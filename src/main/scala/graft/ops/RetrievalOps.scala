package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B10+ — RETRIEVAL family: ranked sparse (BM25) and dense (hashed-TF
  * cosine) channels over the documents corpus, reciprocal-rank-fusion
  * hybrid retrieval, a persisted inverted-index lifecycle with
  * incremental merge, and a planted-contamination recall evaluation.
  *
  * The retrieval shape in a training-data pipeline is the
  * decontamination / near-match audit (the [[TextOps.bm25TopK]]
  * contract): suspect documents are QUERIES against the corpus.
  * Hybrid sparse+dense fusion is the standard recipe when neither
  * channel alone is reliable — lexical BM25 misses paraphrases, dense
  * vectors miss rare-term exact matches; RRF (Cormack et al. 2009)
  * fuses the two rank lists without score calibration.
  *
  * Scale design (100 TB), shared across the family:
  *  - the query side is always bounded (suspect set) and BROADCAST:
  *    BM25 broadcasts the query vocabulary onto the token stream
  *    (corpus explode filtered map-side), the dense channel broadcasts
  *    the query TF entries onto the postings (≤ |queries|·dims rows).
  *  - channel top-k are per-query windows (WindowGroupLimit partial +
  *    final around the q_id exchange — no input partition forwards
  *    more than k rows per query), so candidate volume never
  *    concentrates.
  *  - fusion joins two k-bounded rank lists — trivially small however
  *    large the corpus.
  *  - the dense channel here is the BRUTE-FORCE baseline (one corpus
  *    pass per query batch); at scale the fusion input contract
  *    ([[rrfFuse]] takes any (q_id, doc_id, rank) frame) slots in the
  *    [[SimilarityOps]] ANN family (IVF/LSH/PQ) unchanged — the
  *    registered cosine_topk/ann_* baseline-vs-scale-path pairing.
  *
  * Cross-engine reproducibility (the repo-wide oracle contract):
  * LINEAR idf, ordered term folds and single-IEEE-op score arithmetic
  * as documented on [[TextOps.bm25TopK]]; the dense channel's dot
  * product and squared norms are EXACT INTEGER sums (term frequencies
  * are integers, so Σ tf·tf commutes exactly — no float-order hazard),
  * converted to a double only for the final one-division-two-sqrt
  * cosine; RRF contributions are one IEEE add + one division per
  * channel, summed in a fixed (sparse, dense) order.
  */
object RetrievalOps {

  private def toksCol = split(col("text"), " ", -1)

  // ---------------------------------------------------------------
  // Sparse channel (BM25)
  // ---------------------------------------------------------------

  /** Query-term table (q_id, word): distinct space-split tokens of the
    * corpus rows selected by `isQuery` (a doc_id predicate). */
  def queryTerms(corpus: DataFrame, isQuery: Column): DataFrame =
    corpus.filter(isQuery)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(toksCol)).as("word"))

  /** Generalized [[TextOps.bm25TopK]]: BM25 top-k of each query
    * document (rows matching `isQuery`, a doc_id predicate) against all
    * OTHER corpus documents. Identical arithmetic and plan shape — the
    * query vocabulary is broadcast so the corpus-side explode is
    * filtered MAP-SIDE before tf/df ever shuffle; see the scale notes
    * on [[TextOps.bm25TopK]]. Output: (q_id, doc_id, n_terms, score,
    * rank), rank ≤ k per query.
    */
  def bm25Ranks(corpus: DataFrame, isQuery: Column, k: Int = 5): DataFrame = {
    val qterms = queryTerms(corpus, isQuery)
    val qvocab = qterms.select("word").distinct()
    val toks = corpus
      .select(col("doc_id"), explode(toksCol).as("word"))
      .join(broadcast(qvocab), "word")
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfT = toks.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
    val dl = corpus.select(col("doc_id"), size(toksCol).cast("long").as("dl"))
    scoreAndRank(tf, dfT, dl, qterms, k)
  }

  /** The scoring tail shared by the inline ([[bm25Ranks]]) and
    * persisted-index ([[bm25RanksFromIndex]]) formulations — ONE
    * composition, so the two paths are bit-identical by construction:
    * idf = ((N − df) + 0.5) / (df + 0.5) [linear]; norm = 0.25 +
    * 0.75·(dl/avgdl); contribution = idf · (tf·2.2)/(tf + 1.2·norm)
    * [k1 = 1.2, b = 0.75]; per-(query, doc) score = term-lexicographic
    * strict left fold from 0.0.
    */
  private def scoreAndRank(tf: DataFrame, dfT: DataFrame, dl: DataFrame,
                           qterms: DataFrame, k: Int): DataFrame = {
    val nAvg = dl.agg(count(lit(1)).as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val idf = ((col("n") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val norm = lit(0.25) + (lit(0.75) * (col("dl").cast("double") / col("avgdl")))
    val contrib = idf *
      ((col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + (lit(1.2) * norm)))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(dfT), "word")
      .join(broadcast(qterms), "word")
      .filter(col("doc_id") =!= col("q_id"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(nAvg))
      .withColumn("c", contrib)
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"),
        expr("""aggregate(transform(array_sort(collect_list(struct(word, c))),
               |  x -> x.c), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
          .as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "doc_id", "n_terms", "score", "rank")
  }

  // ---------------------------------------------------------------
  // Persisted inverted index + incremental merge
  // ---------------------------------------------------------------

  /** The persisted BM25 index of a corpus slice — what a production
    * pipeline writes once per slice so that queries and later
    * increments never re-tokenize the corpus (the
    * [[DedupOps.signatureIndex]] / [[PqOps]] persisted-index
    * discipline, applied to lexical retrieval):
    *  - postings: (doc_id, word, tf) — the inverted index;
    *  - doclens:  (doc_id, dl) — length normalization;
    *  - df:       (word, df) — document frequency, slice-local.
    * Corpus stats (N, avgdl) are derived from the skinny doclens at
    * query time; df is ADDITIVE across doc-disjoint slices, so an
    * increment is a union + one vocabulary-sized merge — the corpus
    * postings are never rebuilt.
    */
  final case class Bm25Index(postings: DataFrame, doclens: DataFrame,
                             df: DataFrame)

  def bm25BuildIndex(corpus: DataFrame): Bm25Index = {
    val postings = corpus
      .select(col("doc_id"), explode(toksCol).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val doclens = corpus.select(col("doc_id"),
      size(toksCol).cast("long").as("dl"))
    val dfT = postings.groupBy("word").agg(count(lit(1)).as("df"))
    Bm25Index(postings, doclens, dfT)
  }

  /** Fold a doc-disjoint increment into an index: postings/doclens
    * append, df merges by word (full-outer sum — additive because no
    * document is in both slices). The merge cost is delta-plus-vocab
    * sized, independent of the corpus postings volume.
    */
  def bm25MergeIndex(a: Bm25Index, b: Bm25Index): Bm25Index = Bm25Index(
    a.postings.unionAll(b.postings),
    a.doclens.unionAll(b.doclens),
    mergeDf(a.df, b.df))

  /** The word-keyed df sum on its own (the streaming index loop merges
    * df generations without unioning postings). */
  def mergeDf(a: DataFrame, b: DataFrame): DataFrame =
    a.withColumnRenamed("df", "df_a")
      .join(b.withColumnRenamed("df", "df_b"), Seq("word"), "full")
      .select(col("word"),
        (coalesce(col("df_a"), lit(0L)) + coalesce(col("df_b"), lit(0L)))
          .as("df"))

  def writeBm25Index(idx: Bm25Index, dir: String): Unit = {
    idx.postings.write.mode("overwrite").parquet(dir + "/postings")
    idx.doclens.write.mode("overwrite").parquet(dir + "/doclens")
    idx.df.write.mode("overwrite").parquet(dir + "/df")
  }

  def readBm25Index(spark: SparkSession, dir: String): Bm25Index = Bm25Index(
    spark.read.parquet(dir + "/postings"),
    spark.read.parquet(dir + "/doclens"),
    spark.read.parquet(dir + "/df"))

  /** BM25 top-k from a persisted/merged index, never touching corpus
    * text: postings and df are filtered by the BROADCAST query
    * vocabulary (map-side, so only query-term posting rows survive the
    * scan), then the shared [[scoreAndRank]] tail. For query words the
    * slice-summed df equals the full-corpus df and per-doc tf rows are
    * slice-unique, so the result is bit-identical to [[bm25Ranks]] on
    * the concatenated corpus (spec-pinned; the registered
    * `bm25_incremental` oracle IS the full-corpus `bm25_topk` SQL).
    */
  def bm25RanksFromIndex(idx: Bm25Index, qterms: DataFrame,
                         k: Int = 5): DataFrame = {
    val qvocab = qterms.select("word").distinct()
    val tf = idx.postings.join(broadcast(qvocab), "word")
    val dfT = idx.df.join(broadcast(qvocab), "word")
    scoreAndRank(tf, dfT, idx.doclens, qterms, k)
  }

  // ---------------------------------------------------------------
  // Dense channel (hashed-TF cosine) + RRF fusion
  // ---------------------------------------------------------------

  /** Densified per-document hashed-TF vector (ARRAY<BIGINT>[dims]) —
    * ONE corpus aggregation; the long-typed twin of
    * [[SemanticOps.hashedEmbeddings]] (kept integral so dots/norms
    * stay exact). In a persisted deployment this is the document-side
    * vector index. */
  def denseVectors(corpus: DataFrame, dims: Int = 64): DataFrame =
    SemanticOps.hashedTf(corpus, dims)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("tf"))))
        .as("m"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${dims - 1}), d -> coalesce(element_at(m, CAST(d AS BIGINT)), 0L))")
        .as("v"))

  /** Dense ranked channel: cosine top-k over the model-free
    * [[SemanticOps.hashedTf]] document vectors (feature hashing to
    * `dims` buckets). Plan shape: ONE corpus aggregation to per-doc
    * integer vectors ([[denseVectors]]), query vectors built from the
    * query slice alone and BROADCAST, dots and norms computed MAP-SIDE
    * as exact integer folds (tf is integral, so Σ a·b commutes — no
    * float-order hazard), cosine one division over two sqrt's, top-k a
    * per-query window (WindowGroupLimit brackets the q_id exchange).
    * Pairs sharing no hashed dimension have dot = 0 and are dropped —
    * exactly the candidate set a sparse-entry equi-join on dim would
    * produce, which is what the DuckDB twin expresses. Output:
    * (q_id, doc_id, cos, rank).
    */
  def denseRanks(corpus: DataFrame, isQuery: Column, k: Int = 5,
                 dims: Int = 64): DataFrame = {
    def n2(v: String) = expr(s"aggregate($v, 0L, (acc, x) -> acc + x * x)")
    val qvecs = denseVectors(corpus.filter(isQuery), dims)
      .select(col("doc_id").as("q_id"), col("v").as("qv"),
        n2("v").as("n2q"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("doc_id").asc)
    denseVectors(corpus, dims)
      .withColumn("n2d", n2("v"))
      .crossJoin(broadcast(qvecs))
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(v, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .filter(col("dot") > 0L)
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("n2q").cast("double")) * sqrt(col("n2d").cast("double"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "doc_id", "cos", "rank")
  }

  /** Reciprocal rank fusion (Cormack et al. 2009, c = 60): rrf =
    * Σ_channels 1/(c + rank), absent channel contributes 0, summed in
    * fixed (sparse, dense) order. Takes ANY two ranked (q_id, doc_id,
    * …, rank) frames — the dense slot accepts the brute-force baseline
    * or any [[SimilarityOps]] ANN top-k. Ranks carried through as
    * `sparse_rank`/`dense_rank` (−1 = not retrieved by that channel).
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int = 5,
              c: Double = 60.0): DataFrame = {
    val s = sparse.select(col("q_id"), col("doc_id"), col("rank").as("s_rank"))
    val d = dense.select(col("q_id"), col("doc_id"), col("rank").as("d_rank"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    s.join(d, Seq("q_id", "doc_id"), "full")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("s_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("d_rank").cast("double")), lit(0.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"),
        coalesce(col("s_rank"), lit(-1L)).as("sparse_rank"),
        coalesce(col("d_rank"), lit(-1L)).as("dense_rank"),
        col("rrf"), col("rank"))
  }

  /** Hybrid retrieval: fuse the BM25 and hashed-TF-cosine channel
    * top-kChannel lists by RRF, keep the fused top-k. */
  def hybridRrf(corpus: DataFrame, isQuery: Column, kChannel: Int = 10,
                k: Int = 5): DataFrame =
    rrfFuse(bm25Ranks(corpus, isQuery, kChannel),
      denseRanks(corpus, isQuery, kChannel), k)

  // ---------------------------------------------------------------
  // Planted-contamination recall evaluation
  // ---------------------------------------------------------------

  /** Retrieval-recall evaluation on PLANTED near-duplicates (the
    * retrieval-based-decontamination quality question: "if a benchmark
    * document leaked into the corpus with light edits, does the audit
    * retrieve the source at rank ≤ k?"). Corpus = [[DedupOps.augmented]]
    * (originals ∪ first-word-stripped near copies at +100000 ∪ exact
    * copies at +200000); queries = the 8 smallest near copies; truth
    * for query q is its original q − 100000. One row per channel
    * (sparse / dense / hybrid): (channel, n_queries, n_hits, recall).
    * Evaluation-harness class: cost is bounded by the fixed query set,
    * not the corpus (both channels stay query-broadcast).
    */
  def retrievalRecall(documents: DataFrame, kChannel: Int = 10,
                      k: Int = 5): DataFrame = {
    val corpus = DedupOps.augmented(documents)
    val isQuery = col("doc_id") >= 100000L && col("doc_id") < 100080L
    val s = bm25Ranks(corpus, isQuery, kChannel)
    val d = denseRanks(corpus, isQuery, kChannel)
    val h = rrfFuse(s, d, k)
    val nQ = corpus.filter(isQuery).agg(count(lit(1)).as("n_queries"))
    def hits(ranked: DataFrame, name: String): DataFrame = ranked
      .filter(col("rank") <= k && col("doc_id") === col("q_id") - 100000L)
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(name).as("channel"), col("n_hits"))
    hits(s, "sparse").unionAll(hits(d, "dense")).unionAll(hits(h, "hybrid"))
      .crossJoin(broadcast(nQ))
      .select(col("channel"), col("n_queries"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_queries").cast("double"))
          .as("recall"))
  }

  // ---------------------------------------------------------------
  // DuckDB twins
  // ---------------------------------------------------------------

  /** Sparse-channel CTE chain (expects a `corpus(doc_id, text)` CTE in
    * scope); terminal CTE `stop` = (q_id, doc_id, n_terms, score,
    * rank ≤ kChannel). Same semi-join vocabulary filter, single-IEEE-op
    * composition, term-ordered left fold and (score DESC, doc_id ASC)
    * tiebreak as [[bm25Ranks]]. */
  def sparseCtes(queryPred: String, kChannel: Int): String =
    s"""qterms AS (
       |  SELECT DISTINCT doc_id AS q_id, unnest(string_split(text, ' ')) AS word
       |  FROM corpus WHERE $queryPred),
       |toks AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus)
       |  WHERE word IN (SELECT word FROM qterms)),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |       FROM corpus),
       |navg AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |                CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
       |         FROM dl),
       |contribs AS (
       |  SELECT q.q_id, tf.doc_id, tf.word,
       |    ((CAST(navg.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
       |    * ((CAST(tf.tf AS DOUBLE) * 2.2)
       |       / (CAST(tf.tf AS DOUBLE)
       |          + (1.2 * (0.25 + (0.75 * (CAST(dl.dl AS DOUBLE) / navg.avgdl))))))
       |    AS c
       |  FROM tf
       |  JOIN df ON tf.word = df.word
       |  JOIN qterms q ON tf.word = q.word
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN navg
       |  WHERE tf.doc_id <> q.q_id),
       |sscored AS (
       |  SELECT q_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY word)),
       |                (acc, x) -> acc + x) AS score
       |  FROM contribs GROUP BY 1, 2),
       |stop AS (
       |  SELECT q_id, doc_id, n_terms, score, rank FROM (
       |    SELECT q_id, doc_id, n_terms, score,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
       |    FROM sscored)
       |  WHERE rank <= $kChannel)""".stripMargin

  /** Dense-channel CTE chain (expects `corpus`); terminal CTE `dtop` =
    * (q_id, doc_id, cos, rank ≤ kChannel). Mirrors
    * [[SemanticOps.hashedTfOracle]]'s hash and [[denseRanks]]'s exact
    * integer dot/norm² with the one-division-two-sqrt cosine. */
  def denseCtes(queryPred: String, kChannel: Int, dims: Int): String =
    s"""dtf AS (
       |  SELECT doc_id, ${Hashing.hash64Duck("w")} % $dims AS dim,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus)
       |  WHERE len(w) > 0 GROUP BY 1, 2),
       |qdtf AS (SELECT doc_id AS q_id, dim, tf AS qtf FROM dtf WHERE $queryPred),
       |n2 AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
       |       FROM dtf GROUP BY 1),
       |ddot AS (
       |  SELECT q.q_id, t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
       |  FROM dtf t JOIN qdtf q ON t.dim = q.dim
       |  WHERE t.doc_id <> q.q_id GROUP BY 1, 2),
       |dscored AS (
       |  SELECT d.q_id, d.doc_id,
       |    CAST(d.dot AS DOUBLE)
       |      / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nd.n2 AS DOUBLE))) AS cos
       |  FROM ddot d
       |  JOIN n2 nq ON d.q_id = nq.doc_id
       |  JOIN n2 nd ON d.doc_id = nd.doc_id),
       |dtop AS (
       |  SELECT q_id, doc_id, cos, rank FROM (
       |    SELECT q_id, doc_id, cos,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS rank
       |    FROM dscored)
       |  WHERE rank <= $kChannel)""".stripMargin

  /** RRF fusion CTEs over `stop` ⋈ `dtop`; terminal CTE `htop` =
    * (q_id, doc_id, sparse_rank, dense_rank, rrf, rank ≤ k). */
  def rrfCtes(k: Int): String =
    s"""fused AS (
       |  SELECT COALESCE(s.q_id, d.q_id) AS q_id,
       |    COALESCE(s.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(s.rank, CAST(-1 AS BIGINT)) AS sparse_rank,
       |    COALESCE(d.rank, CAST(-1 AS BIGINT)) AS dense_rank,
       |    COALESCE(CAST(1.0 AS DOUBLE)
       |        / (CAST(60.0 AS DOUBLE) + CAST(s.rank AS DOUBLE)),
       |      CAST(0.0 AS DOUBLE))
       |    + COALESCE(CAST(1.0 AS DOUBLE)
       |        / (CAST(60.0 AS DOUBLE) + CAST(d.rank AS DOUBLE)),
       |      CAST(0.0 AS DOUBLE)) AS rrf
       |  FROM stop s FULL JOIN dtop d
       |    ON s.q_id = d.q_id AND s.doc_id = d.doc_id),
       |htop AS (
       |  SELECT q_id, doc_id, sparse_rank, dense_rank, rrf, rank FROM (
       |    SELECT q_id, doc_id, sparse_rank, dense_rank, rrf,
       |      CAST(row_number() OVER (PARTITION BY q_id
       |        ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
       |    FROM fused)
       |  WHERE rank <= $k)""".stripMargin

  def hybridRrfOracle(nQueries: Int = 8, kChannel: Int = 10, k: Int = 5,
                      dims: Int = 64): String = {
    val pred = s"doc_id < $nQueries"
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |${sparseCtes(pred, kChannel)},
       |${denseCtes(pred, kChannel, dims)},
       |${rrfCtes(k)}
       |SELECT q_id, doc_id, sparse_rank, dense_rank, rrf, rank FROM htop""".stripMargin
  }

  def retrievalRecallOracle(kChannel: Int = 10, k: Int = 5,
                            dims: Int = 64): String = {
    val pred = "doc_id >= 100000 AND doc_id < 100080"
    s"""WITH ${DedupOps.augmentedSql},
       |${sparseCtes(pred, kChannel)},
       |${denseCtes(pred, kChannel, dims)},
       |${rrfCtes(k)},
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries
       |       FROM corpus WHERE $pred),
       |shits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM stop
       |          WHERE rank <= $k AND doc_id = q_id - 100000),
       |dhits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM dtop
       |          WHERE rank <= $k AND doc_id = q_id - 100000),
       |hhits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM htop
       |          WHERE rank <= $k AND doc_id = q_id - 100000)
       |SELECT channel, n_queries, n_hits,
       |  CAST(n_hits AS DOUBLE) / CAST(n_queries AS DOUBLE) AS recall
       |FROM (
       |  SELECT 'sparse' AS channel, nq.n_queries, s.n_hits
       |  FROM shits s CROSS JOIN nq
       |  UNION ALL
       |  SELECT 'dense' AS channel, nq.n_queries, d.n_hits
       |  FROM dhits d CROSS JOIN nq
       |  UNION ALL
       |  SELECT 'hybrid' AS channel, nq.n_queries, h.n_hits
       |  FROM hhits h CROSS JOIN nq)""".stripMargin
  }
}
