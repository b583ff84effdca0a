package graft

import graft.ops.{SemanticOps, SimilarityOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** SemDeDup family: cluster assignment, within-cluster greedy dedup,
  * Lloyd's k-means, and semantic decontamination.
  */
class SemanticOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Small deterministic corpus: 4 tight blobs in 64-d (one-hot-ish with
    * small per-vector jitter on a second axis) so nearest-seed assignment
    * and k-means both have an unambiguous ground truth.
    */
  private def blobs(perBlob: Int = 10): DataFrame = {
    // vec_id = i * 4 + b interleaves blobs so the first k=4 ids (the
    // deterministic seeds) land in four DIFFERENT blobs — a well-posed init.
    val rows = for {
      b <- 0 until 4
      i <- 0 until perBlob
    } yield {
      val base = Array.fill(64)(0.0f)
      base(b * 8) = 1.0f
      base(b * 8 + 1) = 0.01f * (i % 5) // jitter, cos to blob mate ≥ 0.999
      ((i * 4 + b).toLong, base.toSeq, b)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("semanticClusters: every vector lands on its argmax-cosine seed (brute force)") {
    val df = blobs()
    val k = 4
    val vecs = df.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val seeds = (0L until k.toLong).map(i => i -> vecs(i))
    val got = SemanticOps.semanticClusters(df, k)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got.keySet == vecs.keySet)
    for ((id, v) <- vecs) {
      val best = seeds.map { case (s, sv) => (s, cosine(v, sv)) }
        .maxBy { case (s, c) => (c, -s) }._1
      assert(got(id) == best, s"vec $id expected seed $best got ${got(id)}")
    }
  }

  test("semanticClusters assignment is map-side: zero Exchange in the plan") {
    val plan = SemanticOps.semanticClusters(blobs(), 4).queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected shuffle-free assignment, got:\n$plan")
  }

  test("semanticDedup: planted exact copies never survive; survivors+drops partition the corpus") {
    // plant copies EXPLICITLY (the operator takes the corpus as given)
    val df = SimilarityOps.augmentedEmbeddings(blobs())
    val survivors = SemanticOps.semanticDedup(df, k = 4, minCos = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // copies are vec_id % 25 == 0 re-keyed +10000; their source is always
    // present in the same cluster at cos = 1 ≥ any threshold, and ranks
    // before them on the vec_id tiebreak — so no copy survives.
    assert(survivors.forall(_ < 10000), "an injected exact copy survived")
    val corpus = SemanticOps.semanticClusters(df, 4).select("vec_id").as[Long].collect().toSet
    assert(survivors.subsetOf(corpus))
  }

  test("semanticDedup greedy invariant: no surviving pair within a cluster reaches the threshold") {
    val minCos = 0.999
    val vecs = blobs().select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val aug = vecs ++ vecs.filter(_._1 % 25 == 0).map { case (id, v) => (id + 10000) -> v }
    val out = SemanticOps.semanticDedup(
        SimilarityOps.augmentedEmbeddings(blobs()), k = 4, minCos = minCos)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    for {
      Array((a, ca), (b, cb)) <- out.combinations(2)
      if ca == cb
    } assert(cosine(aug(a), aug(b)) < minCos,
      s"survivors $a and $b in cluster $ca are dups at ${cosine(aug(a), aug(b))}")
  }

  test("semanticDedup at an unreachable threshold is a no-op") {
    // cosine never exceeds 1, so minCos = 2.0 must keep the whole
    // corpus — the sweep generates zero drops.
    val df = blobs()
    val survivors = SemanticOps.semanticDedup(df, k = 4, minCos = 2.0)
      .select("vec_id").as[Long].collect().toSet
    val corpusSize = SemanticOps.semanticClusters(df, 4).count()
    assert(survivors.size.toLong == corpusSize, "minCos > 1 must be a no-op dedup")
  }

  test("kmeansFit on separable blobs recovers the blob partition and is deterministic") {
    val df = blobs()
    val c1 = SemanticOps.kmeansFit(df, k = 4, iters = 3)
    val c2 = SemanticOps.kmeansFit(df, k = 4, iters = 3)
    val a1 = SemanticOps.kmeansAssign(df, c1)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val a2 = SemanticOps.kmeansAssign(df, c2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(a1 == a2, "k-means assignments must be deterministic across runs")
    // same-blob vectors co-cluster; different blobs are orthogonal so never merge
    val byLabel = df.select("vec_id", "label").as[(Long, Int)].collect()
    val clusterOf = byLabel.map { case (id, lab) => lab -> a1(id) }
    assert(clusterOf.groupBy(_._1).forall { case (_, xs) => xs.map(_._2).distinct.length == 1 },
      "a blob was split across clusters")
    assert(clusterOf.map(_._2).distinct.length == 4, "blobs merged into fewer than 4 clusters")
  }

  test("kmeansFit objective is non-increasing across iterations") {
    val df = blobs()
    def objective(cents: Array[Seq[Double]]): Double =
      SemanticOps.kmeansAssign(df, cents).agg(sum(lit(1.0) - col("c_score"))).as[Double].head()
    val objs = (1 to 3).map(i => objective(SemanticOps.kmeansFit(df, k = 4, iters = i)))
    assert(objs.sliding(2).forall(s => s.last <= s.head + 1e-12),
      s"objective increased across iterations: $objs")
  }

  test("hashedTf densifies into hashedEmbeddings consistently (spot check)") {
    val docs = Seq((1L, "a b a"), (2L, "c c c c")).toDF("doc_id", "text")
    val tf = SemanticOps.hashedTf(docs).as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (d, rows) => d -> rows.map(r => r._2 -> r._3).toMap }
    val dense = SemanticOps.hashedEmbeddings(docs)
      .as[(Long, Seq[Float])].collect().toMap
    for ((d, m) <- tf; dim <- 0 until 64) {
      assert(dense(d)(dim) == m.getOrElse(dim.toLong, 0L).toFloat,
        s"doc $d dim $dim: dense ${dense(d)(dim)} vs tf ${m.getOrElse(dim.toLong, 0L)}")
    }
    assert(tf(1L).values.sum == 3 && tf(2L).values.sum == 4) // token counts conserved
  }

  test("text -> hashed embedding -> semantic dedup catches planted near-dup documents end-to-end") {
    // the model-free bridge: near-dup docs (one token dropped) have
    // near-parallel TF vectors, so the SEMANTIC dedup finds LEXICAL
    // near-dups without any encoder. Seeds are vec_id < k, so ids 0 and 1
    // (the two DISTINCT docs) are the centroids: doc 0 shares the tok*
    // vocabulary with the near-dup pair (clear-margin assignment to
    // cluster 0), doc 1 shares nothing.
    val base = (1 to 40).map(i => s"tok${i % 13} word$i filler${i % 7}").mkString(" ")
    val docs = Seq(
      (0L, (1 to 20).map(i => s"tok${i % 13} own$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"other$i unrelated${i % 5}").mkString(" ")),
      (10L, base),
      (11L, base.split(" ").drop(1).mkString(" ")) // near-dup of 10
    ).toDF("doc_id", "text")
    val vecs = SemanticOps.hashedEmbeddings(docs)
    val survivors = SemanticOps.semanticDedup(vecs, k = 2, minCos = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(!(survivors.contains(10L) && survivors.contains(11L)),
      s"near-dup pair 10/11 must collapse to one survivor, got $survivors")
    assert(survivors.contains(0L) && survivors.contains(1L),
      s"distinct docs must survive, got $survivors")
  }

  test("semanticDecontaminate drops exactly the planted eval copies on a near-orthogonal corpus") {
    // orthogonal axes: eval member vec_id=0 (0 % 50 == 0); its planted
    // copy 20001 (from the explicit fixture) must drop, everything else
    // survives at 0.99.
    val rows = (0 until 8).map { i =>
      val v = Array.fill(64)(0.0f); v(i * 8) = 1.0f; (i.toLong, v.toSeq, 0)
    }
    val df = SemanticOps.contaminatedEmbeddings(rows.toDF("vec_id", "embedding", "label"))
    val kept = SemanticOps.semanticDecontaminate(df, minCos = 0.99, evalMod = 50)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L), s"got $kept")
  }

  test("explicit (train, eval) decontamination equals the same-table convenience split") {
    val emb = SemanticOps.contaminatedEmbeddings(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val viaSplit = SemanticOps.semanticDecontaminate(emb).as[Long].collect().toSet
    val explicit = SemanticOps.semanticDecontaminate(
      emb.filter($"vec_id" % 50 =!= 0), emb.filter($"vec_id" % 50 === 0), 0.99)
      .as[Long].collect().toSet
    assert(explicit == viaSplit)
  }

  test("LSH decontamination agrees with the exact path on the sf0.001 corpus") {
    val emb = SemanticOps.contaminatedEmbeddings(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val exact = SemanticOps.semanticDecontaminate(emb).as[Long].collect().toSet
    val lsh = SemanticOps.semanticDecontaminateLsh(emb).as[Long].collect().toSet
    // exact copies always share a bucket, so at the 0.99 threshold the
    // bucketed path catches the same contamination set.
    assert(lsh == exact)
  }

  private def tripletCorpus = Seq(
    (0L, "apple banana cherry date"),
    (1L, "banana banana cherry elder fig"),
    (2L, "apple apple grape haw iris"),
    (3L, "cherry date elder fig grape"),
    (4L, "iris jack kiwi lemon apple"),
    (5L, "date date date elder haw jack"),
    (6L, "kiwi lemon mango nut olive"),
    (7L, "apple banana date fig haw kiwi"),
    (8L, "apple banana date fig haw kiwi"),
    (9L, "mango nut olive pear quince")).toDF("doc_id", "text")

  test("tripletMining: anchors/positives are the verified near-dup pairs; " +
    "negatives are distinct, outside the pair set, and deterministic") {
    import org.apache.spark.sql.functions.col
    val trips = SemanticOps.tripletMining(tripletCorpus, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trips.nonEmpty)
    val pairKeys = graft.ops.DedupOps
      .minhashPairs(graft.ops.DedupOps.augmented(tripletCorpus))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trips.map(t => (t._1, t._2)).toSet.subsetOf(pairKeys))
    trips.foreach { case (a, p, n) =>
      assert(a != n && p != n)
      assert(!pairKeys.contains((math.min(a, n), math.max(a, n))))
    }
    val again = SemanticOps.tripletMining(tripletCorpus.repartition(7),
      buckets = 2).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trips.sorted.toSeq == again.sorted.toSeq)
  }
}
