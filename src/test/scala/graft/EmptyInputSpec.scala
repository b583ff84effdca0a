package graft

import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Empty-input robustness: every operator family must return an empty
  * (or correctly-degenerate) result on zero rows — never throw. At
  * 100 TB a daily partition CAN be empty (late landing, upstream
  * failure), and a pipeline that crashes on it pages someone at 3am.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  // mirrors the embeddings table schema (vec_id, embedding, label)
  private def emptyEmb: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))

  // mirrors the documents table schema (doc_id, text, source, n_chars…)
  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType), StructField("n_chars", LongType))))

  test("curation family on an empty corpus returns empty, never throws") {
    assert(DedupOps.lineDedup(emptyDocs).isEmpty)
    assert(TextOps.sourceTemperatureMix(emptyDocs).isEmpty)
    assert(SemanticOps.dsirScores(emptyDocs, emptyDocs).isEmpty)
    assert(SemanticOps.dsirSelect(emptyDocs, emptyDocs).isEmpty)
    // degenerate but defined: scoring with an EMPTY target still yields
    // finite smoothed ratios (coalesced totals), not nulls
    val raw = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val scored = SemanticOps.dsirScores(raw, emptyDocs).collect()
    assert(scored.length == 1 && !scored.head.getAs[Double]("score_avg").isNaN)
    // empty embeddings: cap sampler degrades to empty via the seedless path
    assert(SemanticOps.clusterCapSample(emptyEmb).isEmpty)
  }

  test("dedup family on an empty corpus returns empty, never throws") {
    assert(DedupOps.exactDedup(emptyDocs).isEmpty)
    assert(DedupOps.minhashSignatures(emptyDocs).isEmpty)
    assert(DedupOps.minhashPairs(emptyDocs).isEmpty)
    assert(DedupOps.simhash(emptyDocs).isEmpty)
    assert(DedupOps.paragraphDedup(emptyDocs).isEmpty)
    assert(DedupOps.substringDup(emptyDocs).isEmpty)
    assert(DedupOps.nearDupClusters(emptyDocs).isEmpty)
    spark.catalog.clearCache()
  }

  test("incremental dedup: empty delta yields empty; empty index flags nothing") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val index = DedupOps.signatureIndex(docs)
    assert(DedupOps.dedupIncremental(index, emptyDocs).isEmpty)
    val emptyIndex = DedupOps.signatureIndex(emptyDocs)
    val got = DedupOps.dedupIncremental(emptyIndex, docs).collect()
    assert(got.map(r => (r.getLong(0), r.getBoolean(2))).toSeq == Seq((1L, false)))
    spark.catalog.clearCache()
  }

  test("text family on an empty corpus returns empty, never throws") {
    assert(TextOps.textStats(emptyDocs).isEmpty)
    assert(TextOps.tokenCounts(emptyDocs).isEmpty)
    assert(TextOps.chunkDocuments(emptyDocs).isEmpty)
    assert(TextOps.unigramScores(emptyDocs).isEmpty)
    assert(TextOps.vocabEncode(emptyDocs).isEmpty)
    assert(TextOps.piiScrub(emptyDocs).isEmpty)
    assert(TextOps.hashSplit(emptyDocs).isEmpty)
  }

  test("round-6 additions on an empty corpus return empty, never throw") {
    assert(DedupOps.substringDedup(emptyDocs).isEmpty)
    assert(DedupOps.dedupCanonical(emptyDocs).isEmpty)
    assert(DedupOps.contaminationScore(
      emptyDocs.withColumn("lang", org.apache.spark.sql.functions.lit("xx"))).isEmpty)
    assert(TextOps.corpusShuffle(emptyDocs).isEmpty)
    assert(TextOps.tokenBudgetMix(emptyDocs).isEmpty)
    assert(TextOps.stratifiedSample(emptyDocs).isEmpty)
    assert(TextOps.sourceMixUpsample(emptyDocs, Map("a" -> 2.0)).isEmpty)
    assert(TextOps.packSpans(emptyDocs).isEmpty)
    assert(TextOps.packSplit(emptyDocs).isEmpty)
    spark.catalog.clearCache()
  }

  test("semantic family on an empty corpus returns empty, never throws") {
    assert(SemanticOps.semanticClusters(emptyEmb).isEmpty)
    assert(SemanticOps.semanticDedup(emptyEmb).isEmpty)
    assert(SemanticOps.semanticDecontaminate(emptyEmb).isEmpty)
    assert(SemanticOps.semanticDecontaminateLsh(emptyEmb).isEmpty)
    // k-means on an empty corpus cannot seed — must fail LOUDLY, not hang
    // or return garbage centroids.
    val e = intercept[IllegalArgumentException](SemanticOps.kmeansFit(emptyEmb))
    assert(e.getMessage.contains("corpus is empty"))
    spark.catalog.clearCache()
  }

  test("round-7 additions on empty input return empty, never throw") {
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
    val base = Seq((1L, "alice", 10.0)).toDF("c_custkey", "c_name", "c_acctbal")
    // empty changelog: MERGE is the identity; empty base: all inserts
    assert(EventOps.cdcUpsert(emptyEvents, base).count() === 1)
    assert(EventOps.cdcUpsert(emptyEvents, base.limit(0)).isEmpty)
    assert(EventOps.funnelSteps(emptyEvents).isEmpty)
    assert(TextOps.curationReport(
      emptyDocs.withColumn("lang", org.apache.spark.sql.functions.lit(null: String))).isEmpty)
    val emptySessions = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("user_id", LongType), StructField("session_idx", LongType),
        StructField("start_us", LongType), StructField("end_us", LongType))))
    assert(JoinOps.sessionOverlapPairs(emptySessions).isEmpty)
    assert(SimilarityOps.projectEmbeddings(emptyEmb).isEmpty)
    assert(SimilarityOps.annProjectRerank(emptyEmb).isEmpty)
    assert(SimilarityOps.embeddingPipeline(emptyEmb).isEmpty)
  }

  test("stats family on empty input returns empty aggregates, never throws") {
    val emptyLi = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("l_returnflag", StringType),
        StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType))))
    assert(StatsOps.statsCorr(emptyLi).isEmpty)
    assert(StatsOps.quantiles(emptyLi).isEmpty)
  }

  test("landing-gate family on empty input degrades cleanly, never throws") {
    // profile emits one defined row per column (n_rows=0, NULL ratios);
    // constraints pass vacuously — both asserted in Round7ProfileSpec;
    // here: the remaining members of the family
    val emptyLi = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("l_orderkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_returnflag", StringType),
        StructField("l_extendedprice", DoubleType))))
    assert(StatsOps.zscoreNormalize(emptyLi).isEmpty)
    assert(StatsOps.quantileBins(emptyLi).isEmpty)
    val emptyTsVal = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("ts", LongType), StructField("value", DoubleType))))
    assert(StatsOps.driftCheck(emptyTsVal).isEmpty)
    assert(StatsOps.outputDiff(emptyDocs, emptyDocs, "doc_id", "text", "text").isEmpty)
  }

  test("round-8 additions on empty input degrade cleanly, never throw") {
    val emptyTsVal = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("ts", LongType), StructField("value", DoubleType))))
    assert(graft.ops.StatsOps.driftCheckQuantile(emptyTsVal).isEmpty)
    val emptyPackDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType), StructField("text", StringType))))
    assert(graft.ops.TextOps.packSequencesSharded(emptyPackDocs).isEmpty)
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", LongType))))
    assert(graft.ops.SimilarityOps.annRecall(emptyEmb).isEmpty)
    // ingest of an empty directory: zero manifest rows, no listing error
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_ingest")
    try assert(graft.ops.MultimodalOps.ingestManifest(spark, dir.toString).isEmpty)
    finally java.nio.file.Files.delete(dir)
  }

  test("round-9 additions on empty input degrade cleanly, never throw") {
    // empty corpus: no pairs, no clusters — and the assignment is still
    // total (zero rows of it), not an NPE in the cluster join
    assert(DedupOps.splitLeakage(emptyDocs).isEmpty)
    assert(DedupOps.leakageSafeSplit(emptyDocs).isEmpty)
    assert(DedupOps.crossSourceDupMatrix(emptyDocs).isEmpty)
    // a corpus with docs but NO near-dups: leakageSafeSplit must still
    // assign every doc (singleton fallback), with zero cluster rows
    val loners = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val assigned = DedupOps.leakageSafeSplit(loners).collect()
    assert(assigned.length == 2 && assigned.forall(r =>
      Set("train", "valid", "test").contains(r.getString(1))))
  }

  test("late round-9 additions on empty input degrade cleanly, never throw") {
    // mirrors the events table schema the loader emits (ts as long nanos)
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType))))
    assert(EventOps.scd2History(emptyEvents).isEmpty)
    val emptyDocsWithLang = emptyDocs.withColumn(
      "lang", org.apache.spark.sql.functions.lit("xx"))
    assert(TextOps.kAnonymityGate(emptyDocsWithLang).isEmpty)
    assert(FrequencyOps.heavyHittersBySource(emptyDocs).isEmpty)
    assert(FrequencyOps.heavyNgrams(emptyDocs).isEmpty)
  }

  test("round-11 additions on empty input degrade cleanly, never throw") {
    // bucket audits: zero buckets, zero rows — never a limit/window error
    assert(DedupOps.minhashBucketStats(emptyDocs).isEmpty)
    assert(SimilarityOps.embeddingBucketStats(emptyEmb).isEmpty)
    // the fuse's pre-pass on an empty relation: no overflow keys, the
    // input plan comes back unchanged (and empty)
    assert(SimilarityOps.embeddingNearDupLsh(emptyEmb).isEmpty)
    // sampled recall on an empty corpus: one defined summary row with
    // n_truth = 0 and a NULL (nullif-guarded) recall — same contract as
    // the exhaustive estimator
    val r = DedupOps.dedupRecallSampled(emptyDocs).collect()
    assert(r.length == 1 && r.head.getAs[Long]("n_truth") == 0L
      && r.head.isNullAt(r.head.fieldIndex("recall")))
    // span-level decontamination: no docs, no spans, no redacted rows
    assert(DedupOps.decontaminateSpans(emptyDocs).isEmpty)
    assert(DedupOps.decontaminateSurgical(emptyDocs).isEmpty)
    spark.catalog.clearCache()
  }
}
