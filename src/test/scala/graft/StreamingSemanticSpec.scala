package graft

import graft.ops.SemanticOps
import graft.streaming.StreamingSemantic
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming semantic (embedding) near-dup dedup: batch parity,
  * cross-batch matching, TTL eviction, overflow sentinel, and the
  * stateless decontamination twin.
  */
class StreamingSemanticSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

  private def streamOf(input: MemoryStream[(Long, Seq[Float], Timestamp)]) =
    input.toDF().toDF("vec_id", "embedding", "ts")

  /** Batch reference: same buckets, same cosine, (later_id, earlier_id)
    * orientation — mirrors the stream's smaller-id-first matching within
    * one micro-batch.
    */
  private def batchPairs(vecs: DataFrame, minCos: Double,
                         nPlanes: Int): Set[(Long, Long)] = {
    val c = vecs
      .withColumn("emb", col("embedding").cast("array<double>"))
      .withColumn("norm", sqrt(graft.functions.native.dotFold(col("emb"), col("emb"))))
      .withColumn("bucket", graft.ops.SimilarityOps.bucketExpr(nPlanes))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("b.vec_id") < col("a.vec_id"))
      .filter(graft.functions.native.dotFold(col("a.emb"), col("b.emb")) /
        (col("a.norm") * col("b.norm")) >= minCos)
      .select(col("a.vec_id"), col("b.vec_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def sfVecs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("streaming semantic dedup matches the batch bucket+cosine pairs on the augmented corpus") {
    implicit val sq = spark.sqlContext
    val corpus = graft.ops.SimilarityOps.augmentedEmbeddings(sfVecs)
      .select("vec_id", "embedding")
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), t0)).toSeq
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSemantic.semanticDedupStream(spark, streamOf(input))
    val query = out.writeStream.format("memory").queryName("sem_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("sem_stream").select("vec_id", "dup_of")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = batchPairs(corpus, minCos = 0.99, nPlanes = 8)
      assert(got == want, s"stream-only: ${got -- want}\nbatch-only: ${want -- got}")
      assert(want.nonEmpty, "augmented corpus must contain planted embedding copies")
    } finally query.stop()
  }

  test("exact embedding copies match across micro-batches with cos 1.0") {
    implicit val sq = spark.sqlContext
    val v = (0 until 64).map(i => if (i == 3) 1.0f else 0.25f)
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSemantic.semanticDedupStream(spark, streamOf(input))
    val query = out.writeStream.format("memory").queryName("sem_stream_xb")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, v, t0))
      query.processAllAvailable()
      assert(spark.table("sem_stream_xb").count() == 0)
      input.addData((2L, v, new Timestamp(t0.getTime + 1000)))
      query.processAllAvailable()
      val got = spark.table("sem_stream_xb").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // cos of a vector with itself is 1 up to one ulp (d / sqrt(d)²)
      assert(got.map(t => (t._1, t._2)) == Seq((2L, 1L)), s"got $got")
      assert(math.abs(got.head._3 - 1.0) < 1e-12, s"got $got")
    } finally query.stop()
  }

  test("bucket state is evicted after the TTL: late duplicates no longer match") {
    implicit val sq = spark.sqlContext
    val v = (0 until 64).map(i => if (i % 7 == 0) 0.9f else -0.1f)
    val w = (0 until 64).map(i => if (i % 5 == 0) -0.8f else 0.3f) // different bucket filler
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSemantic.semanticDedupStream(spark, streamOf(input),
      watermarkDelay = "1 minute", stateTtlMs = 60L * 1000)
    val query = out.writeStream.format("memory").queryName("sem_stream_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, v, t0))
      query.processAllAvailable()
      input.addData((2L, w, new Timestamp(t0.getTime + 3600L * 1000)))
      query.processAllAvailable()
      input.addData((3L, w, new Timestamp(t0.getTime + 3610L * 1000)))
      query.processAllAvailable()
      input.addData((4L, v, new Timestamp(t0.getTime + 3620L * 1000)))
      query.processAllAvailable()
      val got = spark.table("sem_stream_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 3 matches 2 (same vector, inside horizon); 4 must NOT match 1.
      assert(got == Set((3L, 2L)), s"got $got")
    } finally query.stop()
  }

  test("hot-bucket overflow emits the loud sentinel instead of silently dropping") {
    implicit val sq = spark.sqlContext
    val v = (0 until 64).map(_ => 0.5f)
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSemantic.semanticDedupStream(spark, streamOf(input),
      maxBucket = 1)
    val query = out.writeStream.format("memory").queryName("sem_stream_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, v, t0), (2L, v, t0), (3L, v, t0))
      query.processAllAvailable()
      val got = spark.table("sem_stream_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // vec 1 fills the bucket; 2 and 3 overflow with the sentinel.
      assert(got == Set((2L, -1L, -1.0), (3L, -1L, -1.0)), s"got $got")
    } finally query.stop()
  }

  test("streaming semantic dedup state runs on RocksDB: identical matches and eviction") {
    // Same conversion of the 100 TB state argument to a passing spec as
    // StreamingDedupSpec's RocksDB test, for the vector-state shape
    // (Seq[Double] payloads rather than Seq[Long] signatures).
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val v = (0 until 64).map(i => if (i % 3 == 0) 0.7f else -0.2f)
      val input = MemoryStream[(Long, Seq[Float], Timestamp)]
      val out = StreamingSemantic.semanticDedupStream(spark, streamOf(input),
        watermarkDelay = "1 minute", stateTtlMs = 60L * 1000)
      val query = out.writeStream.format("memory").queryName("sem_stream_rocks")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData((1L, v, t0))
        query.processAllAvailable()
        input.addData((2L, v, new Timestamp(t0.getTime + 1000)))
        query.processAllAvailable()
        val got = spark.table("sem_stream_rocks").distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == Set((2L, 1L)), s"got $got")
        assert(query.lastProgress.stateOperators.nonEmpty, "stateful operator expected")
        // eviction: watermark sweeps past TTL, a much-later copy no longer matches
        val w = (0 until 64).map(i => if (i % 5 == 0) -0.8f else 0.3f)
        input.addData((3L, w, new Timestamp(t0.getTime + 3600L * 1000)))
        query.processAllAvailable()
        input.addData((4L, w, new Timestamp(t0.getTime + 3610L * 1000)))
        query.processAllAvailable()
        input.addData((5L, v, new Timestamp(t0.getTime + 3620L * 1000)))
        query.processAllAvailable()
        val late = spark.table("sem_stream_rocks").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(!late.exists(_._1 == 5L), s"doc 1's bucket must be evicted, got $late")
      } finally query.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stateless streaming decontamination agrees with the batch LSH path and carries no state") {
    implicit val sq = spark.sqlContext
    val contaminated = SemanticOps.contaminatedEmbeddings(sfVecs)
    // batch reference on the SAME contaminated corpus
    val batchKept = SemanticOps.semanticDecontaminateLsh(contaminated)
      .as[Long].collect().toSet
    val eval = contaminated.filter(col("vec_id") % 50 === 0)
    val train = contaminated.filter(col("vec_id") % 50 =!= 0)
      .select("vec_id", "embedding")
    val rows = train.collect().map(r => (r.getLong(0), r.getSeq[Float](1), t0)).toSeq
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSemantic.decontaminateStream(spark, eval, streamOf(input))
    val query = out.writeStream.format("memory").queryName("sem_decon_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("sem_decon_stream").select("vec_id")
        .as[Long].collect().toSet
      assert(got == batchKept, s"stream-only: ${got -- batchKept}\nbatch-only: ${batchKept -- got}")
      val stateOps = query.lastProgress.stateOperators
      assert(stateOps.isEmpty,
        s"stream-static decontamination must carry no state, got ${stateOps.mkString(",")}")
    } finally {
      query.stop()
      spark.catalog.clearCache()
    }
  }
}
