package graft

import graft.ops.{DedupOps, TextOps}
import graft.streaming.StreamingClean
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming corpus-cleaning twins: micro-batch boilerplate stripping
  * against a frozen index and the Gopher gate must match their batch
  * operators exactly and carry zero streaming state.
  */
class StreamingCleanSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplateStripStream strips against the frozen index, matches batch, zero state, index frozen across batches") {
    implicit val sq = spark.sqlContext
    val banner = "subscribe to our newsletter"
    val reference = Seq(
      (1L, s"$banner. ref one body"), (2L, s"$banner. ref two body"),
      (3L, "ref three is clean")
    ).toDF("doc_id", "text")
    val index = DedupOps.boilerplateIndex(reference).persist()

    val batch1 = Seq((10L, s"arriving doc. $banner"), (11L, banner))
    val batch2 = Seq((20L, s"$banner. late text"), (21L, "never boilerplate"))
    val got = collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val query = StreamingClean.boilerplateStripStream(
      spark, index, input.toDF().toDF("doc_id", "text")) { (cleaned, _) =>
      got ++= cleaned.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    }.start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      // the banner (df=2 in the reference corpus) is stripped; doc 11,
      // pure boilerplate, vanishes — exactly the batch semantics
      val expected1 = DedupOps
        .boilerplateStripAgainst(index, batch1.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got.toSet == expected1, s"got ${got.toSet} expected $expected1")
      assert(got.toSet == Set((10L, "arriving doc", 1L, 2L)))
      assert(query.lastProgress.stateOperators.isEmpty, "must be state-free")

      input.addData(batch2: _*)
      query.processAllAvailable()
      // same frozen index in batch 2: banner still stripped, clean doc intact
      assert(got.toSet == expected1 ++ Set(
        (20L, "late text", 1L, 2L), (21L, "never boilerplate", 1L, 1L)))
    } finally {
      query.stop()
      index.unpersist()
    }
  }

  test("gopherGateStream per-batch flags match the batch gate, zero state") {
    implicit val sq = spark.sqlContext
    val docs = Seq(
      (1L, ("the quick brown fox jumps over a lazy dog near the old barn " +
        "and then rests in soft grass under warm light")),
      (2L, "the cat sat on a mat in peace"))
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val query = StreamingClean.gopherGateStream(
      spark, input.toDF().toDF("doc_id", "text")) { (flags, _) =>
      got ++= flags.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    }.start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val expected = TextOps.gopherGate(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      assert(got.toSet == expected)
      // doc 1 passes every rule; doc 2 is too short
      assert(got.find(_._1 == 1L).get._7 == 1L)
      assert(got.find(_._1 == 2L).get._7 == 0L)
      assert(query.lastProgress.stateOperators.isEmpty, "must be state-free")
    } finally {
      query.stop()
    }
  }

  test("constraintGateStream: per-batch verdicts match the batch gate, zero state") {
    implicit val sq = spark.sqlContext
    val cs = Seq(
      "value_in_range" -> "value >= 0 AND value <= 100",
      "kind_domain" -> "kind IN ('a', 'b')")
    val got = collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, String)]
    val input = MemoryStream[(Double, String)]
    val query = StreamingClean.constraintGateStream(
      spark, input.toDF().toDF("value", "kind"), cs) { (verdicts, id) =>
      got ++= verdicts.collect().map(r =>
        (id, r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }.start()
    try {
      input.addData((10.0, "a"), (50.0, "b")) // clean batch
      query.processAllAvailable()
      input.addData((200.0, "a"), (30.0, "zzz")) // one violation per rule
      query.processAllAvailable()
      val byBatch = got.groupBy(_._1)
      assert(byBatch.size == 2)
      // batch 0: both constraints pass on 2 rows
      assert(byBatch(0L).forall(v => v._3 == 2 && v._4 == 0 && v._5 == "pass"))
      // batch 1: each constraint fails exactly once — the admit/reject
      // signal flips at the batch boundary, scoped to THAT batch only
      val b1 = byBatch(1L).map(v => v._2 -> ((v._4, v._5))).toMap
      assert(b1("value_in_range") == ((1L, "fail")))
      assert(b1("kind_domain") == ((1L, "fail")))
      assert(query.lastProgress.stateOperators.isEmpty, "must be state-free")
    } finally {
      query.stop()
    }
  }

  test("driftGateStream: zero drift on matching batch, maximal on disjoint buckets") {
    implicit val sq = spark.sqlContext
    val ref = Seq(10.0, 10.0, 60.0, 60.0).toDF("value")
    val refHist = StreamingClean.referenceHistogram(ref).persist()
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input = MemoryStream[Double]
    val query = StreamingClean.driftGateStream(
      spark, input.toDF().toDF("value"), refHist) { (drift, id) =>
      got ++= drift.collect().map(r =>
        (id, r.getLong(0), r.getAs[Double]("contrib")))
    }.start()
    try {
      input.addData(10.0, 60.0) // same distribution as the reference
      query.processAllAvailable()
      assert(got.filter(_._1 == 0L).forall(_._3 == 0.0))
      input.addData(110.0, 110.0, 10.0, 10.0) // half the mass moved to bucket 2
      query.processAllAvailable()
      val b1 = got.filter(_._1 == 1L).map(v => v._2 -> v._3).toMap
      assert(b1(0L) == 0.0)       // matching mass
      assert(b1(1L) == 1.0)       // reference-only bucket: (0-.5)^2/.25
      assert(b1(2L) == 1.0)       // batch-only bucket: (.5-0)^2/.25
      assert(query.lastProgress.stateOperators.isEmpty, "must be state-free")
    } finally {
      query.stop()
      refHist.unpersist()
    }
  }

  test("driftGateQuantileStream: frozen quantile grid, batch parity with the fixed-width gate's shape") {
    implicit val sq = spark.sqlContext
    // reference cents [100,300,500,700] → type-7 quartile boundaries
    // 250 / 400 / 550 → one reference value per bucket, p_ref = .25 each
    val ref = Seq(1.0, 3.0, 5.0, 7.0).toDF("value")
    val refHist = StreamingClean.referenceHistogramQuantile(ref, nBins = 4).persist()
    assert(refHist.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == Map(0L -> 0.25, 1L -> 0.25, 2L -> 0.25, 3L -> 0.25))
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input = MemoryStream[Double]
    val query = StreamingClean.driftGateQuantileStream(
      spark, input.toDF().toDF("value"), refHist) { (drift, id) =>
      got ++= drift.collect().map(r =>
        (id, r.getLong(0), r.getAs[Double]("contrib")))
    }.start()
    try {
      input.addData(1.0, 3.0, 5.0, 7.0) // the reference distribution
      query.processAllAvailable()
      assert(got.filter(_._1 == 0L).forall(_._3 == 0.0))
      input.addData(8.0, 8.0) // all mass lands in the top quartile
      query.processAllAvailable()
      val b1 = got.filter(_._1 == 1L).map(v => v._2 -> v._3).toMap
      Seq(0L, 1L, 2L).foreach(b => assert(b1(b) == 0.5)) // (0−.25)²/.125
      assert(b1(3L) == 0.9)                              // (1−.25)²/.625
      assert(query.lastProgress.stateOperators.isEmpty, "must be state-free")
    } finally {
      query.stop()
      refHist.unpersist()
    }
    // empty reference fails fast with a descriptive error, not NoSuchElement
    val err = intercept[IllegalArgumentException] {
      StreamingClean.driftGateQuantileStream(spark,
        spark.readStream.format("rate").load().selectExpr("CAST(value AS DOUBLE) AS value"),
        StreamingClean.referenceHistogramQuantile(
          Seq.empty[Double].toDF("value"), nBins = 4)) { (_, _) => () }
    }
    assert(err.getMessage.contains("reference histogram is empty"))
  }

  test("driftGateStream: empty reference histogram fails fast (ADVICE r7)") {
    implicit val sq = spark.sqlContext
    val err = intercept[IllegalArgumentException] {
      StreamingClean.driftGateStream(spark,
        spark.readStream.format("rate").load().selectExpr("CAST(value AS DOUBLE) AS value"),
        StreamingClean.referenceHistogram(Seq.empty[Double].toDF("value"))) { (_, _) => () }
    }
    assert(err.getMessage.contains("reference histogram is empty"))
  }

  test("profileStream: per-batch profile rows, batch-scoped counts, zero state") {
    implicit val sq = spark.sqlContext
    val got = collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val query = StreamingClean.profileStream(
      spark, input.toDF().toDF("doc_id", "text"),
      numCols = Seq("doc_id"), strCols = Seq("text")) { (profile, id) =>
      got ++= profile.collect().map(r =>
        (id, r.getString(0), r.getLong(1), r.getLong(2)))
    }.start()
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, null))
      query.processAllAvailable()
      input.addData((4L, "d"))
      query.processAllAvailable()
      val b0 = got.filter(_._1 == 0L).map(v => v._2 -> ((v._3, v._4))).toMap
      assert(b0 == Map("doc_id" -> ((3L, 3L)), "text" -> ((3L, 2L))))
      val b1 = got.filter(_._1 == 1L).map(v => v._2 -> ((v._3, v._4))).toMap
      assert(b1 == Map("doc_id" -> ((1L, 1L)), "text" -> ((1L, 1L))))
      assert(query.lastProgress.stateOperators.isEmpty, "must be state-free")
    } finally {
      query.stop()
    }
  }
}
