package graft

import graft.streaming.StreamingJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join: micro-batched execution must emit the
  * same pairs as the single-shot batch twin, including matches whose two
  * sides arrive in DIFFERENT micro-batches (the buffered-state case).
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val usPerMin = 60L * 1000 * 1000
  // (event_id, user_id, ts_ns): views v1,v2 for user 1; v3 for user 2
  private val views = Seq(
    (10L, 1L, 5L * usPerMin * 1000),   // 00:05
    (11L, 1L, 50L * usPerMin * 1000),  // 00:50
    (12L, 2L, 10L * usPerMin * 1000))  // 00:10
  // purchases: p1 at 00:55 (user 1: views at 00:05 and 00:50 both within 1h),
  // p2 at 02:00 (user 2: view at 00:10 is OUTSIDE the 1h window)
  private val purchases = Seq(
    (20L, 1L, 55L * usPerMin * 1000),
    (21L, 2L, 120L * usPerMin * 1000))

  private def toDF(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("event_id", "user_id", "ts")

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.select("p_id", "v_id").as[(Long, Long)].collect().toSet

  test("stream-stream attribution equals the batch twin across split micro-batches") {
    implicit val sq = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Long)]
    val vIn = MemoryStream[(Long, Long, Long)]
    val joined = StreamingJoins.purchaseAttribution(
      pIn.toDF().toDF("event_id", "user_id", "ts"),
      vIn.toDF().toDF("event_id", "user_id", "ts"))
    val query = joined.writeStream.format("memory")
      .queryName("attribution").outputMode("append").start()
    try {
      // batch 1: only the views — they must be BUFFERED in join state
      vIn.addData(views: _*)
      query.processAllAvailable()
      // batch 2: the purchases arrive later and still match batch-1 views
      pIn.addData(purchases: _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = collected(spark.table("attribution"))
    val batch = collected(StreamingJoins.purchaseAttribution(
      toDF(purchases), toDF(views)))
    assert(streamed === batch)
    assert(streamed === Set((20L, 10L), (20L, 11L)),
      "user 1 attributes both in-window views; user 2's view is outside the window")
  }

  test("left-outer emits unattributed purchases with NULLs once the watermark proves no match") {
    implicit val sq = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Long)]
    val vIn = MemoryStream[(Long, Long, Long)]
    val joined = StreamingJoins.purchaseAttribution(
      pIn.toDF().toDF("event_id", "user_id", "ts"),
      vIn.toDF().toDF("event_id", "user_id", "ts"),
      joinType = "left_outer")
    val query = joined.writeStream.format("memory")
      .queryName("attribution_outer").outputMode("append").start()
    try {
      // user 1 purchase has a matching view; user 9 purchase has NONE
      vIn.addData(views.head)
      pIn.addData(purchases.head, (30L, 9L, 60L * usPerMin * 1000))
      query.processAllAvailable()
      // before the watermark passes, the no-match purchase is withheld
      val early = spark.table("attribution_outer")
        .filter(col("p_id") === 30L).count()
      assert(early === 0L, "outer result must wait for the watermark")
      // advance event time on BOTH streams well past purchase+delay,
      // then run the extra batches watermark propagation needs
      val far = 300L * usPerMin * 1000
      vIn.addData((98L, 8L, far)); pIn.addData((99L, 8L, far))
      query.processAllAvailable()
      vIn.addData((96L, 8L, far + 1000)); pIn.addData((97L, 8L, far + 1000))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("attribution_outer")
    val noMatch = out.filter(col("p_id") === 30L).collect()
    assert(noMatch.length === 1 && noMatch.head.isNullAt(3),
      s"unattributed purchase must emit exactly once with NULL view: ${out.collect().toSeq}")
    assert(out.filter(col("p_id") === purchases.head._1 && col("v_id").isNotNull)
      .count() >= 1, "matched purchases still emit their pairs")
  }

  test("the join keys state by user and time-bounds BOTH sides (plan sanity)") {
    implicit val sq = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Long)]
    val vIn = MemoryStream[(Long, Long, Long)]
    val joined = StreamingJoins.purchaseAttribution(
      pIn.toDF().toDF("event_id", "user_id", "ts"),
      vIn.toDF().toDF("event_id", "user_id", "ts"))
    val query = joined.writeStream.format("memory")
      .queryName("attribution_plan").outputMode("append").start()
    try {
      pIn.addData(purchases: _*); vIn.addData(views: _*)
      query.processAllAvailable()
      val plan = query.lastProgress.sources.length
      assert(plan === 2, "two streaming sources feed one join")
      assert(query.lastProgress.stateOperators.nonEmpty,
        "the join must run as a stateful operator")
    } finally query.stop()
  }
}
