package graft

import graft.streaming.{SessionEvent, StatefulSessionizer, StreamingOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark: per-window per-key aggregation") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.windowedCounts(
      input.toDF().toDF("ts", "kind"), "ts", "kind", "10 seconds", "5 seconds")
    val query = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        (new Timestamp(1000), "a"), (new Timestamp(3000), "a"),
        (new Timestamp(12000), "a"), (new Timestamp(13000), "b"))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT window.start, kind, cnt FROM win_counts ORDER BY 1, 2").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSeq
      assert(rows == Seq((0L, "a", 2L), (10000L, "a", 1L), (10000L, "b", 1L)))
    } finally query.stop()
  }

  test("session_window merges events within the gap, splits beyond it") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val sessions = StreamingOps.sessionWindowCounts(
      input.toDF().toDF("ts", "kind"), "ts", "kind", "5 seconds", "2 seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("sess_counts").outputMode(OutputMode.Complete()).start()
    try {
      // events at 1s, 4s (same session: gap 3s < 5s), 60s (new session)
      input.addData(
        (new Timestamp(1000), "u"), (new Timestamp(4000), "u"),
        (new Timestamp(60000), "u"))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT session_window.start, cnt FROM sess_counts ORDER BY 1").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq
      assert(rows == Seq((1000L, 2L), (60000L, 1L)))
    } finally query.stop()
  }

  test("stream-stream join matches rates within the join window only") {
    implicit val sq = spark.sqlContext
    val payments = MemoryStream[(String, Timestamp, Long)]
    val rates = MemoryStream[(String, Timestamp, Double)]
    val joined = StreamingOps.streamStreamJoin(
      payments.toDF().toDF("currency", "p_ts", "amount"),
      rates.toDF().toDF("r_currency", "r_ts", "rate")
        .withColumnRenamed("r_currency", "currency"),
      "currency", "p_ts", "r_ts", "10 seconds", "5 SECONDS")
    val query = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode(OutputMode.Append()).start()
    try {
      rates.addData(("GBP", new Timestamp(1000), 1.0))
      payments.addData(
        ("GBP", new Timestamp(3000), 100L),   // rate 2s earlier: in window
        ("GBP", new Timestamp(9000), 200L),   // rate 8s earlier: outside 5s window
        ("USD", new Timestamp(3000), 300L))   // no rate for key
      query.processAllAvailable()
      val out = spark.table("ss_join").select("amount").as[Long].collect().toSeq
      assert(out == Seq(100L))
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions across triggers") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val closed = StatefulSessionizer.sessionize(spark, input.toDS(), gapMs = 5000)
    val query = closed.writeStream.format("memory")
      .queryName("closed_sessions").outputMode(OutputMode.Append()).start()
    try {
      input.addData(SessionEvent(1, 1000), SessionEvent(1, 2000), SessionEvent(2, 1000))
      query.processAllAvailable()
      assert(spark.table("closed_sessions").count() == 0) // both still open

      // 20s later: closes user 1's first session (2 events), opens another
      input.addData(SessionEvent(1, 20000))
      query.processAllAvailable()
      val out = spark.table("closed_sessions").as[ClosedRow].collect().toSeq
      assert(out == Seq(ClosedRow(1, 1000, 2000, 2)))
    } finally query.stop()
  }
}

case class ClosedRow(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
