package graft

import graft.model.ExchangeRates
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics via MemoryStream (SURVEY.md §5.4): Update-mode
  * changelog word count mirroring spark/kafka/App.java:74-85, and the
  * foreachBatch payments fan-out mirroring PaymentsService.java:50-59.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("A3 Update-mode word count emits per-trigger changelog deltas") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[String]
    val counts = StreamingOps.wordCountSpace(input.toDF().toDF("value"))
    val query = counts.writeStream.format("memory")
      .queryName("wc_update").outputMode(OutputMode.Update()).start()
    try {
      input.addData("a b a")
      query.processAllAvailable()
      val batch1 = spark.table("wc_update").as[(String, Long)].collect().toMap
      assert(batch1 == Map("a" -> 2L, "b" -> 1L))

      input.addData("b c")
      query.processAllAvailable()
      // Update mode appends only changed keys to the memory sink:
      // b updated to 2, c new at 1; a NOT re-emitted.
      val all = spark.table("wc_update").as[(String, Long)].collect().toSeq
      val afterBatch2 = all.diff(batch1.toSeq)
      assert(afterBatch2.toSet == Set("b" -> 2L, "c" -> 1L))
    } finally query.stop()
  }

  test("A2/K4 changelog keeps state across triggers (KTable semantics)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[String]
    val counts = StreamingOps.wordCountRegex(input.toDF().toDF("value"))
    val query = counts.writeStream.format("memory")
      .queryName("wc_state").outputMode(OutputMode.Complete()).start()
    try {
      input.addData("To be, or NOT to be")
      query.processAllAvailable()
      input.addData("to be")
      query.processAllAvailable()
      val state = spark.table("wc_state").as[(String, Long)].collect().toMap
      assert(state == Map("to" -> 3L, "be" -> 3L, "or" -> 1L, "not" -> 1L))
    } finally query.stop()
  }

  test("F3 foreachBatch fan-out writes both sinks from one pass, strict threshold") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val main = collection.mutable.ArrayBuffer.empty[String]
    val susp = collection.mutable.ArrayBuffer.empty[String]
    val query = StreamingOps.paymentsFanout(
      input.toDF().toDF("k", "value"),
      ExchangeRates.ratesDF(spark),
      (df: DataFrame, _: Long) => main.synchronized { main ++= df.select("value").as[String].collect() },
      (df: DataFrame, _: Long) => susp.synchronized { susp ++= df.select("value").as[String].collect() }
    ).start()
    try {
      input.addData(
        (1L, """{"currency":"GBP","amount":999999,"ts":1}"""),   // suspicious
        (2L, """{"currency":"GBP","amount":1000000,"ts":2}"""),  // boundary: NOT
        (3L, "garbage"),                                          // dropped
        (4L, """{"currency":"USD","amount":2000000,"ts":3}""")   // not suspicious
      )
      query.processAllAvailable()
      assert(main.size == 3)      // both suspicious and non-suspicious land in main
      assert(susp.size == 1)
      assert(susp.head.contains("999999"))
    } finally query.stop()
  }

  test("S7/S8 generators produce the declared shapes") {
    val p = StreamingOps.syntheticPayments(spark)
    assert(p.isStreaming && p.columns.toSeq == Seq("currency", "amount", "ts"))
    val t = StreamingOps.textReplay(spark, Seq("line one", "line two"))
    assert(t.isStreaming && t.columns.toSeq == Seq("value"))
  }
}
