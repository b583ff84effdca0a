package graft

import graft.ops.TextOps
import graft.streaming.StreamingText
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming LM-filter twin: micro-batch scoring against a frozen bigram
  * LM must equal the batch scorer bitwise, carry zero streaming state,
  * and keep scoring later batches against the SAME frozen model.
  */
class StreamingTextSpec extends SparkSpec {
  import spark.implicits._

  test("pqEncodeWith on a stream: frozen codebook, Append mode, zero state, bitwise batch parity") {
    implicit val sq = spark.sqlContext
    val train = (0L until 20L).map { i =>
      (i, (0 until 64).map(d => math.sin(i * 64 + d + 1).toFloat))
    }
    val cb = graft.ops.PqOps.trainCodebook(train.toDF("vec_id", "embedding"))
    val arriving = (100L until 110L).map { i =>
      (i, (0 until 64).map(d => math.cos(i * 64 + d + 1).toFloat))
    }
    val input = MemoryStream[(Long, Seq[Float])]
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    // encode is a pure projection: Append mode, no aggregation, no state
    val query = graft.ops.PqOps
      .pqEncodeWith(input.toDF().toDF("vec_id", "embedding"), cb)
      .writeStream.outputMode("append").format("memory").queryName("pq_stream")
      .start()
    try {
      input.addData(arriving: _*)
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty)
      val streamed = spark.table("pq_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.ops.PqOps
        .pqEncodeWith(arriving.toDF("vec_id", "embedding"), cb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch && streamed.size == 10 * 4)
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS pq_stream")
    }
  }

  test("lmScoreStream: per-batch scores match the batch scorer bitwise; frozen LM spans batches") {
    implicit val sq = spark.sqlContext
    val train = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val lm = TextOps.bigramLm(train).select("w1", "w2", "p_cond").persist()

    val batch1 = Seq((10L, "a b c"), (11L, "a zz b"))
    val batch2 = Seq((20L, "c a b"))
    val scores = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double)]
    val input = MemoryStream[(Long, String)]
    val query = StreamingText.lmScoreStream(
      spark, lm, input.toDF().toDF("doc_id", "text")) { (batch, _) =>
      scores ++= batch.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    }.start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      val expected1 = TextOps.scoreAgainstLm(lm, batch1.toDF("doc_id", "text"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
      assert(scores.toSet == expected1, s"got $scores expected $expected1")
      // doc 11's (a,zz)/(zz,b) are OOV under the frozen model
      assert(scores.find(_._1 == 11L).get._3 == 2L)
      // zero streaming state: foreachBatch runs the batch scorer
      assert(query.lastProgress.stateOperators.isEmpty)

      input.addData(batch2: _*)
      query.processAllAvailable()
      val expected2 = TextOps.scoreAgainstLm(lm, batch2.toDF("doc_id", "text"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
      assert(scores.toSet == expected1 ++ expected2)
    } finally {
      query.stop()
      lm.unpersist()
    }
  }
}
