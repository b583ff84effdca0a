package graft

import graft.functions.{GraftFunctions, Winnow60}
import graft.ops.{SimilarityOps, TextOps}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class Round2AdditionsSpec extends SparkSpec {
  import spark.implicits._

  test("winnow60 rolling hash equals the naive per-window fold") {
    def naive(s: String, w: Int): Long = {
      val P = 2147483647L; val B = 257L
      def h(sub: String): Long = sub.foldLeft(0L)((acc, c) => (acc * B + c) % P)
      if (s.length <= w) h(s)
      else (0 to s.length - w).map(i => h(s.substring(i, i + w))).min
    }
    val texts = Seq("", "short", "a" * 32, "the quick brown fox jumps over the lazy dog repeatedly and then some")
    val got = texts.toDF("text").select(Winnow60.winnow60(col("text")))
      .as[Long].collect().toSeq
    assert(got == texts.map(naive(_, 32)))
  }

  test("winnow60 is shift-robust: near-identical suffix shares the fingerprint") {
    // Dropping a leading word leaves most 32-char windows intact, so the
    // min-window fingerprint usually survives — the dedup property.
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val df = Seq(t, t.substring(t.indexOf(' ') + 1)).toDF("text")
    val fps = df.select(Winnow60.winnow60(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("tf-idf: rare terms outrank common terms within a doc") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common other other"),
      (3L, "common unrelated words")
    ).toDF("doc_id", "text")
    val top = TextOps.tfIdfTop(docs, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("word")).toMap
    // doc 1: "rare" (df=1) beats "common" (tf=2 but df=3): 1*3/1=3 > 2*3/3=2
    assert(top(1L) == "rare")
  }

  test("LSH top-k only returns same-bucket candidates, ranked by cosine") {
    val emb = (0L to 20L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat), 1)
    }.toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.lshTopK(emb, nQueries = 2, k = 5)
    val rows = out.collect()
    // ranks are 1..k per query, scores non-increasing
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("multi-probe LSH recall >= probe-1 recall") {
    val emb = (0L to 40L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat), 1)
    }.toDF("vec_id", "embedding", "label")
    val p1 = SimilarityOps.lshTopK(emb, nQueries = 3, k = 10).count()
    val mp = SimilarityOps.lshTopKMultiProbe(emb, nQueries = 3, k = 10).count()
    assert(mp >= p1)
  }

  test("SQL registration: native functions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash60(array('a','b')) AS s,
        |       minhash_sig(array('x'), 4) AS m,
        |       dot_fold(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       sig_agree(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS g,
        |       winnow60('hello world') AS w""".stripMargin).collect().head
    assert(r.getAs[Long]("s") != 0L)
    assert(r.getAs[scala.collection.Seq[Long]]("m").size == 4)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("g") == 2)
    assert(r.getAs[Long]("w") > 0L)
  }

  test("streaming dedup within watermark drops duplicates, keeps state bounded") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = StreamingOps.dedupWithinWatermark(
      input.toDF().toDF("id", "kind", "ts"), Seq("id", "kind"), "ts", "10 seconds")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode(OutputMode.Append()).start()
    try {
      val t0 = new Timestamp(1000000L)
      input.addData((1L, "a", t0), (1L, "a", t0), (2L, "b", t0))
      query.processAllAvailable()
      input.addData((1L, "a", new Timestamp(1002000L)))  // dup within watermark
      query.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)   // (1,a), (2,b) once
    } finally query.stop()
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gap boundary, strict >") {
    val us = 1000L  // ns per us: input ts column is nanos
    val gapUs = 3600L * 1000 * 1000
    val events = Seq(
      // user 1: two events 1h apart EXACTLY -> same session (strict >)
      (1L, 1L, 0L), (2L, 1L, gapUs * 1000),
      // then 1h + 1us later -> new session
      (3L, 1L, (2 * gapUs + 1) * 1000),
      (4L, 2L, 0L)
    ).toDF("event_id", "user_id", "ts")
    val out = graft.ops.EventOps.sessionize(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events"))).sorted.toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
