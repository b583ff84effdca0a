package graft

import graft.ops.{LayoutOps, SemanticOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-7 hardening: the four ADVICE r6 fixes, each with the failure
  * mode it closes exercised directly.
  */
class Round7AdditionsSpec extends SparkSpec {
  import spark.implicits._

  test("sourceTemperatureMix: all-null-source corpus returns empty, matching the oracle's inner join") {
    val docs = Seq(
      (1L, "alpha beta", null.asInstanceOf[String], 10L),
      (2L, "gamma delta", null.asInstanceOf[String], 11L)
    ).toDF("doc_id", "text", "source", "n_chars")
    // before the fix: counts was empty and the fallback kept every
    // null-source doc at defaultRate=1.0 while the oracle's rates join
    // returned zero rows
    assert(TextOps.sourceTemperatureMix(docs).isEmpty,
      "null-source docs must not survive the degenerate fallback path")
    // truly-empty corpus still returns empty with the output schema
    assert(TextOps.sourceTemperatureMix(docs.filter(lit(false))).isEmpty)
  }

  test("dsirScoresWithHandle: caller-managed unpersist releases the cached tokenize stage") {
    val raw = Seq((1L, "aa bb cc"), (2L, "bb cc dd"), (3L, "zz yy")).toDF("doc_id", "text")
    val target = Seq((10L, "aa bb"), (11L, "bb cc")).toDF("doc_id", "text")
    val (scores, feats) = SemanticOps.dsirScoresWithHandle(raw, target, dims = 64)
    val viaHandle = scores.collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(feats.storageLevel.useMemory, "feats handle must be persisted")
    feats.unpersist(blocking = true)
    assert(!feats.storageLevel.useMemory, "unpersist must release the handle")
    // parity with the managed-lifetime entry point
    val viaPlain = SemanticOps.dsirScores(raw, target, dims = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    spark.catalog.clearCache() // dsirScores' documented caller contract
    assert(viaHandle == viaPlain)
  }

  test("withHilbert fails loudly when a coordinate exceeds the 2^bits grid") {
    val ok = Seq((0L, 0L), (255L, 255L)).toDF("x", "y")
    assert(LayoutOps.withHilbert(ok, col("x"), col("y"), bits = 8, "d")
      .count() == 2, "in-range coordinates must pass")
    val bad = Seq((0L, 0L), (256L, 3L)).toDF("x", "y") // 256 = 2^8: out of grid
    val e = intercept[Exception] {
      LayoutOps.withHilbert(bad, col("x"), col("y"), bits = 8, "d").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("coordinate out of")),
      s"expected the loud range failure, got: $e")
    val neg = Seq((-1L, 0L)).toDF("x", "y")
    val e2 = intercept[Exception] {
      LayoutOps.withHilbert(neg, col("x"), col("y"), bits = 8, "d").collect()
    }
    assert(messages(e2).exists(_.contains("coordinate out of")))
  }

  test("bpe_segment: character conservation, real merging, and frozen-merge determinism") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val seg = graft.ops.BpeOps.bpeSegmentFrozen(docs).cache()
    try {
      // conservation: stripping the separators reconstructs every word
      // exactly — segmentation reorders nothing and loses nothing
      val broken = seg.filter(
        regexp_replace(col("segmented"), "\u001f", "") =!= col("word"))
      assert(broken.isEmpty, s"non-conserving rows: ${broken.collect().toSeq}")
      // the frozen merges actually merge: some word has fewer symbols
      // than characters, and no word has more
      assert(seg.filter(col("n_syms") < length(col("word"))).count() > 0)
      assert(seg.filter(col("n_syms") > length(col("word"))).isEmpty)
      // 'column' is fully covered by the frozen merge chain (co+lu+m)
      val colRow = seg.filter(col("word") === "column").collect()
      assert(colRow.nonEmpty && colRow.head.getAs[Long]("n_syms") == 2L,
        s"'column' must segment as [colum, n]: ${colRow.toSeq}")
      // determinism across partitionings (the fold is per-row map-side)
      val a = seg.collect().map(r => r.getString(0) -> r.getString(3)).toMap
      val b = graft.ops.BpeOps.bpeSegmentFrozen(docs.repartition(7))
        .collect().map(r => r.getString(0) -> r.getString(3)).toMap
      assert(a == b)
    } finally seg.unpersist()
  }

  test("classifyStream emits pred=NULL/score=0 for docs sharing no dim with any centroid") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val labeled = Seq(
      (1L, "quick brown fox", "en"),
      (2L, "schnelle braune fuchs", "de")
    ).toDF("doc_id", "text", "lang")
    val model = SemanticOps.centroidTrain(labeled).persist()
    val got = collection.mutable.ArrayBuffer.empty[(Long, Option[String], Double)]
    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingText.classifyStream(
      spark, model, input.toDF().toDF("doc_id", "text")) { (preds, _) =>
      got ++= preds.collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
    }.start()
    try {
      // 800 classifies; 801 shares no hashed dim with either centroid and
      // previously vanished from the sink entirely
      input.addData((800L, "quick brown fox"), (801L, ""))
      query.processAllAvailable()
      assert(got.size == 2, s"every ingested doc_id must reach the sink: $got")
      val rejected = got.find(_._1 == 801L).get
      assert(rejected._2.isEmpty && rejected._3 == 0.0,
        s"unclassifiable docs must surface as (NULL, 0.0): $rejected")
      assert(got.find(_._1 == 800L).get._2.contains("en"))
    } finally {
      query.stop(); model.unpersist()
    }
  }
}
