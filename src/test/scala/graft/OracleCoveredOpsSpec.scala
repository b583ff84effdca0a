package graft

import graft.ops.{DedupOps, EventOps, MultimodalOps, TextOps}
import org.apache.spark.sql.functions._

/** Unit coverage for operators whose primary gate is the DuckDB oracle —
  * these specs pin the SEMANTICS on tiny inputs so a refactor that
  * changes behavior fails fast, before the oracle round-trip.
  */
class OracleCoveredOpsSpec extends SparkSpec {
  import spark.implicits._

  test("castProject maps the event envelope to string key/value") {
    val e = Seq((7L, """{"k": 1}""")).toDF("event_id", "props")
    val r = EventOps.castProject(e).as[(String, String)].head()
    assert(r == ("7", """{"k": 1}"""))
  }

  test("tokenCounts: whitespace tokens + ceil(len/4) subword estimate") {
    val d = Seq((1L, "ab abcd abcdefgh x")).toDF("doc_id", "text")
    val row = TextOps.tokenCounts(d).head()
    assert(row.getAs[Long]("ws_tokens") == 4)
    // ceil(2/4)+ceil(4/4)+ceil(8/4)+ceil(1/4) = 1+1+2+1 = 5
    assert(row.getAs[Long]("subword_est") == 5)
  }

  test("fingerprints: 16 hex chars of md5 over case-folded text") {
    val d = Seq((1L, "HeLLo"), (2L, "hello")).toDF("doc_id", "text")
    val fps = TextOps.fingerprints(d).select("fp").as[String].collect()
    assert(fps(0) == fps(1) && fps(0).length == 16)
    assert(fps(0).matches("[0-9a-f]{16}"))
  }

  test("multimodal features: byte length, first byte, additive checksum") {
    val d = Seq((1L, "AB", "en", "s", 2L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = MultimodalOps.features(spark, d).head()
    assert(f.getAs[Long]("byte_len") == 2)
    assert(f.getAs[Long]("first_byte") == 'A'.toLong)
    assert(f.getAs[Long]("checksum") == 'A'.toLong + 'B'.toLong)
  }

  test("frame sampling: stride skips frames, tail frame is short, empty payload drops") {
    val packed = MultimodalOps.pack(
      Seq((1L, "a" * 40, "en", "s"), (2L, "", "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long")))
    val frames = MultimodalOps.sampleFrames(packed, frameSize = 16, stride = 2)
      .select("doc_id", "frame_idx", "frame").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // chunks at offsets 0,16,32 → stride 2 keeps 0 and 32; 32..40 is 8 bytes;
    // frame is hex so 2 chars per byte. Empty doc 2 emits nothing.
    assert(frames.keySet == Set((1L, 0L), (1L, 1L)))
    assert(frames((1L, 0L)) == "61" * 16 && frames((1L, 1L)) == "61" * 8)
  }

  test("near-dup clusters: transitive pairs collapse into one component") {
    val t = (0 until 20).map(i => s"tok$i")
    val corpus = Seq(
      (1L, t.mkString(" ")),                 // J(1,2)=17/18, J(2,3)=16/17,
      (2L, t.drop(1).mkString(" ")),         // J(1,3)=16/18 < 0.9 — the 1-3
      (3L, t.drop(2).mkString(" ")),         // edge exists only transitively
      (10L, "an entirely different corner of space"),
      (11L, "an entirely different corner of space"),
      (50L, "alone with no neighbors at all here")
    ).toDF("doc_id", "text")
    val clusters = DedupOps.nearDupClusters(corpus, minJaccard = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
    assert(!clusters.contains(50L))          // singletons have no edges
  }

  test("near-dup clusters: a pair-free corpus yields an empty cluster map") {
    val corpus = Seq(
      (1L, "utterly unique first document body"),
      (2L, "completely unrelated second text payload"))
      .toDF("doc_id", "text")
    assert(DedupOps.nearDupClusters(corpus, minJaccard = 0.9).count() == 0L)
  }

  test("qualityCalibrated: per-source percent-rank gate, singleton ranks at 0") {
    // source A: 3 docs with strictly increasing quality (more tokens,
    // no stopwords); source B: a singleton
    def doc(words: Int) = (1 to words).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, doc(10), "A"), (2L, doc(20), "B"), (3L, doc(30), "A"),
      (4L, doc(40), "A"))
      .toDF("doc_id", "text", "source")
    val kept = TextOps.qualityCalibrated(docs, p = 0.5)
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    // A ranks 1→pct 0, 3→0.5, 4→1.0: top half = {3, 4}
    assert(kept.keySet.intersect(Set(1L, 3L, 4L)) == Set(3L, 4L))
    assert(kept(3L) == 0.5 && kept(4L) == 1.0)
    // singleton B: percent 0 — below the cut by convention (no
    // distribution to calibrate against)
    assert(!kept.contains(2L))
  }

  test("kAnonymityGate: singleton quasi-groups suppressed, k-sized groups released") {
    // 10 docs share (en, web, band 0); 1 doc sits alone in (fr, web, band 1)
    val docs = ((1L to 10L).map(i => (i, "en", "web", 50L)) :+
      ((99L, "fr", "web", 250L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val verdicts = TextOps.kAnonymityGate(docs, k = 10, bandChars = 200)
      .select("lang", "len_band", "group_n", "released", "suppressed_docs")
      .as[(String, Long, Long, Boolean, Long)].collect().toSet
    assert(verdicts == Set(
      ("en", 0L, 10L, true, 0L),    // exactly k → released
      ("fr", 1L, 1L, false, 1L)))   // singleton → suppressed
  }

  test("dedup pipeline: exact keepers minus fuzzy drops") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup → dropped
      (3L, "the quick brown fox jumps over the lazy cat"),   // near dup → dropped (J≈0.78? verify ≥0.5)
      (4L, "entirely different content with other words here")
    ).toDF("doc_id", "text")
    val survivors = DedupOps.dedupPipeline(corpus, minJaccard = 0.5)
      .as[Long].collect().toSet
    assert(survivors.contains(1L) && survivors.contains(4L))
    assert(!survivors.contains(2L))
  }
}
