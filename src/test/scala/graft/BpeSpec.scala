package graft

import graft.ops.BpeOps
import org.apache.spark.sql.functions._

/** BPE training vs a plain-Scala reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-freq histogram, greedy (count DESC, pair ASC)
    * merge selection, left-to-right non-overlapping merging.
    */
  private def refBpe(words: Seq[String], nMerges: Int): (Seq[(String, String)], Map[String, Seq[String]]) = {
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var syms: Map[String, Seq[String]] = freq.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, ss) <- syms; Seq(a, b) <- ss.sliding(2) if ss.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + freq(w)
      if (counts.isEmpty) done = true
      else {
        val (pair, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        syms = syms.map { case (w, ss) =>
          val out = collection.mutable.ArrayBuffer.empty[String]
          for (s <- ss) {
            if (out.nonEmpty && out.last == pair._1 && s == pair._2) {
              out.remove(out.length - 1); out += (pair._1 + pair._2)
            } else out += s
          }
          w -> out.toSeq
        }
      }
    }
    (merges.toSeq, syms)
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest")

  private def docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("bpeTrain matches the reference implementation merge-for-merge") {
    val words = corpus.flatMap(_.split(" "))
    val (expMerges, expSyms) = refBpe(words, 8)
    val gotMerges = BpeOps.bpeTrain(docs, 8)
    assert(gotMerges == expMerges)
    val gotSyms = BpeOps.bpeSegment(docs, gotMerges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(gotSyms == expSyms)
  }

  test("first merges on the Sennrich-style corpus are the expected suffix pairs") {
    // 'es' occurs in newest(6) + widest(3) = 9 — the dominant pair; then
    // ('es','t') at the same 9 count.
    val merges = BpeOps.bpeTrain(docs, 2)
    assert(merges == Seq(("e", "s"), ("es", "t")))
  }

  test("mergePair folds greedily left-to-right without re-merging") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("a", "b", "a")).toDF("syms")
    val out = df.select(BpeOps.mergePair(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("a", "b", "a")))
  }

  test("bpePairCounts: hand-checked counts, deterministic tie order") {
    val d = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val got = BpeOps.bpePairCounts(d).as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 2L), ("ba", 1L)))
  }

  test("bpeTrain stops early when the vocabulary is fully merged") {
    val d = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeOps.bpeTrain(d, 10)
    assert(merges == Seq(("a", "b"))) // one merge exhausts all pairs
  }

  test("each merge reduces total weighted symbol count by the merged pair's count") {
    val words = corpus.flatMap(_.split(" "))
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val merges = BpeOps.bpeTrain(docs, 4)
    var prevTotal = -1L
    for (n <- 0 to 4) {
      val segmented = BpeOps.bpeSegment(docs, merges.take(n))
        .select("word", "syms").as[(String, Seq[String])].collect()
      val total = segmented.map { case (w, ss) => ss.length * freq(w) }.sum
      if (prevTotal >= 0) assert(total < prevTotal, s"merge $n did not shrink the corpus")
      prevTotal = total
    }
  }
}
