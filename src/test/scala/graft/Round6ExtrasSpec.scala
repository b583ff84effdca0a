package graft

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Late round-6 additions: DF-threshold boilerplate stripping, the
  * Gopher rule battery, and bloom-prefiltered decontamination.
  */
class Round6ExtrasSpec extends SparkSpec {
  import spark.implicits._

  // ---- boilerplateStrip ----

  test("boilerplateStrip drops ALL copies of a too-common segment, keeps rare ones in order") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"unique opening one. $boiler. unique closing one"),
      (2L, s"$boiler. a second document body"),
      (3L, s"third body text. $boiler"),
      (4L, "entirely original fourth document")
    ).toDF("doc_id", "text")
    val got = DedupOps.boilerplateStrip(docs, maxDf = 1L).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // the boilerplate segment (df=3) vanishes everywhere — including its
    // first occurrence (contrast paragraphDedup, which would keep doc 1's)
    assert(got(1L) == (("unique opening one. unique closing one", 2L, 3L)))
    assert(got(2L) == (("a second document body", 1L, 2L)))
    assert(got(3L) == (("third body text", 1L, 2L)))
    assert(got(4L) == (("entirely original fourth document", 1L, 1L)))
  }

  test("boilerplateStrip: a document that is pure boilerplate drops out; within-doc repeats count once toward df") {
    val docs = Seq(
      (1L, "common banner"),
      (2L, "common banner"),                       // df=2 -> stripped, doc gone
      (3L, "repeated phrase. repeated phrase. own content")
    ).toDF("doc_id", "text")
    val got = DedupOps.boilerplateStrip(docs, maxDf = 1L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!got.contains(1L) && !got.contains(2L),
      "pure-boilerplate docs must drop out entirely")
    // "repeated phrase" appears twice in doc 3 only: df=1 (distinct docs),
    // so BOTH copies survive — DF thresholding is cross-doc, not within-doc
    assert(got(3L) == "repeated phrase. repeated phrase. own content")
  }

  test("boilerplateStrip maxDf=2 keeps segments shared by up to two docs") {
    val docs = Seq(
      (1L, "shared by two. only in one"),
      (2L, "shared by two"),
      (3L, "shared by all"), (4L, "shared by all"), (5L, "shared by all")
    ).toDF("doc_id", "text")
    val got = DedupOps.boilerplateStrip(docs, maxDf = 2L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "shared by two. only in one")
    assert(got(2L) == "shared by two")
    assert(Seq(3L, 4L, 5L).forall(!got.contains(_)), "df=3 segment must strip")
  }

  // ---- gopherGate ----

  test("gopherGate flags each rule independently and keep is their conjunction") {
    val docs = Seq(
      // healthy: 24 tokens, avg len in band, has stopwords, no repetition
      (1L, ("the quick brown fox jumps over a lazy dog near the old barn " +
        "and then rests in soft grass under warm light")),
      // too short (8 tokens) but otherwise fine
      (2L, "the cat sat on a mat in peace"),
      // no stopwords at all -> f_stop = 0
      (3L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega")),
      // one bigram dominates -> f_top_bigram = 0 (and dup segments -> f_dup_seg = 0)
      (4L, ("spam ham. spam ham. spam ham. spam ham. spam ham. spam ham. " +
        "spam ham. spam ham. spam ham. spam ham. spam ham. spam ham"))
    ).toDF("doc_id", "text")
    val got = TextOps.gopherGate(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (f1, _, f1s, f1d, f1b, k1) = got(1L)
    assert(f1 == 1L && f1s == 1L && f1d == 1L && f1b == 1L && k1 == 1L,
      s"healthy doc must pass every rule, got ${got(1L)}")
    assert(got(2L)._1 == 0L && got(2L)._6 == 0L, "short doc fails f_len and keep")
    assert(got(3L)._3 == 0L && got(3L)._6 == 0L, "stopword-free doc fails f_stop")
    val (_, _, _, f4d, f4b, k4) = got(4L)
    assert(f4d == 0L && f4b == 0L && k4 == 0L,
      s"repetitive doc fails both repetition rules, got ${got(4L)}")
  }

  test("gopherGate keep equals the product of its flags on the real corpus, and discriminates") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextOps.gopherGate(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val prod = (1 to 5).map(r.getLong).product
      assert(r.getLong(6) == prod, s"keep != flag product for doc ${r.getLong(0)}")
    }
    val kept = rows.count(_.getLong(6) == 1L)
    assert(kept > 0 && kept < rows.length,
      s"gate must genuinely split the corpus, kept $kept/${rows.length}")
  }

  // ---- bloomDecontaminate ----

  test("bloomDecontaminate output is byte-identical to exact decontaminate (no false negatives)") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = DedupOps.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // a deliberately high fpp maximizes bloom false positives — the exact
    // confirm join must still remove every one of them
    val bloom = DedupOps.bloomDecontaminate(docs, fpp = 0.2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(exact.nonEmpty)
    assert(bloom == exact,
      s"bloom path diverged: only-exact=${(exact -- bloom).take(3)} only-bloom=${(bloom -- exact).take(3)}")
  }

  test("bloomDecontaminate drops a planted contaminated doc and keeps clean ones") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, benchText, "en", "bench"),            // doc_id % 50 == 0 -> benchmark slice
      (1L, s"leading words then $benchText trailing", "en", "web"), // shares an 8-gram
      (2L, "completely independent training text with enough tokens to form grams here", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val got = DedupOps.bloomDecontaminate(docs).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), s"expected only the clean doc to survive, got $got")
  }
}
