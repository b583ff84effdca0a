package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** BM25 top-k retrieval semantics pinned on a hand-computable fixture
  * (same convention as OracleCoveredOpsSpec: exact doubles, not
  * tolerances — the implementation's arithmetic is single IEEE ops, so
  * a Scala reference computation in the same order must match bitwise).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // doc 0 is the query ("apple banana"); 1 matches both terms (long),
  // 2 matches one term (short), 3 matches nothing
  private val docs = Seq(
    (0L, "apple banana"),
    (1L, "apple apple banana extra words here pad pad"),
    (2L, "apple"),
    (3L, "cherry date")
  ).toDF("doc_id", "text")

  /** Reference BM25 with the implementation's exact composition. */
  private def contrib(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double): Double = {
    val idf = ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)
    val norm = 0.25 + (0.75 * (dl.toDouble / avgdl))
    idf * ((tf.toDouble * 2.2) / (tf.toDouble + (1.2 * norm)))
  }

  test("bm25TopK: self excluded, non-matching absent, hand-computed scores bitwise") {
    val out = TextOps.bm25TopK(docs, nQueries = 1, k = 5)
      .orderBy("q_id", "rank").collect()
    // only q_id 0 exists; docs 1 and 2 match, 0 (self) and 3 do not
    assert(out.map(_.getLong(0)).toSet == Set(0L))
    assert(out.map(_.getLong(1)).toSeq.toSet == Set(1L, 2L))
    val n = 4L
    val avgdl = 13.0 / 4 // dl: 2 + 8 + 1 + 2
    // doc 1: apple tf=2 df=3 dl=8; banana tf=1 df=2 dl=8 — fold in word order
    val s1 = (0.0 + contrib(2, 3, 8, n, avgdl)) + contrib(1, 2, 8, n, avgdl)
    // doc 2: apple tf=1 df=3 dl=1
    val s2 = 0.0 + contrib(1, 3, 1, n, avgdl)
    val byDoc = out.map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(byDoc(1L)._1 == 2L && byDoc(2L)._1 == 1L) // n_terms
    assert(java.lang.Double.doubleToRawLongBits(byDoc(1L)._2) ==
           java.lang.Double.doubleToRawLongBits(s1))
    assert(java.lang.Double.doubleToRawLongBits(byDoc(2L)._2) ==
           java.lang.Double.doubleToRawLongBits(s2))
    // ranks dense from 1 in (score DESC, doc_id ASC) order
    val ranked = out.sortBy(_.getLong(4)).map(r => (r.getLong(4), r.getDouble(3)))
    assert(ranked.map(_._1).toSeq == Seq(1L, 2L))
    assert(ranked(0)._2 >= ranked(1)._2)
  }

  test("bm25TopK: k truncates per query, every query doc gets its own ranking") {
    val many = (0L until 12L).map(i => (i, s"term$i shared common")).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(many, nQueries = 3, k = 4).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.length == 4) // 11 candidates share 'shared common', capped at k
      assert(rows.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0))) // self excluded
    }
  }

  test("bm25TopK: shorter document outranks longer at equal tf/df (length norm)") {
    val d = Seq(
      (0L, "target"),
      (1L, "target filler filler filler filler filler filler filler"),
      (2L, "target filler")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(d, nQueries = 1, k = 5).collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out(2L) < out(1L)) // doc 2 (short) ranks ahead of doc 1 (long)
  }
}
