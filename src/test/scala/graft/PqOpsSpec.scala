package graft

import graft.ops.{PqOps, TextOps}
import org.apache.spark.sql.functions._

/** Product quantization + LM-likelihood scoring — semantics pinned on
  * tiny inputs ahead of the oracle round-trip (same convention as
  * OracleCoveredOpsSpec), plus the ADC-vs-exact recall property that the
  * oracle cannot express.
  */
class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int): org.apache.spark.sql.DataFrame =
    (0L until n.toLong).map { i =>
      // deterministic, well-spread unit-ish vectors
      (i, (0 until 64).map(d => math.sin(i * 64 + d + 1).toFloat))
    }.toDF("vec_id", "embedding")

  test("pqEncode: codes bounded, codebook vectors quantize to themselves with ~0 error") {
    val enc = PqOps.pqEncode(vecs(40)).collect()
    assert(enc.length == 40 * 4)
    assert(enc.forall { r =>
      val code = r.getLong(2); code >= 0 && code < 16
    })
    // the k codebook source vectors reconstruct exactly (distance to
    // their own codeword is (x·x − 2x·x) + x·x = 0.0 bitwise)
    val own = enc.filter(_.getLong(0) < 16)
    assert(own.forall(r => math.abs(r.getDouble(3)) < 1e-12))
    assert(own.forall(r => r.getLong(2) == r.getLong(0)))
    // non-codebook vectors carry positive quantization error
    val rest = enc.filter(_.getLong(0) >= 16)
    assert(rest.forall(_.getDouble(3) > 0.0))
  }

  test("annPqAdc: self excluded, ranks dense from 1, ADC recalls exact inner-product neighbors") {
    val df = vecs(60).cache()
    val adc = PqOps.annPqAdc(df, nQueries = 5, topK = 10)
    val rows = adc.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(byQ.values.forall(_.map(_.getLong(3)).sorted.sameElements(1L to 10L)))
    // exact inner-product top-10 per query, computed locally
    val all = df.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val recalls = (0L until 5L).map { q =>
      val exact = all.filter(_._1 != q)
        .map { case (id, v) => id -> v.zip(all(q)).map(p => p._1 * p._2).sum }
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val got = byQ(q).map(_.getLong(1)).toSet
      exact.intersect(got).size / 10.0
    }
    // seed codebooks (no Lloyd refinement) on synthetic data: demand a
    // sane floor, not perfection — ADC must beat random (10/59 ≈ 0.17)
    assert(recalls.sum / recalls.size > 0.4, s"mean recall ${recalls.sum / 5}")
    df.unpersist()
  }

  test("pq plan shape: encode is map-side (no shuffle); ADC broadcasts the LUTs") {
    val enc = PqOps.pqEncode(vecs(40))
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange hashpartitioning"),
      s"PQ encode must not shuffle:\n$encPlan")
    val adcPlan = PqOps.annPqAdc(vecs(40), nQueries = 3, topK = 5)
      .queryExecution.executedPlan.toString
    assert(adcPlan.contains("BroadcastNestedLoopJoin") || adcPlan.contains("BroadcastExchange"),
      s"ADC must broadcast the query LUTs:\n$adcPlan")
  }

  test("pq on an empty corpus returns empty, never throws") {
    val empty = vecs(0)
    assert(PqOps.pqEncode(empty).isEmpty)
    assert(PqOps.annPqAdc(empty).isEmpty)
    assert(PqOps.annIvfPq(empty.withColumn("label", lit(0))).isEmpty)
  }

  test("pqRefine: Lloyd iterations strictly improve the seed codebook's objective") {
    val df = vecs(80).cache()
    val subDim = 16
    val seedCb = {
      // rebuild the seed codebook via one refine call with 0 iters
      PqOps.pqRefine(df, iters = 0)
    }
    val refined = PqOps.pqRefine(df, iters = 2)
    val before = PqOps.pqObjective(df, seedCb)
    val after = PqOps.pqObjective(df, refined)
    // sin-grid vectors are near-uniform, so gains are modest (~8% at 2
    // iters); demand a real cut, not Lloyd's asymptotic best
    assert(after < before * 0.97,
      s"Lloyd refinement should cut MSE: before=$before after=$after")
    assert(refined.length == 4 && refined.forall(_.length == 16))
    assert(refined.forall(_.forall(_.length == subDim)))
    df.unpersist()
  }

  test("annIvfPq: scores only same-cell candidates, ranks dense, agrees with unpruned ADC on in-cell pairs") {
    val df = vecs(60).withColumn("label", (col("vec_id") % 3).cast("int")).cache()
    val rows = PqOps.annIvfPq(df, nQueries = 4, topK = 5).collect()
    val labels = df.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(rows.nonEmpty)
    assert(rows.forall(r => labels(r.getLong(0)) == labels(r.getLong(1))))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // the cell-pruned scores must be the SAME ADC scores the unpruned
    // scan assigns those pairs (pruning changes candidates, not scores)
    val full = PqOps.annPqAdc(df, nQueries = 4, topK = 60).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.forall(r => full((r.getLong(0), r.getLong(1))) == r.getDouble(2)))
    df.unpersist()
  }

  test("annIvfPqResidual: residual coding beats raw-vector coding on clustered data") {
    // clustered corpus: per-cell offset dwarfs within-cell variation —
    // exactly the geometry residual coding exists for
    val df = (0L until 60L).map { i =>
      val cell = (i % 3).toInt
      (i, (0 until 64).map(d => (cell * 10.0 + math.sin(i * 64 + d + 1)).toFloat), cell)
    }.toDF("vec_id", "embedding", "label").cache()
    val rows = PqOps.annIvfPqResidual(df, nQueries = 4, topK = 5).collect()
    val labels = df.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(rows.nonEmpty)
    assert(rows.forall(r => labels(r.getLong(0)) == labels(r.getLong(1))))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // residual recall vs exact residual inner product within the cell
    val all = df.select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
    val anchor = all.groupBy(_._2).map { case (l, vs) => l -> vs.minBy(_._1)._3 }
    def res(v: Seq[Double], l: Int): Seq[Double] = v.zip(anchor(l)).map(p => p._1 - p._2)
    val recalls = (0L until 4L).map { q =>
      val (_, ql, qv) = all.find(_._1 == q).get
      val qr = res(qv, ql)
      val exact = all.filter(v => v._2 == ql && v._1 != q)
        .map { case (id, l, v) => id -> res(v, l).zip(qr).map(p => p._1 * p._2).sum }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val got = rows.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      exact.intersect(got).size / 5.0
    }
    assert(recalls.sum / recalls.size > 0.4, s"residual recall ${recalls.sum / 4}")
    // raw-vector IVF-PQ on the same clustered data wastes its range on
    // the cell offset; residual coding must not do worse
    val raw = PqOps.annIvfPq(df, nQueries = 4, topK = 5).collect()
    val rawRecalls = (0L until 4L).map { q =>
      val (_, ql, qv) = all.find(_._1 == q).get
      val exact = all.filter(v => v._2 == ql && v._1 != q)
        .map { case (id, _, v) => id -> v.zip(qv).map(p => p._1 * p._2).sum }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val got = raw.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      exact.intersect(got).size / 5.0
    }
    assert(recalls.sum >= rawRecalls.sum,
      s"residual ${recalls.sum / 4} vs raw ${rawRecalls.sum / 4}")
    df.unpersist()
  }

  test("lmLikelihood: hand-checked bigram means and minima") {
    // corpus: "a b a b" -> bigrams (a,b),(b,a),(a,b); "a b" -> (a,b)
    // counts: (a,b)=3 of a-total 3 -> p=1.0; (b,a)=1 of b-total 1 -> p=1.0
    // all probs 1.0 -> avg=min=1.0 for both docs
    val d1 = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val r1 = TextOps.lmLikelihood(d1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(r1(1L) == ((3L, 1.0, 1.0)) && r1(2L) == ((1L, 1.0, 1.0)))
    // corpus with a split: "x y" and "x z" -> p(y|x)=p(z|x)=0.5
    val d2 = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val r2 = TextOps.lmLikelihood(d2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(r2(1L) == ((1L, 0.5, 0.5)) && r2(2L) == ((1L, 0.5, 0.5)))
    // mixed doc: "x y x z" bigrams (x,y),(y,x),(x,z): p(y|x)=p(z|x)=0.5,
    // p(x|y)=1.0 -> min 0.5, avg 2/3; single-token doc contributes no row
    val d3 = Seq((1L, "x y x z"), (2L, "solo")).toDF("doc_id", "text")
    val r3 = TextOps.lmLikelihood(d3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(r3.keySet == Set(1L))
    assert(r3(1L)._1 == 3L && r3(1L)._2 == 0.5)
    assert(math.abs(r3(1L)._3 - 2.0 / 3.0) < 1e-15)
  }

  test("lmLikelihood on an empty corpus returns empty") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.lmLikelihood(empty).isEmpty)
  }

  test("partitioning invariance: ordered folds make LM scores and ADC scores bitwise-stable") {
    // the PLANS.md claim under test: an unordered SUM() would be
    // partitioning-dependent; the sort-by-pos ordered fold is not
    val docs = (1L to 40L).map { i =>
      (i, (0 until 30).map(j => s"w${(i * 7 + j * 3) % 11}").mkString(" "))
    }.toDF("doc_id", "text")
    def lmScores(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
      TextOps.lmLikelihood(df).collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val a = lmScores(docs.repartition(7))
    val b = lmScores(docs.repartition(2))
    assert(a == b, "lmLikelihood must be partitioning-invariant bitwise")

    val emb = vecs(50)
    def adc(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      PqOps.annPqAdc(df, nQueries = 5, topK = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(adc(emb.repartition(9)) == adc(emb.repartition(3)),
      "ADC scores must be partitioning-invariant bitwise")
  }

  test("lmLikelihoodAgainst: OOV bigrams floor to 0.0 and are counted; in-vocab matches self-scoring") {
    val train = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    // eval doc: (a,b) in-vocab p=1.0; (b,zz) and (zz,a) OOV
    val eval = Seq((10L, "a b zz a b")).toDF("doc_id", "text")
    val r = TextOps.lmLikelihoodAgainst(train, eval).head()
    assert(r.getAs[Long]("n_bigrams") == 4)
    assert(r.getAs[Long]("oov") == 2)
    assert(r.getAs[Double]("min_p") == 0.0)
    // probs in pos order: 1.0, 0.0, 0.0, 1.0 -> avg 0.5
    assert(r.getAs[Double]("avg_p") == 0.5)
    // a fully in-vocab eval doc scores identically to self-scoring
    val eval2 = Seq((11L, "a b")).toDF("doc_id", "text")
    val r2 = TextOps.lmLikelihoodAgainst(train, eval2).head()
    assert(r2.getAs[Long]("oov") == 0 && r2.getAs[Double]("avg_p") == 1.0)
    // empty train: every bigram OOV, all scores 0
    val r3 = TextOps.lmLikelihoodAgainst(train.limit(0), eval2).head()
    assert(r3.getAs[Long]("oov") == 1 && r3.getAs[Double]("avg_p") == 0.0)
  }
}
