package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions.col

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 1),
    (1L, Array(0.9f, 0.1f, 0.0f), 1),   // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal to 0
    (3L, Array(0.5f, 0.5f, 0.0f), 2),   // close to 0 but other label
    (4L, Array(-1.0f, 0.0f, 0.0f), 2)   // opposite of 0
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by cosine, excludes self") {
    val out = SimilarityOps.cosineTopK(emb, nQueries = 1, k = 4)
      .select("vec_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L, 4L))
    assert(!out.map(_._1).contains(0L))
  }

  test("scores are cosine values in [-1, 1] with exact extremes") {
    val scores = SimilarityOps.cosineTopK(emb, nQueries = 1, k = 4)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(scores(4L) + 1.0) < 1e-12)  // opposite vector
    assert(math.abs(scores(2L)) < 1e-12)         // orthogonal
  }

  test("IVF variant only searches the query's coarse cell (label)") {
    val out = SimilarityOps.ivfTopK(emb, nQueries = 1, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))  // label 1 only, self excluded
  }

  test("quantize/dequantize round-trip reconstructs within half a quantization step") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val orig = vecs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .as[(Long, Seq[Double])].collect().toMap
    val q = SimilarityOps.quantizeEmbeddings(vecs)
    val codes = q.select("vec_id", "vmin", "vmax", "q")
      .as[(Long, Double, Double, Seq[Long])].collect()
    assert(codes.length == orig.size)
    codes.foreach { case (id, vmin, vmax, cs) =>
      assert(cs.forall(c => c >= 0 && c <= 255), s"vec $id codes out of range")
      assert(vmin == orig(id).min && vmax == orig(id).max)
    }
    val recon = SimilarityOps.dequantizeEmbeddings(q)
      .as[(Long, Seq[Double])].collect().toMap
    orig.foreach { case (id, xs) =>
      val halfStep = (xs.max - xs.min) / 255.0 / 2.0
      val err = xs.zip(recon(id)).map { case (a, b) => math.abs(a - b) }.max
      assert(err <= halfStep * (1 + 1e-9), s"vec $id error $err > half step $halfStep")
    }
  }

  test("quantization codes a constant vector to all-zero without dividing by zero") {
    val flat = Seq((1L, Seq.fill(64)(0.25f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeEmbeddings(flat)
      .select("q").as[Seq[Long]].head()
    assert(got == Seq.fill(64)(0L))
  }

  test("cosine over dequantized vectors approximates exact cosine") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = SimilarityOps.cosineTopK(vecs, nQueries = 5, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recon = SimilarityOps.dequantizeEmbeddings(
        SimilarityOps.quantizeEmbeddings(vecs))
      .select(col("vec_id"), col("emb").cast("array<float>").as("embedding"))
    val approx = SimilarityOps.cosineTopK(recon, nQueries = 5, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // int8 scalar quantization preserves neighborhoods: ≥ 80% of the
    // exact top-5 lists survive (deterministic corpus → fixed number).
    val overlap = (exact intersect approx).size.toDouble / exact.size
    assert(overlap >= 0.8, s"top-k overlap after quantization only $overlap")
  }
}
