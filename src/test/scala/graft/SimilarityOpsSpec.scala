package graft

import graft.ops.SimilarityOps

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
}
