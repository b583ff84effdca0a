package graft

import org.apache.spark.sql.functions._

import graft.ops.{PqOps, SimilarityOps}

/** Round 14: the VERDICT r13 fix list — clustered-geometry recall for
  * the persisted-index incremental ANN path (the deployment-grade
  * counterpart to the near-orthogonal worst-case rows), plus the
  * fixture's two load-bearing invariants: seed-codebook coverage of the
  * product grid (zero quantization error) and integer-exact arithmetic.
  */
class Round14AdditionsSpec extends SparkSpec {
  import spark.implicits._

  /** ids only — [[SimilarityOps.clusteredGeometry]] derives the vectors
    * from vec_id alone; the float column stands in for the real
    * embeddings table's. */
  private def idCorpus(n: Long) =
    (0L until n).map(i => (i, Seq.tabulate(4)(_.toFloat)))
      .toDF("vec_id", "embedding")

  // ---- ann_recall_incremental_clustered (VERDICT r13 #1) ----

  test("clusteredGeometry: 64 dims, cluster offsets by vec_id % 8, seed ids cover every (cluster, fine) codeword pair per subspace") {
    val rows = SimilarityOps.clusteredGeometry(idCorpus(512))
      .as[(Long, Seq[Double])].collect().toMap
    assert(rows(0L).length == 64)
    // within a subspace the value is constant; across clusters the
    // offset (c+1)*64 dominates any fine value (< 8)
    for ((i, v) <- rows) {
      val c = i % 8
      assert(v.forall(x => x >= (c + 1) * 64 && x < (c + 1) * 64 + 8),
        s"id $i must sit in its cluster's offset band")
      assert(v.grouped(8).forall(sub => sub.distinct.size == 1),
        s"id $i: fine value must be constant within a subspace")
    }
    // seed coverage: for every subspace, ids 0..63 hit all 64
    // (cluster, fine) pairs — the zero-quantization-error precondition
    for (s <- 0 until 8) {
      val pairs = (0L until 64L).map(i => (i % 8, rows(i)(s * 8))).toSet
      assert(pairs.size == 64,
        s"subspace $s: seed codebook must cover all 64 grid codewords")
    }
  }

  test("clusteredGeometry quantizes losslessly against its own seed codebook (qerr exactly 0 for every vector)") {
    val emb = SimilarityOps.clusteredGeometry(idCorpus(256))
    val base = emb.filter(PqOps.annSplitIsIndex(64))
    val enc = PqOps.pqEncodeWith(emb, PqOps.trainCodebook(base, 8, 64))
    val nonzero = enc.filter(col("qerr") =!= 0.0).count()
    assert(nonzero == 0,
      "every subvector IS a codeword, so ADC ranking must equal exact ranking")
  }

  test("annRecallIncrementalClustered: deployment-grade recall (>= 0.8) where the near-orthogonal corpus is chance-level") {
    val corpus = idCorpus(512)
    val out = SimilarityOps.annRecallIncrementalClustered(corpus)
      .as[(Long, Double)].collect()
    val deltaIds = (0L until 512L).filter(i => i >= 64 && i % 4 == 0)
    assert(out.map(_._1).toSet == deltaIds.toSet,
      "every delta vector evaluated, orphan or not")
    assert(out.forall(r => r._2 == 0.0 || r._2 == 1.0))
    val recall = out.map(_._2).sum / out.length
    assert(recall >= 0.8,
      s"clustered-geometry recall@1 $recall below the deployment bar")
  }
}
