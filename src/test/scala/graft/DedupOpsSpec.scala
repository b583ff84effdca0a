package graft

import graft.ops.{DedupOps, SimilarityOps}

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different words entirely here now today")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeper is min doc_id") {
    val out = DedupOps.exactDedup(corpus).collect()
      .map(r => r.getAs[Long]("keeper_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("minhash: identical docs share all 16 signature rows") {
    val sigs = DedupOps.minhashSignatures(corpus)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    assert(sigs(1L).size == 16)
  }

  test("minhash pairs finds exact + near dups, not unrelated docs") {
    val pairs = DedupOps.minhashPairs(corpus, minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: exact dup has jaccard 1.0, near dup in (0,1)") {
    val out = DedupOps.ngramJaccardPairs(corpus, minJaccard = 0.1)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out.get((1L, 3L)).exists(j => j > 0.1 && j < 1.0))
  }

  test("simhash: identical docs have hamming 0; pairs join finds them") {
    val sigs = DedupOps.simhash(corpus).as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = DedupOps.simhashPairs(corpus, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("embedding near-dup finds injected exact copies at cosine ~1") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 0.5f), 1),
      (1L, Array(-1.0f, 0.3f, 2.0f), 1),
      (2L, Array(0.9f, -0.2f, 0.1f), 2)
    ).toDF("vec_id", "embedding", "label")
    // augmentedEmbeddings injects a copy of vec_id 0 as 10000
    val pairs = SimilarityOps.embeddingNearDup(emb, minCos = 0.999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 10000L)))
  }
}
