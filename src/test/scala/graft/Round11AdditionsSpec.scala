package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.functions._

import graft.ops.{BucketCap, DedupOps, SimilarityOps}

/** Round 11: the VERDICT r10 fix list — the hot-bucket cap's plan
  * corrected to overflow-keys-only (healthy path keeps the r9 plan:
  * no window over bands), the cap's loud half registered and exercised
  * on a genuinely flooded fixture, and the embedding LSH pair surface
  * brought under the same (shared) fuse.
  */
class Round11AdditionsSpec extends SparkSpec {
  import spark.implicits._

  /** Healthy corpus: distinct texts, every band bucket far under any cap. */
  private def healthyDocs =
    (0L until 40L).map(i => (i, s"alpha bravo charlie delta_$i echo_$i fox_$i"))
      .toDF("doc_id", "text")

  /** Flooded corpus: 8 byte-identical docs (ids 0-7 share every band
    * bucket — the homogenized-corpus clique) + 2 unrelated docs. */
  private def floodedDocs =
    ((0L until 8L).map(i => (i, "the very same document body repeated verbatim")) ++
      Seq((20L, "an unrelated first control document here"),
        (21L, "another unrelated second control document here")))
      .toDF("doc_id", "text")

  test("capBuckets healthy path: the input plan is returned UNCHANGED (reference-identical)") {
    val df = healthyDocs.withColumn("bucket", col("doc_id") % 5)
    val out = BucketCap.capBuckets(df, Seq("bucket"), "doc_id", maxBucket = 64)
    assert(out eq df, "no overflowing bucket must mean zero plan delta")
  }

  test("minhashPairs healthy plan contains NO window over bands (VERDICT r10 #1)") {
    val wins = DedupOps.minhashPairs(healthyDocs)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty,
      s"healthy pair surface must not pay the rank window: $wins")
  }

  test("minhashBucketStats: healthy corpus proves the cap never bit") {
    val rows = DedupOps.minhashBucketStats(healthyDocs, k = 10)
      .select("bucket_n", "dropped_n", "overflowed")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, dropped, over) => dropped == 0L && !over })
  }

  test("minhashBucketStats: flooded bucket fires overflowed/dropped_n under the cap") {
    val top = DedupOps.minhashBucketStats(floodedDocs, k = 4, maxBucket = 4)
      .select("band", "bucket_n", "cand_pairs", "dropped_n", "overflowed")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // the 8-doc clique floods one bucket in each of the 4 bands
    assert(top.map(_._1).sorted == Seq(0L, 1L, 2L, 3L))
    top.foreach { case (_, n, cand, dropped, over) =>
      assert(n == 8L && cand == 28L && dropped == 4L && over)
    }
  }

  test("minhashPairs under the cap drops exactly the audited docs; default cap is a fuse, not a sampler") {
    // cap 4: each band bucket keeps the 4 smallest doc_ids -> pairs are
    // exactly the C(4,2)=6 clique pairs among ids {0,1,2,3}
    val capped = DedupOps.minhashPairs(floodedDocs, maxBucket = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 4L; b <- (a + 1) until 4L
    } yield (a, b)).toSet
    assert(capped == expected, s"capped pair set: $capped")
    // default cap (1024) leaves the flooded clique INTACT: all 28 pairs
    val uncapped = DedupOps.minhashPairs(floodedDocs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped == (for {
      a <- 0L until 8L; b <- (a + 1) until 8L
    } yield (a, b)).toSet)
  }

  test("capBuckets: a pathologically homogenized corpus fails LOUDLY past maxHotKeys") {
    val df = (0L until 20L).map(i => (i, i % 2)).toDF("doc_id", "bucket")
    val ex = intercept[IllegalArgumentException] {
      BucketCap.capBuckets(df, Seq("bucket"), "doc_id", maxBucket = 3,
        maxHotKeys = 1)
    }
    assert(ex.getMessage.contains("curate"))
  }

  // ---- embedding LSH surface under the shared fuse (VERDICT r10 #3) ----

  /** 8 identical vectors (one signature bucket, the embedding-homogeneity
    * hazard) — ids 1-8 so the %25 augmentation planting stays inert. */
  private def floodedEmbeddings =
    (1L to 8L).map(i => (i, Array.fill(64)(0.1f), 0L))
      .toDF("vec_id", "embedding", "label")

  test("embeddingNearDupLsh: flooded bucket truncates to the maxBucket smallest vec_ids") {
    val capped = SimilarityOps.embeddingNearDupLsh(floodedEmbeddings,
        maxBucket = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toSet
    assert(capped == expected, s"capped embedding pair set: $capped")
    // default cap: the full 28-pair clique survives (fuse, not sampler)
    val uncapped = SimilarityOps.embeddingNearDupLsh(floodedEmbeddings)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 28)
  }

  test("embeddingBucketStats: flooded bucket audited; healthy corpus all-clear; plans carry no window") {
    val flooded = SimilarityOps.embeddingBucketStats(floodedEmbeddings,
        k = 3, maxBucket = 4)
      .select("bucket_n", "cand_pairs", "dropped_n", "overflowed")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(flooded.head == ((8L, 28L, 4L, true)), s"audit top row: $flooded")
    // healthy: near-orthogonal distinct vectors spread across buckets
    val healthy = (1L to 40L)
      .map(i => (i, Array.tabulate(64)(d => if (d == (i % 64).toInt) 1.0f else 0.01f), i % 4))
      .toDF("vec_id", "embedding", "label")
    val stats = SimilarityOps.embeddingBucketStats(healthy, k = 20)
      .select("dropped_n", "overflowed").as[(Long, Boolean)].collect()
    assert(stats.nonEmpty && stats.forall { case (d, o) => d == 0L && !o })
    val wins = SimilarityOps.embeddingNearDupLsh(healthy)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.isEmpty, "healthy embedding pair surface must stay window-free")
  }
}
