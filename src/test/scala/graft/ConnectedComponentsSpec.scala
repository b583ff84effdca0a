package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components: correctness against a
  * union-find reference on adversarial shapes — the skewed star (one hub,
  * 10k spokes: the degree distribution plain min-label handles but a
  * naive neighbor-list gather would not), the long path (worst-case
  * diameter: O(log n) rounds here vs O(n) for min-label propagation),
  * and seeded random graphs.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Union-find reference. */
  private def ufLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // second pass: full compression, then label by component MIN
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def ccLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"), parts = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: one hub, 10k spokes — single component, hub-min label") {
    val pairs = (1L to 10000L).map(i => (0L, i))
    val got = ccLabels(pairs)
    assert(got.size == 10001)
    assert(got.values.forall(_ == 0L))
  }

  test("inverted star: hub has the LARGEST id (skewed toward max)") {
    val pairs = (0L until 5000L).map(i => (20000L, i))
    val got = ccLabels(pairs)
    assert(got.size == 5001)
    assert(got.values.forall(_ == 0L))
  }

  test("long path: 600-node chain converges (O(log n) rounds, not O(n))") {
    val pairs = (0L until 600L).map(i => (i, i + 1))
    val got = ccLabels(pairs)
    assert(got.size == 601)
    assert(got.values.forall(_ == 0L))
  }

  test("disjoint components keep distinct min labels") {
    val pairs = Seq((5L, 9L), (9L, 7L), (20L, 30L), (41L, 40L))
    assert(ccLabels(pairs) == Map(5L -> 5L, 9L -> 5L, 7L -> 5L,
      20L -> 20L, 30L -> 20L, 41L -> 40L, 40L -> 40L))
  }

  test("seeded random graphs match union-find labels") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200 * trial
      val pairs = Seq.fill(n) {
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
      }.filter(p => p._1 != p._2)
      assert(ccLabels(pairs) == ufLabels(pairs), s"trial $trial")
    }
  }

  test("empty pair graph yields an empty cluster map") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupOps.connectedComponents(empty, parts = 2).isEmpty)
  }

  test("driver union-find fast path matches the union-find reference on adversarial shapes") {
    val shapes = Seq(
      (1L to 10000L).map(i => (0L, i)),            // skewed star
      (0L until 5000L).map(i => (20000L, i)),      // inverted star
      (0L until 600L).map(i => (i, i + 1)),        // long chain
      Seq((5L, 9L), (9L, 7L), (20L, 30L), (41L, 40L)))
    shapes.zipWithIndex.foreach { case (pairs, i) =>
      val got = DedupOps.localComponents(pairs.toArray).toMap
      assert(got == ufLabels(pairs), s"shape $i")
    }
  }

  test("nearDupClusters: driver fast path and distributed path label identically") {
    val docs = DedupOps.augmented(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    def labels(threshold: Long): Map[Long, Long] =
      DedupOps.nearDupClusters(docs, driverMaxEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = labels(Long.MaxValue)  // forced driver union-find
    val dist = labels(-1L)             // forced star alternation
    assert(local.nonEmpty && local == dist)
    spark.catalog.clearCache()
  }
}
