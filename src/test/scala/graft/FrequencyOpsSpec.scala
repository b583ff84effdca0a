package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries.misraGries
import graft.ops.FrequencyOps

/** Heavy-hitter family: the Misra-Gries sketch's theorem-level
  * guarantees pinned on adversarial synthetic streams (forced pruning),
  * and the sketch→verify operator's exactness + partitioning
  * invariance.
  */
class FrequencyOpsSpec extends SparkSpec {
  import spark.implicits._

  test("MisraGries: candidate-superset + lower-bound + undercount bound under heavy pruning") {
    // 3000 copies of one hot token drowned in 7000 uniques; capacity 16
    // forces hundreds of prunes. N/(m+1) = 10000/17 = 588.
    val stream = (Seq.fill(3000)("hot") ++ (0 until 7000).map(i => s"u$i"))
    val df = stream.toDF("tok").repartition(7)
    val cands = df.agg(misraGries(col("tok"), 16).as("s"))
      .select(explode(col("s")).as("c"))
      .select($"c.item".as("item"), $"c.count_lb".as("lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands.size <= 32, s"summary must stay <= 2*capacity, got ${cands.size}")
    // superset property: true count 3000 > 588 => "hot" MUST survive
    assert(cands.contains("hot"), s"hot missing from $cands")
    // lower bound + bounded undercount
    assert(cands("hot") <= 3000L)
    assert(cands("hot") >= 3000L - 588L, s"undercount too large: ${cands("hot")}")
    // every other retained count is a lower bound of a true count of 1
    cands.removed("hot").values.foreach(c => assert(c == 1L))
  }

  test("MisraGries: no-prune regime returns exact counts; NULLs skipped; SQL surface") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("a"), Some("a"), Some("b"), None, Some("a"), Some("b"))
      .toDF("tok")
    df.createOrReplaceTempView("mg_in")
    val rows = spark.sql(
      "SELECT misra_gries(tok, 8) AS s FROM mg_in")
      .select(explode(col("s")).as("c"))
      .select($"c.item", $"c.count_lb").as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 3L, "b" -> 2L))
  }

  test("heavyHitters: exact top-k, guaranteed flags, partitioning-invariant") {
    // Zipf-ish corpus: token t<i> appears (50 - i) times
    val docs = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"t$i"))
    val corpus = scala.util.Random.shuffle(docs).grouped(7)
      .map(_.mkString(" ")).toSeq.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val expected = (0 until 10).map(i => (s"t$i", (50 - i).toLong))
    def run(parts: Int) =
      FrequencyOps.heavyHitters(corpus.repartition(parts), k = 10, capacity = 64)
        .select("tok", "cnt").as[(String, Long)].collect().toSeq
    val r1 = run(1)
    val r13 = run(13)
    assert(r1 == expected, s"exact top-10 mismatch: $r1")
    // exact verify makes the OUTPUT partitioning-invariant even though
    // the intermediate summaries differ with merge order
    assert(r13 == r1)

    // top rows clear the N/(m+1) bound on this corpus => guaranteed
    val flags = FrequencyOps.heavyHitters(corpus, k = 10, capacity = 64)
      .select("guaranteed").as[Boolean].collect()
    assert(flags.forall(identity),
      "all top-10 rows should be provably exact at capacity 64 here")
  }

  test("heavyHitters: verify pass broadcasts candidates (no distinct-token shuffle join)") {
    val corpus = (0L until 200L).map(i => (i, s"a b c tok$i")).toDF("doc_id", "text")
    val plan = FrequencyOps.heavyHitters(corpus, k = 3, capacity = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"candidate join must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("heavyNgrams: planted template phrase ranks first") {
    val template = "click here now"
    val docs = (0L until 40L).map { i =>
      (i, s"$template unique$i filler${i * 7} tail${i % 3}")
    }.toDF("doc_id", "text")
    val top = FrequencyOps.heavyNgrams(docs, k = 1, capacity = 128)
      .select("tok", "cnt").as[(String, Long)].head()
    assert(top == ((template, 40L)), s"got $top")
  }

  test("heavyHittersBySource: grouped sketch gives per-source exact top-k") {
    // two sources with DIFFERENT hot tokens; the grouped sketch must
    // keep them apart
    val docs = ((0 until 30).map(i => ("s0", s"alpha alpha beta u$i")) ++
      (0 until 20).map(i => ("s1", s"gamma gamma gamma v$i")))
      .zipWithIndex.map { case ((src, t), i) => (i.toLong, t, src) }
      .toDF("doc_id", "text", "source")
    val top = graft.ops.FrequencyOps.heavyHittersBySource(docs, k = 2, capacity = 32)
      .select("source", "tok", "cnt").as[(String, String, Long)]
      .collect().toSet
    assert(top == Set(("s0", "alpha", 60L), ("s0", "beta", 30L),
      ("s1", "gamma", 60L), ("s1", "v0", 1L)))
  }

  test("streaming running summary: MG state accumulates across micro-batches, bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val summary = graft.streaming.StreamingFrequency.runningTokenSummary(
      input.toDF().toDF("doc_id", "text"), capacity = 8)
    val query = summary.writeStream.format("memory")
      .queryName("freq_running").outputMode(OutputMode.Complete()).start()
    try {
      input.addData((1L, "hot hot hot cold"), (2L, "hot warm"))
      query.processAllAvailable()
      def snap() = spark.sql(
        "SELECT explode(cands) AS c, n FROM freq_running")
        .selectExpr("c.item", "c.count_lb", "n")
        .as[(String, Long, Long)].collect()
      val s1 = snap()
      assert(s1.head._3 == 6L)
      assert(s1.toSeq.map(r => r._1 -> r._2).toMap.apply("hot") == 4L)
      // second trigger: counts ACCUMULATE over the stream, not per batch
      input.addData((3L, "hot hot cool"), (4L, "hot"))
      query.processAllAvailable()
      val s2 = snap()
      assert(s2.head._3 == 10L)
      assert(s2.toSeq.map(r => r._1 -> r._2).toMap.apply("hot") == 7L)
      // bounded state: summary never exceeds 2*capacity entries
      assert(s2.length <= 16)
    } finally query.stop()
  }

  test("heavyHitters contract on a flat distribution: tail flags drop, shown counts stay exact") {
    // one hot token (100 > N/(m+1)) above a flat field of 40 tokens × 10:
    // with capacity 8 the bound is 500/9 = 55, so every rank-2+ row is
    // best-effort — the flag must SAY so — while counts for whatever
    // tokens are shown remain exact (the verify pass guarantees that
    // regardless of candidate-set luck)
    val stream = Seq.fill(100)("hot") ++
      (0 until 40).flatMap(i => Seq.fill(10)(f"mid$i%02d"))
    val corpus = stream.grouped(5).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = FrequencyOps.heavyHitters(corpus, k = 5, capacity = 8)
      .select("tok", "cnt", "guaranteed")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(rows.head == (("hot", 100L, true)))
    rows.tail.foreach { case (tok, cnt, guaranteed) =>
      assert(!guaranteed, s"$tok cannot clear the N/(m+1) bound here")
      assert(cnt == truth(tok), s"shown count for $tok must be exact")
    }
  }

  test("heavyHitters: empty corpus yields empty top-k, no NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .filter(col("doc_id") < 0)
    assert(FrequencyOps.heavyHitters(empty, k = 5, capacity = 8).count() == 0L)
  }
}
