package graft

import graft.ops.{SemanticOps, TextOps}
import org.apache.spark.sql.functions._

/** DSIR importance resampling and α=0.5 temperature source mixing —
  * the two data-curation selectors added late in round 6.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  // Target set: distinctive "reference" vocabulary. Raw: one doc written
  // in the target's vocabulary, the rest off-distribution.
  private val target = Seq(
    doc(100L, "curated reference prose about careful reasoning and clear evidence"),
    doc(101L, "careful reasoning with clear evidence and curated prose"),
    doc(102L, "reference evidence prose reasoning careful clear curated")
  ).toDF("doc_id", "text")

  private val raw = Seq(
    doc(1L, "careful curated reasoning and clear reference evidence prose"), // in-dist
    doc(2L, "buy cheap pills online casino jackpot winner click now"),
    doc(3L, "random assorted words banana umbrella xylophone quartz"),
    doc(4L, "the cat sat on the mat and the dog barked loudly")
  ).toDF("doc_id", "text")

  // ---- dsirScores / dsirSelect ----

  test("dsirScores ranks the in-distribution document first; scores are finite and positive") {
    val rows = SemanticOps.dsirScores(raw, target).collect()
    assert(rows.length == 4, "every raw doc gets a score")
    val byScore = rows.sortBy(r => -r.getAs[Double]("score_avg"))
    assert(byScore.head.getLong(0) == 1L,
      "the doc sharing the target vocabulary must score highest")
    rows.foreach { r =>
      val s = r.getAs[Double]("score_avg")
      assert(s > 0.0 && !s.isNaN && !s.isInfinite,
        s"Laplace smoothing keeps every score finite+positive, got $s")
    }
  }

  test("dsirScores accounting: n_toks matches whitespace token count, n_dims <= n_toks") {
    val rows = SemanticOps.dsirScores(raw, target).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_dims"), r.getAs[Long]("n_toks"))).toMap
    val expected = raw.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_.nonEmpty)).toMap
    expected.foreach { case (id, n) =>
      val (nd, nt) = rows(id)
      assert(nt == n, s"doc $id: n_toks $nt != whitespace count $n")
      assert(nd <= nt, s"doc $id: distinct dims $nd must be <= tokens $nt")
    }
  }

  test("dsirScores is partitioning-invariant (ordered fold contract)") {
    val base = SemanticOps.dsirScores(raw, target).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("score_sum"))).sortBy(_._1)
    val repart = SemanticOps.dsirScores(raw.repartition(7), target.repartition(3))
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score_sum"))).sortBy(_._1)
    assert(base.sameElements(repart),
      "score_sum must be bitwise identical under any partitioning")
  }

  test("dsirSelect returns exactly k docs in deterministic order, plans as TakeOrderedAndProject") {
    val sel = SemanticOps.dsirSelect(raw, target, k = 2)
    val got = sel.collect().map(_.getLong(0))
    assert(got.length == 2 && got.head == 1L,
      s"top-2 must lead with the in-distribution doc, got ${got.toSeq}")
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  test("dsirScores plan: ratio table broadcasts; corpus side never re-reads text after feature extraction") {
    val plan = SemanticOps.dsirScores(raw, target).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"dims-sized ratio table must broadcast, not shuffle the corpus:\n$plan")
  }

  test("scoreAgainstRatios on in-vocabulary docs equals dsirScores bitwise (plus oov=0)") {
    val ratios = SemanticOps.dsirRatioTable(raw, target).persist()
    try {
      val frozen = SemanticOps.scoreAgainstRatios(ratios, raw).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_dims"), r.getAs[Long]("n_toks"),
          r.getAs[Long]("oov"), r.getAs[Double]("score_sum"))).sortBy(_._1)
      val batch = SemanticOps.dsirScores(raw, target).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_dims"), r.getAs[Long]("n_toks"),
          0L, r.getAs[Double]("score_sum"))).sortBy(_._1)
      assert(frozen.sameElements(batch),
        "frozen-table scorer must agree with the training-time scorer on in-vocab docs")
    } finally ratios.unpersist()
  }

  test("scoreAgainstRatios floors never-seen features at 0.0 and counts them as oov") {
    val ratios = SemanticOps.dsirRatioTable(raw, target)
    val novel = Seq((50L, "zzzunseen zzzunseen careful")).toDF("doc_id", "text")
    val r = SemanticOps.scoreAgainstRatios(ratios, novel).collect().head
    assert(r.getAs[Long]("n_toks") == 3L && r.getAs[Long]("oov") == 2L,
      s"both copies of the unseen token must count as oov, got $r")
    assert(r.getAs[Double]("score_avg") > 0.0,
      "the in-vocab token still contributes; oov floors at 0, not NaN")
  }

  test("dsirScoreStream: per-batch scores match the frozen-table batch scorer bitwise across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ratios = SemanticOps.dsirRatioTable(raw, target).persist()
    val batch1 = Seq((10L, "careful curated evidence"), (11L, "casino jackpot zzznovel"))
    val batch2 = Seq((20L, "clear reasoning prose"))
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double, Double)]
    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingText.dsirScoreStream(
      spark, ratios, input.toDF().toDF("doc_id", "text")) { (scores, _) =>
      got ++= scores.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    }.start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty,
        "foreachBatch scoring must carry zero streaming state")
      input.addData(batch2: _*)
      query.processAllAvailable()
      val expected = SemanticOps.scoreAgainstRatios(
          ratios, (batch1 ++ batch2).toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toSet
      assert(got.toSet == expected && got.size == 3,
        s"streamed scores must equal the batch scorer: got=$got")
      // the frozen table spans triggers: the novel token in batch 1 is oov
      assert(got.find(_._1 == 11L).get._4 == 1L)
    } finally {
      query.stop(); ratios.unpersist()
    }
  }

  // ---- clusterCapSample ----

  private val clusteredVecs = {
    // two tight clusters around orthogonal axes; seeds = vec_id 0 and 1
    val around0 = (0L until 40L by 2L).map(i =>
      (i, Seq(1.0f, 0.001f * i, 0f, 0f)))
    val around1 = (1L until 40L by 2L).map(i =>
      (i, Seq(0.001f * i, 1.0f, 0f, 0f)))
    (around0 ++ around1).toDF("vec_id", "embedding")
  }

  test("clusterCapSample caps every cluster, keeps small clusters whole, ranks contiguously") {
    val got = SemanticOps.clusterCapSample(clusteredVecs, k = 2, cap = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = got.groupBy(_._2)
    assert(byCluster.keySet == Set(0L, 1L), s"both seed clusters present: $byCluster")
    byCluster.foreach { case (c, members) =>
      assert(members.length == 5, s"cluster $c must be capped at 5, got ${members.length}")
      assert(members.map(_._3).sorted.sameElements(1L to 5L),
        s"ranks must be contiguous 1..cap in cluster $c")
    }
    // cap above cluster size keeps everything
    val uncapped = SemanticOps.clusterCapSample(clusteredVecs, k = 2, cap = 1000).collect()
    assert(uncapped.length == 40, "cap above cluster size must be a no-op")
  }

  test("clusterCapSample pick order is content-addressed: stable under repartitioning, not vec_id order") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SemanticOps.clusterCapSample(df, k = 2, cap = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(r => (r._2, r._3)).toSeq
    val a = run(clusteredVecs)
    val b = run(clusteredVecs.repartition(7))
    assert(a == b, "kept set + ranks must be partitioning-invariant")
    // the picked members are md5-ordered, which differs from plain id order
    val cluster0Ids = a.filter(_._2 == 0L).map(_._1)
    assert(cluster0Ids != cluster0Ids.sorted || a.filter(_._2 == 1L).map(_._1) !=
      a.filter(_._2 == 1L).map(_._1).sorted,
      "content-addressed pick must not reduce to ascending vec_id order")
  }

  // ---- centroid classifier ----

  private val labeledDocs = {
    // two "languages" with disjoint vocabularies; eval docs stay in-vocab
    val en = Seq("the quick brown fox jumps", "a lazy dog sleeps here",
      "quick dog and brown fox")
    val de = Seq("der schnelle braune fuchs springt", "ein fauler hund schlaeft",
      "schnelle hund und braune fuchs")
    (en.zipWithIndex.map { case (t, i) => (i * 2L + 1L, t, "en") } ++
      de.zipWithIndex.map { case (t, i) => (i * 2L + 100L, t, "de") })
      .toDF("doc_id", "text", "lang")
  }

  test("centroidClassify recovers disjoint-vocabulary labels perfectly") {
    val model = SemanticOps.centroidTrain(labeledDocs)
    val evalDocs = Seq(
      (500L, "brown fox jumps here", "en"),
      (501L, "braune fuchs springt", "de")
    ).toDF("doc_id", "text", "lang")
    val got = SemanticOps.centroidClassify(model, evalDocs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((500L, "en", "en"), (501L, "de", "de")),
      s"disjoint vocabularies must classify exactly, got ${got.toSeq}")
  }

  test("centroidClassify scores are partitioning-invariant; model broadcasts") {
    val evalDocs = Seq((500L, "quick brown fox", "en")).toDF("doc_id", "text", "lang")
    def run(train: org.apache.spark.sql.DataFrame) =
      SemanticOps.centroidClassify(SemanticOps.centroidTrain(train), evalDocs)
        .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSeq
    assert(run(labeledDocs) == run(labeledDocs.repartition(7)),
      "integer centroids + ordered norm folds must be partitioning-invariant")
    val plan = SemanticOps.centroidClassify(
      SemanticOps.centroidTrain(labeledDocs), evalDocs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the metadata-sized model must broadcast:\n$plan")
  }

  test("centroidClassify ties break by label ascending; no-overlap docs drop out") {
    val model = SemanticOps.centroidTrain(labeledDocs)
    val evalDocs = Seq((600L, "zzz qqq www", "en")).toDF("doc_id", "text", "lang")
    // zero overlap with either centroid: the doc has no score row at all
    assert(SemanticOps.centroidClassify(model, evalDocs).isEmpty,
      "a doc sharing no hashed dim with any class must drop, not NaN")
  }

  test("classifyStream: frozen model, zero state, per-batch parity with the batch classifier") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val model = SemanticOps.centroidTrain(labeledDocs).persist()
    val arriving1 = Seq((700L, "quick brown fox"), (701L, "schnelle braune fuchs"))
    val arriving2 = Seq((702L, "lazy dog sleeps"))
    val got = collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingText.classifyStream(
      spark, model, input.toDF().toDF("doc_id", "text")) { (preds, _) =>
      got ++= preds.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    }.start()
    try {
      input.addData(arriving1: _*)
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty)
      input.addData(arriving2: _*)
      query.processAllAvailable()
      val expected = SemanticOps.centroidClassify(model,
          (arriving1 ++ arriving2).map { case (id, t) => (id, t, "??") }
            .toDF("doc_id", "text", "lang"))
        .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSet
      assert(got.toSet == expected && got.size == 3,
        s"streamed predictions must equal the batch classifier: $got")
      assert(got.find(_._1 == 700L).get._2 == "en" &&
        got.find(_._1 == 701L).get._2 == "de")
    } finally {
      query.stop(); model.unpersist()
    }
  }

  // ---- lineDedup ----

  test("lineDedup keeps first occurrence within a doc, leaves cross-doc duplicates alone") {
    val docs = Seq(
      (1L, "alpha. beta. alpha. gamma. beta"),
      (2L, "alpha. delta"), // cross-doc dup of 'alpha' must SURVIVE
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = graft.ops.DedupOps.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (("alpha. beta. gamma", 3L, 5L)))
    assert(got(2L) == (("alpha. delta", 2L, 2L)),
      "within-doc dedup must not touch cross-document duplicates")
    assert(got(3L) == (("solo", 1L, 1L)))
  }

  test("lineDedup streams in Append mode with zero state (pure projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = graft.ops.DedupOps.lineDedup(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("line_dedup_stream")
      .start()
    try {
      input.addData((1L, "p. q. p"), (2L, "r"))
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty,
        "a map-side operator must add no streaming state")
      val got = spark.table("line_dedup_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "p. q", 2L -> "r"))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS line_dedup_stream")
    }
  }

  test("lineDedup is idempotent and zero-shuffle") {
    val docs = Seq((1L, "x. y. x. y. z")).toDF("doc_id", "text")
    val once = graft.ops.DedupOps.lineDedup(docs)
    val twice = graft.ops.DedupOps.lineDedup(
      once.select(col("doc_id"), col("text_dedup").as("text")))
    assert(once.collect().head.getString(1) == twice.collect().head.getString(1),
      "dedup of deduped text must be identity")
    val plan = once.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"within-doc dedup must be fully map-side:\n$plan")
  }

  // ---- qualityBudgetMix ----

  test("qualityBudgetMix fills the budget best-quality-first with at most one straddler per source") {
    // same source: quality_score rises with n_tokens up to 100 tokens and
    // falls with stopword ratio; craft docs with clearly ordered quality
    val good = (1L, ("interesting content " * 40).trim, "src_a")   // 80 toks, 0 stop
    val mid  = (2L, ("the of and " * 20 + "substance words " * 10).trim, "src_a") // stops
    val bad  = (3L, "the of and a in to is", "src_a")              // all stopwords
    val docs = Seq(good, mid, bad).toDF("doc_id", "text", "source")
    val got = graft.ops.TextOps.qualityBudgetMix(docs, budget = 90).collect()
      .map(r => (r.getLong(0), r.getLong(4))).sortBy(_._2)
    // doc 1 (best) fills 80 tokens; doc 2 straddles (cum_excl=80 < 90);
    // doc 3's exclusive prefix >= 90 -> excluded
    assert(got.map(_._1).toSeq == Seq(1L, 2L),
      s"selection must be quality-ordered with one straddler, got ${got.toSeq}")
  }

  test("qualityBudgetMix is partitioning-invariant and budget-monotone") {
    val docs = (0L until 30L).map(i =>
      (i, ("word " * (10 + i.toInt)).trim, s"src_${i % 3}"))
      .toDF("doc_id", "text", "source")
    def run(budget: Long, df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextOps.qualityBudgetMix(df, budget).collect()
        .map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1).toSeq
    assert(run(100, docs) == run(100, docs.repartition(7)))
    val small = run(60, docs).map(_._1).toSet
    val large = run(200, docs).map(_._1).toSet
    assert(small.subsetOf(large), "a larger budget must only ADD documents")
  }

  // ---- sourceTemperatureMix ----

  private val skewedDocs = {
    // source a: 64 docs, source b: 4 docs — rates must flatten toward b
    val a = (0L until 64L).map(i => (i, "a" * 10, "src_a", 10L))
    val b = (100L until 104L).map(i => (i, "b" * 10, "src_b", 10L))
    (a ++ b).toDF("doc_id", "text", "source", "n_chars")
  }

  test("sourceTemperatureMix flattens: scarce source keeps all docs, abundant source is thinned") {
    val got = TextOps.sourceTemperatureMix(skewedDocs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget = 34 docs; sqrt weights 8:2 -> src_b target = 34*2/10 = 6.8 > 4
    // so src_b keeps everything (rate caps at 1); src_a thins to ~27/64
    assert(got.getOrElse("src_b", 0L) == 4L,
      s"scarce source must survive whole, got $got")
    val aKept = got.getOrElse("src_a", 0L)
    assert(aKept > 0L && aKept < 64L,
      s"abundant source must be thinned but not emptied, got $aKept")
    // flattening: kept share of src_b (100%) > kept share of src_a
    assert(4.0 / 4.0 > aKept / 64.0)
  }

  test("sourceTemperatureMix is deterministic under repartitioning and rerun") {
    def run() = TextOps.sourceTemperatureMix(skewedDocs.repartition(5)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run() == run(), "content-addressed gate must be rerun-stable")
  }

  test("sourceTemperatureMix budgetFrac=1 keeps every document of a balanced corpus") {
    val balanced = (0L until 20L)
      .map(i => (i, "x", if (i % 2 == 0) "src_a" else "src_b", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val kept = TextOps.sourceTemperatureMix(balanced, budgetFrac = 1.0).collect()
      .map(_.getLong(1)).sum
    // balanced corpus at full budget: every source rate = min(1, B/2/n) = 1
    assert(kept == 20L, s"full budget on balanced corpus must keep all, kept $kept")
  }
}
