package graft

import graft.ops.{RelationalOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Round-4 surface additions: CUBE (the full grouping-sets lattice) and
  * multi-table LSH ANN (the L-independent-tables recall knob).
  */
class Round4AdditionsSpec extends SparkSpec {
  import spark.implicits._

  test("cube produces all four grouping sets from one Expand pass") {
    val li = Seq(("A", "F", 1.0), ("A", "F", 2.0), ("N", "O", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val got = RelationalOps.pricingCube(li)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3), r.getLong(4))).toSet
    assert(got == Set(
      (Some("A"), Some("F"), 2L, 3.0, 0L),
      (Some("N"), Some("O"), 1L, 4.0, 0L),
      (Some("A"), None, 2L, 3.0, 1L),       // per-flag subtotal
      (Some("N"), None, 1L, 4.0, 1L),
      (None, Some("F"), 2L, 3.0, 2L),       // per-status subtotal (cube-only)
      (None, Some("O"), 1L, 4.0, 2L),
      (None, None, 3L, 7.0, 3L)))           // grand total
    val plan = RelationalOps.pricingCube(li).queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size == 1, s"expected ONE Expand:\n$plan")
  }

  /** Deterministic corpus with planted clusters: base vectors plus small
    * perturbations, so each query has true near neighbors at high cosine.
    */
  private def clusteredEmbeddings(n: Int): org.apache.spark.sql.DataFrame =
    (0L until n.toLong).map { i =>
      val base = i % 8
      (i, Array.tabulate(64)(d =>
        (math.sin(base * 64 + d) + 0.02 * math.sin(i * 7 + d)).toFloat), base.toInt)
    }.toDF("vec_id", "embedding", "label")

  private def recallVsBrute(ann: org.apache.spark.sql.DataFrame,
                            brute: org.apache.spark.sql.DataFrame): Double = {
    val truth = brute.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = ann.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    (truth intersect got).size.toDouble / truth.size
  }

  test("multi-table LSH: recall vs brute force >= single-table, both reasonable") {
    val emb = clusteredEmbeddings(120)
    val brute = SimilarityOps.cosineTopK(emb, nQueries = 6, k = 5)
      .filter(col("rank") <= 5)
    val single = SimilarityOps.lshTopK(emb, nQueries = 6, k = 5)
    val multi = SimilarityOps.lshTopKMultiTable(emb, nQueries = 6, k = 5, nTables = 2)
    val rSingle = recallVsBrute(single, brute)
    val rMulti = recallVsBrute(multi, brute)
    assert(rMulti >= rSingle, s"multi-table recall $rMulti < single $rSingle")
    assert(rMulti >= 0.5, s"multi-table recall $rMulti unreasonably low")
  }

  test("multi-table LSH scores pairs once: no duplicate (q_id, vec_id) rows") {
    val emb = clusteredEmbeddings(80)
    val out = SimilarityOps.lshTopKMultiTable(emb, nQueries = 4, k = 10, nTables = 3)
    assert(out.groupBy("q_id", "vec_id").count().filter(col("count") > 1).isEmpty)
  }

  test("IVF nprobe=2 recall >= nprobe=1 recall vs brute force") {
    val emb = clusteredEmbeddings(120)
    val brute = SimilarityOps.cosineTopK(emb, nQueries = 6, k = 5)
    val p1 = SimilarityOps.ivfTopKProbed(emb, nQueries = 6, k = 5, nProbe = 1)
    val p2 = SimilarityOps.ivfTopKProbed(emb, nQueries = 6, k = 5, nProbe = 2)
    val r1 = recallVsBrute(p1, brute)
    val r2 = recallVsBrute(p2, brute)
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 $r1")
  }

  test("decontamination drops exactly the docs sharing a long n-gram with the benchmark") {
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (0L, bench, "en", "s1"),                                       // benchmark slice
      (1L, s"intro words then $bench and a tail", "en", "s1"),       // contaminated
      (2L, "an entirely different document with its own eight gram span here", "en", "s2"),
      (3L, "the quick brown fox jumps over seven lazy dogs instead okay", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")                      // 3: 6-gram overlap only
    val kept = graft.ops.DedupOps.decontaminate(docs, n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("streaming decontamination agrees with the batch operator, stateless in Append mode") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val benchDigests = bench.split(" ").sliding(8)
      .map(w => graft.functions.Hashing.md5Hex(w.mkString(" "))).toSet
    val input = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingOps.decontaminateStream(
      spark, input.toDF().toDF("doc_id", "text"), benchDigests)
    // Append mode start proves the pipeline is stateless (an aggregate
    // would demand Update/Complete)
    val query = out.writeStream.format("memory").queryName("decon_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      input.addData(
        (1L, s"prefix $bench suffix"),                     // contaminated
        (2L, "a clean document with enough words to have eight grams of its own"),
        (3L, "short doc"))                                 // < n tokens: kept
      query.processAllAvailable()
      val kept = spark.table("decon_stream").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(2L, 3L))
    } finally query.stop()
  }

  test("shingle simhash resists token-homogeneity collapse (the 153M-pair hazard)") {
    val rnd = new scala.util.Random(7)
    // every doc: 10 unique tokens + 12 copies of one corpus-wide token —
    // the homogenized shape that collapses unigram simhash
    val docs = (0L until 40L).map { d =>
      val unique = Seq.fill(10)(s"u${d}_${rnd.nextInt(100000)}")
      (d, rnd.shuffle(unique ++ Seq.fill(12)("common")).mkString(" "))
    }.toDF("doc_id", "text")
    def closePairs(sigs: Array[Long]): Int =
      (for { i <- sigs.indices; j <- i + 1 until sigs.length
             if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3 } yield 1).size
    val uni = graft.ops.DedupOps.simhash(docs)
      .select("simhash").as[Long].collect()
    val shi = graft.ops.DedupOps.simhashShingles(docs)
      .select("simhash").as[Long].collect()
    val (cUni, cShi) = (closePairs(uni), closePairs(shi))
    assert(cShi == 0, s"shingle simhash produced $cShi spurious close pairs")
    assert(cUni > 10, s"homogenized corpus should collapse unigram simhash (got $cUni)")
  }

  test("paragraph dedup keeps first global occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "a b. c d. e f"),
      (2L, "c d. x y"),        // "c d" first seen in doc 1
      (3L, "a b. c d"))        // fully duplicated -> disappears
      .toDF("doc_id", "text")
    val got = graft.ops.DedupOps.paragraphDedup(docs)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> (("a b. c d. e f", 3L, 3L)),
      2L -> (("x y", 1L, 2L))))
    assert(!got.contains(3L))
  }

  test("decontaminate plans broadcast digest joins — documents never join documents") {
    val docs = (0L until 200L).map(i => (i, s"tok$i a b c d e f g h i j k", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val plan = graft.ops.DedupOps.decontaminate(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }

  test("doc repetition: duplicated segments and dominant bigrams are measured") {
    val docs = Seq(
      (1L, "spam spam spam spam"),   // top bigram "spam spam" = 3/3
      (2L, "a b. a b"),              // dup_seg_frac = 1 - 1/2
      (3L, "w x y z"))               // all bigrams distinct -> 1/3
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.docRepetition(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 0.0, 1.0)))
    // doc 2 tokens: ["a","b.","a","b"] -> 3 distinct bigrams, top = 1/3
    assert(got(2L) == ((2L, 0.5, 1.0 / 3)))
    assert(got(3L) == ((1L, 0.0, 1.0 / 3)))
  }
}
