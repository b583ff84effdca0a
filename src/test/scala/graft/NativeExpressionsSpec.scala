package graft

import graft.functions.{native, Hashing}
import org.apache.spark.sql.functions._

/** The native expressions must be BIT-IDENTICAL to the built-in HOF
  * formulations they replace (which are what the DuckDB oracles mirror).
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a", "", "x y", "punctuation, included! here?"
  ).toDF("text")

  test("simhash60 == nested-HOF simhash on sample docs") {
    val toks = split(col("text"), " ", -1)
    val hof = docs
      .withColumn("hs", expr(
        s"transform(split(text, ' ', -1), w -> ${Hashing.hash64Expr("w")})"))
      .select(expr(
        """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) ->
          |  acc + IF(aggregate(hs, 0, (v, h) ->
          |            v + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
          |          shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin))
      .as[Long].collect().toSeq
    val nat = docs.select(native.simhash60(toks)).as[Long].collect().toSeq
    assert(nat == hof)
  }

  test("minhashSig == transform/array_min HOF on sample shingle arrays") {
    val sh = docs.select(split(col("text"), " ", -1).as("shingles"))
    val hof = sh.select(expr(
      s"""transform(sequence(0, 15), p ->
         |  array_min(transform(shingles, s ->
         |    ${Hashing.hash64Expr("concat(cast(p AS string), ':', s)")})))""".stripMargin))
      .as[Seq[Long]].collect().toSeq
    val nat = sh.select(native.minhashSig(col("shingles"), 16))
      .as[Seq[Long]].collect().toSeq
    assert(nat == hof)
  }

  test("dotFold == aggregate(zip_with) bitwise on adversarial doubles") {
    val vecs = Seq(
      (Array(1e16, 1.0, -1e16, 3.7), Array(1.0, 1.0, 1.0, 0.1)),
      (Array(0.1, 0.2, 0.3, 0.4), Array(-0.4, 0.3, -0.2, 0.1))
    ).toDF("a", "b")
    val hof = vecs.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
      .as[Double].collect().toSeq
    val nat = vecs.select(native.dotFold(col("a"), col("b"))).as[Double].collect().toSeq
    assert(nat.map(java.lang.Double.doubleToLongBits) ==
      hof.map(java.lang.Double.doubleToLongBits))
  }

  test("dotFold is null on length mismatch (zip_with pad semantics)") {
    val vecs = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(vecs.select(native.dotFold(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  /** Independent naive O(n·W) formulation over UTF-8 bytes — mirrors what
    * the DuckDB oracle computes via hex-pair extraction of encode(text).
    */
  private def naiveWinnow(s: String, window: Int): Long = {
    val P = 2147483647L; val B = 257L
    val bytes = s.getBytes("UTF-8")
    def fold(lo: Int, hi: Int): Long = {
      var h = 0L; var j = lo
      while (j < hi) { h = (h * B + (bytes(j) & 0xff)) % P; j += 1 }
      h
    }
    if (bytes.length <= window) fold(0, bytes.length)
    else (0 to bytes.length - window).map(i => fold(i, i + window)).min
  }

  test("sig_agree equals the zip_with/aggregate HOF form on random, null-bearing, mismatched arrays") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq.tabulate(200) { _ =>
      def arr(n: Int): Seq[java.lang.Long] = Seq.fill(n)(
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(4).toLong))
      val n = 1 + rnd.nextInt(20)
      val m = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(20) else n  // 25% length mismatch
      (arr(n), arr(m))
    } :+ ((Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      native.sigAgree(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)").as("hof"))
    val mismatches = got.filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
    // whole-stage codegen and interpreted agree (force both paths)
    val s = spark
    val key = "spark.sql.codegen.wholeStage"
    val prev = s.conf.get(key)
    try {
      s.conf.set(key, "false")
      val interp = df.select(native.sigAgree(col("a"), col("b"))).as[Int].collect().toSeq
      s.conf.set(key, "true")
      val gen = df.select(native.sigAgree(col("a"), col("b"))).as[Int].collect().toSeq
      assert(interp == gen)
    } finally s.conf.set(key, prev)
  }

  test("winnow60 hashes UTF-8 bytes: non-ASCII text matches the naive byte fold") {
    val texts = Seq(
      "héllo wörld — naïve café ★",                // 2- and 3-byte codepoints
      "中文文本指纹测试，比窗口长得多的一段中文文本指纹测试内容", // all multi-byte, > window bytes
      "mixed ascii and ünïcödé in one string that is longer than the window",
      "züm",                                       // shorter than window
      "")                                          // empty
    val exp = texts.map(naiveWinnow(_, 32))
    val got = texts.toDF("text")
      .select(graft.functions.Winnow60.winnow60(col("text"), 32))
      .as[Long].collect().toSeq
    assert(got == exp)
  }
}
