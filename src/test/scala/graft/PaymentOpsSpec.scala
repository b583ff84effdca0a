package graft

import graft.model.ExchangeRates
import graft.ops.PaymentOps
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** SURVEY.md §5.2: malformed-JSON drop, missing-currency routing,
  * strict suspicious threshold, encode∘decode identity.
  */
class PaymentOpsSpec extends SparkSpec {
  import spark.implicits._

  private def jsonRow(k: Long, v: String) = (k, v)

  test("F1 malformed JSON records are dropped, valid ones decoded") {
    val df = Seq(
      jsonRow(1, """{"currency":"USD","amount":500,"ts":42}"""),
      jsonRow(2, "not a json payload"),
      jsonRow(3, """{"broken": true"""),
      jsonRow(4, """{"currency":"EUR","amount":9,"ts":7}""")
    ).toDF("k", "value")
    val out = PaymentOps.jsonDecode(df).collect()
    assert(out.map(_.getAs[Long]("k")).sorted.toSeq == Seq(1L, 4L))
  }

  test("F2 missing-currency payments are routed out (inner join), not NPE") {
    // The reference would NPE at PaymentsService.java:102 on an unknown
    // currency; we define: drop from the converted stream (rejects route).
    val payments = Seq((1L, "USD", 100L, 0L), (2L, "XXX", 100L, 0L))
      .toDF("k", "currency", "amount", "ts")
    val out = PaymentOps.convert(payments, ExchangeRates.ratesDF(spark))
    assert(out.select("k").as[Long].collect().toSeq == Seq(1L))
  }

  test("F3 suspicious threshold is strict: converted == 10000 units is NOT suspicious") {
    // threshold 10000 currency units = 1_000_000 cents, strict < per
    // PaymentsService.java:95
    val payments = Seq(
      (1L, "GBP", 1000000L, 0L),  // == threshold → not suspicious
      (2L, "GBP", 999999L, 0L),   // < threshold → suspicious
      (3L, "GBP", 1000001L, 0L)
    ).toDF("k", "currency", "amount", "ts")
    val conv = PaymentOps.convert(payments, ExchangeRates.ratesDF(spark))
    val susp = conv.filter(PaymentOps.suspicious).select("k").as[Long].collect().toSeq
    assert(susp == Seq(2L))
  }

  test("F2 conversion is exact decimal multiply (GBP rate 1.00 is identity)") {
    val payments = Seq((1L, "GBP", 123456789L, 0L)).toDF("k", "currency", "amount", "ts")
    val out = PaymentOps.convert(payments, ExchangeRates.ratesDF(spark))
    assert(out.select("converted").as[Long].head() == 123456789L)
  }

  test("F4∘F1 encode-decode identity on arbitrary payments (property)") {
    val currencyGen = Gen.oneOf(ExchangeRates.currencies)
    val payGen = for {
      c <- currencyGen; a <- Gen.chooseNum(0L, 2000000L); t <- Gen.chooseNum(0L, 1.7e12.toLong)
    } yield (c, a, t)
    val prop = Prop.forAll(Gen.nonEmptyListOf(payGen)) { pays =>
      val df = pays.zipWithIndex
        .map { case ((c, a, t), i) => (i.toLong, c, a, t) }
        .toDF("k", "currency", "amount", "ts")
      val conv = PaymentOps.convert(df, ExchangeRates.ratesDF(spark))
      val encoded = PaymentOps.jsonEncode(conv)
        .withColumn("k", org.apache.spark.sql.functions.monotonically_increasing_id())
      val decoded = PaymentOps.jsonDecode(encoded.select(col("k"), col("value")))
      // decode(encode(x)) preserves currency + converted amount rows
      val back = decoded.select("currency", "amount").as[(String, Long)].collect().sorted.toSeq
      val expect = conv.select("currency", "converted").as[(String, Long)].collect().sorted.toSeq
      decoded.count() == df.count() && back == expect
    }
    val result = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
