package graft.ops

import graft.model.ExchangeRates
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The payments pipeline operators — F1 (JSON decode), F2 (currency
  * enrichment), F3 (suspicious routing predicate), F4 (JSON encode) from
  * SURVEY.md §2.3, re-expressed Spark-first.
  *
  * Reference behavior (lenses-topology-example-microservice/.../
  * PaymentsService.java):
  *  - :52      Jackson decode; :54-56 malformed records printed + dropped
  *  - :100-103 applyExchangeRate — BigDecimal rate lookup × amount
  *  - :94-97   route to suspicious topic when converted amount < 10000
  *             (strict <; both sinks receive the suspicious record)
  *  - :92-93   Jackson encode, Kafka key = currency
  *
  * All four are pure `DataFrame => DataFrame` composable stages built from
  * codegen'd built-in functions — no UDFs — so predicate pushdown, column
  * pruning and whole-stage codegen apply end to end.
  */
object PaymentOps {

  /** Wire schema of a payment JSON document (amount in integer cents). */
  val paymentSchema: StructType = StructType(Seq(
    StructField("currency", StringType),
    StructField("amount", LongType),
    StructField("ts", LongType)
  ))

  /** Deterministically derive a payments feed from the `orders` table so the
    * batch pipeline has a reproducible input the DuckDB oracle can rebuild:
    * currency by orderkey mod 5, amount = totalprice in cents, plus a
    * sprinkling of malformed records (every 97th key) to exercise F1's
    * drop-on-malformed path. Column `value` mirrors a Kafka record value.
    */
  def syntheticPaymentsJson(orders: DataFrame): DataFrame = {
    val currency = element_at(
      array(ExchangeRates.currencies.map(lit): _*),
      (col("o_orderkey") % 5 + 1).cast("int"))
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    // o_orderdate is TIMESTAMP_NTZ in the parquet; session TZ is pinned to
    // UTC, so the cast makes unix_millis agree with DuckDB's epoch_ms.
    val ts = unix_millis(col("o_orderdate").cast("timestamp"))
    val json = concat(
      lit("{\"currency\":\""), currency,
      lit("\",\"amount\":"), cents.cast("string"),
      lit(",\"ts\":"), ts.cast("string"), lit("}"))
    orders.select(
      col("o_orderkey").as("k"),
      when(col("o_orderkey") % 97 === 0, lit("not a json payload"))
        .otherwise(json).as("value"))
  }

  /** Same synthetic feed for the DuckDB oracle (identical strings). */
  def syntheticPaymentsJsonSql: String = {
    val currencies = ExchangeRates.currencies
      .map(c => s"'$c'").mkString("[", ", ", "]")
    s"""SELECT o_orderkey AS k,
       |  CASE WHEN o_orderkey % 97 = 0 THEN 'not a json payload'
       |       ELSE '{"currency":"' || ($currencies)[CAST(o_orderkey % 5 + 1 AS INT)] ||
       |            '","amount":' || CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR) ||
       |            ',"ts":' || CAST(epoch_ms(o_orderdate) AS VARCHAR) || '}'
       |  END AS value
       |FROM orders""".stripMargin
  }

  /** F1 — JSON decode with malformed-drop (PaymentsService.java:52-56).
    * PERMISSIVE `from_json` yields null struct on malformed input; the
    * filter reproduces the reference's print-and-drop (we drop silently —
    * the count of drops is observable as input minus output rows).
    */
  def jsonDecode(jsonDF: DataFrame): DataFrame =
    // Filter on the EXTRACTED currency field only (round 15, guide §4.4
    // duplication): the previous `p IS NOT NULL AND p.currency IS NOT
    // NULL` filter pushed below the projection as TWO independent
    // from_json evaluations (each re-deriving the full input
    // expression), plus the projection's own — 3+ parses per row.
    // Row-equivalence: from_json under PERMISSIVE yields an all-null
    // struct for malformed input and null only for null input, so
    // `currency IS NOT NULL` accepts exactly the same rows (a null
    // struct extracts a null field). The pushed filter's parse is
    // schema-pruned to the one field by OptimizeJsonExprs; survivors
    // pay one full parse in the projection — 2 total.
    jsonDF
      .withColumn("p", from_json(col("value"), paymentSchema))
      .select(col("k"), col("p.currency").as("currency"),
        col("p.amount").as("amount"), col("p.ts").as("ts"))
      .filter(col("currency").isNotNull)

  /** F2 — currency conversion via broadcast lookup join
    * (PaymentsService.java:100-103; rates CurrencyExchangeRepo.java:15-19).
    * The 5-row dimension is broadcast: the fact side never shuffles —
    * mandatory at 100 TB (a shuffle join on the fact table here is the
    * canonical scale-killer). Exact decimal multiply ≙ BigDecimal.multiply.
    */
  def convert(payments: DataFrame, rates: DataFrame): DataFrame =
    payments
      .join(broadcast(rates), "currency")
      .withColumn("converted",
        round(col("amount") * col("rate"), 0).cast("long"))

  /** F2 alternative — the reference's literal semantics: a per-record
    * HashMap lookup (CurrencyExchangeRepo.java:22-24) as a typed Dataset
    * map over a broadcast variable. Same results as the join form
    * ([[convert]] — which stays the default: Catalyst SEES a join and can
    * optimize around it, while a closure is opaque). This is the template
    * for genuinely imperative per-row enrichment (model inference, codec
    * calls) where no relational form exists.
    */
  def convertMapSide(spark: org.apache.spark.sql.SparkSession,
                     payments: DataFrame): DataFrame = {
    import spark.implicits._
    val rates = spark.sparkContext.broadcast(
      graft.model.ExchangeRates.rates.map { case (c, r) => c -> r }.toMap)
    payments.select("k", "currency", "amount", "ts")
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        val m = rates.value
        it.flatMap { case (k, currency, amount, ts) =>
          m.get(currency).map { rate =>
            // BigDecimal multiply + HALF_UP ≙ exact decimal round, matching
            // the join form's round(amount * rate, 0)
            val conv = new java.math.BigDecimal(amount).multiply(rate)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
            (k, currency, amount, ts, conv)
          }
        }
      }
      .toDF("k", "currency", "amount", "ts", "converted")
  }

  /** F2 decimal variant — the reference's literal BigDecimal semantics
    * end-to-end (PaymentsService.java:102 multiplies exact BigDecimals):
    * the converted amount stays a DECIMAL, never rounded to cents.
    * Scales are chosen so the product is EXACT under Spark's decimal
    * multiply rules: amount cents DECIMAL(12,0) × rate DECIMAL(18,6) →
    * DECIMAL(31,6), inside the 38-digit budget, zero precision loss —
    * then widened to DECIMAL(38,6) for a stable output type. A blanket
    * DECIMAL(38,18) on BOTH operands would be the opposite of fidelity:
    * 38+38+1 digits overflows the budget and Spark's precision-loss rule
    * silently truncates the scale — the spec demonstrates both that trap
    * and this path's exactness at the 1.313558 × 1.9e6-scale boundary
    * (SURVEY §7 risk 1). Amounts ≥ 10^12 cents overflow the (12,0) cast
    * LOUDLY under ANSI mode rather than drifting.
    */
  def convertDecimal(payments: DataFrame, rates: DataFrame): DataFrame =
    payments
      .join(broadcast(rates), "currency")
      .withColumn("converted_dec",
        (col("amount").cast(DecimalType(12, 0)) * col("rate"))
          .cast(DecimalType(38, 6)))
      .select("k", "currency", "amount", "ts", "converted_dec")

  /** F3 — suspicious-payment predicate: converted amount < 10,000 units
    * (strict; PaymentsService.java:94-97 routes on the CONVERTED amount).
    * Amounts are cents here, so the threshold is 10_000 * 100.
    */
  val suspicious: Column = col("converted") < 10000L * 100

  /** F4 — JSON encode with Kafka key = currency
    * (PaymentsService.java:92-93). Spark's to_json is compact
    * (no spaces), fields in struct order.
    */
  def jsonEncode(converted: DataFrame): DataFrame =
    converted.select(
      col("currency").as("key"),
      to_json(struct(col("currency"), col("converted").as("amount"),
        col("ts"))).as("value"))

  /** The full batch pipeline: decode → convert → route. Returns the
    * converted stream with an `is_suspicious` flag rather than two separate
    * outputs — the streaming fan-out (two Kafka sinks from one pass) lives
    * in graft.streaming.PaymentsPipeline.
    */
  def pipeline(spark: SparkSession, orders: DataFrame): DataFrame = {
    val decoded = jsonDecode(syntheticPaymentsJson(orders))
    convert(decoded, ExchangeRates.ratesDF(spark))
      .withColumn("is_suspicious", suspicious)
  }
}
