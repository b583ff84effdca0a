package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical profiling aggregates — the data-profiling pass a pipeline
  * runs before/after transformations (drift checks, schema profiling,
  * feature sanity). Spark has corr/covar/percentile_approx built in, but
  * their float accumulation is partial-aggregation-order-dependent: the
  * same query returns different last-ulp bits run to run, which is
  * useless for regression-testing a pipeline against a reference engine.
  * These operators compute the SAME statistics deterministically:
  *
  *  - Moments accumulate as exact integer cents (BIGINT): addition is
  *    associative/commutative, so partial aggregation order cannot change
  *    the sums; int64→double conversion is a single correctly-rounded
  *    IEEE op in every engine; the closed-form statistics then apply a
  *    fixed sequence of IEEE ops. Bitwise-reproducible across runs,
  *    partitionings, AND engines (hash-matches DuckDB).
  *  - Quantiles use the exact rank-interpolation definition (type-7,
  *    rank = p·(n−1)) — on integer-valued data with dyadic p every
  *    interpolation is exact, so engines agree bitwise.
  *
  * Scale: one partial-aggregated shuffle of 6 longs per group for the
  * moments (map-side combine does nearly all the work — shuffle traffic
  * is O(groups), independent of row count). int64 cent-sums bound the
  * domain: Σy² of 1e7-cent values overflows past ~9e18, i.e. ~1e5 rows
  * per group at max price — beyond that a production run swaps the sum
  * type to DECIMAL(38,0) (still exact, still order-independent) and
  * accepts engine-specific last-ulp conversion. Exact percentile
  * shuffles (value, count) pairs per group — bounded by distinct values
  * (50 here), NOT rows; for unbounded domains use approx sketches.
  */
object StatsOps {

  /** Pearson correlation, population covariance, and OLS slope/intercept
    * of (l_quantity, l_extendedprice) per return flag, from exact
    * integer-cent moment sums. Both inputs are 2-decimal values stored
    * as doubles: ×100 then round() lands exactly on the integer (the
    * FP error of the stored double is ≪ 0.5 cents), so the cast to long
    * is exact on both engines.
    */
  def statsCorr(lineitem: DataFrame): DataFrame = {
    val xc = round(col("l_quantity") * 100).cast("long")
    val yc = round(col("l_extendedprice") * 100).cast("long")
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    lineitem
      .select(col("l_returnflag"), xc.as("xc"), yc.as("yc"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
        sum(col("xc") * col("xc")).as("sxx"),
        sum(col("yc") * col("yc")).as("syy"),
        sum(col("xc") * col("yc")).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        ((nd * d("sxy") - d("sx") * d("sy")) /
          (sqrt(nd * d("sxx") - d("sx") * d("sx")) *
            sqrt(nd * d("syy") - d("sy") * d("sy")))).as("corr_qty_price"),
        // covariance is in cents²: one exact power-of-ten division back
        (((d("sxy") - d("sx") * d("sy") / nd) / nd) / lit(10000.0)).as("covar_pop"),
        // slope is cents/cents — the scale cancels
        ((nd * d("sxy") - d("sx") * d("sy")) /
          (nd * d("sxx") - d("sx") * d("sx"))).as("slope"),
        (((d("sy") - ((nd * d("sxy") - d("sx") * d("sy")) /
          (nd * d("sxx") - d("sx") * d("sx"))) * d("sx")) / nd) / lit(100.0))
          .as("intercept"))
  }

  /** Identical moment sums and IEEE op sequence in DuckDB. sum(BIGINT)
    * returns HUGEINT there — cast back to BIGINT before the double
    * conversion so both engines convert the same int64. */
  val statsCorrOracle: String =
    """WITH cents AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS xc,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
      |    CAST(sum(xc * xc) AS BIGINT) AS sxx,
      |    CAST(sum(yc * yc) AS BIGINT) AS syy,
      |    CAST(sum(xc * yc) AS BIGINT) AS sxy
      |  FROM cents GROUP BY 1)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    AS corr_qty_price,
      |  ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |    / CAST(n AS DOUBLE)) / 10000.0 AS covar_pop,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    AS slope,
      |  ((CAST(sy AS DOUBLE)
      |     - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / 100.0 AS intercept
      |FROM m""".stripMargin

  /** Exact quartiles of l_quantity per return flag. Spark's `percentile`
    * aggregate is the exact type-7 quantile (rank = p·(n−1), linear
    * interpolation) — the same definition as DuckDB's quantile_cont. On
    * integer-valued data with p ∈ {¼, ½, ¾} the interpolation arithmetic
    * is exact in FP, so the engines agree bitwise.
    */
  def quantiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      expr("percentile(l_quantity, 0.25)").as("q25"),
      expr("percentile(l_quantity, 0.5)").as("median"),
      expr("percentile(l_quantity, 0.75)").as("q75"))

  /** 1.5σ outlier screen per return flag (the synthetic prices are
    * near-uniform — max z ≈ 1.8 — so a 3σ default would select nothing):
    * mean/σ from the same exact
    * integer-cent moments as [[statsCorr]] (population σ), broadcast
    * back as 1-row-per-group scalars; each row compares against bounds
    * computed once per group — both engines evaluate the identical IEEE
    * sequence, so the flagged sets agree bitwise. Two passes over the
    * fact table (agg, then filter) — at 100 TB the second pass prunes
    * at the scan because the broadcast side is group-level metadata.
    */
  def outliers(lineitem: DataFrame, nSigma: Double = 1.5): DataFrame = {
    val yc = round(col("l_extendedprice") * 100).cast("long")
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val moments = lineitem
      .select(col("l_returnflag"), yc.as("yc"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("sy"),
        sum(col("yc") * col("yc")).as("syy"))
      .select(col("l_returnflag"),
        (d("sy") / nd).as("mean_c"),
        sqrt((d("syy") - d("sy") * d("sy") / nd) / nd).as("sd_c"))
    lineitem.select(col("l_returnflag"), yc.as("yc"))
      .join(broadcast(moments), "l_returnflag")
      .filter(abs(col("yc").cast("double") - col("mean_c")) >
        lit(nSigma) * col("sd_c"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_outliers"),
        (min(col("yc")).cast("double") / lit(100.0)).as("min_price"),
        (max(col("yc")).cast("double") / lit(100.0)).as("max_price"))
  }

  def outliersOracle(nSigma: Double = 1.5): String =
    s"""WITH cents AS (
       |  SELECT l_returnflag,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
       |  FROM lineitem),
       |m AS (
       |  SELECT l_returnflag,
       |    CAST(CAST(sum(yc) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      AS mean_c,
       |    sqrt((CAST(CAST(sum(yc * yc) AS BIGINT) AS DOUBLE)
       |          - CAST(CAST(sum(yc) AS BIGINT) AS DOUBLE)
       |            * CAST(CAST(sum(yc) AS BIGINT) AS DOUBLE)
       |            / CAST(count(*) AS DOUBLE))
       |         / CAST(count(*) AS DOUBLE)) AS sd_c
       |  FROM cents GROUP BY 1)
       |SELECT l_returnflag, count(*) AS n_outliers,
       |  CAST(min(yc) AS DOUBLE) / 100.0 AS min_price,
       |  CAST(max(yc) AS DOUBLE) / 100.0 AS max_price
       |FROM cents JOIN m USING (l_returnflag)
       |WHERE abs(CAST(yc AS DOUBLE) - mean_c) > $nSigma * sd_c
       |GROUP BY 1""".stripMargin

  val quantilesOracle: String =
    """SELECT l_returnflag, count(*) AS n,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q75
      |FROM lineitem GROUP BY 1""".stripMargin
}
