package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver-generated test data (TESTDATA.md).
  *
  * Schema-on-read from parquet footers: at 100 TB these would be catalog
  * tables with partition pruning; locally the parquet footer is the catalog.
  * Loaders select no columns — column pruning is left to Catalyst so each
  * query's scan reads only what it projects (verify via `PushedFilters` /
  * `ReadSchema` in explain output).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects by default; read nanos as Long (we never consume the
    // raw ts column — event-time logic derives times explicitly).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    parallelize(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** The test tables are single small parquet files → single-partition
    * scans → every downstream hash/JSON/HOF stage runs on ONE core (a
    * single-row-group file can't be split by maxPartitionBytes).
    * Repartition to cluster parallelism, gated so it is a NO-OP at
    * real scale where the scan already yields >= defaultParallelism
    * splits. Filters/pruning still push through Repartition.
    *
    * HASH on the leading column, not round-robin (round 15): every
    * keyless repartition(n) pays a local sort of its whole input first
    * (spark.sql.execution.sortBeforeRepartition, on by default since
    * SPARK-23207, so retried tasks reproduce the same row→partition
    * assignment — guide §2.5) — a per-load tax on every one of the
    * ~226 registered queries. The leading column of every test table
    * is its (near-)unique key (doc_id / o_orderkey / l_orderkey /
    * event_id / vec_id / *_key), so hash partitioning spreads as
    * evenly as round-robin, needs no sort, is deterministic under
    * retry/speculation BY VALUE (not just by assignment), and
    * advertises a HashPartitioning downstream operators keyed on the
    * same column can reuse. Every registered operator is partitioning-
    * invariant by the repo-wide content-addressed determinism
    * discipline, so results are unchanged (oracle gate re-run green).
    */
  def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target)
      df.repartition(target, col(df.columns.head)) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` canonical representation is a LONG of epoch NANOS — all
    * event-time operators derive micros via `ts div 1000`. Generator output
    * has varied between parquet TIMESTAMP(NANOS) (read as raw-nanos Long
    * under nanosAsLong) and TIMESTAMP(MICROS) (read as timestamp_ntz), so
    * normalize on the schema actually read. The NTZ→timestamp cast is exact
    * under the engine-wide UTC session timezone, matching DuckDB's
    * `epoch_us` on the same naive timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
