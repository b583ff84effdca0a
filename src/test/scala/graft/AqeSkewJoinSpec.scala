package graft

import org.apache.spark.sql.functions._

/** The runtime half of the skew story (SkewOps.saltedJoin is the static
  * half): AQE detects an oversized shuffle partition at stage boundary
  * and splits it across tasks (`OptimizeSkewedJoin`), so one hot key
  * does not serialize a reducer. Thresholds are lowered so the local
  * test data trips the same code path a 100 TB hot key would.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // key 0 carries 100k rows (hot); keys 1..50 carry 100 each.
      val fact = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(5000).select((col("id") % 50 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(51).select(col("id").as("k"), concat(lit("d"), col("id")).as("tag"))
      val joined = fact.join(dim, "k")
      // Execute THIS queryExecution (count() would spawn a fresh one and
      // leave this AQE plan un-finalized).
      val rows = joined.queryExecution.toRdd.map(_ => 1L).reduce(_ + _)
      assert(rows == 105000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected a skew-split join, got:\n${plan.take(2000)}")
    } finally {
      restore.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
