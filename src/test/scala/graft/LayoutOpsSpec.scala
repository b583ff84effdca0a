package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness on knowable bit patterns, and
  * the pruning property the layout exists for — measured as the fraction
  * of blocks a box predicate touches under the z-layout vs a
  * single-column layout of matching granularity.
  */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mortonCode: hand-checked interleaves") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .withColumn("m", LayoutOps.mortonCode(col("a"), col("b")))
    val got = df.select("m").as[Long].collect().toSeq
    // interleave(3, 5): a bits 1,1 -> positions 0,2; b bits 1,0,1 ->
    // positions 1,5 -> 1 + 2 + 4 + 32 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, (1L << 32) - 1))
  }

  test("z-layout prunes box predicates on either dimension; single-column layout cannot") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01").cache()
    val z = LayoutOps.zorderLayout(li) // blockBits=10: 32x32 key tiles
    // single-column layout at matching granularity: partkey >> 3 gives
    // ~250 blocks vs ~256 populated z-tiles
    val oneD = li.select(col("l_partkey"), col("l_suppkey"))
      .withColumn("block", shiftrightunsigned(col("l_partkey"), 3))
    def frac(df: org.apache.spark.sql.DataFrame, pred: org.apache.spark.sql.Column): Double = {
      val total = df.select("block").distinct().count().toDouble
      df.filter(pred).select("block").distinct().count() / total
    }
    val suppBox = col("l_suppkey").between(10, 19)
    val partBox = col("l_partkey").between(100, 199)
    // supplier-constrained: z skips most tiles, the partkey layout none
    assert(frac(z, suppBox) < 0.5, s"z supp frac ${frac(z, suppBox)}")
    assert(frac(oneD, suppBox) > 0.9, s"1d supp frac ${frac(oneD, suppBox)}")
    // partkey-constrained: both prune; z stays within 3x of the
    // specialist layout (the documented Z-curve trade)
    assert(frac(z, partBox) < 3 * frac(oneD, partBox) + 0.02,
      s"z part frac ${frac(z, partBox)} vs 1d ${frac(oneD, partBox)}")
    // the layout assignment is map-side: the OPERATOR adds no exchange
    // (asserted on a loader-free frame — Tables' round-robin spread
    // would otherwise show up as the scan's own exchange)
    val plain = Seq((1L, 1, 5L, 7L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val plan = LayoutOps.zorderLayout(plain).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"z-layout must not shuffle:\n$plan")
    li.unpersist()
  }
}
