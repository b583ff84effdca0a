package graft

import graft.ops.{EventOps, RelationalOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-3 additions: relational breadth (Q3/Q4/Q6 flavors) and the
  * native event-time window operators. Value checks on synthetic inputs
  * plus physical-plan shape assertions — the plan IS the contract at
  * scale (semi-join must not fan out, global top-k must not global-sort,
  * Q6 predicates must reach the scan).
  */
class Round3AdditionsSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("tumbling window: epoch-aligned hour buckets, counts and sums") {
    val hourUs = 3600L * 1000 * 1000
    val events = Seq(
      (1L, 10L * hourUs * 1000, "a", """{"k":1}"""),          // ts is NANOS
      (2L, (10L * hourUs + 1) * 1000, "a", """{"k":2}"""),
      (3L, 11L * hourUs * 1000, "a", """{"k":4}"""),
      (4L, (11L * hourUs - 1) * 1000, "b", """{"k":8}""")
    ).toDF("event_id", "ts", "event_type", "props")
    val got = EventOps.tumblingCounts(events)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (10 * hourUs, "a", 2L, 3L),
      (11 * hourUs, "a", 1L, 4L),
      (10 * hourUs, "b", 1L, 8L)))                            // 11h-1us → 10h bucket
  }

  test("sliding window: every event lands in exactly width/slide windows") {
    val halfUs = 1800L * 1000 * 1000
    val events = Seq((1L, 5L * halfUs * 1000, "a", "{}"))
      .toDF("event_id", "ts", "event_type", "props")
    val got = EventOps.slidingCounts(events)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((4 * halfUs, "a", 1L), (5 * halfUs, "a", 1L)))
  }

  test("semi-join emits each order once regardless of matching-line count") {
    val orders = Seq((1L, "1-URGENT"), (2L, "1-URGENT"), (3L, "2-HIGH"))
      .toDF("o_orderkey", "o_orderpriority")
    val lineitem = Seq((1L, "R"), (1L, "R"), (1L, "R"), (3L, "R"), (2L, "N"))
      .toDF("l_orderkey", "l_returnflag")
    val got = RelationalOps.prioritiesWithReturns(orders, lineitem)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1-URGENT" -> 1L, "2-HIGH" -> 1L))
    assert(plan(RelationalOps.prioritiesWithReturns(orders, lineitem))
      .contains("LeftSemi"))
  }

  test("global top-k plans TakeOrderedAndProject, never a global sort") {
    val dir = "/root/testdata/sf0.001"
    val p = plan(RelationalOps.shippingPriority(
      Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir)))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("rangepartitioning"))
  }

  test("Q6 predicates push into the parquet scan") {
    val p = plan(RelationalOps.revenueChange(
      Tables.lineitem(spark, "/root/testdata/sf0.001")))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    // Column pruning: the scan reads only the 4 referenced columns.
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"))
  }
}
