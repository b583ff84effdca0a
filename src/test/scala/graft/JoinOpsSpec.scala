package graft

import graft.ops.JoinOps
import org.apache.spark.sql.functions.col

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: inclusive at equal time, null before first right row, ties by order col") {
    val left = Seq((1L, 1L, 4L), (2L, 1L, 5L), (3L, 1L, 10L), (4L, 2L, 7L))
      .toDF("event_id", "k", "t")
    val right = Seq((1L, 5L, 10L, 100.0), (1L, 5L, 11L, 200.0), (1L, 8L, 12L, 300.0))
      .toDF("k", "t", "rid", "v")
    val out = JoinOps.asofJoin(left, right, "k", "t", "rid", Seq("v"))
      .select("event_id", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == None)            // t=4 before any right row
    assert(out(2L) == Some(200.0))     // t=5 inclusive; tie resolved to rid=11
    assert(out(3L) == Some(300.0))     // latest right at t=8
    assert(out(4L) == None)            // key 2 has no right rows
  }

  test("asof join: NULL value on the latest right row propagates (no earlier-row leak)") {
    val left = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("event_id", "k", "t")
    val right = Seq(
      (1L, 5L, 1L, Some(100.0)),
      (1L, 15L, 2L, None)              // latest before t=20, value is NULL
    ).toDF("k", "t", "rid", "v")
    val out = JoinOps.asofJoin(left, right, "k", "t", "rid", Seq("v"))
      .select("event_id", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == Some(100.0))     // t=10: latest right is t=5
    assert(out(2L) == None)            // t=20: latest right is t=15 with NULL value
  }

  test("asof join: multiple valueCols never mix right rows") {
    val left = Seq((1L, 1L, 20L)).toDF("event_id", "k", "t")
    val right = Seq(
      (1L, 5L, 1L, Some(100.0), Option.empty[Long]),
      (1L, 15L, 2L, None, Some(7L))
    ).toDF("k", "t", "rid", "v", "u")
    val r = JoinOps.asofJoin(left, right, "k", "t", "rid", Seq("v", "u")).head()
    // both values must come from the t=15 row: v NULL, u 7
    assert(r.isNullAt(r.fieldIndex("asof_v")))
    assert(r.getLong(r.fieldIndex("asof_u")) == 7L)
  }

  test("range join: lo inclusive, hi exclusive, intervals spanning buckets") {
    val facts = Seq((1L, 0.0), (2L, 24999.9), (3L, 25000.0), (4L, 70000.0))
      .toDF("id", "v")
    val iv = Seq((10L, 0.0, 25000.0), (20L, 25000.0, 100000.0)).toDF("tier", "lo", "hi")
    val out = JoinOps.rangeJoin(facts, "v", iv, "lo", "hi", 25000L)
      .select("id", "tier").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L))
  }

  test("range join equals the plain non-equi join") {
    val facts = (1L to 200L).map(i => (i, i * 37.0 % 500)).toDF("id", "v")
    val iv = Seq((1L, 0.0, 100.0), (2L, 100.0, 350.0), (3L, 350.0, 500.0)).toDF("tier", "lo", "hi")
    val bucketed = JoinOps.rangeJoin(facts, "v", iv, "lo", "hi", 50L)
      .select("id", "tier").as[(Long, Long)].collect().sorted.toSeq
    val plain = facts.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "tier").as[(Long, Long)].collect().sorted.toSeq
    assert(bucketed == plain)
  }
}
