package graft

import org.apache.spark.sql.functions._

import graft.ops.EventOps

/** SCD Type-2 history semantics on a hand-built changelog: interval
  * chaining, tombstone closure, tie-breaking, and the consistency
  * contract with the latest-snapshot CDC path (the current SCD2 row
  * must agree with cdcUpsert's survivor for every key).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts NANOS, user_id, event_type, value)
  private def changelog(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("intervals chain per key; open end carries the sentinel") {
    val h = EventOps.scd2History(changelog(
      (1L, 1000_000L, 7L, "update", 10.0),
      (2L, 3000_000L, 7L, "update", 20.0),
      (3L, 9000_000L, 7L, "update", 30.0)))
      .orderBy("valid_from_us")
      .select("bal", "valid_from_us", "valid_to_us", "is_current")
      .as[(Double, Long, Long, Boolean)].collect().toSeq
    assert(h == Seq(
      (10.0, 1000L, 3000L, false),
      (20.0, 3000L, 9000L, false),
      (30.0, 9000L, Long.MaxValue, true)))
    // intervals tile the timeline: each valid_to is the next valid_from
    h.sliding(2).foreach { case Seq(a, b) => assert(a._3 == b._2); case _ => () }
  }

  test("a tombstone closes the open interval without opening a version") {
    val h = EventOps.scd2History(changelog(
      (1L, 1000_000L, 7L, "update", 10.0),
      (2L, 5000_000L, 7L, "error", 0.0)))
      .select("bal", "valid_from_us", "valid_to_us", "is_current")
      .as[(Double, Long, Long, Boolean)].collect().toSeq
    // one version, CLOSED at the delete's timestamp; no current row
    assert(h == Seq((10.0, 1000L, 5000L, false)))
  }

  test("ts ties break by event_id — same total order as the snapshot path") {
    val h = EventOps.scd2History(changelog(
      (5L, 1000_000L, 7L, "update", 50.0),
      (2L, 1000_000L, 7L, "update", 20.0)))
      .orderBy("valid_from_us", "bal")
      .select("bal", "is_current").as[(Double, Boolean)].collect().toSeq
    // event_id 2 precedes 5 at the same ts: 20.0 is superseded
    assert(h == Seq((20.0, false), (50.0, true)))
  }

  test("current SCD2 rows agree with the cdcUpsert snapshot on every key") {
    val log = changelog(
      (1L, 1000_000L, 1L, "update", 10.0),
      (2L, 2000_000L, 1L, "update", 11.0),
      (3L, 1000_000L, 2L, "update", 20.0),
      (4L, 4000_000L, 2L, "error", 0.0),   // key 2 deleted
      (5L, 7000_000L, 3L, "update", 30.0))
    val current = EventOps.scd2History(log)
      .filter(col("is_current"))
      .select(col("user_id"), col("bal")).as[(Long, Double)].collect().toMap
    assert(current == Map(1L -> 11.0, 3L -> 30.0))
    // the snapshot path sees the same survivors (empty base dimension)
    val base = Seq.empty[(Long, String, Double)]
      .toDF("c_custkey", "c_name", "c_acctbal")
    val snap = EventOps.cdcUpsert(log, base)
      .select(col("key"), col("acctbal")).as[(Long, Double)].collect().toMap
    assert(snap == current)
  }

  test("plan: one user-keyed exchange, no global sort") {
    val plan = EventOps.scd2History(changelog(
      (1L, 1000_000L, 7L, "update", 10.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan.take(1500))
    assert(plan.contains("hashpartitioning(user_id"), plan.take(1500))
  }
}
