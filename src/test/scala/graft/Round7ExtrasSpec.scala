package graft

import graft.ops.{EventOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-7 surface extensions: CDC changelog apply (lakehouse MERGE),
  * per-source curation audit report.
  */
class Round7ExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def changelog(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "ts_ns", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_ns")).drop("ts_ns")

  test("cdcUpsert: untouched / update / delete / insert / tombstoned-insert branches") {
    val base = Seq(
      (1L, "alice", 10.0),
      (2L, "bob", 20.0),
      (3L, "carol", 30.0)
    ).toDF("c_custkey", "c_name", "c_acctbal")
    val events = changelog(
      // key 2: older upsert superseded by a newer upsert -> latest wins
      (100L, 1000L * 1000, 2L, "purchase", 50.0),
      (101L, 2000L * 1000, 2L, "click", 99.0),
      // key 3: upsert superseded by a tombstone -> row dropped
      (102L, 1000L * 1000, 3L, "purchase", 77.0),
      (103L, 2000L * 1000, 3L, "error", 0.0),
      // key 4: not in base, latest is an upsert -> insert
      (104L, 1000L * 1000, 4L, "signup", 44.0),
      // key 5: not in base, latest is a tombstone -> no-op
      (105L, 1000L * 1000, 5L, "error", 0.0))
    val out = EventOps.cdcUpsert(events, base)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getDouble(2), Option(r.getString(3))))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, Some("alice"), 10.0, None),          // untouched passthrough
      (2L, Some("bob"), 99.0, Some("upsert")),  // latest-wins update
      (4L, None, 44.0, Some("upsert"))))        // fresh insert
  }

  test("curationReport: dup pressure, language spread, quality gate, null-source group") {
    val many = (1 to 30).map(i => s"tok$i").mkString(" ") // 30 tokens, 0 stopwords
    val docs = Seq(
      (1L, "same text", "web", "en", 9L),
      (2L, "same text", "web", "fr", 9L),   // exact dup within source
      (3L, many, "web", "en", many.length.toLong), // quality pass
      (4L, "same text", "books", "en", 9L), // cross-source copy: counts once here
      (5L, "hello", null.asInstanceOf[String], "en", 5L) // untagged ingest
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val rows = TextOps.curationReport(docs).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))
      .toMap
    assert(rows(Some("web")) === ((3L, 2L, 1L, 2L, 1L)),
      "web: 3 docs, 2 distinct, 1 extra copy, 2 langs, 1 quality pass")
    assert(rows(Some("books")) === ((1L, 1L, 0L, 1L, 0L)),
      "cross-source copy is not a dup within books")
    assert(rows(None) === ((1L, 1L, 0L, 1L, 0L)),
      "null source reports as its own group")
  }

  test("cdcUpsert: same-timestamp changes resolve by event_id (deterministic latest)") {
    val base = Seq((7L, "dave", 1.0)).toDF("c_custkey", "c_name", "c_acctbal")
    val events = changelog(
      (201L, 5000L * 1000, 7L, "click", 2.0),
      (202L, 5000L * 1000, 7L, "click", 3.0)) // higher event_id wins the tie
    val out = EventOps.cdcUpsert(events, base).collect()
    assert(out.length === 1 && out.head.getDouble(2) === 3.0)
  }

  test("cdcUpsert: empty changelog is the identity on the base snapshot") {
    val base = Seq((1L, "alice", 10.0), (2L, "bob", 20.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val out = EventOps.cdcUpsert(changelog(), base)
    assert(out.count() === 2)
    assert(out.filter(col("last_op").isNotNull).count() === 0)
  }

  test("cdcUpsert plan: survivor filter stays ABOVE the full-outer join") {
    val base = Seq((1L, "alice", 10.0)).toDF("c_custkey", "c_name", "c_acctbal")
    val events = changelog((1L, 1000L, 1L, "error", 0.0))
    val plan = EventOps.cdcUpsert(events, base)
      .queryExecution.optimizedPlan.toString
    // the NULL-accepting filter must not be pushed below the join: doing
    // so would resurrect tombstoned base rows as "untouched"
    val joinIdx = plan.indexOf("FullOuter")
    val filterIdx = plan.indexOf("Filter")
    assert(joinIdx >= 0, s"expected a full-outer join in:\n$plan")
    assert(filterIdx >= 0 && filterIdx < joinIdx,
      s"survivor filter must sit above the join:\n$plan")
    // and the tombstone really deletes
    assert(EventOps.cdcUpsert(events, base).count() === 0)
  }
}
