package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operators over the `events` table — the engine's stand-in for a Kafka
  * record stream in batch form (SURVEY.md §2.3 F5, §7 B8a/B11).
  *
  * All stages are built from codegen'd built-ins; the aggregations get
  * map-side partial aggregation, so at 100 TB the shuffle carries
  * (key, partial) pairs bounded by key cardinality × partitions, not rows.
  */
object EventOps {

  /** F5 — projection + cast, the reference's `selectExpr("CAST(value AS
    * STRING)")` (spark/kafka/App.java:74) applied to the events stream:
    * event_id plays the Kafka key, props the value.
    */
  def castProject(events: DataFrame): DataFrame =
    events.select(
      col("event_id").cast("string").as("key"),
      col("props").as("value"))

  /** B8a — exact dedup of the event stream on its semantic key
    * (user_id, event_type), keeping the earliest event_id. GroupBy-min
    * rather than window-row_number: one shuffle, full map-side partial
    * aggregation, no per-group sort — the cheaper plan at scale.
    */
  def dedupExact(events: DataFrame): DataFrame =
    events.groupBy("user_id", "event_type")
      .agg(min("event_id").as("first_event_id"),
        count(lit(1)).as("n_events"))

  /** B11 — JSON property extraction from the untyped `props` column
    * (events.props carries {"k": N}), the engine's get_json_object path.
    */
  def jsonExtract(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** B11 — aggregate over the extracted JSON property. Integer sums only
    * (double sums are partition-order dependent and would break the
    * bitwise oracle compare).
    */
  def jsonAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
}
