package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM join — the Structured Streaming capability
  * the rest of the streaming surface composes around but nothing yet
  * demonstrated directly (reference analogue: correlating the payments
  * topics across services; re-expressed as the canonical purchase
  * attribution: each purchase pairs with every view by the same user
  * within the preceding attribution window).
  *
  * Both sides carry event-time watermarks and the join condition bounds
  * `v_time` to a window ENDING at the purchase time, so Spark can prove
  * when buffered rows on each side are no longer joinable and evict
  * them — state is O(arrival rate × (watermark delay + window)), not
  * O(stream length). Without the time bound the state grows forever;
  * with only one watermark the unbounded side still leaks — both are
  * required, which is exactly what this operator encodes.
  *
  * The batch funnel twin (`EventOps.funnelConversion`) keeps only the
  * LATEST qualifying view per purchase (as-of semantics); the
  * stream-stream join emits every qualifying (purchase, view) PAIR —
  * the shape ad-attribution and audit pipelines want. The same function
  * applied to BATCH frames (watermarks are no-ops there) is the parity
  * oracle the spec uses.
  */
object StreamingJoins {

  /** `purchases`/`views` need (event_id, user_id, ts) with ts in epoch
    * NANOS (the events-table convention; `Tables.events` normalizes).
    *
    * `joinType` "inner" emits only matched pairs as they meet;
    * "left_outer" ALSO emits every unattributed purchase with NULL view
    * columns — but only once the watermark proves no qualifying view
    * can still arrive (v_time <= p_time, so eviction at
    * watermark > p_time): the outer result is late by one watermark
    * delay BY DESIGN, the price of a correct "no match" verdict on an
    * unbounded stream (spec-asserted).
    */
  def purchaseAttribution(purchases: DataFrame, views: DataFrame,
                          windowUs: Long = 3600L * 1000 * 1000,
                          delay: String = "10 minutes",
                          joinType: String = "inner"): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("p_time"))
      .withWatermark("p_time", delay)
    val v = views.select(col("event_id").as("v_id"),
        col("user_id").as("v_user"),
        timestamp_micros(expr("ts div 1000")).as("v_time"))
      .withWatermark("v_time", delay)
    p.join(v,
        col("user_id") === col("v_user") &&
          col("v_time") <= col("p_time") &&
          col("v_time") >= col("p_time") - expr(s"INTERVAL $windowUs MICROSECOND"),
        joinType)
      .select(col("p_id"), col("user_id"), col("p_time"),
        col("v_id"), col("v_time"))
  }
}
