package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGries.misraGries

/** Streaming twin of the heavy-hitter family
  * ([[graft.ops.FrequencyOps]]): a RUNNING Misra-Gries summary over an
  * unbounded token stream.
  *
  * Unlike the per-doc scoring twins (which use foreachBatch because
  * their state would be unbounded), this one is a NATIVE streaming
  * aggregation on purpose: the MG sketch is exactly the
  * bounded-state structure streaming wants — the state store holds ONE
  * serialized buffer of at most 2·capacity entries no matter how many
  * tokens or triggers flow through. `misra_gries` being a real
  * TypedImperativeAggregate is what makes this free: the same
  * expression runs batch partial/final aggregation AND streaming
  * state-store merge with identical semantics, so every guarantee in
  * [[graft.functions.MisraGriesAgg]]'s doc (candidate superset over
  * the WHOLE stream so far, ≤ N/(m+1) undercount) holds at each
  * trigger emission.
  *
  * Run with Complete (or Update) output mode — the result is one row:
  * the current summary + exact running token count N (for the
  * guarantee arithmetic downstream). A production pipeline broadcasts
  * each emission to its filter stage — e.g. a live boilerplate-phrase
  * blocklist fed by [[graft.ops.FrequencyOps.heavyNgrams]]-shaped
  * shingle input.
  */
object StreamingFrequency {

  /** (doc_id, text) stream → one running-summary row:
    * (cands array<struct<item,count_lb>>, n). */
  def runningTokenSummary(stream: DataFrame, capacity: Int = 1024): DataFrame =
    // cores-width per micro-batch for the same reason as the batch path
    // ([[graft.ops.Sketch.coalesceToCores]]): a many-split file-source
    // trigger would otherwise ship one O(capacity) summary per split
    // into the state-store exchange every trigger
    graft.ops.Sketch.coalesceToCores(stream)
      .select(explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(misraGries(col("tok"), capacity).as("cands"),
        count(lit(1)).as("n"))
}
