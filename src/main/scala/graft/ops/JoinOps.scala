package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks natively, composed Spark-first from
  * built-ins (custom-operator preference (a) — no custom strategy needed):
  *
  *  - **As-of join**: each left row picks the latest right row with
  *    right_time <= left_time (inclusive), per key. Implemented as a
  *    tagged UNION + per-key window `last(..., ignoreNulls)` — one shuffle
  *    on the key, one per-key local sort, NO range/nested-loop join. At
  *    100 TB this beats the naive non-equi join (which plans as a
  *    broadcast-nested-loop or cartesian) by orders of magnitude; it is
  *    the standard "merge the streams" formulation.
  *
  *  - **Range join**: left value ∈ [lo, hi) against an interval table.
  *    Naively a non-equi join (BNLJ). Bucketized: intervals explode to the
  *    fixed-width buckets they overlap, facts compute their bucket, the
  *    join becomes an EQUI-join on bucket + residual filter — shuffle-
  *    partitionable, AQE-skew-splittable. Bucket width trades replication
  *    (intervals spanning many buckets) against selectivity.
  */
object JoinOps {

  /** Backward as-of join (inclusive). `left`/`right` must share `keyCol`;
    * times are comparable numerics; `valueCols` are carried from right.
    * Right-side ties on (key, time) resolve by largest `rightOrderCol`
    * (pass e.g. an event id for full determinism).
    *
    * All `valueCols` travel in ONE struct per right row: the struct is
    * non-null for every right row even when its value fields are NULL, so
    * `last(..., ignoreNulls)` always selects the genuinely latest right
    * row — a NULL value column propagates as NULL instead of leaking an
    * earlier row's value, and multiple valueCols can never mix rows.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, rightOrderCol: String,
               valueCols: Seq[String]): DataFrame = {
    val rStruct = org.apache.spark.sql.types.StructType(valueCols.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val leftOther = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val lTagged = left.select(
      (col(keyCol) +: col(timeCol) +: lit(0).as("__is_right") +:
        lit(null).cast("long").as("__ord") +:
        lit(null).cast(rStruct).as("__r") +:
        leftOther.map(col)): _*)
    val rTagged = right.select(
      (col(keyCol) +: col(timeCol) +: lit(1).as("__is_right") +:
        col(rightOrderCol).cast("long").as("__ord") +:
        struct(valueCols.map(col): _*).as("__r") +:
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows sort BEFORE left rows at equal time (inclusive as-of),
    // and among right ties the largest __ord wins (it is the last seen).
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc, col("__is_right").desc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    merged.filter(col("__is_right") === 0)
      .select((col(keyCol) +: col(timeCol) +: leftOther.map(col)) ++
        valueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Bucketized range join: rows of `facts` matched to rows of
    * `intervals` where `lo <= value < hi`. `width` is the bucket size.
    */
  def rangeJoin(facts: DataFrame, valueCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                width: Long): DataFrame = {
    val f = facts.withColumn("__bucket", floor(col(valueCol) / width))
    val iv = intervals.withColumn("__bucket", explode(sequence(
      floor(col(loCol) / width),
      // hi is exclusive: the last overlapped bucket is floor((hi-ulp)/W);
      // for integer-ish domains floor((hi-1)/W) — use hi/W and filter,
      // one extra bucket of replication at worst.
      floor(col(hiCol) / width))))
    f.join(iv, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
