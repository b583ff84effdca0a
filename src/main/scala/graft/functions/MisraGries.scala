package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter SUMMARY as a native Catalyst aggregate —
  * the mergeable frequent-items sketch (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012). The buffer
  * holds at most `2*capacity` (item, count) entries; when it overflows,
  * the (capacity+1)-th largest count is subtracted from every entry and
  * non-positive entries drop — the batched-decrement variant, so the
  * per-row update cost is amortized O(1) instead of the textbook O(m)
  * decrement-all. Merge is pointwise-sum + the same prune, which the
  * Mergeable Summaries result proves keeps the error bound additive-safe
  * across ANY merge tree — exactly what a 1000-executor partial/final
  * aggregation needs.
  *
  * Guarantees (N = stream length, m = capacity):
  *  - every returned count is a LOWER bound of the item's true count,
  *    undercounting by at most N/(m+1) (each prune removes ≥ (m+1)·c*
  *    mass from the stream's total, so Σc* ≤ N/(m+1));
  *  - every item with true count > N/(m+1) IS in the summary (its
  *    lower bound stays positive) — the candidate-superset property
  *    [[graft.ops.FrequencyOps.heavyHitters]] builds its exact-verify
  *    pass on.
  *
  * Why a TypedImperativeAggregate and not groupBy(token).count():
  * a full token groupBy shuffles EVERY DISTINCT TOKEN (billions of
  * rows at 100 TB); this sketch keeps the shuffle at O(2m) metadata
  * per partition regardless of corpus size — partial aggregation does
  * the heavy lifting map-side, the exchange carries serialized
  * summaries only.
  *
  * Returns array<struct<item string, count_lb long>> sorted by
  * (count_lb desc, item asc) for a deterministic display order; NULL
  * inputs are skipped (SQL aggregate convention).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"misra_gries needs capacity >= 1, got $capacity")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lb", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // clone on FIRST insert only: the UTF8String handed to eval points
      // into a reused row buffer; a retained key must own its bytes
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None =>
          buf.update(s.clone(), 1L)
          if (buf.size > 2 * capacity) prune(buf)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (k, c) =>
      b1.update(k, b1.getOrElse(k, 0L) + c)
    }
    if (b1.size > 2 * capacity) prune(b1)
    b1
  }

  /** Batched decrement: subtract the (capacity+1)-th largest count from
    * every entry, drop non-positives — at most `capacity` entries keep a
    * positive count (only those STRICTLY above the threshold survive).
    */
  private def prune(buf: mutable.HashMap[UTF8String, Long]): Unit = {
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val thr = counts(counts.length - (capacity + 1))
    buf.filterInPlace((_, c) => c > thr)
    buf.mapValuesInPlace((_, c) => c - thr)
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    // deterministic order: count desc, item bytes asc
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(k, c)
    }.asInstanceOf[Array[Any]]): ArrayData
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGries {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** DataFrame-API surface: `misraGries($"tok", 4096)`. */
  def misraGries(col: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(col), capacity)
        .toAggregateExpression())
}
