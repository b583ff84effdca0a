package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT — the write-side half of scan pruning.
  * Clustering a table by a space-filling curve over two predicate
  * columns groups the rows that 2-D range queries touch, so min/max
  * file statistics skip most files for box predicates on EITHER OR BOTH
  * dimensions — the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`
  * and the classic Morton-order layout literature. A single-column
  * layout gives perfect pruning on that column and none on the other;
  * the Z-curve trades a little of the first for most of the second
  * (measured in LayoutOpsSpec: a supplier-constrained box predicate
  * touches every partkey-layout block but a small fraction of z-blocks).
  *
  * Nothing like this exists in the reference (SURVEY.md §2.7) — it is
  * part of the 100 TB extension surface: at scale the dominant cost of
  * this engine's dedup/ANN/relational scans is bytes read, and bytes
  * read is a function of layout, not just plan shape.
  *
  * Scale design: the Morton code is a per-row integer expression (16
  * codegen'd shift/mask terms per dimension — no joins, no shuffle),
  * and the BLOCK is carved from the code's high bits (`morton >>
  * blockBits`), i.e. a fixed spatial tile — so the whole layout
  * assignment is MAP-SIDE with zero exchanges. A writer realizes it
  * with one `repartitionByRange(morton)` pass (the same cost any
  * compaction rewrite already pays); a global row_number over the sort
  * would serialize into one task and is exactly what this formulation
  * avoids. Everything is exact integer arithmetic, so the registered
  * query hash-matches DuckDB bit-for-bit.
  */
object LayoutOps {

  /** Morton (Z-curve) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Disjoint targets, so the OR-accumulation is
    * a plain sum — identical arithmetic in Spark and DuckDB.
    */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftleft(shiftrightunsigned(a.cast("long"), i) % 2, 2 * i) +
        shiftleft(shiftrightunsigned(b.cast("long"), i) % 2, 2 * i + 1)
    }
  }

  private def duckMorton(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Z-order layout of lineitem over its two join-key predicate columns
    * (part, supplier): every row tagged with its Morton key and its
    * spatial block (`morton >> blockBits` — the file/row-group a
    * z-ordering writer would emit it into). At lineitem's near-uniform
    * key density the tiles are near-equal-sized; skewed domains would
    * pick blockBits from a quantile sketch the same way range
    * partitioning does.
    */
  def zorderLayout(lineitem: DataFrame, blockBits: Int = 10): DataFrame = {
    require(blockBits >= 0 && blockBits < 32,
      s"blockBits must be in [0, 32) for a 2x16-bit Morton code, got $blockBits")
    lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      .withColumn("morton", mortonCode(col("l_partkey"), col("l_suppkey")))
      .withColumn("block", shiftrightunsigned(col("morton"), blockBits))
  }

  def zorderLayoutOracle(blockBits: Int = 10): String =
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CAST(${duckMorton("l_partkey", "l_suppkey", 16)} AS BIGINT) AS morton,
       |  CAST((${duckMorton("l_partkey", "l_suppkey", 16)}) >> $blockBits AS BIGINT)
       |    AS block
       |FROM lineitem""".stripMargin
}
