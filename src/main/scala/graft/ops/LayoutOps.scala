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

  /** Hilbert-curve index of two non-negative integer columns on the
    * 2^bits × 2^bits grid — the curve behind Databricks liquid
    * clustering and the stronger half of the space-filling-curve
    * trade: unlike the Z-curve it has NO diagonal jumps (consecutive
    * curve positions are always grid neighbors — spec-proven
    * bijection + continuity), so range boxes touch fewer, more
    * compact runs of the curve.
    *
    * Implementation is the standard per-level fold (Wikipedia xy2d,
    * full-grid rotation so coordinates provably stay in [0, 2^bits)):
    * each level reads one bit of each coordinate, accumulates
    * s²·quadrant, and rotates/reflects the frame. The quadrant term
    * (3·rx)^ry is computed ARITHMETICALLY (3rx + ry − 2rx·ry — the
    * identity holds on {0,1}²) so no engine-specific xor is needed.
    * All exact integer CASE/add/multiply — bitwise cross-engine. The
    * per-level transforms chain as named columns (linear growth;
    * textual inlining would double per level), mirrored in the oracle
    * as a CTE chain GENERATED FROM THE SAME LOOP, so the two sides
    * cannot diverge structurally. Map-side, zero joins/shuffles — the
    * same writer contract as [[zorderLayout]].
    */
  def withHilbert(df: DataFrame, xCol: Column, yCol: Column,
                  bits: Int = 16, out: String = "hilbert"): DataFrame = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // the per-level chain materializes working columns by name; fail
    // LOUDLY rather than silently clobbering a caller column and
    // dropping it at the end
    val internal = Set("h_x", "h_y", "h_rx", "h_ry", "h_nx", "h_ny")
    val clash = df.columns.filter(c => internal(c) || c == out)
    require(clash.isEmpty,
      s"withHilbert working columns collide with input columns: ${clash.mkString(", ")}")
    val n = 1L << bits
    // Out-of-range coordinates fail LOUDLY at execution time (ADVICE r6):
    // a key above 2^bits-1 would have its high bits silently ignored —
    // Spark and oracle would still agree (same truncation), masking the
    // clustering-locality degradation. raise_error is a row-level branch
    // (map-side, codegen'd); NullType coerces to the otherwise() type.
    def checked(c: Column, axis: String): Column =
      when(c < 0L || c >= n, raise_error(concat(
        lit(s"withHilbert: $axis coordinate out of [0, $n) for bits=$bits: "),
        c.cast("string")))).otherwise(c)
    var cur = df
      .withColumn("h_x", checked(xCol.cast("long"), "x"))
      .withColumn("h_y", checked(yCol.cast("long"), "y"))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("h_rx",
          when(col("h_x").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("h_ry",
          when(col("h_y").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(out, col(out) + lit(s * s) *
          (lit(3L) * col("h_rx") + col("h_ry") -
            lit(2L) * col("h_rx") * col("h_ry")))
        .withColumn("h_nx", when(col("h_ry") === 0L,
          when(col("h_rx") === 1L, lit(n - 1) - col("h_y")).otherwise(col("h_y")))
          .otherwise(col("h_x")))
        .withColumn("h_ny", when(col("h_ry") === 0L,
          when(col("h_rx") === 1L, lit(n - 1) - col("h_x")).otherwise(col("h_x")))
          .otherwise(col("h_y")))
        .withColumn("h_x", col("h_nx")).withColumn("h_y", col("h_ny"))
    }
    cur.drop("h_x", "h_y", "h_rx", "h_ry", "h_nx", "h_ny")
  }

  /** Hilbert layout of lineitem over (part, supplier) — the liquid-
    * clustering counterpart of [[zorderLayout]], same block contract.
    */
  def hilbertLayout(lineitem: DataFrame, blockBits: Int = 10): DataFrame = {
    require(blockBits >= 0 && blockBits < 32,
      s"blockBits must be in [0, 32) for a 2x16-bit Hilbert index, got $blockBits")
    withHilbert(
      lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey")),
      col("l_partkey"), col("l_suppkey"))
      .withColumn("block", shiftrightunsigned(col("hilbert"), blockBits))
  }

  /** Realize a curve layout on disk: range-repartition on the curve key
    * (contiguous curve runs per output file), sort within partitions so
    * row groups are tight too, and write parquet. This is what makes the
    * keys computed by [[zorderLayout]]/[[hilbertLayout]] DO something:
    * each file's min/max statistics over the original predicate columns
    * become narrow boxes, so engines skip files/row-groups on 2-D range
    * predicates (spec-measured: per-file key spans shrink by an order of
    * magnitude vs an unclustered write of the same rows —
    * [[graft.LayoutOpsSpec]]).
    *
    * `repartitionByRange` samples the key to pick near-equal-sized range
    * bounds — the same one extra pass any compaction/OPTIMIZE rewrite
    * already pays; no global sort task, no driver bottleneck.
    */
  def writeClustered(df: DataFrame, path: String, curveCol: String,
                     numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, col(curveCol))
      .sortWithinPartitions(curveCol)
      .write.mode("overwrite").parquet(path)

  /** Oracle CTE chain generated from the same per-level loop as
    * [[withHilbert]] — one CTE per level carrying (h_x, h_y, hd). */
  def hilbertLayoutOracle(blockBits: Int = 10, bits: Int = 16): String = {
    val n = 1L << bits
    val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      s"""h${k + 1} AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - h_y ELSE h_y END)
         |         ELSE h_x END AS h_x,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - h_x ELSE h_x END)
         |         ELSE h_y END AS h_y,
         |    hd + ${s * s} * (3 * rx + ry - 2 * rx * ry) AS hd
         |  FROM (SELECT *,
         |          CASE WHEN (h_x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (h_y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM h$k))""".stripMargin
    }
    s"""WITH h0 AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |    CAST(l_partkey AS BIGINT) AS h_x, CAST(l_suppkey AS BIGINT) AS h_y,
       |    CAST(0 AS BIGINT) AS hd
       |  FROM lineitem),
       |${levels.mkString(",\n")}
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CAST(hd AS BIGINT) AS hilbert,
       |  CAST(hd >> $blockBits AS BIGINT) AS block
       |FROM h$bits""".stripMargin
  }
}
