package graft

import graft.functions.native
import graft.ops.PqOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The native [[graft.functions.PqEncode]] must be BIT-IDENTICAL to the
  * unrolled m × k codeword-distance formulation it replaced (which is
  * what the DuckDB oracles mirror): strict left-fold dots,
  * `(x·x − 2·x·c) + c·c` composition, first-min argmin. qerr doubles are
  * compared via raw bits, not tolerance.
  */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int): DataFrame =
    (0L until n.toLong).map { i =>
      (i, (0 until 64).map(d => math.sin(i * 64 + d + 1).toFloat))
    }.toDF("vec_id", "embedding")

  /** The pre-round-14 unrolled wide encode, verbatim (PqOps history):
    * one DotFold per (subspace, codeword) + array_min/array_position.
    */
  private def unrolledWide(corpus: DataFrame, cb: Array[Array[Seq[Double]]],
                           subDim: Int): DataFrame = {
    def dot(a: Column, b: Column): Column = native.dotFold(a, b)
    cb.indices.foldLeft(corpus) { (df, s) =>
      val xs = slice(col("emb"), s * subDim + 1, subDim)
      val dists: Array[Column] = cb(s).map { cw =>
        val cl = typedlit(cw)
        (dot(xs, xs) - lit(2.0) * dot(xs, cl)) + dot(cl, cl)
      }
      df.withColumn(s"d_$s", array(dists.toIndexedSeq: _*))
        .withColumn(s"qerr_$s", array_min(col(s"d_$s")))
        .withColumn(s"code_$s",
          (array_position(col(s"d_$s"), col(s"qerr_$s")) - 1).cast("long"))
        .drop(s"d_$s")
    }
  }

  private def emb(df: DataFrame): DataFrame =
    df.withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("emb"))

  test("pq_encode == unrolled DotFold formulation, bitwise, at m=8/k=64") {
    val corpus = emb(vecs(200))
    val cb = PqOps.trainCodebook(vecs(200), m = 8, k = 64)
    val m = cb.length
    val subDim = 64 / m
    val cols = (0 until m).flatMap(s => Seq(col(s"code_$s"), col(s"qerr_$s")))
    val ref = unrolledWide(corpus, cb, subDim)
      .select(col("vec_id") +: cols: _*).orderBy("vec_id").collect()
    val got = corpus
      .withColumn("_pq", native.pqEncode(col("emb"), cb, subDim))
      .select(col("vec_id") +:
        (0 until m).flatMap(s => Seq(
          element_at(col("_pq").getField("codes"), s + 1).as(s"code_$s"),
          element_at(col("_pq").getField("qerrs"), s + 1).as(s"qerr_$s"))): _*)
      .orderBy("vec_id").collect()
    assert(ref.length == 200 && got.length == 200)
    ref.zip(got).foreach { case (r, g) =>
      assert(r.getLong(0) == g.getLong(0))
      (0 until m).foreach { s =>
        assert(r.getLong(1 + 2 * s) == g.getLong(1 + 2 * s),
          s"code mismatch vec ${r.getLong(0)} sub $s")
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2 + 2 * s)) ==
               java.lang.Double.doubleToRawLongBits(g.getDouble(2 + 2 * s)),
          s"qerr bit mismatch vec ${r.getLong(0)} sub $s")
      }
    }
  }

  test("pq_encode argmin keeps the FIRST codeword on exact ties") {
    // duplicate codewords: index 1 and 2 are identical; a vector equal
    // to that codeword must encode to 1 (array_position semantics)
    val cw: Seq[Double] = (0 until 64).map(d => (d + 1).toDouble)
    val far: Seq[Double] = (0 until 64).map(_ => 100.0)
    val cb: Array[Array[Seq[Double]]] = Array(Array(far, cw, cw))
    val df = Seq((0L, cw.map(_.toFloat))).toDF("vec_id", "embedding")
    val row = emb(df)
      .select(native.pqEncode(col("emb"), cb, 64).as("pq"))
      .select(col("pq.codes").getItem(0), col("pq.qerrs").getItem(0))
      .head()
    assert(row.getLong(0) == 1L)
    assert(row.getDouble(1) == 0.0)
  }

  test("pq_encode is null on length mismatch, like the unrolled form") {
    val df = Seq(
      (0L, (0 until 64).map(_.toFloat)),
      (1L, (0 until 32).map(_.toFloat)) // wrong length → null struct
    ).toDF("vec_id", "embedding")
    val cb = PqOps.trainCodebook(vecs(20), m = 4, k = 8)
    val rows = emb(df)
      .withColumn("_pq", native.pqEncode(col("emb"), cb, 16))
      .select(col("vec_id"), element_at(col("_pq").getField("codes"), 1).as("c0"))
      .orderBy("vec_id").collect()
    assert(!rows(0).isNullAt(1))
    assert(rows(1).isNullAt(1))
  }

  test("pq_encode interpreted eval matches codegen (kernel is shared)") {
    val cb = PqOps.trainCodebook(vecs(30), m = 4, k = 8)
    val corpus = emb(vecs(30))
    val viaPlan = corpus
      .select(col("vec_id"), native.pqEncode(col("emb"), cb, 16).as("pq"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getStruct(1).getSeq[Long](0)))
    // force the interpreted path: evaluate the kernel directly
    val flat = cb.flatMap(_.flatMap(_.toArray))
    val cc = cb.flatMap(_.map(_.foldLeft(0.0)((a, v) => a + v * v)))
    val direct = corpus.orderBy("vec_id").collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Double](1).toArray)
      val out = graft.functions.PqEncodeKernel.eval(arr, flat, cc, 4, 8, 16)
      (r.getLong(0), out.getArray(0).toLongArray().toSeq)
    }
    assert(viaPlan.map(t => (t._1, t._2.toSeq)).toSeq == direct.toSeq)
  }
}
