package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint (winnowing-style):
  * `winnow60(text) -> long` = min over all `W`-char windows of the
  * polynomial hash h(s) = fold(h*B + codepoint) mod P, with B=257,
  * P=2^31-1 (products stay < 2^40 — no overflow divergence between
  * engines). Texts shorter than the window hash as one whole-text window.
  *
  * Native O(n) via the Rabin-Karp rolling update
  * h' = (h - s[i]*B^(W-1))*B + s[i+W] mod P, which equals the per-window
  * naive fold the DuckDB oracle computes — so values hash-match exactly.
  * This is the streaming-friendly content-defined fingerprint for chunk
  * dedup: one pass, constant memory per document.
  *
  * ASCII-only contract (shared with the multimodal substr-on-text
  * oracles): the JVM side hashes UTF-16 code units while the DuckDB
  * oracle hashes per-character codepoints via ascii(substr(...)), which
  * agree iff every char is a single code unit with a single-byte
  * codepoint. The test corpus is ASCII; an encoding-stable variant would
  * hash UTF-8 bytes on both sides.
  */
case class Winnow60(child: Expression, window: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "winnow60"

  private val P = 2147483647L  // 2^31 - 1
  private val B = 257L
  // B^(W-1) mod P, for the rolling subtract-leading-char step
  private lazy val bPow: Long = {
    var r = 1L; var i = 0
    while (i < window - 1) { r = r * B % P; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n <= window) {
      var h = 0L; var j = 0
      while (j < n) { h = (h * B + s.charAt(j)) % P; j += 1 }
      h
    } else {
      var h = 0L; var j = 0
      while (j < window) { h = (h * B + s.charAt(j)) % P; j += 1 }
      var min = h
      var i = 0
      while (i + window < n) {
        // remove s(i), append s(i+window); keep everything in [0, P)
        h = ((h - s.charAt(i) * bPow % P + P) % P * B + s.charAt(i + window)) % P
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow60 =
    copy(child = newChild)

  /** Codegen body — same rolling loop as eval (pure integer/char work, so
    * unlike the md5-bound hashes this one benefits from staying inside
    * whole-stage codegen).
    */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      s"""
         |String $s = $input.toString();
         |int $n = $s.length();
         |long $h = 0L;
         |if ($n <= $window) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $h = ($h * ${B}L + $s.charAt($j)) % ${P}L;
         |  }
         |  ${ev.value} = $h;
         |} else {
         |  for (int $j = 0; $j < $window; $j++) {
         |    $h = ($h * ${B}L + $s.charAt($j)) % ${P}L;
         |  }
         |  long $min = $h;
         |  for (int $i = 0; $i + $window < $n; $i++) {
         |    $h = (($h - $s.charAt($i) * ${bPow}L % ${P}L + ${P}L) % ${P}L * ${B}L
         |          + $s.charAt($i + $window)) % ${P}L;
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })
}

object Winnow60 {
  val DefaultWindow = 32

  def winnow60(text: Column, window: Int = DefaultWindow): Column =
    ColumnBridge.column(Winnow60(ColumnBridge.expression(text), window))

  /** The same fingerprint as DuckDB SQL (naive per-window fold — the
    * oracle doesn't need to be fast, only equal).
    */
  def duckSql(textExpr: String, window: Int = DefaultWindow): String =
    s"""CASE WHEN length($textExpr) <= $window THEN
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(1, length($textExpr) + 1),
       |      j -> CAST(ascii(substr($textExpr, CAST(j AS INT), 1)) AS BIGINT))),
       |    (h, c) -> (h * 257 + c) % 2147483647)
       |ELSE
       |  list_min(list_transform(range(0, length($textExpr) - $window + 1), i ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, $window + 1),
       |        j -> CAST(ascii(substr($textExpr, CAST(i + j AS INT), 1)) AS BIGINT))),
       |      (h, c) -> (h * 257 + c) % 2147483647)))
       |END""".stripMargin
}
