package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives (SURVEY.md §2d). */
object TextCodec {
  final val Mod = 2147483647L // 2^31-1
  final val Mult = 131L

  /** Polynomial rolling hash over the UTF-8 bytes of a string —
    * the document fingerprint. Static so generated code calls it
    * directly inside whole-stage codegen. */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Mult + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }
}

/** `fingerprint(text)` as a codegen'd Catalyst expression. */
case class Fingerprint(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCodec.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodec.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextFunctions {
  def fingerprint(c: Column): Column =
    GraftShim.column(Fingerprint(GraftShim.expression(c)))

  /** Whitespace tokens of trimmed text. */
  def words(text: Column): Column = split(trim(text), " ")

  /** Distinct word n-gram shingles (n=3). */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2)))))
      .otherwise(array_distinct(array(array_join(ws, " "))))

  /** SQL fragment mirroring [[words]] for the DuckDB oracle. */
  val wordsSql = "string_split(trim(text), ' ')"

  /** SQL fragment mirroring [[shingles3]] over an alias of words. */
  def shinglesSql(w: String): String =
    s"""CASE WHEN len($w) >= 3 THEN
       |  list_distinct(list_transform(generate_series(1, len($w) - 2),
       |    i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2]))
       |ELSE list_distinct([array_to_string($w, ' ')]) END""".stripMargin
}
