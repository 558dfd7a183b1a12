package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dense float-vector kernels (SURVEY.md §2d).
  *
  * One pass accumulates the dot product and both norms together — the
  * HOF formulation (`aggregate(zip_with(...))`) walks the arrays three
  * times and materializes a zipped array per pair. Accumulation is in
  * index order, so results are bit-identical to the sequential HOF
  * fold (and to the DuckDB oracle's `list_sum(list_transform(...))`).
  * Assumes equal-length vectors, as an embedding column guarantees.
  */
object VectorKernel {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** L2 norm in index order — bit-identical to
    * `sqrt(aggregate(transform(v, x*x), 0.0, +))` without the
    * interpreted fold or the squared intermediate array. */
  def l2Norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }
}

/** `cosine(a, b)` over two float arrays as a codegen'd expression. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernel.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `l2_norm(a)` over a float array as a codegen'd expression. */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VectorKernel.l2Norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernel.l2Norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Vectors {
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a),
      GraftShim.expression(b)))
  def l2Norm(a: Column): Column =
    GraftShim.column(L2Norm(GraftShim.expression(a)))
}
