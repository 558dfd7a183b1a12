package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Byte-domain media kernels (SURVEY.md §2d).
  *
  * The resample kernel is the 1-D analogue of nearest-neighbor image
  * resize: output byte i reads input byte floor(i·len/k). The real
  * pixel-domain resize would decode first (stubbed in this container —
  * no media libraries); the Spark-side contract is identical either
  * way: BinaryType → fixed-size BinaryType, codegen'd, no UDF
  * boundary, so a 100 TB thumbnail pass stays inside whole-stage
  * codegen.
  */
object MultimediaKernel {
  def resample(payload: Array[Byte], k: Int): Array[Byte] = {
    val len = payload.length
    if (len == 0) return Array.emptyByteArray
    val out = new Array[Byte](k)
    var i = 0
    while (i < k) {
      out(i) = payload((i.toLong * len / k).toInt)
      i += 1
    }
    out
  }
}

/** `byte_resample(payload, k)` — nearest-neighbor resample to k bytes. */
case class ByteResample(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"byte_resample target must be positive, got $k")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    MultimediaKernel.resample(v.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimediaKernel.resample($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Multimedia {
  def byteResample(payload: Column, k: Int): Column =
    GraftShim.column(ByteResample(GraftShim.expression(payload), k))
}
