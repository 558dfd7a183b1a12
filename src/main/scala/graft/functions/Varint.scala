package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expressions for the MapsForge varint codec
  * (SURVEY.md §2b; reference decode: map2db.py:285-313).
  *
  * Each generates a direct static call inside whole-stage codegen —
  * no UDF/serialization boundary, so a 100 TB scan of varint-encoded
  * tile payloads stays in the codegen'd hot loop.
  */
abstract class VarintExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  protected def codecCall: String

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VarintCodec.$codecCall($c)")
}

case class ULeb128Encode(child: Expression) extends VarintExpression {
  override def dataType: DataType = BinaryType
  override protected def codecCall: String = "encodeU"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.encodeU(v.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ULeb128Decode(child: Expression) extends VarintExpression {
  override def dataType: DataType = LongType
  override protected def codecCall: String = "decodeU"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.decodeU(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class SLeb128Encode(child: Expression) extends VarintExpression {
  override def dataType: DataType = BinaryType
  override protected def codecCall: String = "encodeS"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.encodeS(v.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class SLeb128Decode(child: Expression) extends VarintExpression {
  override def dataType: DataType = LongType
  override protected def codecCall: String = "decodeS"
  override def nullSafeEval(v: Any): Any =
    VarintCodec.decodeS(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-level API. */
object varint {
  def uleb_encode(c: Column): Column =
    GraftShim.column(ULeb128Encode(GraftShim.expression(c)))
  def uleb_decode(c: Column): Column =
    GraftShim.column(ULeb128Decode(GraftShim.expression(c)))
  def sleb_encode(c: Column): Column =
    GraftShim.column(SLeb128Encode(GraftShim.expression(c)))
  def sleb_decode(c: Column): Column =
    GraftShim.column(SLeb128Decode(GraftShim.expression(c)))
}
