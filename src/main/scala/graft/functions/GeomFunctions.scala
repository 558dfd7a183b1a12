package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import org.locationtech.jts.geom.Geometry

/** Spark-facing geometry operators (SURVEY.md §2c).
  *
  * The union aggregate is the engine form of map2db's cross-tile
  * geometry merge (map2db.py:776-784): fragments of one feature are
  * co-located by the groupBy shuffle and unioned with partial
  * (map-side) combining — the reference's row-at-a-time
  * SELECT→union→UPDATE loop becomes one associative aggregate.
  */
object GeomFunctions {

  case class PointXY(x: Double, y: Double)

  /** Unions the MultiPoint of all (x,y) in the group; buffer and
    * result travel as WKB bytes so Tungsten handles them natively. */
  class PointUnionAgg extends Aggregator[PointXY, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(buf: Array[Byte], p: PointXY): Array[Byte] = {
      val pt = GeomOps.point(p.x, p.y)
      if (buf.isEmpty) GeomOps.toWkb(pt)
      else GeomOps.toWkb(GeomOps.union(GeomOps.fromWkb(buf), pt))
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else GeomOps.toWkb(GeomOps.union(GeomOps.fromWkb(a), GeomOps.fromWkb(b)))
    override def finish(buf: Array[Byte]): Array[Byte] =
      if (buf.isEmpty) buf
      else GeomOps.toWkb(GeomOps.normalized(GeomOps.fromWkb(buf)))
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Generic WKB union aggregate — any geometry type.
    *
    * Fragments accumulate as a WKB list and compact through JTS's
    * cascaded union in batches of [[UnionBatch]]: a feature spanning
    * hundreds of tiles (a long road) costs O(n log n) instead of the
    * O(n²) point copying of a pairwise left fold, while the batch
    * bound keeps the Tungsten buffer row small for map-side combine. */
  case class GeomParts(parts: Seq[Array[Byte]])
  val UnionBatch = 16

  class WkbUnionAgg extends Aggregator[Array[Byte], GeomParts, Array[Byte]] {
    private def compact(parts: Seq[Array[Byte]]): Seq[Array[Byte]] =
      if (parts.size < UnionBatch) parts
      else Seq(GeomOps.toWkb(GeomOps.unionAll(parts.map(GeomOps.fromWkb))))
    override def zero: GeomParts = GeomParts(Vector.empty)
    override def reduce(buf: GeomParts, wkb: Array[Byte]): GeomParts =
      GeomParts(compact(buf.parts :+ wkb))
    override def merge(a: GeomParts, b: GeomParts): GeomParts =
      GeomParts(compact(a.parts ++ b.parts))
    override def finish(buf: GeomParts): Array[Byte] = buf.parts match {
      case Seq() => Array.emptyByteArray
      case Seq(one) =>
        GeomOps.toWkb(GeomOps.normalized(GeomOps.fromWkb(one)))
      case many => GeomOps.toWkb(GeomOps.normalized(
        GeomOps.unionAll(many.map(GeomOps.fromWkb))))
    }
    override def bufferEncoder: Encoder[GeomParts] =
      Encoders.product[GeomParts]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `union_points(x, y)` as an untyped aggregate Column. */
  def unionPoints(x: Column, y: Column): Column =
    udaf(new PointUnionAgg, Encoders.product[PointXY]).apply(x, y)

  def unionWkb(wkb: Column): Column =
    udaf(new WkbUnionAgg, Encoders.BINARY).apply(wkb)

  /** Number of component geometries in a WKB value (post-aggregation
    * decoration; tiny cardinality, evaluated via deserialization). */
  def numGeometries(wkb: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0 else GeomOps.fromWkb(b).getNumGeometries
    }
    f(wkb)
  }

  def wkt(wkb: Column): Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null || b.isEmpty) "" else GeomOps.fromWkb(b).toText
    }
    f(wkb)
  }
}
