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

  /** Unions the MultiPoint of all (x,y) in the group.
    *
    * The buffer is a flat interleaved coordinate list; the (set-
    * semantics) union happens ONCE at finish via distinct+normalize.
    * The obvious per-row `geom.union(point)` fold is O(n²) in point
    * copying AND pays a WKB parse+serialize per input row — this form
    * is a plain append, which is what lets map-side combine run at
    * scan speed on a 100 TB pass. */
  case class PtBuf(coords: Vector[Double])

  class PointUnionAgg extends Aggregator[PointXY, PtBuf, Array[Byte]] {
    /** Collapse -0.0 to 0.0 so the boxed-equality dedup below agrees
      * with JTS's IEEE == coordinate equality (java.lang.Double
      * treats -0.0 and 0.0 as DISTINCT, which would leave a phantom
      * extra point in groups containing both zero signs). */
    private def canon(v: Double): Double = v + 0.0
    override def zero: PtBuf = PtBuf(Vector.empty)
    override def reduce(buf: PtBuf, p: PointXY): PtBuf =
      PtBuf(buf.coords :+ canon(p.x) :+ canon(p.y))
    override def merge(a: PtBuf, b: PtBuf): PtBuf =
      PtBuf(a.coords ++ b.coords)
    override def finish(buf: PtBuf): Array[Byte] =
      if (buf.coords.isEmpty) Array.emptyByteArray
      else {
        val pts = buf.coords.grouped(2).map(c => (c(0), c(1)))
          .toSeq.distinct
        GeomOps.toWkb(GeomOps.normalized(GeomOps.multiPoint(pts)))
      }
    override def bufferEncoder: Encoder[PtBuf] = Encoders.product[PtBuf]
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
