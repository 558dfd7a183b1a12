package graft.functions

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryFixer
import org.locationtech.jts.io.{WKBReader, WKBWriter}
import org.locationtech.jts.operation.linemerge.LineMerger
import org.locationtech.jts.operation.overlayng.OverlayNG

import scala.jdk.CollectionConverters._

/** Geometry kernel on JTS (SURVEY.md §2c).
  *
  * shapely (the reference's geometry library) is a binding to GEOS,
  * the C++ port of JTS — so these are the same algorithms the
  * reference runs, JVM-native. All functions are pure and
  * serializable-safe (the factory is per-call or static), used inside
  * typed Aggregators / mapGroups where a shuffle already co-located
  * the feature's fragments.
  */
object GeomOps {
  private val gf = new GeometryFactory(new PrecisionModel(), 4326)
  /** microdegree grid — the reference's grid_size=0.000001
    * (map2db.py:846,912,1018). */
  private val microGridScale = 1e6

  // ---- constructors -------------------------------------------------
  def point(x: Double, y: Double): Point = gf.createPoint(new Coordinate(x, y))

  def multiPoint(pts: Seq[(Double, Double)]): MultiPoint =
    gf.createMultiPoint(
      pts.map(p => gf.createPoint(new Coordinate(p._1, p._2))).toArray)

  def lineString(pts: Seq[(Double, Double)]): LineString =
    gf.createLineString(pts.map(p => new Coordinate(p._1, p._2)).toArray)

  def multiLineString(lines: Seq[Seq[(Double, Double)]]): MultiLineString =
    gf.createMultiLineString(lines.map(lineString).toArray)

  def polygon(shell: Seq[(Double, Double)],
      holes: Seq[Seq[(Double, Double)]] = Nil): Polygon =
    gf.createPolygon(
      gf.createLinearRing(shell.map(p => new Coordinate(p._1, p._2)).toArray),
      holes.map(h => gf.createLinearRing(
        h.map(p => new Coordinate(p._1, p._2)).toArray)).toArray)

  def multiPolygon(polys: Seq[Polygon]): MultiPolygon =
    gf.createMultiPolygon(polys.toArray)

  def box(minX: Double, minY: Double, maxX: Double, maxY: Double): Geometry = {
    val e = new Envelope(minX, maxX, minY, maxY)
    gf.toGeometry(e)
  }

  // ---- WKB ----------------------------------------------------------
  def toWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)
  def fromWkb(b: Array[Byte]): Geometry = new WKBReader(gf).read(b)

  // ---- reference operations ----------------------------------------
  /** `tile_box.intersection(geom, grid_size=1e-6)` — snap-to-grid
    * overlay on the microdegree lattice (map2db.py:846,912,1018). */
  def clipToBox(g: Geometry, minX: Double, minY: Double, maxX: Double,
      maxY: Double): Geometry =
    OverlayNG.overlay(g, box(minX, minY, maxX, maxY), OverlayNG.INTERSECTION,
      new PrecisionModel(microGridScale))

  /** Whether the box fully covers g (used to skip needless clips,
    * map2db.py:907). */
  def boxCovers(g: Geometry, minX: Double, minY: Double, maxX: Double,
      maxY: Double): Boolean =
    box(minX, minY, maxX, maxY).covers(g)

  /** shapely make_valid (map2db.py:984), incl. the reference's
    * "collect only polygons from a collection" fallback (988-1003):
    * returns None-equivalent (empty) when nothing polygonal remains. */
  def makeValidPolygonal(g: Geometry): Option[Geometry] = {
    if (g.isValid) return Some(g)
    val fixed = GeometryFixer.fix(g)
    val polys = extractPolygons(fixed)
    if (polys.isEmpty) None
    else {
      val mp = multiPolygon(polys)
      if (mp.isValid) Some(mp) else None
    }
  }

  def extractPolygons(g: Geometry): Seq[Polygon] = g match {
    case p: Polygon => Seq(p)
    case mp: MultiPolygon =>
      (0 until mp.getNumGeometries).map(mp.getGeometryN(_).asInstanceOf[Polygon])
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).map(gc.getGeometryN)
        .flatMap(extractPolygons)
    case _ => Nil
  }

  def extractLines(g: Geometry): Seq[LineString] = g match {
    case l: LineString => Seq(l)
    case ml: MultiLineString =>
      (0 until ml.getNumGeometries)
        .map(ml.getGeometryN(_).asInstanceOf[LineString])
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).map(gc.getGeometryN).flatMap(extractLines)
    case _ => Nil
  }

  /** Post-clip filtering for the lines table: keep only linear parts,
    * discard point intersections (map2db.py:918-930). */
  def keepLinear(g: Geometry): Option[Geometry] = {
    val ls = extractLines(g)
    if (ls.isEmpty) None
    else if (ls.size == 1) Some(ls.head)
    else Some(gf.createMultiLineString(ls.toArray))
  }

  /** Post-clip filtering for the areas table (map2db.py:1024-1036). */
  def keepPolygonal(g: Geometry): Option[Geometry] = {
    val ps = extractPolygons(g)
    if (ps.isEmpty) None
    else if (ps.size == 1) Some(ps.head)
    else Some(multiPolygon(ps))
  }

  def normalized(g: Geometry): Geometry = { val c = g.copy(); c.normalize(); c }

  /** Douglas–Peucker simplification (JTS) — the zoom-dependent
    * geometry thinning a tile renderer applies before encoding lower
    * zoom levels (fewer vertices per on-screen pixel; shapely's
    * `simplify(preserve_topology=False)` is this class). Vertices of
    * the result are a subset of the input's; endpoints are kept;
    * max deviation ≤ tol. */
  def simplify(g: Geometry, tol: Double): Geometry =
    org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(g, tol)

  /** Topology-preserving variant (shapely `preserve_topology=True`,
    * the default map2db-style choice for polygons — rings can't
    * collapse or self-cross under it). */
  def simplifyPreserving(g: Geometry, tol: Double): Geometry =
    org.locationtech.jts.simplify.TopologyPreservingSimplifier
      .simplify(g, tol)

  def union(a: Geometry, b: Geometry): Geometry = a.union(b)

  /** N-way union via JTS UnaryUnionOp (cascaded) — O(n log n)-ish vs
    * the O(n²) point copying of a pairwise left fold. */
  def unionAll(gs: Seq[Geometry]): Geometry = {
    val coll = new java.util.ArrayList[Geometry](gs.size)
    gs.foreach(coll.add)
    org.locationtech.jts.operation.union.UnaryUnionOp.union(coll)
  }

  /** JTS linemerge — shapely's linemerge is this class. */
  def lineMerge(g: Geometry): Geometry = {
    val merger = new LineMerger()
    merger.add(g)
    val merged = merger.getMergedLineStrings.asScala.toSeq
      .map(_.asInstanceOf[LineString])
    if (merged.size == 1) merged.head
    else gf.createMultiLineString(merged.toArray)
  }

  /** The reference's full line-merge pass (map2db.py:1080-1171):
    * linemerge; if still multi-part, snap each part's endpoints to
    * matching endpoints of preceding parts within tol (2.1
    * microdegrees), then linemerge again. Returns the improved
    * geometry only when the part count dropped (map2db.py:1163-1171),
    * else the input unchanged. */
  def mergeLineFeature(g: Geometry, tol: Double = 0.0000021): Geometry = {
    g match {
      case ml: MultiLineString if ml.getNumGeometries > 1 =>
        val gcount = ml.getNumGeometries
        var merged = lineMerge(ml)
        if (merged.isInstanceOf[MultiLineString] &&
          merged.getNumGeometries > 1) {
          val coords = merged.asInstanceOf[MultiLineString] match {
            case m =>
              (0 until m.getNumGeometries)
                .map(m.getGeometryN(_).asInstanceOf[LineString])
                .map(_.getCoordinateSequence.toCoordinateArray.toBuffer)
                .toArray
          }
          for (i <- 1 until coords.length; j <- 0 until i) {
            val ci = coords(i); val cj = coords(j)
            if (math.abs(ci.head.x - cj.last.x) <= tol &&
              math.abs(ci.head.y - cj.last.y) <= tol)
              ci(0) = new Coordinate(cj.last)
            if (math.abs(ci.last.x - cj.head.x) <= tol &&
              math.abs(ci.last.y - cj.head.y) <= tol)
              ci(ci.length - 1) = new Coordinate(cj.head)
          }
          merged = lineMerge(gf.createMultiLineString(
            coords.map(c => gf.createLineString(c.toArray))))
        }
        if (merged.isInstanceOf[LineString] ||
          merged.getNumGeometries < gcount) normalized(merged)
        else g
      case other => other
    }
  }
}
