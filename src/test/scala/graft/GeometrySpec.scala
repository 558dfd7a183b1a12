package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeomOps

class GeometrySpec extends AnyFunSuite {

  test("WKB roundtrip preserves geometry") {
    val mp = GeomOps.multiPoint(Seq((1.5, 2.5), (3.0, -4.0)))
    val back = GeomOps.fromWkb(GeomOps.toWkb(mp))
    assert(back.equalsExact(mp))
  }

  test("wkb union aggregate merges 100 fragments via cascaded batches") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 100 consecutive segments of one long road, worst-case ordering
    val segs = (0 until 100).map { i =>
      GeomOps.toWkb(GeomOps.multiLineString(
        Seq(Seq((i * 1e-4, 0.0), ((i + 1) * 1e-4, 0.0)))))
    }.reverse
    val out = segs.toDF("wkb").groupBy()
      .agg(graft.functions.GeomFunctions.unionWkb(col("wkb")).as("u"))
      .collect().head.getAs[Array[Byte]]("u")
    val g = GeomOps.fromWkb(out)
    assert(math.abs(g.getLength - 100 * 1e-4) < 1e-12)
    val env = g.getEnvelopeInternal
    assert(env.getMinX == 0.0 && math.abs(env.getMaxX - 0.01) < 1e-12)
  }

  test("clipToBox trims a line at the tile edge on the microdegree grid") {
    // line crossing the box [0,0]-[10,10] horizontally at y=5
    val line = GeomOps.lineString(Seq((-5.0, 5.0), (15.0, 5.0)))
    val clipped = GeomOps.clipToBox(line, 0, 0, 10, 10)
    assert(clipped.getGeometryType == "LineString")
    val cs = clipped.getCoordinates
    assert(cs.head.x == 0.0 && cs.last.x == 10.0)
    assert(cs.forall(_.y == 5.0))
  }

  test("clipToBox drops a geometry entirely outside (empty result)") {
    val pt = GeomOps.multiPoint(Seq((20.0, 20.0)))
    assert(GeomOps.clipToBox(pt, 0, 0, 10, 10).isEmpty)
  }

  test("clip of a polygon straddling the edge keeps the inside part") {
    val poly = GeomOps.polygon(
      Seq((5.0, 5.0), (15.0, 5.0), (15.0, 8.0), (5.0, 8.0), (5.0, 5.0)))
    val clipped = GeomOps.clipToBox(poly, 0, 0, 10, 10)
    assert(GeomOps.extractPolygons(clipped).nonEmpty)
    assert(math.abs(clipped.getArea - 15.0) < 1e-9) // 5x3 remains
  }

  test("makeValidPolygonal fixes a bowtie self-intersection") {
    // bowtie: invalid as a single ring; fixer splits into two triangles
    val bowtie = GeomOps.polygon(
      Seq((0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)))
    assert(!bowtie.isValid)
    val fixed = GeomOps.makeValidPolygonal(bowtie)
    assert(fixed.nonEmpty)
    assert(fixed.get.isValid)
    assert(math.abs(fixed.get.getArea - 8.0) < 1e-9) // two 2x2 triangles
  }

  test("union dedups identical points (cross-tile merge semantics)") {
    val a = GeomOps.multiPoint(Seq((1.0, 1.0), (2.0, 2.0)))
    val b = GeomOps.multiPoint(Seq((2.0, 2.0), (3.0, 3.0)))
    val u = GeomOps.union(a, b)
    assert(u.getNumGeometries == 3)
  }

  test("mergeLineFeature stitches exactly-touching parts") {
    val ml = GeomOps.multiLineString(Seq(
      Seq((0.0, 0.0), (1.0, 0.0)),
      Seq((1.0, 0.0), (2.0, 0.0)),
      Seq((2.0, 0.0), (3.0, 0.0))))
    val merged = GeomOps.mergeLineFeature(ml)
    assert(merged.getGeometryType == "LineString")
    assert(merged.getCoordinates.length == 4)
  }

  test("mergeLineFeature snaps endpoints within 2.1 microdegrees") {
    // second part starts 1 µdeg off the first part's end —
    // plain linemerge cannot join them, the snap pass must
    val ml = GeomOps.multiLineString(Seq(
      Seq((0.0, 0.0), (1.0, 0.0)),
      Seq((1.000001, 0.0), (2.0, 0.0))))
    assert(GeomOps.lineMerge(ml).getNumGeometries == 2) // stays split
    val merged = GeomOps.mergeLineFeature(ml)
    assert(merged.getGeometryType == "LineString",
      s"expected stitched LineString, got ${merged.toText}")
  }

  test("mergeLineFeature leaves genuinely disjoint parts unchanged") {
    val ml = GeomOps.multiLineString(Seq(
      Seq((0.0, 0.0), (1.0, 0.0)),
      Seq((5.0, 5.0), (6.0, 5.0))))
    val merged = GeomOps.mergeLineFeature(ml)
    assert(merged.getNumGeometries == 2)
  }

  test("keepLinear discards point artifacts after clip") {
    // touching the box only at a corner point plus a crossing line
    val ml = GeomOps.multiLineString(Seq(
      Seq((-5.0, 5.0), (15.0, 5.0)),
      Seq((-5.0, -5.0), (0.0, 0.0)))) // touches box corner at (0,0)
    val clipped = GeomOps.clipToBox(ml, 0, 0, 10, 10)
    val kept = GeomOps.keepLinear(clipped)
    assert(kept.nonEmpty)
    assert(GeomOps.extractLines(kept.get).size == 1)
  }

  test("normalize is canonical (same geometry, any construction order)") {
    val a = GeomOps.multiPoint(Seq((1.0, 1.0), (2.0, 2.0)))
    val b = GeomOps.multiPoint(Seq((2.0, 2.0), (1.0, 1.0)))
    assert(GeomOps.normalized(a).equalsExact(GeomOps.normalized(b)))
    assert(GeomOps.toWkb(GeomOps.normalized(a)).toSeq ==
      GeomOps.toWkb(GeomOps.normalized(b)).toSeq)
  }

  test("Douglas-Peucker simplify: vertex subset, endpoints kept, tol bound") {
    // a jittered line: y-noise of ±2e-5 around y=0 over 100 points;
    // tol 1e-4 must collapse it to (nearly) the endpoints, tol 1e-6
    // must keep every jitter vertex
    val pts = (0 until 100).map(i =>
      (i * 1e-3, if (i % 2 == 0) 2e-5 else -2e-5))
    val line = GeomOps.lineString(pts)
    val simple = GeomOps.simplify(line, 1e-4)
    val kept = simple.getCoordinates.toSeq
    val orig = line.getCoordinates.toSeq
    assert(kept.size < orig.size / 10, s"kept ${kept.size}")
    assert(kept.toSet.subsetOf(orig.toSet), "DP must keep a vertex SUBSET")
    assert(kept.head == orig.head && kept.last == orig.last)
    // deviation bound: every original vertex within tol of the result
    assert(orig.forall(c =>
      simple.distance(GeomOps.point(c.x, c.y)) <= 1e-4 + 1e-12))
    // below-noise tolerance keeps everything
    assert(GeomOps.simplify(line, 1e-6).getCoordinates.length ==
      orig.size)
    // topology-preserving variant never empties a polygon
    val ring = (0 until 36).map { i =>
      val a = i * math.Pi / 18
      (math.cos(a), math.sin(a))
    }
    val poly = GeomOps.polygon(ring :+ ring.head)
    val sp = GeomOps.simplifyPreserving(poly, 10.0)
    assert(!sp.isEmpty && sp.getArea > 0, "preserving variant collapsed")
  }
}
