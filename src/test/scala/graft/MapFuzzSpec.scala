package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.MapEncoder._
import graft.sources.Mapsforge

/** Randomized wire-format round-trip: 300 seeded-random POIs and 120
  * ways (random layers, tag subsets, every vtag type, names,
  * elevations, multi-block / double-delta coords) encode into a .map
  * and must decode bit-exactly through the distributed reader. The
  * fixed-fixture specs pin known corners; this sweeps the space
  * between them.
  */
class MapFuzzSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val poiTags = Seq("amenity=cafe", "place=town", "shop=bakery",
    "__dbl_pnum=%i", "population=%i", "height=%f", "width=%h", "note=%s")
  private val wayTags = Seq("highway=primary", "waterway=river",
    "__dbl_lnum=%i", "lanes=%i", "name:en=%s",
    "_lbd_=" + "ODbL-1.0".reverse)

  private val tiles = Seq((532L, 340L), (533L, 340L))
  private def md(deg: Double): Long = math.rint(deg * 1e6).toLong

  test("randomized maps round-trip exactly through the reader") {
    val rnd = new scala.util.Random(20260812L)
    // a random µdeg-exact position inside the given level-10 tile
    def pos(tx: Long, ty: Long): (Double, Double) = {
      val lonW = Mapsforge.lonFromX(10, tx)
      val lonE = Mapsforge.lonFromX(10, tx + 1)
      val latS = Mapsforge.latFromY(10, ty + 1)
      val latN = Mapsforge.latFromY(10, ty)
      def q(lo: Double, hi: Double) =
        (md(lo) + 1 + rnd.nextInt((md(hi) - md(lo) - 2).toInt)) / 1e6
      (q(lonW, lonE), q(latS, latN))
    }

    case class PoiGen(pnum: Int, spec: PoiSpec, fixed: Seq[String],
        vtags: Map[String, String])
    case class WayGen(lnum: Int, spec: WaySpec,
        coords: Seq[Seq[Seq[(Double, Double)]]])

    val pois = (0 until 300).map { pnum =>
      val (tx, ty) = tiles(rnd.nextInt(tiles.length))
      val (lon, lat) = pos(tx, ty)
      val fixedIdx = Seq(0, 1, 2).filter(_ => rnd.nextBoolean())
      val pop = if (rnd.nextBoolean()) Some(rnd.nextInt(1000000)) else None
      val h = if (rnd.nextBoolean()) Some(rnd.nextInt(400) / 4.0f) else None
      // %h is a SIGNED 16-bit on the wire (reference semantics)
      val wdt = if (rnd.nextBoolean())
        Some(rnd.nextInt(65536) - 32768) else None
      val note = if (rnd.nextBoolean())
        Some(s"n${rnd.nextInt(1000)} x") else None
      val typedIdx = Seq(Some(3), pop.map(_ => 4), h.map(_ => 5),
        wdt.map(_ => 6), note.map(_ => 7)).flatten
      val vals: Seq[Any] = Seq(Some(Int.box(pnum)), pop.map(Int.box),
        h.map(Float.box), wdt.map(Int.box), note).flatten
      val name = if (rnd.nextBoolean()) Some(s"poi$pnum") else None
      val elev = if (rnd.nextBoolean())
        Some(rnd.nextInt(3000).toLong) else None
      val spec = PoiSpec(tileZ = 9 + rnd.nextInt(3), lat = lat, lon = lon,
        layer = rnd.nextInt(16) - 5, tagIdx = fixedIdx ++ typedIdx,
        vtagValues = vals, name = name,
        houseNum = if (rnd.nextBoolean()) Some(s"${pnum}a") else None,
        elevation = elev)
      val vt = Map.empty[String, String] ++
        pop.map(p => "population" -> p.toString) ++
        h.map(v => "height" -> v.toString) ++
        wdt.map(v => "width" -> v.toString) ++
        note.map(v => "note" -> v) ++
        name.map(n => "m2db_name" -> n) ++
        elev.map(e => "m2db_elevation" -> e.toString)
      PoiGen(pnum, spec, fixedIdx.map(poiTags), vt)
    }

    val ways = (0 until 120).map { lnum =>
      val (tx, ty) = tiles(rnd.nextInt(tiles.length))
      val blocks = (0 until 1 + rnd.nextInt(2)).map { _ =>
        (0 until 1 + rnd.nextInt(2)).map { _ =>
          (0 until 2 + rnd.nextInt(5)).map(_ => pos(tx, ty))
        }
      }
      val spec = WaySpec(tileZ = 9 + rnd.nextInt(3),
        layer = rnd.nextInt(16) - 5, tagIdx = Seq(rnd.nextInt(2), 2),
        vtagValues = Seq(Int.box(lnum)),
        name = if (rnd.nextBoolean()) Some(s"way$lnum") else None,
        doubleDelta = rnd.nextBoolean(), blocks = blocks)
      WayGen(lnum, spec, blocks)
    }

    val tileSpecs = tiles.map { case (tx, ty) =>
      val lonW = Mapsforge.lonFromX(10, tx)
      val lonE = Mapsforge.lonFromX(10, tx + 1)
      TileSpec(tx, ty,
        pois = pois.filter(p =>
          p.spec.lon >= lonW && p.spec.lon < lonE).map(_.spec),
        ways = ways.filter(w =>
          w.coords.head.head.head._1 >= lonW &&
            w.coords.head.head.head._1 < lonE).map(_.spec))
    }
    val mapSpec = MapSpec(minLat = 51.5, minLon = 7.1, maxLat = 51.6,
      maxLon = 7.6, poiTags = poiTags, wayTags = wayTags,
      subfiles = Seq(SubfileSpec(10, 9, 11, tileSpecs)))
    val path = MapEncoder.writeToTemp(mapSpec)

    val (decodedPois, decodedWays) = Mapsforge.scan(spark, path)
    val gotPois = decodedPois.collect()
      .map(p => p.pnum.get.toInt -> p).toMap
    assert(gotPois.size == pois.size)
    pois.foreach { g =>
      val p = gotPois(g.pnum)
      assert(md(p.lat) == md(g.spec.lat) && md(p.lon) == md(g.spec.lon),
        s"poi ${g.pnum} coords")
      assert(p.layer == g.spec.layer, s"poi ${g.pnum} layer")
      assert(p.minz == g.spec.tileZ, s"poi ${g.pnum} zoom")
      assert(p.tags == g.fixed, s"poi ${g.pnum} tags")
      g.vtags.foreach { case (k, v) =>
        assert(p.vtags.get(k).contains(v), s"poi ${g.pnum} vtag $k: " +
          s"${p.vtags.get(k)} != $v")
      }
    }
    val gotWays = decodedWays.collect()
      .map(w => w.lnum.get.toInt -> w).toMap
    assert(gotWays.size == ways.size)
    ways.foreach { g =>
      val w = gotWays(g.lnum)
      assert(w.layer == g.spec.layer, s"way ${g.lnum} layer")
      val got = w.coords.map(_.map(_.map(c => (md(c.lon), md(c.lat)))))
      // line ways flatten data blocks on decode (each coordinate
      // block is one linestring — reference semantics, map2db.py:648)
      val want = Seq(g.coords.flatten.map(_.map { case (lon, lat) =>
        (md(lon), md(lat)) }))
      assert(got == want, s"way ${g.lnum} coords")
    }
  }
}
