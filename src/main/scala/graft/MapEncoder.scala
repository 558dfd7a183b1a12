package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.functions.VarintCodec
import graft.sources.Mapsforge

/** MapsForge binary map encoder — the write-side inverse of the wire
  * format the reader parses. Used by the round-trip specs and by the
  * g13 pipeline benchmark to synthesize maps of arbitrary size
  * (POIs/ways incl. double-delta coords, multi-block polygons,
  * variable tags and names).
  */
object MapEncoder {

  case class PoiSpec(tileZ: Int, lat: Double, lon: Double, layer: Int,
      tagIdx: Seq[Int], vtagValues: Seq[Any] = Nil,
      name: Option[String] = None, houseNum: Option[String] = None,
      elevation: Option[Long] = None)

  case class WaySpec(tileZ: Int, layer: Int, tagIdx: Seq[Int],
      vtagValues: Seq[Any] = Nil, name: Option[String] = None,
      ref: Option[String] = None,
      labelOffset: Option[(Double, Double)] = None,
      doubleDelta: Boolean = false,
      // data blocks -> coordinate blocks -> (lon, lat)
      blocks: Seq[Seq[Seq[(Double, Double)]]])

  case class TileSpec(x: Long, y: Long, pois: Seq[PoiSpec] = Nil,
      ways: Seq[WaySpec] = Nil)

  case class SubfileSpec(level: Int, minzoom: Int, maxzoom: Int,
      tiles: Seq[TileSpec])

  case class MapSpec(minLat: Double, minLon: Double, maxLat: Double,
      maxLon: Double, poiTags: Seq[String], wayTags: Seq[String],
      subfiles: Seq[SubfileSpec], comment: Option[String] = None,
      createdBy: Option[String] = None, debugInfo: Boolean = false)

  private class Out {
    val b = new ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def s32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    def u64(v: Long): Unit = { s32((v >>> 32).toInt); s32(v.toInt) }
    def f32(v: Float): Unit = s32(java.lang.Float.floatToIntBits(v))
    def vu(v: Long): Unit = b.write(VarintCodec.encodeU(v))
    def vs(v: Long): Unit = b.write(VarintCodec.encodeS(v))
    def raw(x: Array[Byte]): Unit = b.write(x)
    def lstr(s: String): Unit = {
      val x = s.getBytes(StandardCharsets.UTF_8); vu(x.length); raw(x)
    }
    def bytes: Array[Byte] = b.toByteArray
  }

  private def md(deg: Double): Long = math.rint(deg * 1e6).toLong

  private def writeVtagValues(o: Out, tags: Seq[String], vals: Seq[Any])
      : Unit = {
    val typed = tags.filter(t => t.endsWith("=%i") || t.endsWith("=%f") ||
      t.endsWith("=%h") || t.endsWith("=%s"))
    require(typed.size == vals.size,
      s"need ${typed.size} vtag values, got ${vals.size}")
    typed.zip(vals).foreach {
      case (t, v) if t.endsWith("=%i") => o.s32(v.asInstanceOf[Int])
      case (t, v) if t.endsWith("=%f") => o.f32(v.asInstanceOf[Float])
      case (t, v) if t.endsWith("=%h") => o.u16(v.asInstanceOf[Int])
      case (t, v) if t.endsWith("=%s") => o.lstr(v.asInstanceOf[String])
      case _ => ()
    }
  }

  private def pad32(s: String): Array[Byte] =
    java.util.Arrays.copyOf(s.getBytes(StandardCharsets.US_ASCII), 32)

  private def encodePoi(p: PoiSpec, originLatMd: Long, originLonMd: Long,
      dict: Seq[String]): Array[Byte] = {
    val o = new Out
    o.vs(md(p.lat) - originLatMd)
    o.vs(md(p.lon) - originLonMd)
    o.u8(((p.layer + 5) << 4) | p.tagIdx.size)
    p.tagIdx.foreach(i => o.vu(i))
    writeVtagValues(o, p.tagIdx.map(dict), p.vtagValues)
    var flags = 0
    if (p.name.isDefined) flags |= 0x80
    if (p.houseNum.isDefined) flags |= 0x40
    if (p.elevation.isDefined) flags |= 0x20
    o.u8(flags)
    p.name.foreach(o.lstr)
    p.houseNum.foreach(o.lstr)
    p.elevation.foreach(o.vu)
    o.bytes
  }

  private def encodeWay(w: WaySpec, originLatMd: Long, originLonMd: Long,
      dict: Seq[String]): Array[Byte] = {
    val body = new Out
    body.u16(0) // subtile bitmap (unused by the parser)
    body.u8(((w.layer + 5) << 4) | w.tagIdx.size)
    w.tagIdx.foreach(i => body.vu(i))
    writeVtagValues(body, w.tagIdx.map(dict), w.vtagValues)
    var flags = 0
    if (w.name.isDefined) flags |= 0x80
    if (w.ref.isDefined) flags |= 0x20
    if (w.labelOffset.isDefined) flags |= 0x10
    if (w.blocks.size != 1) flags |= 0x08
    if (w.doubleDelta) flags |= 0x04
    body.u8(flags)
    w.name.foreach(body.lstr)
    w.ref.foreach(body.lstr)
    w.labelOffset.foreach { case (dlat, dlon) =>
      body.vs(md(dlat)); body.vs(md(dlon))
    }
    if (w.blocks.size != 1) body.vu(w.blocks.size)
    w.blocks.foreach { dblock =>
      body.vu(dblock.size)
      dblock.foreach { cblock =>
        body.vu(cblock.size)
        var latPrev = originLatMd; var lonPrev = originLonMd
        var dLatPrev = 0L; var dLonPrev = 0L
        cblock.zipWithIndex.foreach { case ((lon, lat), n) =>
          val dLat = md(lat) - latPrev
          val dLon = md(lon) - lonPrev
          if (w.doubleDelta && n > 1) {
            body.vs(dLat - dLatPrev); body.vs(dLon - dLonPrev)
          } else {
            body.vs(dLat); body.vs(dLon)
          }
          dLatPrev = dLat; dLonPrev = dLon
          latPrev = md(lat); lonPrev = md(lon)
        }
      }
    }
    val o = new Out
    val bb = body.bytes
    o.vu(bb.length)
    o.raw(bb)
    o.bytes
  }

  private def encodeTile(sf: SubfileSpec, t: TileSpec, poiDict: Seq[String],
      wayDict: Seq[String], debugInfo: Boolean): Array[Byte] = {
    val originLatMd = md(Mapsforge.latFromY(sf.level, t.y))
    val originLonMd = md(Mapsforge.lonFromX(sf.level, t.x))
    val o = new Out
    if (debugInfo) o.raw(pad32(s"###TileStart${t.x},${t.y}###"))
    for (z <- sf.minzoom to sf.maxzoom) {
      o.vu(t.pois.count(_.tileZ == z))
      o.vu(t.ways.count(_.tileZ == z))
    }
    val poiBytes = t.pois.sortBy(_.tileZ).map { p =>
      val body = encodePoi(p, originLatMd, originLonMd, poiDict)
      if (debugInfo) pad32("***POIStart***") ++ body else body
    }
    val wayBytes = t.ways.sortBy(_.tileZ).map { w =>
      val body = encodeWay(w, originLatMd, originLonMd, wayDict)
      if (debugInfo) pad32("---WayStartX---") ++ body else body
    }
    val poiTotal = poiBytes.map(_.length).sum
    o.vu(poiTotal) // first-way offset relative to after this varint
    poiBytes.foreach(o.raw)
    wayBytes.foreach(o.raw)
    o.bytes
  }

  /** Encode the map and return the raw bytes. */
  def encode(m: MapSpec): Array[Byte] = {
    // subfile bodies: tile index (5 B/tile) + tile payloads
    val subfileBodies = m.subfiles.map { sf =>
      val minX = Mapsforge.xFromLon(sf.level, m.minLon).toLong
      val maxX = Mapsforge.xFromLon(sf.level, m.maxLon).toLong
      val minY = Mapsforge.yFromLat(sf.level, m.maxLat).toLong
      val maxY = Mapsforge.yFromLat(sf.level, m.minLat).toLong
      val xCount = maxX - minX + 1
      val tileCount = (xCount * (maxY - minY + 1)).toInt
      val byPos = m.subfiles.find(_ == sf).get.tiles
        .map(t => ((t.y - minY) * xCount + (t.x - minX)).toInt -> t).toMap
      val payloads = (0 until tileCount).map { i =>
        byPos.get(i)
          .map(encodeTile(sf, _, m.poiTags, m.wayTags, m.debugInfo))
          .getOrElse(Array.emptyByteArray)
      }
      val indexSize = tileCount * 5 + (if (m.debugInfo) 16 else 0)
      val offsets = payloads.scanLeft(indexSize.toLong)(_ + _.length)
      val o = new Out
      if (m.debugInfo)
        o.raw("+++IndexStart+++".getBytes(StandardCharsets.US_ASCII))
      offsets.init.foreach { off =>
        o.u8(((off >> 32) & 0x7F).toInt); o.s32(off.toInt)
      }
      payloads.foreach(o.raw)
      o.bytes
    }

    // header
    val h = new Out
    h.raw("mapsforge binary OSM".getBytes(StandardCharsets.US_ASCII))
    h.s32(0); h.s32(0) // header size, file version (unread)
    h.u64(0); h.u64(0) // file size, creation date (unread)
    h.s32(md(m.minLat).toInt); h.s32(md(m.minLon).toInt)
    h.s32(md(m.maxLat).toInt); h.s32(md(m.maxLon).toInt)
    h.u16(256) // tile pixel size
    h.lstr("Mercator")
    var flags = 0
    if (m.debugInfo) flags |= 0x80
    if (m.comment.isDefined) flags |= 0x08
    if (m.createdBy.isDefined) flags |= 0x04
    h.u8(flags)
    m.comment.foreach(h.lstr)
    m.createdBy.foreach(h.lstr)
    h.u16(m.poiTags.size); m.poiTags.foreach(h.lstr)
    h.u16(m.wayTags.size); m.wayTags.foreach(h.lstr)
    h.u8(m.subfiles.size)
    val headerSize = {
      // subfile table: 3 + 8 + 8 bytes each
      h.bytes.length + m.subfiles.size * 19
    }
    var offset = headerSize.toLong
    m.subfiles.zip(subfileBodies).foreach { case (sf, body) =>
      h.u8(sf.level); h.u8(sf.minzoom); h.u8(sf.maxzoom)
      h.u64(offset); h.u64(body.length)
      offset += body.length
    }
    val out = new ByteArrayOutputStream()
    out.write(h.bytes)
    subfileBodies.foreach(out.write)
    out.toByteArray
  }

  def writeToTemp(m: MapSpec): String = {
    val f = java.io.File.createTempFile("graft-test", ".map")
    f.deleteOnExit()
    val fos = new java.io.FileOutputStream(f)
    fos.write(encode(m)); fos.close()
    f.getAbsolutePath
  }
}
