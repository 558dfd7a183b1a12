package graft.functions

/** Header-only MP4 (ISO BMFF) metadata probe — the VIDEO arm of the
  * multimodal family, completing the m09/m12 (image) and m10 (audio)
  * byte-peek symmetry (map2db has no media surface; this is the
  * training-data-pipeline extension SURVEY §2d specifies). Same
  * contract as [[AudioCodec]]: a media-ingest pipeline's first pass
  * is metadata gating (duration caps, shard budgeting) and must never
  * pay a demux/decode per blob — the probe is a bounded walk of the
  * public ISO base-media box structure (ISO/IEC 14496-12: big-endian
  * (u32 size, 4cc type) boxes, size==1 → u64 largesize follows) down
  * exactly one level: top-level boxes to `moov`, `moov` children to
  * `mvhd`, whose fixed layout carries the movie timescale and
  * duration (version 0: u32s at +12/+16 after the version/flags word;
  * version 1: u64 times, timescale u32 at +20, duration u64 at +24).
  * -1 for anything that is not a well-formed MP4 — the gate requires
  * the leading `ftyp` box AND a complete in-bounds walk to a sane
  * mvhd, which no text payload satisfies by accident.
  */
object VideoCodec {

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  private def be64(p: Array[Byte], o: Int): Long =
    (be32(p, o) << 32) | be32(p, o + 4)

  private def tag(p: Array[Byte], o: Int, s: String): Boolean =
    o + 4 <= p.length &&
      p(o) == s.charAt(0).toByte && p(o + 1) == s.charAt(1).toByte &&
      p(o + 2) == s.charAt(2).toByte && p(o + 3) == s.charAt(3).toByte

  /** Walk one box level [from, to): returns the (payloadStart,
    * payloadEnd) of the first box named `name`, or None. Bounded at
    * 64 boxes; any non-positive / out-of-bounds size aborts (hostile
    * or truncated payloads cannot loop or over-read). */
  private def findBox(p: Array[Byte], from: Int, to: Int,
      name: String): Option[(Int, Int)] = {
    var off = from
    var boxes = 0
    while (off + 8 <= to && boxes < 64) {
      val sz32 = be32(p, off)
      val (hdr, sz) =
        if (sz32 == 1L) {
          if (off + 16 > to) return None
          (16, be64(p, off + 8))
        } else (8, sz32)
      if (sz < hdr || off + sz > to) return None
      if (tag(p, off + 4, name))
        return Some((off + hdr, off + sz.toInt))
      off += sz.toInt
      boxes += 1
    }
    None
  }

  /** Every box named `name` at one level [from, to) in file order —
    * the plural [[findBox]] (trak enumeration needs all matches, not
    * the first). Same 64-box / in-bounds-size discipline: a hostile
    * size aborts the walk, returning what was found so far. */
  private def findBoxes(p: Array[Byte], from: Int, to: Int,
      name: String): List[(Int, Int)] = {
    val out = List.newBuilder[(Int, Int)]
    var off = from
    var boxes = 0
    while (off + 8 <= to && boxes < 64) {
      val sz32 = be32(p, off)
      val (hdr, sz) =
        if (sz32 == 1L) {
          if (off + 16 > to) return out.result()
          (16, be64(p, off + 8))
        } else (8, sz32)
      if (sz < hdr || off + sz > to) return out.result()
      if (tag(p, off + 4, name)) out += ((off + hdr, off + sz.toInt))
      off += sz.toInt
      boxes += 1
    }
    out.result()
  }

  /** A 4CC as text, non-printable bytes masked to '?' so a hostile
    * header can't smuggle control bytes into a string column. */
  private def fourcc(p: Array[Byte], o: Int): String =
    if (o + 4 > p.length) "????"
    else (0 until 4).map { i =>
      val c = p(o + i) & 0xff
      if (c >= 0x20 && c < 0x7f) c.toChar else '?'
    }.mkString

  /** Some((timescale, durationTicks)) from moov/mvhd, None for
    * non-MP4 / malformed payloads. */
  def parseMvhd(p: Array[Byte]): Option[(Long, Long)] = {
    if (p.length < 16) return None
    // the first box must be ftyp (ISO 14496-12 §4.3: "should be
    // placed as early as possible" — in practice first, and requiring
    // it makes the magic gate unambiguous)
    if (!tag(p, 4, "ftyp")) return None
    for {
      (ms, me) <- findBox(p, 0, p.length, "moov")
      (hs, he) <- findBox(p, ms, me, "mvhd")
      out <- {
        if (hs + 4 > he) None
        else {
          val version = p(hs) & 0xff
          if (version == 0 && hs + 20 <= he)
            Some((be32(p, hs + 12), be32(p, hs + 16)))
          else if (version == 1 && hs + 32 <= he)
            Some((be32(p, hs + 20), be64(p, hs + 24)))
          else None
        }
      }
    } yield out
  }

  /** m16: the TRACK table — (handler 4CC, codec 4CC) per moov/trak
    * in file order. Handler comes from trak/mdia/hdlr (handler_type
    * at payload +8 after version/flags + pre_defined — ISO 14496-12
    * §8.4.3: `vide`/`soun`/`text`/...), codec from trak/mdia/minf/
    * stbl/stsd's FIRST sample entry (format 4CC at payload +12 after
    * version/flags + entry_count + entry size — §8.5.2: `avc1`/
    * `mp4a`/...). This pair is what a media-ingest filter actually
    * gates on (m13 reads only duration — r13 verdict near-gap 4).
    * A trak whose sub-boxes are missing/truncated contributes
    * "????" parts instead of failing the probe — the per-record
    * fault-tolerance contract of every header probe here. None for
    * non-MP4 (no ftyp, no moov). Header-only: the walk touches four
    * nesting levels of (size, 4cc) headers, never sample data. */
  def trackEntries(p: Array[Byte]): Option[List[(String, String)]] = {
    if (p.length < 16 || !tag(p, 4, "ftyp")) return None
    findBox(p, 0, p.length, "moov").map { case (ms, me) =>
      findBoxes(p, ms, me, "trak").map { case (ts, te) =>
        findBox(p, ts, te, "mdia") match {
          case None => ("????", "????")
          case Some((ds, de)) =>
            val handler = findBox(p, ds, de, "hdlr") match {
              case Some((hs, he)) if hs + 12 <= he => fourcc(p, hs + 8)
              case _ => "????"
            }
            val codec = (for {
              (ns, ne) <- findBox(p, ds, de, "minf")
              (bs, be) <- findBox(p, ns, ne, "stbl")
              (es, ee) <- findBox(p, bs, be, "stsd")
              if es + 16 <= ee && be32(p, es + 4) >= 1
            } yield fourcc(p, es + 12)).getOrElse("????")
            (handler, codec)
        }
      }
    }
  }

  /** m16's string probe: the track table as `handler/codec` parts
    * comma-joined in file order (e.g. "vide/avc1,soun/mp4a"); "" for
    * a track-less MP4 and the "-" sentinel for non-MP4 payloads (the
    * string sibling of the family's -1 convention — keeps the
    * expression codegen null-free). */
  def mp4Tracks(p: Array[Byte]): String = trackEntries(p) match {
    case None => "-"
    case Some(ts) => ts.map { case (h, c) => s"$h/$c" }.mkString(",")
  }

  /** m18: the SAMPLE-TABLE stats of the FIRST video track —
    * (total samples, total delta ticks, media timescale) from
    * trak/mdia/{mdhd, minf/stbl/stts} (ISO 14496-12 §8.6.1.2: stts
    * is (sample_count, sample_delta) run-length pairs; §8.4.2: mdhd
    * carries the per-TRACK timescale those deltas tick in — the
    * movie timescale is a different clock). Entry walk capped at
    * 256 and every read bounds-checked, the family's hostile-header
    * discipline. None for non-MP4 / no video track / truncated
    * sub-boxes. */
  def frameStats(p: Array[Byte]): Option[(Long, Long, Long)] = {
    if (p.length < 16 || !tag(p, 4, "ftyp")) return None
    val trak = findBox(p, 0, p.length, "moov").toList.flatMap {
      case (ms, me) => findBoxes(p, ms, me, "trak")
    }.find { case (ts, te) =>
      findBox(p, ts, te, "mdia").exists { case (ds, de) =>
        findBox(p, ds, de, "hdlr") match {
          case Some((hs, he)) if hs + 12 <= he =>
            fourcc(p, hs + 8) == "vide"
          case _ => false
        }
      }
    }
    for {
      (ts, te) <- trak
      (ds, de) <- findBox(p, ts, te, "mdia")
      (ms, me) <- findBox(p, ds, de, "mdhd")
      mediaTs <- {
        if (ms + 4 > me) None
        else (p(ms) & 0xff) match {
          case 0 if ms + 16 <= me => Some(be32(p, ms + 12))
          case 1 if ms + 24 <= me => Some(be32(p, ms + 20))
          case _ => None
        }
      }
      (ns, ne) <- findBox(p, ds, de, "minf")
      (bs, be) <- findBox(p, ns, ne, "stbl")
      (ss, se) <- findBox(p, bs, be, "stts")
      out <- {
        if (ss + 8 > se) None
        else {
          val n = be32(p, ss + 4)
          if (n < 0 || n > 256 || ss + 8 + 8 * n > se) None
          else try {
            // Overflow discipline: c and d are unsigned 32-bit (up to
            // 2^32−1 each), so c·d can exceed int64 and 256 summed
            // entries can exceed it further — a hostile header must
            // yield the family's None/-1 sentinel, not garbage.
            var samples = 0L
            var ticks = 0L
            var i = 0
            while (i < n) {
              val c = be32(p, ss + 8 + 8 * i)
              val d = be32(p, ss + 12 + 8 * i)
              samples = Math.addExact(samples, c)
              ticks = Math.addExact(ticks, Math.multiplyExact(c, d))
              i += 1
            }
            Some((samples, ticks, mediaTs))
          } catch { case _: ArithmeticException => None }
        }
      }
    } yield out
  }

  /** Field probe for the Catalyst expression: 0 = movie timescale
    * (ticks/second), 1 = duration in timescale ticks, 2 = duration in
    * MICROSECONDS (ticks · 10⁶ / timescale, integer floor — exact and
    * engine-portable); m16 widens it with the track-walk counters:
    * 3 = track count, 4 = video (`vide`) tracks, 5 = audio (`soun`)
    * tracks; m18 with the first video track's sample table:
    * 6 = frame count (Σ stts sample_count), 7 = frame rate in
    * MILLI-fps (frames · media_timescale · 1000 div Σ count·delta —
    * integer floor, engine-portable). -1 for non-MP4 / malformed
    * payloads / no video track. */
  def mp4Field(p: Array[Byte], idx: Int): Long =
    if (idx >= 6) frameStats(p) match {
      case None => -1L
      case Some((samples, ticks, mts)) => idx match {
        case 6 => samples
        case 7 => if (ticks <= 0) -1L
          else try {
            // samples·mts·1000 can overflow int64 on hostile headers
            // (samples up to 256·(2^32−1), mts up to 2^32−1) — the
            // sentinel, never a wrapped garbage rate.
            Math.multiplyExact(Math.multiplyExact(samples, mts),
              1000L) / ticks
          } catch { case _: ArithmeticException => -1L }
        case _ => -1L
      }
    }
    else if (idx >= 3) trackEntries(p) match {
      case None => -1L
      case Some(ts) => idx match {
        case 3 => ts.size.toLong
        case 4 => ts.count(_._1 == "vide").toLong
        case 5 => ts.count(_._1 == "soun").toLong
        case _ => -1L
      }
    }
    else parseMvhd(p) match {
      case None => -1L
      case Some((ts, dur)) => idx match {
        case 0 => ts
        case 1 => dur
        case 2 => if (ts <= 0) -1L else dur * 1000000L / ts
        case _ => -1L
      }
    }

  /** Spec helper: minimal well-formed MP4 metadata bytes (ftyp +
    * moov/mvhd at the given version) per the public ISO BMFF layout —
    * the probes are pinned on the exact box/field offsets a real
    * muxer writes. */
  def mp4Bytes(timescale: Long, durationTicks: Long,
      version: Int = 0, leadingFree: Boolean = false,
      tracks: Seq[(String, String)] = Nil,
      stts: Seq[(Long, Long)] = Nil,
      mediaTimescale: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    // ftyp: major brand isom, minor 0, one compatible brand
    w32(20); tag("ftyp"); tag("isom"); w32(0); tag("isom")
    if (leadingFree) { w32(8); tag("free") } // skipped-box coverage
    val mvhdLen = if (version == 0) 8 + 100 else 8 + 112
    // trak = mdia(hdlr(version/flags + pre_defined + 4cc + 12
    // reserved) + minf(stbl(stsd(version/flags + entry_count + one
    // 16-byte sample entry)))) — the minimal canonical nesting the
    // m16 walk reads (ISO 14496-12 §8.3-8.5 layouts)
    val hdlrLen = 8 + 4 + 4 + 4 + 12
    val stsdLen = 8 + 4 + 4 + 16
    // m18: when a sample table is requested, every trak also gets a
    // v0 mdhd (24-byte payload) and an stts with the given runs
    val mdhdLen = if (stts.isEmpty) 0 else 8 + 24
    val sttsLen = if (stts.isEmpty) 0 else 8 + 8 + 8 * stts.size
    val stblLen = 8 + stsdLen + sttsLen
    val minfLen = 8 + stblLen
    val mdiaLen = 8 + mdhdLen + hdlrLen + minfLen
    val trakLen = 8 + mdiaLen
    w32(8L + mvhdLen + trakLen.toLong * tracks.size); tag("moov")
    w32(mvhdLen.toLong); tag("mvhd")
    out.write(version); out.write(0); out.write(0); out.write(0)
    if (version == 0) {
      w32(0); w32(0) // ctime, mtime
      w32(timescale); w32(durationTicks)
      (0 until 100 - 20).foreach(_ => out.write(0)) // rate..next_track
    } else {
      w64(0); w64(0)
      w32(timescale); w64(durationTicks)
      (0 until 112 - 32).foreach(_ => out.write(0))
    }
    tracks.foreach { case (handler, codec) =>
      w32(trakLen.toLong); tag("trak")
      w32(mdiaLen.toLong); tag("mdia")
      if (stts.nonEmpty) {
        w32(mdhdLen.toLong); tag("mdhd")
        w32(0) // version/flags (v0)
        w32(0); w32(0) // ctime, mtime
        w32(mediaTimescale)
        w32(0) // duration
        w32(0) // language + pre_defined
      }
      w32(hdlrLen.toLong); tag("hdlr")
      w32(0); w32(0); tag(handler) // version/flags, pre_defined, 4cc
      (0 until 12).foreach(_ => out.write(0)) // reserved
      w32(minfLen.toLong); tag("minf")
      w32(stblLen.toLong); tag("stbl")
      w32(stsdLen.toLong); tag("stsd")
      w32(0); w32(1) // version/flags, entry_count
      w32(16); tag(codec) // sample entry: size + format 4cc
      (0 until 8).foreach(_ => out.write(0)) // entry reserved tail
      if (stts.nonEmpty) {
        w32(sttsLen.toLong); tag("stts")
        w32(0) // version/flags
        w32(stts.size.toLong)
        stts.foreach { case (c, d) => w32(c); w32(d) }
      }
    }
    out.toByteArray
  }
}
