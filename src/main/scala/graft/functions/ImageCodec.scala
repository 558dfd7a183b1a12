package graft.functions

import java.awt.image.BufferedImage

/** REAL image decode — JDK `javax.imageio` (public API, available
  * offline) — the de-stubbed pixel path behind m01/m04/m06
  * (map2db has no image surface; this is the training-data-pipeline
  * extension SURVEY §2d specifies).
  *
  * Contract: payloads that actually ARE images (PNG/JPEG by magic
  * bytes) decode to grayscale pixels and the media kernels operate in
  * the PIXEL domain (2-D box-filter thumbnails — the geometry a real
  * aHash/thumbnail pass uses); anything else falls back to the
  * deterministic byte-domain stand-in, which remains the
  * oracle-checked path on the synthetic text-payload corpus. The
  * sniff is a few byte compares, so non-media payloads never pay
  * codec overhead, and the decode stays a static JVM call — the
  * Catalyst expressions wrapping it keep whole-stage codegen.
  *
  * Only container formats whose magic cannot occur in UTF-8 text are
  * sniffed (PNG's 0x89, JPEG's 0xFF 0xD8): a text payload can never
  * reach the codec, so the fallback path is deterministic by
  * construction, and a hostile/garbled header can't trigger a
  * giant-allocation decode attempt on non-image data.
  */
object ImageCodec {

  /** PNG / JPEG magic-byte sniff (both start with non-UTF-8 bytes —
    * see the object Scaladoc for why only these two). */
  def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
          p(2) == 0xFF.toByte))

  /** Decode to (width, height, row-major grayscale bytes) via
    * integer ITU-R BT.601 luma ((77R + 150G + 29B) >> 8) —
    * deterministic, no float. None when the payload is not a
    * decodable image. */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!looksLikeImage(p)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            out(y * w + x) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 2-D box-filter downscale of the decoded grayscale image to a
    * gw×gh cell grid, row-major, integer mean per cell — the
    * real-image analogue of [[MultimediaKernel.blockMean]]'s 1-D
    * block average. */
  def grayThumb(p: Array[Byte], gw: Int, gh: Int): Option[Array[Byte]] =
    decodeGray(p).map { case (w, h, px) =>
      val out = new Array[Byte](gw * gh)
      var cy = 0
      while (cy < gh) {
        val y0 = (cy.toLong * h / gh).toInt
        val y1 = math.min(h, math.max(y0 + 1,
          ((cy + 1).toLong * h / gh).toInt))
        var cx = 0
        while (cx < gw) {
          val x0 = (cx.toLong * w / gw).toInt
          val x1 = math.min(w, math.max(x0 + 1,
            ((cx + 1).toLong * w / gw).toInt))
          var s = 0L
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x) & 0xff; n += 1; x += 1 }
            y += 1
          }
          out(cy * gw + cx) = (if (n == 0) 0L else s / n).toByte
          cx += 1
        }
        cy += 1
      }
      out
    }

  /** Grid geometry for a k-byte thumbnail: 8 columns when 8 | k (the
    * aHash convention — m06's 48 bits are an 8×6 grid, m04's 32-byte
    * thumbnail an 8×4), else a k×1 strip. */
  def grid(k: Int): (Int, Int) =
    if (k % 8 == 0 && k >= 8) (8, k / 8) else (k, 1)

  /** Pixel-domain k-byte thumbnail of a real image payload; None for
    * non-image payloads (callers fall back to the byte kernel). */
  def thumbK(p: Array[Byte], k: Int): Option[Array[Byte]] = {
    val (gw, gh) = grid(k)
    grayThumb(p, gw, gh)
  }

  /** m09: cheap image-dimension probe — parses the PNG IHDR header
    * (width/height as big-endian u32 at offsets 16/20, per the public
    * PNG spec) WITHOUT decoding pixels: the metadata-extraction pass
    * a 100 TB media corpus runs first (size/aspect gates, thumbnail
    * budgeting) must not pay a full decode per blob. Returns
    * (width << 32) | height packed in a long, or -1 for non-PNG /
    * truncated payloads. Pure byte peeks — codegen-friendly static. */
  def pngDims(p: Array[Byte]): Long = {
    if (p.length < 24 || p(0) != 0x89.toByte || p(1) != 'P' ||
      p(2) != 'N' || p(3) != 'G') return -1L
    // the first chunk MUST be IHDR (PNG spec §5.6) — a PNG-magic
    // payload with a non-conforming first chunk would otherwise
    // return garbage packed dims instead of the -1 sentinel
    if (p(12) != 'I' || p(13) != 'H' || p(14) != 'D' || p(15) != 'R')
      return -1L
    def be32(o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    (be32(16) << 32) | be32(20)
  }

  /** m12: JPEG dimension probe — walks the public JFIF marker list to
    * the first frame header (SOF0–SOF15, excluding the non-frame
    * markers DHT/JPG/DAC that share the range) and reads the
    * big-endian height/width fields at fixed offsets inside it, per
    * the public JPEG spec (ITU T.81 §B.2.2). No entropy decode, no
    * pixel pass — the same metadata-gate contract as [[pngDims]], on
    * the format most of a crawled media corpus actually lands in.
    * Returns (width << 32) | height, or -1 for non-JPEG / truncated /
    * non-conforming payloads. The walk is bounded (segment lengths
    * are u16 and the scan stops at SOS/EOI or 256 segments), so a
    * hostile header can't loop or over-read. */
  def jpegDims(p: Array[Byte]): Long = {
    if (p.length < 4 || p(0) != 0xFF.toByte || p(1) != 0xD8.toByte ||
      p(2) != 0xFF.toByte) return -1L
    def u8(o: Int): Int = p(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    var i = 2
    var segs = 0
    while (i + 3 < p.length && segs < 256) {
      if (u8(i) != 0xFF) return -1L
      // fill bytes: any number of 0xFF may pad before a marker
      while (i + 3 < p.length && u8(i + 1) == 0xFF) i += 1
      // the skip loop may exit on the length bound with i+3 == length;
      // a length-bearing marker would then read be16(i+2) past the end
      if (i + 3 >= p.length) return -1L
      val m = u8(i + 1)
      if (m == 0xD9 || m == 0xDA) return -1L // EOI/SOS before any SOF
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
          m != 0xCC) {
        // SOF: len(2) precision(1) height(2) width(2)
        if (i + 8 >= p.length) return -1L
        val h = be16(i + 5).toLong
        val w = be16(i + 7).toLong
        return (w << 32) | h
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
      else {
        val len = be16(i + 2)
        if (len < 2) return -1L
        i += 2 + len
      }
      segs += 1
    }
    -1L
  }

  /** m12: GIF dimension probe — the logical-screen width/height are
    * little-endian u16 at fixed offsets 6/8 after the "GIF87a"/
    * "GIF89a" magic (public GIF89a spec §18). Same packed-long /
    * -1-sentinel contract as [[pngDims]]/[[jpegDims]]. */
  def gifDims(p: Array[Byte]): Long = {
    if (p.length < 10 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != '8' || (p(4) != '7' && p(4) != '9') || p(5) != 'a')
      return -1L
    def le16(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8)
    (le16(6) << 32) | le16(8)
  }

  /** m12 (r15): WebP dimension probe — a 2025-era crawl corpus is
    * heavily WebP, which previously fell to the -1 arm. Bounded RIFF
    * container walk (the [[AudioCodec.wavField]] chunk discipline):
    * "RIFF" + LE32 size + "WEBP", then the FIRST chunk dispatches by
    * public bitstream spec — "VP8 " lossy (3-byte frame tag, the
    * 9D 01 2A start code, 14-bit LE width/height), "VP8L" lossless
    * (0x2F signature, width-1/height-1 packed in bits 0-13/14-27 of
    * the next LE32), "VP8X" extended (canvas width-1/height-1 as
    * LE24 pairs after 4 flag/reserved bytes). Every read is
    * bounds-checked against both the payload and the declared chunk
    * size, so a truncated or hostile header returns -1, never
    * over-reads. Same packed-long contract as [[pngDims]]. */
  def webpDims(p: Array[Byte]): Long = {
    if (p.length < 25) return -1L
    def tag(o: Int, s: String): Boolean =
      s.indices.forall(i => p(o + i) == s(i).toByte)
    if (!tag(0, "RIFF") || !tag(8, "WEBP")) return -1L
    def le16(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8)
    def le24(o: Int): Long = le16(o) | ((p(o + 2) & 0xffL) << 16)
    def le32(o: Int): Long = le24(o) | ((p(o + 3) & 0xffL) << 24)
    val chunkSize = le32(16)
    if (tag(12, "VP8 ")) {
      // lossy: payload = 3-byte frame tag, start code, dim words
      if (p.length < 30 || chunkSize < 10) return -1L
      if ((p(23) & 0xff) != 0x9D || (p(24) & 0xff) != 0x01 ||
        (p(25) & 0xff) != 0x2A) return -1L
      ((le16(26) & 0x3FFF) << 32) | (le16(28) & 0x3FFF)
    } else if (tag(12, "VP8L")) {
      if (chunkSize < 5 || (p(20) & 0xff) != 0x2F) return -1L
      val b = le32(21)
      (((b & 0x3FFF) + 1) << 32) | (((b >> 14) & 0x3FFF) + 1)
    } else if (tag(12, "VP8X")) {
      if (p.length < 30 || chunkSize < 10) return -1L
      ((le24(24) + 1) << 32) | (le24(27) + 1)
    } else -1L
  }

  /** m12 (r15): TIFF dimension probe — the scanned-document arm (a
    * digitized-archive corpus is TIFF-heavy): the public TIFF 6.0
    * header (II/MM byte order, magic 42, IFD0 offset) and IFD0's
    * 12-byte entries scanned for ImageWidth (256) / ImageLength
    * (257), each SHORT or LONG with count 1 — the same walk
    * [[exifOrientation]] runs inside the JPEG APP1 wrapper, here at
    * file scope. Both byte orders; entry count capped at 256; every
    * read bounds-checked; no sub-IFD recursion. Same packed-long /
    * -1-sentinel contract as [[pngDims]]. */
  def tiffDims(p: Array[Byte]): Long = {
    if (p.length < 8) return -1L
    def u8(o: Int): Int = p(o) & 0xff
    val little =
      if (p(0) == 'I' && p(1) == 'I') true
      else if (p(0) == 'M' && p(1) == 'M') false
      else return -1L
    def tu16(o: Int): Int =
      if (little) u8(o) | (u8(o + 1) << 8)
      else (u8(o) << 8) | u8(o + 1)
    def tu32(o: Int): Long =
      if (little)
        u8(o).toLong | (u8(o + 1).toLong << 8) |
          (u8(o + 2).toLong << 16) | (u8(o + 3).toLong << 24)
      else
        (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) |
          (u8(o + 2).toLong << 8) | u8(o + 3).toLong
    if (tu16(2) != 42) return -1L
    val ifdOff = tu32(4)
    if (ifdOff < 8 || ifdOff + 2 > p.length) return -1L
    val ifd = ifdOff.toInt
    val n = math.min(tu16(ifd), 256)
    var w = -1L
    var h = -1L
    var e = ifd + 2
    var k = 0
    while (k < n && e + 12 <= p.length && (w < 0 || h < 0)) {
      val tag = tu16(e)
      val typ = tu16(e + 2)
      if ((tag == 256 || tag == 257) && tu32(e + 4) == 1L) {
        // value is LEFT-justified in the 4-byte field: SHORT reads
        // the first two bytes in file order, LONG all four
        val v =
          if (typ == 3) tu16(e + 8).toLong
          else if (typ == 4) tu32(e + 8)
          else -1L
        if (tag == 256) w = v else h = v
      }
      e += 12
      k += 1
    }
    if (w <= 0 || h <= 0) -1L else (w << 32) | h
  }

  /** m12: format-dispatching dimension probe — PNG, JPEG, GIF, WebP
    * (lossy/lossless/extended), or TIFF (both byte orders) by magic
    * bytes, -1 for everything else. ONE gate expression for the
    * size/aspect admission pass over a mixed-format media corpus,
    * composing the five header walks; never decodes pixels. */
  def imageDims(p: Array[Byte]): Long = {
    if (p.length >= 4 && p(0) == 0x89.toByte && p(1) == 'P') pngDims(p)
    else if (p.length >= 4 && p(0) == 0xFF.toByte &&
      p(1) == 0xD8.toByte) jpegDims(p)
    else if (p.length >= 4 && p(0) == 'G' && p(1) == 'I') gifDims(p)
    // RIFF is shared with WAV — webpDims' "WEBP" form-type check
    // sends non-image RIFF containers to the -1 arm
    else if (p.length >= 4 && p(0) == 'R' && p(1) == 'I') webpDims(p)
    // TIFF's own magic-42 check sends stray "II"/"MM" text to -1
    else if (p.length >= 4 && ((p(0) == 'I' && p(1) == 'I') ||
      (p(0) == 'M' && p(1) == 'M'))) tiffDims(p)
    else -1L
  }

  /** m15: EXIF orientation probe — the one metadata field an image
    * pipeline MUST read before any geometric op (a phone photo's
    * pixels are stored unrotated; thumbnails/aHash/crops that ignore
    * orientation silently mis-process a third of a mobile corpus):
    * walks the JPEG marker list (the [[jpegDims]] bounds discipline)
    * to the APP1 "Exif  " segment, parses the public TIFF
    * header it wraps (II/MM byte order, magic 42, IFD0 offset — TIFF
    * 6.0 / EXIF 2.3 specs) and scans IFD0's 12-byte entries for tag
    * 0x0112 (Orientation, SHORT). Returns 1-8, or -1 for non-JPEG /
    * no-EXIF / malformed payloads. Header-only — entry count capped
    * at 256, every read bounds-checked, no sub-IFD recursion, so a
    * hostile header can't loop or over-read. */
  def exifOrientation(p: Array[Byte]): Long = {
    if (p.length < 4 || p(0) != 0xFF.toByte || p(1) != 0xD8.toByte ||
      p(2) != 0xFF.toByte) return -1L
    def u8(o: Int): Int = p(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    var i = 2
    var segs = 0
    var app1 = -1
    var app1Len = 0
    while (app1 < 0 && i + 3 < p.length && segs < 256) {
      if (u8(i) != 0xFF) return -1L
      while (i + 3 < p.length && u8(i + 1) == 0xFF) i += 1
      // same truncation guard as jpegDims: the skip loop can exit with
      // i+3 == length, where be16(i+2) below would over-read
      if (i + 3 >= p.length) return -1L
      val m = u8(i + 1)
      if (m == 0xD9 || m == 0xDA) return -1L // EOI/SOS: no EXIF seen
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
      else {
        val len = be16(i + 2)
        if (len < 2) return -1L
        if (m == 0xE1 && i + 2 + len <= p.length && len >= 16 &&
          p(i + 4) == 'E' && p(i + 5) == 'x' && p(i + 6) == 'i' &&
          p(i + 7) == 'f' && p(i + 8) == 0 && p(i + 9) == 0) {
          app1 = i + 10 // TIFF header base
          app1Len = i + 2 + len // segment end (exclusive)
        }
        i += 2 + len
      }
      segs += 1
    }
    if (app1 < 0) return -1L
    val base = app1
    if (base + 8 > app1Len) return -1L
    val little =
      if (p(base) == 'I' && p(base + 1) == 'I') true
      else if (p(base) == 'M' && p(base + 1) == 'M') false
      else return -1L
    def tu16(o: Int): Int =
      if (little) u8(o) | (u8(o + 1) << 8)
      else (u8(o) << 8) | u8(o + 1)
    def tu32(o: Int): Long =
      if (little)
        u8(o).toLong | (u8(o + 1).toLong << 8) |
          (u8(o + 2).toLong << 16) | (u8(o + 3).toLong << 24)
      else
        (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) |
          (u8(o + 2).toLong << 8) | u8(o + 3).toLong
    if (tu16(base + 2) != 42) return -1L
    val ifdOff = tu32(base + 4)
    if (ifdOff < 8 || base + ifdOff + 2 > app1Len) return -1L
    val ifd = base + ifdOff.toInt
    val n = math.min(tu16(ifd), 256)
    var e = ifd + 2
    var k = 0
    while (k < n && e + 12 <= app1Len) {
      if (tu16(e) == 0x0112 && tu16(e + 2) == 3 && tu32(e + 4) == 1L) {
        val v = tu16(e + 8).toLong
        return if (v >= 1 && v <= 8) v else -1L
      }
      e += 12
      k += 1
    }
    -1L
  }

  /** Spec helper: a minimal JPEG byte stream carrying ONLY an EXIF
    * APP1 with the given orientation (SOI + APP1 + EOI) — the probe
    * never decodes, so the stream needs no scan data; `little`
    * selects the TIFF byte order so both arms are pinned. */
  def exifBytes(orientation: Int, little: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Int): Unit = bos.write(b & 0xff)
    def w16(v: Int, le: Boolean): Unit =
      if (le) { w(v); w(v >> 8) } else { w(v >> 8); w(v) }
    def w32(v: Int, le: Boolean): Unit =
      if (le) { w(v); w(v >> 8); w(v >> 16); w(v >> 24) }
      else { w(v >> 24); w(v >> 16); w(v >> 8); w(v) }
    w(0xFF); w(0xD8) // SOI
    // APP1: len(2) + "Exif\0\0"(6) + TIFF(8) + count(2) + entry(12)
    //       + next-IFD(4) = 34
    w(0xFF); w(0xE1); w(0); w(34)
    bos.write("Exif".getBytes("US-ASCII")); w(0); w(0)
    if (little) { w('I'); w('I') } else { w('M'); w('M') }
    w16(42, little); w32(8, little)
    w16(1, little) // one IFD0 entry
    w16(0x0112, little); w16(3, little); w32(1, little)
    w16(orientation, little); w16(0, little) // SHORT value, padded
    w32(0, little) // no next IFD
    w(0xFF); w(0xD9) // EOI
    bos.toByteArray
  }

  /** m14: decoded-pixel luminance statistics — the blank/flat/
    * low-contrast admission gate a media-ingest pipeline runs after
    * the header probes pass (a solid-color or near-blank frame is
    * worthless training data however valid its container): one pixel
    * pass accumulates exact integer sums over the BT.601 luma plane
    * ([[decodeGray]]); idx 0 = floor mean luma, 1 = luma range
    * (max − min, 0 for a solid color), 2 = floor population variance
    * ((n·Σx² − (Σx)²)/n², the final division done in BigInt so no
    * image size can overflow the intermediate). -1 for non-image /
    * undecodable payloads — the [[pngDims]] sentinel contract. */
  def grayStats(p: Array[Byte], idx: Int): Long =
    decodeGray(p) match {
      case Some((_, _, px)) if px.length > 0 =>
        var s = 0L
        var s2 = 0L
        var mn = 255L
        var mx = 0L
        var i = 0
        while (i < px.length) {
          val v = (px(i) & 0xff).toLong
          s += v
          s2 += v * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        val n = px.length.toLong
        idx match {
          case 0 => s / n
          case 1 => mx - mn
          case _ =>
            ((BigInt(n) * s2 - BigInt(s) * s) / (BigInt(n) * n)).toLong
        }
      case _ => -1L
    }

  /** Spec helper: REAL deterministic PNG bytes for a synthetic scene
    * (`f(x, y)` returns the 0xRRGGBB pixel). Pure-JDK encode, so the
    * spec's planted images exercise the same codec a production
    * payload would. */
  def pngBytes(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    imageBytes("png", w, h)(f)

  /** m20: GIF ANIMATION probe — the static-vs-animated admission
    * gate (and the frame/duration caps) a media corpus runs after
    * m12's dimension pass: an image pipeline must not feed a
    * 400-frame banner GIF to a single-frame feature kernel. Bounded
    * walk of the public GIF89a block structure (§20-26 + the
    * NETSCAPE2.0 application extension, public): header + logical
    * screen descriptor (+ global color table when flagged), then
    * blocks — 0x2C image descriptors COUNT frames (local color
    * table + LZW sub-blocks skipped by their declared sizes), 0x21
    * extensions dispatch by label (0xF9 graphic control carries the
    * per-frame delay in centiseconds, summed; 0xFF application with
    * the 11-byte "NETSCAPE2.0" id carries the loop count, 0 =
    * forever), 0x3B trailer ends the walk. Returns (frames, loop,
    * totalCs) with loop = -1 when no NETSCAPE block (the
    * play-once default); None for non-GIF / truncated / hostile
    * payloads (block walk capped at 4096 blocks, every sub-block
    * length bounds-checked — a forged length can't over-read). */
  def gifMeta(p: Array[Byte]): Option[(Long, Long, Long)] = {
    if (p.length < 14 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != '8' || (p(4) != '7' && p(4) != '9') || p(5) != 'a')
      return None
    var off = 13
    // global color table: 3 * 2^(N+1) bytes when the flag is set
    if ((p(10) & 0x80) != 0) off += 3 * (1 << ((p(10) & 0x7) + 1))
    var frames = 0L
    var loop = -1L
    var totalCs = 0L
    var blocks = 0
    while (blocks < 4096) {
      blocks += 1
      if (off >= p.length) return None // ran off the end: truncated
      val b = p(off) & 0xff
      off += 1
      if (b == 0x3b) { // trailer: a complete file
        return Some((frames, loop, totalCs))
      } else if (b == 0x2c) { // image descriptor
        if (off + 9 > p.length) return None
        frames += 1
        val packed = p(off + 8) & 0xff
        off += 9
        if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 0x7) + 1))
        off += 1 // LZW minimum code size
        // data sub-blocks: (len, bytes)* until a zero terminator
        var len = -1
        while (len != 0) {
          if (off >= p.length) return None
          len = p(off) & 0xff
          off += 1 + len
        }
      } else if (b == 0x21) { // extension: label + sub-blocks
        if (off >= p.length) return None
        val label = p(off) & 0xff
        off += 1
        var first = true
        // Loop-count admission: ONLY honored when the extension's
        // 11-byte application identifier (its first sub-block) is
        // NETSCAPE2.0 or ANIMEXTS1.0 — an XMP/other 0xFF payload
        // whose data sub-block happens to start with 0x01 must NOT
        // forge the loop count.
        var loopingApp = false
        var len = -1
        while (len != 0) {
          if (off >= p.length) return None
          len = p(off) & 0xff
          if (len > 0 && off + 1 + len > p.length) return None
          if (first && label == 0xf9 && len >= 3) {
            // graphic control: packed, delay LE16 (centiseconds)
            totalCs += (p(off + 2) & 0xffL) | ((p(off + 3) & 0xffL) << 8)
          } else if (first && label == 0xff && len == 11) {
            val id = new String(p, off + 1, 11,
              java.nio.charset.StandardCharsets.US_ASCII)
            loopingApp = id == "NETSCAPE2.0" || id == "ANIMEXTS1.0"
          } else if (!first && loopingApp && label == 0xff &&
              len == 3 && (p(off + 1) & 0xff) == 1) {
            // NETSCAPE/ANIMEXTS looping sub-block: 01, count LE16
            loop = (p(off + 2) & 0xffL) | ((p(off + 3) & 0xffL) << 8)
          }
          first = false
          off += 1 + len
        }
      } else return None // unknown block type: not a GIF we trust
    }
    None // block cap hit: hostile
  }

  /** Field probe for the Catalyst expression: 0 = frame count, 1 =
    * loop count (0 = forever, -1 = no NETSCAPE block: play once),
    * 2 = total duration centiseconds, 3 = animated flag (>= 2
    * frames); -1 for non-GIF / malformed payloads. */
  def gifField(p: Array[Byte], idx: Int): Long = gifMeta(p) match {
    case None => -1L
    case Some((frames, loop, totalCs)) => idx match {
      case 0 => frames
      case 1 => loop
      case 2 => totalCs
      case 3 => if (frames >= 2) 1L else 0L
      case _ => -1L
    }
  }

  /** Spec helper: a REAL multi-frame GIF from the JDK's own GIF
    * encoder (the m12 genuine-encoder-output convention): nFrames
    * frames of varying pixels, a per-frame delay in centiseconds,
    * and — when loop >= 0 — a NETSCAPE2.0 looping block. */
  def animatedGifBytes(nFrames: Int, delayCs: Int,
      loop: Int): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    val proto = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val wp = writer.getDefaultWriteParam
    val meta = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(proto), wp)
    val fmtName = meta.getNativeMetadataFormatName
    val root = meta.getAsTree(fmtName).asInstanceOf[IIOMetadataNode]
    def node(parent: IIOMetadataNode, name: String): IIOMetadataNode = {
      val kids = parent.getElementsByTagName(name)
      if (kids.getLength > 0) kids.item(0).asInstanceOf[IIOMetadataNode]
      else {
        val n = new IIOMetadataNode(name); parent.appendChild(n); n
      }
    }
    val gce = node(root, "GraphicControlExtension")
    gce.setAttribute("disposalMethod", "none")
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", delayCs.toString)
    gce.setAttribute("transparentColorIndex", "0")
    if (loop >= 0) {
      val apps = node(root, "ApplicationExtensions")
      val app = node(apps, "ApplicationExtension")
      app.setAttribute("applicationID", "NETSCAPE")
      app.setAttribute("authenticationCode", "2.0")
      app.setUserObject(Array[Byte](1, (loop & 0xff).toByte,
        ((loop >> 8) & 0xff).toByte))
    }
    meta.setFromTree(fmtName, root)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { img.setRGB(x, y, (i * 40 + x * 8 + y) << 8); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
        wp)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** Spec helper: REAL encoded bytes in any JDK-writable container
    * (`png`/`jpg`/`gif`) — the m12 probes are pinned on genuine
    * encoder output, not hand-forged headers. */
  def imageBytes(fmt: String, w: Int, h: Int)(
      f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, f(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }
}
