package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioCodec, ImageCodec, Multimedia, MultimediaKernel}

/** The de-stubbed REAL image path (r9): planted actual PNGs — encoded
  * and decoded by the JDK codec — must flow through the m04/m06
  * kernels in the PIXEL domain, while non-image payloads keep the
  * byte-domain path the oracles check. */
class ImageCodecSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  // deterministic scenes
  private def gradient(w: Int, h: Int): Array[Byte] =
    ImageCodec.pngBytes(w, h) { (x, _) =>
      val v = x * 255 / (w - 1); (v << 16) | (v << 8) | v
    }
  private def inverse(w: Int, h: Int): Array[Byte] =
    ImageCodec.pngBytes(w, h) { (x, _) =>
      val v = 255 - x * 255 / (w - 1); (v << 16) | (v << 8) | v
    }

  test("PNG roundtrip: real encode → real decode, exact dims and luma") {
    val png = ImageCodec.pngBytes(20, 10)((_, _) => 0x406080)
    assert(ImageCodec.looksLikeImage(png))
    val Some((w, h, px)) = ImageCodec.decodeGray(png)
    assert(w == 20 && h == 10 && px.length == 200)
    // integer BT.601 luma of (0x40, 0x60, 0x80)
    val expect = ((77 * 0x40 + 150 * 0x60 + 29 * 0x80) >> 8).toByte
    assert(px.forall(_ == expect))
  }

  test("text payloads never sniff as images; byte kernels unchanged") {
    val text = "The quick brown fox jumps over the lazy dog. " * 4
    val bytes = text.getBytes("UTF-8")
    assert(!ImageCodec.looksLikeImage(bytes))
    assert(MultimediaKernel.resample(bytes, 32).toSeq ==
      MultimediaKernel.resampleBytes(bytes, 32).toSeq)
    assert(MultimediaKernel.blockMean(bytes, 48).toSeq ==
      MultimediaKernel.blockMeanBytes(bytes, 48).toSeq)
  }

  test("real PNG routes the kernels through the 2-D pixel thumbnail") {
    val png = gradient(64, 48)
    val viaKernel = MultimediaKernel.blockMean(png, 48)
    val viaCodec = ImageCodec.thumbK(png, 48).get
    assert(viaKernel.toSeq == viaCodec.toSeq)
    assert(viaKernel.length == 48)
    // 8×6 grid of a horizontal gradient: each row strictly brighter
    // left→right, rows identical
    val rows = viaKernel.grouped(8).toSeq
    rows.foreach { r =>
      r.map(_ & 0xff).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a < b); case _ => ()
      }
    }
    assert(rows.map(_.toSeq).distinct.size == 1)
  }

  test("aHash on real images: scale-stable within a scene, far apart " +
    "across scenes — the stability the 1-D stub could not give") {
    val h1 = MultimediaKernel.ahash(MultimediaKernel.blockMean(
      gradient(64, 48), 48))
    val h2 = MultimediaKernel.ahash(MultimediaKernel.blockMean(
      gradient(128, 96), 48))
    val h3 = MultimediaKernel.ahash(MultimediaKernel.blockMean(
      inverse(64, 48), 48))
    assert(hamming(h1, h2) <= 4,
      s"same scene at 2 scales drifted ${hamming(h1, h2)} of 48 bits")
    assert(hamming(h1, h3) >= 24,
      s"unrelated scenes only ${hamming(h1, h3)} bits apart")
  }

  test("the codegen'd expression path carries real PNGs and text " +
    "through their respective arms in ONE plan") {
    import spark.implicits._
    val png = gradient(64, 48)
    val textB = ("just words, not an image. " * 8).getBytes("UTF-8")
    val df = Seq((1L, png), (2L, textB)).toDF("id", "payload")
      .select(col("id"),
        Multimedia.aHash(Multimedia.blockMean(col("payload"), 48))
          .as("ahash"),
        hex(Multimedia.byteResample(col("payload"), 32)).as("thumb"))
    val got = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L)._1 == MultimediaKernel.ahash(
      ImageCodec.thumbK(png, 48).get))
    assert(got(2L)._1 == MultimediaKernel.ahash(
      MultimediaKernel.blockMeanBytes(textB, 48)))
    assert(got(1L)._2 == ImageCodec.thumbK(png, 32).get
      .map("%02X".format(_)).mkString)
    assert(got(2L)._2 == MultimediaKernel.resampleBytes(textB, 32)
      .map("%02X".format(_)).mkString)
  }

  test("m09 png_dims: header-only dimension probe, no pixel decode") {
    import spark.implicits._
    val png = ImageCodec.pngBytes(640, 480)((_, _) => 0x123456)
    assert(ImageCodec.pngDims(png) == ((640L << 32) | 480L))
    assert(ImageCodec.pngDims("not a png".getBytes("UTF-8")) == -1L)
    assert(ImageCodec.pngDims(png.take(20)) == -1L) // truncated header
    // PNG magic but a non-conforming first chunk (not IHDR) must hit
    // the -1 sentinel, not read garbage at the IHDR offsets (ADVICE r9)
    val rogue = png.clone()
    rogue(12) = 'J'; rogue(13) = 'U'; rogue(14) = 'N'; rogue(15) = 'K'
    assert(ImageCodec.pngDims(rogue) == -1L)
    // the codegen'd expression path, mixed payloads in one plan
    val got = Seq((1L, png), (2L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"), Multimedia.pngDims(col("payload")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ((640L << 32) | 480L) && got(2L) == -1L)
    assert(((got(1L) >> 32) & 0xffffffffL) == 640L)
    assert((got(1L) & 0xffffffffL) == 480L)
  }

  test("m12 image_dims: JPEG SOF walk + GIF screen + PNG dispatch — " +
      "mixed-format header probe, no decode") {
    import spark.implicits._
    // REAL encoder output for all three containers, not forged bytes
    val png = ImageCodec.pngBytes(640, 480)((_, _) => 0x123456)
    val jpg = ImageCodec.imageBytes("jpg", 321, 123)((x, y) =>
      ((x * 7 + y * 13) & 0xff) * 0x010101)
    val gif = ImageCodec.imageBytes("gif", 77, 55)((x, _) =>
      if (x % 2 == 0) 0xFF0000 else 0x0000FF)
    assert(ImageCodec.jpegDims(jpg) == ((321L << 32) | 123L))
    assert(ImageCodec.gifDims(gif) == ((77L << 32) | 55L))
    assert(ImageCodec.imageDims(png) == ((640L << 32) | 480L))
    assert(ImageCodec.imageDims(jpg) == ((321L << 32) | 123L))
    assert(ImageCodec.imageDims(gif) == ((77L << 32) | 55L))
    // non-image / truncated / cross-format payloads hit -1
    assert(ImageCodec.imageDims("not an image".getBytes("UTF-8")) == -1L)
    assert(ImageCodec.jpegDims(png) == -1L)
    assert(ImageCodec.gifDims(jpg) == -1L)
    assert(ImageCodec.jpegDims(jpg.take(12)) == -1L) // truncated pre-SOF
    // JPEG with no SOF before EOI (headers only) must hit the
    // sentinel, not walk off the marker list
    val noSof = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xD9.toByte)
    assert(ImageCodec.jpegDims(noSof) == -1L)
    // a hostile segment length of 0/1 can't loop the walk
    val badLen = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE0.toByte, 0, 1, 0, 0)
    assert(ImageCodec.jpegDims(badLen) == -1L)
    // the codegen'd expression path, all four payload kinds one plan
    val got = Seq((1L, png), (2L, jpg), (3L, gif),
        (4L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"), Multimedia.imageDims(col("payload")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ((640L << 32) | 480L))
    assert(got(2L) == ((321L << 32) | 123L))
    assert(got(3L) == ((77L << 32) | 55L))
    assert(got(4L) == -1L)
    // (the graft_image_dims SQL surface is pinned in
    // GraftExtensionsSpec, whose session carries the extensions)
  }

  test("m12 webp_dims: RIFF walk + VP8/VP8L/VP8X arms — spec-exact " +
      "headers, hostile truncation, WAV cross-format stays -1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def le16(v: Int): Seq[Byte] =
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le24(v: Int): Seq[Byte] = le16(v & 0xffff) :+
      ((v >> 16) & 0xff).toByte
    def le32(v: Int): Seq[Byte] = le24(v & 0xffffff) :+
      ((v >> 24) & 0xff).toByte
    def riff(fourcc: String, payload: Seq[Byte]): Array[Byte] =
      ("RIFF".getBytes("US-ASCII").toSeq ++ le32(4 + 8 + payload.size)
        ++ "WEBP".getBytes("US-ASCII") ++ fourcc.getBytes("US-ASCII")
        ++ le32(payload.size) ++ payload).toArray
    // lossy: 3-byte frame tag, 9D 01 2A start code, 14-bit LE dims
    val vp8 = riff("VP8 ", Seq[Byte](0x30, 0x01, 0x00) ++
      Seq(0x9D.toByte, 0x01.toByte, 0x2A.toByte) ++
      le16(160) ++ le16(120))
    assert(ImageCodec.webpDims(vp8) == ((160L << 32) | 120L))
    // a 2-bit scale rides the top bits of each dim word — masked off
    val vp8scaled = riff("VP8 ", Seq[Byte](0x30, 0x01, 0x00) ++
      Seq(0x9D.toByte, 0x01.toByte, 0x2A.toByte) ++
      le16(160 | 0x4000) ++ le16(120 | 0x8000))
    assert(ImageCodec.webpDims(vp8scaled) == ((160L << 32) | 120L))
    // lossless: 0x2F signature, width-1 bits 0-13, height-1 14-27
    val bits = (33 - 1) | ((17 - 1) << 14)
    val vp8l = riff("VP8L", Seq(0x2F.toByte) ++ le32(bits))
    assert(ImageCodec.webpDims(vp8l) == ((33L << 32) | 17L))
    // extended: 4 flag/reserved bytes, LE24 canvas-1 pair
    val vp8x = riff("VP8X", Seq[Byte](0, 0, 0, 0) ++
      le24(1000 - 1) ++ le24(600 - 1))
    assert(ImageCodec.webpDims(vp8x) == ((1000L << 32) | 600L))
    // the dispatch arm routes RIFF payloads through the WEBP check
    assert(ImageCodec.imageDims(vp8) == ((160L << 32) | 120L))
    assert(ImageCodec.imageDims(vp8l) == ((33L << 32) | 17L))
    assert(ImageCodec.imageDims(vp8x) == ((1000L << 32) | 600L))
    // hostile: truncation at every prefix length can't over-read
    (0 until vp8.length).foreach { n =>
      ImageCodec.webpDims(vp8.take(n)); ImageCodec.imageDims(vp8.take(n))
    }
    assert(ImageCodec.webpDims(vp8.take(25)) == -1L)
    // wrong start code / signature
    val badSig = vp8.clone(); badSig(23) = 0x00
    assert(ImageCodec.webpDims(badSig) == -1L)
    // a declared chunk size smaller than the bitstream header
    val shortChunk = vp8.clone(); shortChunk(16) = 4; shortChunk(17) = 0
    assert(ImageCodec.webpDims(shortChunk) == -1L)
    // unknown first chunk
    assert(ImageCodec.webpDims(riff("ALPH", Seq.fill(12)(0.toByte)))
      == -1L)
    // RIFF/WAVE (a real WAV header) is NOT an image: -1 from both
    val wav = AudioCodec.wavBytes(8000, 1, 16)((_, _) => 0)
    assert(ImageCodec.webpDims(wav) == -1L)
    assert(ImageCodec.imageDims(wav) == -1L)
    // and the codegen'd expression path carries the new arm
    val got = Seq((1L, vp8), (2L, vp8l), (3L, vp8x), (4L, wav))
      .toDF("id", "payload")
      .select(col("id"), Multimedia.imageDims(col("payload")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ((160L << 32) | 120L))
    assert(got(2L) == ((33L << 32) | 17L))
    assert(got(3L) == ((1000L << 32) | 600L))
    assert(got(4L) == -1L)
  }

  test("m14 image_stats: decoded luminance mean/range/variance — " +
      "the blank/flat admission gate, exact on planted scenes") {
    import spark.implicits._
    // solid mid-gray: luma = (77+150+29)·128 >> 8 = 128 exactly —
    // mean 128, range 0, variance 0 (the blank-frame signature)
    val solid = ImageCodec.pngBytes(64, 48)((_, _) => 0x808080)
    assert(ImageCodec.grayStats(solid, 0) == 128L)
    assert(ImageCodec.grayStats(solid, 1) == 0L)
    assert(ImageCodec.grayStats(solid, 2) == 0L)
    // half black / half white: luma 0 and 255, so mean floor 127,
    // range 255, variance floor(255²/4) = 16256
    val split = ImageCodec.pngBytes(64, 48)((x, _) =>
      if (x < 32) 0x000000 else 0xFFFFFF)
    assert(ImageCodec.grayStats(split, 0) == 127L)
    assert(ImageCodec.grayStats(split, 1) == 255L)
    assert(ImageCodec.grayStats(split, 2) == 16256L)
    // a real scene has contrast; a JPEG of a solid color stays
    // near-flat through the lossy roundtrip
    val scene = ImageCodec.pngBytes(64, 48)((x, y) =>
      (((x * 3 + y * 5) & 0xff) * 0x010101))
    assert(ImageCodec.grayStats(scene, 1) > 64L)
    val flatJpg = ImageCodec.imageBytes("jpg", 64, 48)((_, _) => 0x808080)
    assert(ImageCodec.grayStats(flatJpg, 1) <= 8L)
    // non-image / truncated payloads hit the -1 sentinel
    assert(ImageCodec.grayStats("words".getBytes("UTF-8"), 0) == -1L)
    assert(ImageCodec.grayStats(solid.take(20), 2) == -1L)
    // the codegen'd expression path: gate a mixed batch in one plan
    val rows = Seq((1L, solid), (2L, split),
        (3L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        Multimedia.imageMeanLuma(col("payload")).as("mean"),
        Multimedia.imageLumaRange(col("payload")).as("rng"),
        Multimedia.imageLumaVariance(col("payload")).as("vr"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) == ((128L, 0L, 0L)))
    assert(rows(2L) == ((127L, 255L, 16256L)))
    assert(rows(3L) == ((-1L, -1L, -1L)))
  }

  test("m15 exif_orientation: APP1 TIFF IFD0 walk, both byte orders, " +
      "no decode") {
    import spark.implicits._
    // every orientation, both TIFF byte orders
    (1 to 8).foreach { o =>
      assert(ImageCodec.exifOrientation(
        ImageCodec.exifBytes(o, little = true)) == o.toLong)
      assert(ImageCodec.exifOrientation(
        ImageCodec.exifBytes(o, little = false)) == o.toLong)
    }
    // a REAL JDK-encoded JPEG carries no EXIF → -1 (not a crash);
    // non-JPEG and truncated payloads → -1
    val jpg = ImageCodec.imageBytes("jpg", 32, 16)((x, y) =>
      ((x * 5 + y) & 0xff) * 0x010101)
    assert(ImageCodec.exifOrientation(jpg) == -1L)
    assert(ImageCodec.exifOrientation(
      "not an image".getBytes("UTF-8")) == -1L)
    val full = ImageCodec.exifBytes(6, little = true)
    assert(ImageCodec.exifOrientation(full.take(14)) == -1L)
    // out-of-range orientation value and a corrupt TIFF magic → -1
    val bad = ImageCodec.exifBytes(6, little = true)
    bad(30) = 9 // the SHORT value byte (LE): orientation 9 is invalid
    assert(ImageCodec.exifOrientation(bad) == -1L)
    val badMagic = ImageCodec.exifBytes(3, little = true)
    badMagic(14) = 0 // TIFF magic 42 → 0
    assert(ImageCodec.exifOrientation(badMagic) == -1L)
    // the codegen'd expression path over a mixed batch
    val rows = Seq(
        (1L, ImageCodec.exifBytes(6, little = true)),
        (2L, ImageCodec.exifBytes(8, little = false)),
        (3L, jpg), (4L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        Multimedia.exifOrientation(col("payload")).as("o"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 6L, 2L -> 8L, 3L -> -1L, 4L -> -1L))
  }

  test("m18 mp4_field frame stats: stts walk — frame count + " +
      "milli-fps from the first video track, hostile tables bounded") {
    import graft.functions.VideoCodec
    // 300 frames at delta 1001 in a 30000-tick media clock = the
    // canonical 29.97 fps NTSC layout, split across two stts runs
    val v = VideoCodec.mp4Bytes(1000L, 10010L,
      tracks = Seq(("vide", "avc1"), ("soun", "mp4a")),
      stts = Seq((100L, 1001L), (200L, 1001L)),
      mediaTimescale = 30000L)
    assert(VideoCodec.mp4Field(v, 6) == 300L)
    // 300 * 30000 * 1000 / 300300 = 29970 milli-fps exactly
    assert(VideoCodec.mp4Field(v, 7) == 29970L)
    // constant-rate single run: 25 fps exactly
    val cfr = VideoCodec.mp4Bytes(1000L, 4000L,
      tracks = Seq(("vide", "avc1")),
      stts = Seq((100L, 40L)), mediaTimescale = 1000L)
    assert(VideoCodec.mp4Field(cfr, 6) == 100L)
    assert(VideoCodec.mp4Field(cfr, 7) == 25000L)
    // audio-only file: no video track -> -1 (not the soun table)
    val aud = VideoCodec.mp4Bytes(1000L, 4000L,
      tracks = Seq(("soun", "mp4a")),
      stts = Seq((50L, 80L)), mediaTimescale = 1000L)
    assert(VideoCodec.mp4Field(aud, 6) == -1L)
    assert(VideoCodec.mp4Field(aud, 7) == -1L)
    // a track table without a sample table (m13/m16 shapes) stays
    // probe-able and m18 degrades to -1, not a throw
    val nostts = VideoCodec.mp4Bytes(1000L, 4000L,
      tracks = Seq(("vide", "avc1")))
    assert(VideoCodec.mp4Field(nostts, 3) == 1L)
    assert(VideoCodec.mp4Field(nostts, 6) == -1L)
    // hostile: truncation at every prefix never throws or over-reads
    (0 until v.length).foreach { n =>
      VideoCodec.mp4Field(v.take(n), 6); VideoCodec.mp4Field(v.take(n), 7)
    }
    // hostile entry_count larger than the box bounds -> -1
    val bad = v.clone()
    val sttsOff = {
      // find the stts 4cc and corrupt its entry_count
      val idx = (0 until bad.length - 4).find(i =>
        bad(i) == 's' && bad(i + 1) == 't' && bad(i + 2) == 't' &&
          bad(i + 3) == 's').get
      idx + 8
    }
    bad(sttsOff) = 0x7f
    assert(VideoCodec.mp4Field(bad, 6) == -1L)
    // zero total delta (division guard) -> -1 fps, count still served
    val zero = VideoCodec.mp4Bytes(1000L, 0L,
      tracks = Seq(("vide", "avc1")),
      stts = Seq((10L, 0L)), mediaTimescale = 1000L)
    assert(VideoCodec.mp4Field(zero, 6) == 10L)
    assert(VideoCodec.mp4Field(zero, 7) == -1L)
  }

  test("m13 mp4_field: header-only ISO-BMFF probe — timescale/" +
      "duration without demux, v0 and v1 mvhd, skipped boxes") {
    import spark.implicits._
    import graft.functions.VideoCodec
    // 90 kHz movie timescale, 45000 ticks = exactly 0.5 s
    val v0 = VideoCodec.mp4Bytes(90000L, 45000L)
    assert(VideoCodec.mp4Field(v0, 0) == 90000L)
    assert(VideoCodec.mp4Field(v0, 1) == 45000L)
    assert(VideoCodec.mp4Field(v0, 2) == 500000L)
    // version-1 mvhd (64-bit duration) parses the wide layout
    val v1 = VideoCodec.mp4Bytes(600L, 3600L, version = 1)
    assert(VideoCodec.mp4Field(v1, 2) == 6000000L) // 6 s
    // a leading free box between ftyp and moov is walked over, not
    // assumed away (the box walk, not fixed offsets)
    val freed = VideoCodec.mp4Bytes(1000L, 1500L, leadingFree = true)
    assert(VideoCodec.mp4Field(freed, 2) == 1500000L)
    // non-MP4 / truncated / corrupted payloads hit the -1 sentinel
    assert(VideoCodec.mp4Field("not a video".getBytes("UTF-8"), 0) == -1L)
    assert(VideoCodec.mp4Field(v0.take(30), 0) == -1L)
    val rogue = v0.clone(); rogue(4) = 'J' // break the ftyp tag
    assert(VideoCodec.mp4Field(rogue, 0) == -1L)
    // hostile box size (0) cannot loop the walk
    val badSz = v0.clone()
    badSz(20) = 0; badSz(21) = 0; badSz(22) = 0; badSz(23) = 0
    assert(VideoCodec.mp4Field(badSz, 0) == -1L)
    // the codegen'd expression path, mixed payloads in one plan
    val got = Seq((1L, v0), (2L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        Multimedia.mp4Timescale(col("payload")).as("t"),
        Multimedia.mp4DurationMicros(col("payload")).as("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((90000L, 500000L)) && got(2L) == ((-1L, -1L)))
  }

  test("m16 mp4 track walk: stream counts + codec 4CCs from " +
      "trak/hdlr/stsd on canonical boxes, hostile sizes bounded") {
    import spark.implicits._
    import graft.functions.VideoCodec
    // the canonical A/V mux: one avc1 video track, one mp4a audio
    val av = VideoCodec.mp4Bytes(90000L, 45000L,
      tracks = Seq("vide" -> "avc1", "soun" -> "mp4a"))
    assert(VideoCodec.mp4Tracks(av) == "vide/avc1,soun/mp4a")
    assert(VideoCodec.mp4Field(av, 3) == 2L)
    assert(VideoCodec.mp4Field(av, 4) == 1L)
    assert(VideoCodec.mp4Field(av, 5) == 1L)
    // the mvhd fields still read through the widened moov
    assert(VideoCodec.mp4Field(av, 2) == 500000L)
    // audio-only and multi-track orders preserve file order
    val audio = VideoCodec.mp4Bytes(600L, 600L,
      tracks = Seq("soun" -> "mp4a"))
    assert(VideoCodec.mp4Tracks(audio) == "soun/mp4a")
    assert((VideoCodec.mp4Field(audio, 4), VideoCodec.mp4Field(audio, 5))
      == ((0L, 1L)))
    val multi = VideoCodec.mp4Bytes(600L, 600L, tracks =
      Seq("soun" -> "mp4a", "vide" -> "hvc1", "text" -> "tx3g"))
    assert(VideoCodec.mp4Tracks(multi) == "soun/mp4a,vide/hvc1,text/tx3g")
    assert(VideoCodec.mp4Field(multi, 3) == 3L)
    // track-less MP4: empty table, zero counts (not the sentinel)
    val bare = VideoCodec.mp4Bytes(1000L, 1500L)
    assert(VideoCodec.mp4Tracks(bare) == "" &&
      VideoCodec.mp4Field(bare, 3) == 0L)
    // non-MP4 payloads: "-" / -1 sentinels
    assert(VideoCodec.mp4Tracks("not video".getBytes("UTF-8")) == "-")
    assert(VideoCodec.mp4Field("not video".getBytes("UTF-8"), 3) == -1L)
    // a trak whose mdia is truncated degrades to ???? parts, never
    // throws (per-record fault tolerance on hostile headers)
    val torn = av.clone()
    // break the first trak's mdia tag so its sub-walk finds nothing
    val mdiaOff = {
      def find(tag: String, from: Int): Int = {
        val b = tag.getBytes("US-ASCII")
        (from until torn.length - 4).find(i => torn(i) == b(0) &&
          torn(i + 1) == b(1) && torn(i + 2) == b(2) &&
          torn(i + 3) == b(3)).get
      }
      find("mdia", 0)
    }
    torn(mdiaOff) = 'X'
    assert(VideoCodec.mp4Tracks(torn).startsWith("????/????"))
    // hostile zero box size inside moov cannot loop the trak walk
    val badSz = av.clone()
    // zero the first trak's size word (trak tag found, back up 4)
    val trakOff = (0 until badSz.length - 4).find(i =>
      badSz(i) == 't' && badSz(i + 1) == 'r' && badSz(i + 2) == 'a' &&
        badSz(i + 3) == 'k').get - 4
    badSz(trakOff) = 0; badSz(trakOff + 1) = 0
    badSz(trakOff + 2) = 0; badSz(trakOff + 3) = 0
    assert(VideoCodec.mp4Field(badSz, 3) == 0L) // bounded abort
    // the codegen'd expression path over mixed payloads
    val got = Seq((1L, av), (2L, "txt".getBytes("UTF-8")), (3L, bare))
      .toDF("id", "payload")
      .select(col("id"),
        graft.functions.Multimedia.mp4Tracks(col("payload")).as("t"),
        graft.functions.Multimedia.mp4VideoTracks(col("payload")).as("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("vide/avc1,soun/mp4a", 1L)))
    assert(got(2L) == (("-", -1L)) && got(3L) == (("", 0L)))
    // the SQL surface (spark.sql callable like the other probes; the
    // shared test session has no extensions — retrofit-register)
    GraftExtensions.register(spark)
    val sq = spark.sql(
      "SELECT graft_mp4_tracks(X'00') AS t, graft_mp4_field(X'00', 3) AS n")
      .collect()(0)
    assert(sq.getString(0) == "-" && sq.getLong(1) == -1L)
  }

  test("m17 mp3_field: Layer III frame probe — tables, ID3v2 skip, " +
    "hostile scan bounded") {
    import spark.implicits._
    // MPEG-1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), stereo
    val v1 = AudioCodec.mp3Bytes(3, 9, 0, mono = false)
    assert(AudioCodec.mp3Field(v1, 0) == 44100L)
    assert(AudioCodec.mp3Field(v1, 1) == 128L)
    assert(AudioCodec.mp3Field(v1, 2) == 2L)
    // V1 frame length: 144*128000/44100 = 417 (floor, no padding)
    assert(AudioCodec.mp3Field(v1, 3) == 417L)
    // MPEG-2 table: 64 kbps (idx 8), 22050 Hz (idx 0), mono
    val v2 = AudioCodec.mp3Bytes(2, 8, 0, mono = true)
    assert(AudioCodec.mp3Field(v2, 0) == 22050L)
    assert(AudioCodec.mp3Field(v2, 1) == 64L)
    assert(AudioCodec.mp3Field(v2, 2) == 1L)
    assert(AudioCodec.mp3Field(v2, 3) == 72L * 64 * 1000 / 22050)
    // an ID3v2 tag prefix is skipped by its syncsafe size
    val tagged = AudioCodec.mp3Bytes(3, 9, 0, mono = false,
      id3Size = 200)
    assert(AudioCodec.mp3Field(tagged, 0) == 44100L)
    // non-audio, truncation, reserved version bits, bad indexes
    assert(AudioCodec.mp3Field("not audio".getBytes("UTF-8"), 0) == -1L)
    assert(AudioCodec.mp3Field(v1.take(3), 0) == -1L)
    assert(AudioCodec.mp3Field(
      AudioCodec.mp3Bytes(1, 9, 0, mono = false), 0) == -1L) // reserved ver
    assert(AudioCodec.mp3Field(
      AudioCodec.mp3Bytes(3, 15, 0, mono = false), 0) == -1L) // bad bitrate
    assert(AudioCodec.mp3Field(
      AudioCodec.mp3Bytes(3, 9, 3, mono = false), 0) == -1L) // bad rate
    // a WAV payload must not alias the MP3 gate
    val wav = AudioCodec.wavBytes(44100, 2, 100)((f, c) => f + c)
    assert(AudioCodec.mp3Field(wav, 0) == -1L)
    // hostile: an ID3 size pointing past the payload is rejected
    val torn = AudioCodec.mp3Bytes(3, 9, 0, mono = false,
      id3Size = 100).take(60)
    assert(AudioCodec.mp3Field(torn, 0) == -1L)
    // codegen'd expression + SQL surface over mixed payloads
    GraftExtensions.register(spark)
    val got = Seq((1L, v1), (2L, "txt".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        graft.functions.Multimedia.mp3SampleRate(col("payload")).as("r"),
        graft.functions.Multimedia.mp3BitrateKbps(col("payload")).as("b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((44100L, 128L)) && got(2L) == ((-1L, -1L)))
    val sq = spark.sql("SELECT graft_mp3_field(X'00', 0) AS r")
      .collect()(0)
    assert(sq.getLong(0) == -1L)
  }

  test("m21 tiff dims: IFD0 walk at file scope — both byte orders, " +
    "magic-42 gate, hostile truncation") {
    import spark.implicits._
    // real JDK TIFF encoder output (little-endian "II")
    val tif = ImageCodec.imageBytes("tiff", 33, 21)((x, y) => x ^ y)
    assert(tif.nonEmpty, "JDK TIFF writer missing")
    assert(ImageCodec.tiffDims(tif) == ((33L << 32) | 21L))
    assert(ImageCodec.imageDims(tif) == ((33L << 32) | 21L))
    // forged big-endian "MM" file: IFD0 at 8, SHORT width 42 (the
    // LEFT-justified value field), LONG height 17
    val mm = Array[Int](
      'M', 'M', 0, 42, 0, 0, 0, 8, // header: BE, magic, IFD0 @ 8
      0, 2, // two entries
      1, 0, 0, 3, 0, 0, 0, 1, 0, 42, 0, 0, // 256 SHORT 1 val=42
      1, 1, 0, 4, 0, 0, 0, 1, 0, 0, 0, 17, // 257 LONG  1 val=17
      0, 0, 0, 0 // next-IFD: none
    ).map(_.toByte)
    assert(ImageCodec.tiffDims(mm) == ((42L << 32) | 17L))
    assert(ImageCodec.imageDims(mm) == ((42L << 32) | 17L))
    // hostile: text starting "II" fails the magic-42 gate; truncation
    // at every prefix; zero dims rejected; non-TIFF payloads
    assert(ImageCodec.tiffDims("IIx and more text".getBytes("UTF-8"))
      == -1L)
    // prefixes below 34 bytes cut into the second IFD entry and must
    // fail; 34+ carry both entries complete (the unread next-IFD
    // pointer is not required by a header probe)
    (0 until 34).foreach { n =>
      assert(ImageCodec.tiffDims(mm.take(n)) == -1L)
    }
    assert(ImageCodec.tiffDims(mm.take(34)) == ((42L << 32) | 17L))
    val zeroW = mm.clone(); zeroW(18) = 0; zeroW(19) = 0
    assert(ImageCodec.tiffDims(zeroW) == -1L)
    assert(ImageCodec.tiffDims(
      ImageCodec.pngBytes(4, 4)((x, y) => x + y)) == -1L)
    // the m12 SQL dispatch serves TIFF like the other formats
    GraftExtensions.register(spark)
    val got = Seq((1L, tif), (2L, "txt".getBytes("UTF-8")))
      .toDF("id", "payload")
      .selectExpr("id", "graft_image_dims(payload) AS d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ((33L << 32) | 21L) && got(2L) == -1L)
  }

  test("m20 gif_field: animation probe — frames/loop/duration from " +
    "real encoder output, hostile walk bounded") {
    import spark.implicits._
    // 4 frames, 12 cs each, NETSCAPE loop 3 — the JDK's own encoder
    val anim = ImageCodec.animatedGifBytes(4, 12, 3)
    assert(ImageCodec.gifField(anim, 0) == 4L)
    assert(ImageCodec.gifField(anim, 1) == 3L)
    assert(ImageCodec.gifField(anim, 2) == 48L)
    assert(ImageCodec.gifField(anim, 3) == 1L)
    // loop 0 = forever (the banner-GIF default)
    assert(ImageCodec.gifField(
      ImageCodec.animatedGifBytes(2, 5, 0), 1) == 0L)
    // no NETSCAPE block: loop degrades to -1 = play once
    val once = ImageCodec.animatedGifBytes(3, 7, -1)
    assert(ImageCodec.gifField(once, 0) == 3L)
    assert(ImageCodec.gifField(once, 1) == -1L)
    // a static single-frame GIF is NOT animated; m12 dims agree
    val still = ImageCodec.imageBytes("gif", 11, 7)((x, y) => x * y)
    assert(ImageCodec.gifField(still, 0) == 1L)
    assert(ImageCodec.gifField(still, 3) == 0L)
    assert(ImageCodec.gifDims(still) == ((11L << 32) | 7L))
    assert(ImageCodec.gifDims(anim) == ((8L << 32) | 8L))
    // hostile: text, truncation at every prefix (never over-reads,
    // never loops), a PNG payload must not alias the gate
    assert(ImageCodec.gifField("not a gif".getBytes("UTF-8"), 0) == -1L)
    (0 until anim.length).foreach { n =>
      assert(ImageCodec.gifField(anim.take(n), 0) == -1L)
    }
    assert(ImageCodec.gifField(
      ImageCodec.pngBytes(4, 4)((x, y) => x + y), 0) == -1L)
    // forged sub-block length pointing past the payload is rejected
    val forged = anim.clone()
    // find the first image descriptor and corrupt a data sub-block
    // length to 0xFF near the tail
    forged(forged.length - 2) = 0xff.toByte
    assert(ImageCodec.gifField(forged, 0) == -1L)
    // codegen'd expression + SQL surface over mixed payloads
    GraftExtensions.register(spark)
    val got = Seq((1L, anim), (2L, still), (3L, "txt".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        graft.functions.Multimedia.gifFrames(col("payload")).as("f"),
        graft.functions.Multimedia.gifAnimated(col("payload")).as("a"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((4L, 1L)) && got(2L) == ((1L, 0L)) &&
      got(3L) == ((-1L, -1L)))
    val sq = spark.sql("SELECT graft_gif_field(X'00', 0) AS f")
      .collect()(0)
    assert(sq.getLong(0) == -1L)
  }

  test("m20 gif loop-count admission: only NETSCAPE2.0/ANIMEXTS1.0 " +
    "application IDs may set the loop; a forged XMP-shaped block " +
    "must not") {
    // hand-built GIF89a: 13-byte header (no global color table), one
    // application extension, one bare image descriptor, trailer
    def gifWith(appId: String, sub: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(Array[Byte](8, 0, 8, 0, 0, 0, 0)) // LSD, no GCT
      out.write(0x21); out.write(0xff)             // application ext
      out.write(appId.length)                      // 11-byte app id
      out.write(appId.getBytes("US-ASCII"))
      out.write(sub.length); out.write(sub)        // data sub-block
      out.write(0)                                 // sub-block term
      out.write(0x2c)                              // image descriptor
      out.write(Array[Byte](0, 0, 0, 0, 8, 0, 8, 0, 0)) // no LCT
      out.write(2)                                 // LZW min code
      out.write(0)                                 // empty data
      out.write(0x3b)                              // trailer
      out.toByteArray
    }
    val loopSub = Array[Byte](1, 7, 0) // 01, count=7 LE16
    // genuine NETSCAPE2.0 and the ANIMEXTS1.0 alias both honored
    assert(ImageCodec.gifField(gifWith("NETSCAPE2.0", loopSub), 1) == 7L)
    assert(ImageCodec.gifField(gifWith("ANIMEXTS1.0", loopSub), 1) == 7L)
    // an XMP-shaped application block whose data sub-block happens to
    // start with 0x01 must NOT forge the loop count (was the r15 bug)
    assert(ImageCodec.gifField(gifWith("XMP DataXMP", loopSub), 1) == -1L)
    assert(ImageCodec.gifField(gifWith("FORGEDAPPID", loopSub), 1) == -1L)
    // frames still count regardless of the rejected extension
    assert(ImageCodec.gifField(gifWith("XMP DataXMP", loopSub), 0) == 1L)
  }

  test("m18 mp4_field overflow discipline: hostile stts counts/deltas " +
    "and a huge media timescale return the -1 sentinel, not wrapped " +
    "garbage") {
    import graft.functions.VideoCodec
    val u32 = 0xffffffffL
    // c·d = (2^32−1)² overflows int64 inside the stts walk → None
    val cdOv = VideoCodec.mp4Bytes(1000L, 4000L,
      tracks = Seq(("vide", "avc1")),
      stts = Seq((u32, u32)), mediaTimescale = 1000L)
    assert(VideoCodec.mp4Field(cdOv, 6) == -1L)
    assert(VideoCodec.mp4Field(cdOv, 7) == -1L)
    // 256 max-count entries overflow the samples accumulator's
    // product path: samples·mts·1000 > 2^63 → fps sentinel (frame
    // count itself stays exact and in-range)
    val sumOv = VideoCodec.mp4Bytes(1000L, 4000L,
      tracks = Seq(("vide", "avc1")),
      stts = (1 to 256).map(_ => (u32, 1L)), mediaTimescale = u32)
    assert(VideoCodec.mp4Field(sumOv, 6) == 256L * u32)
    assert(VideoCodec.mp4Field(sumOv, 7) == -1L)
    // a sane table still measures exactly
    val ok = VideoCodec.mp4Bytes(1000L, 4000L,
      tracks = Seq(("vide", "avc1")),
      stts = Seq((100L, 40L)), mediaTimescale = 1000L)
    assert(VideoCodec.mp4Field(ok, 7) == 25000L)
  }

  test("m19 flac_field: STREAMINFO probe — bit-packed fields, " +
    "mandatory first block, hostile shapes") {
    import spark.implicits._
    // CD audio: 44.1 kHz stereo 16-bit, 441000 samples = exactly 10 s
    val cd = AudioCodec.flacBytes(44100L, 2, 16, 441000L)
    assert(AudioCodec.flacField(cd, 0) == 44100L)
    assert(AudioCodec.flacField(cd, 1) == 2L)
    assert(AudioCodec.flacField(cd, 2) == 16L)
    assert(AudioCodec.flacField(cd, 3) == 10000000L)
    assert(AudioCodec.flacField(cd, 4) == 441000L)
    // hi-res: 192 kHz (needs all 20 rate bits), 8ch (3-bit max),
    // 24-bit (crosses the byte-split bps field), >2^32 samples
    // (exercises the 36-bit split)
    val hi = AudioCodec.flacBytes(192000L, 8, 24, (1L << 33) + 7L)
    assert(AudioCodec.flacField(hi, 0) == 192000L)
    assert(AudioCodec.flacField(hi, 1) == 8L)
    assert(AudioCodec.flacField(hi, 2) == 24L)
    assert(AudioCodec.flacField(hi, 4) == (1L << 33) + 7L)
    // total samples 0 = unknown (the spec sentinel): duration -1,
    // rate/channels still served
    val unk = AudioCodec.flacBytes(48000L, 2, 16, 0L)
    assert(AudioCodec.flacField(unk, 0) == 48000L)
    assert(AudioCodec.flacField(unk, 3) == -1L)
    assert(AudioCodec.flacField(unk, 4) == 0L)
    // hostile shapes: text, truncation at every prefix, a first
    // block that is not STREAMINFO, a wrong block length, rate 0
    assert(AudioCodec.flacField("not audio".getBytes("UTF-8"), 0) == -1L)
    (0 until 42).foreach { n =>
      assert(AudioCodec.flacField(cd.take(n), 0) == -1L)
    }
    assert(AudioCodec.flacField(
      AudioCodec.flacBytes(44100L, 2, 16, 1L, blockType = 4), 0) == -1L)
    assert(AudioCodec.flacField(
      AudioCodec.flacBytes(44100L, 2, 16, 1L, blockLen = 20), 0) == -1L)
    assert(AudioCodec.flacField(
      AudioCodec.flacBytes(0L, 2, 16, 1L), 0) == -1L)
    // cross-format: WAV and MP3 payloads must not alias the gate
    val wavx = AudioCodec.wavBytes(44100, 2, 10)((f, c) => f + c)
    assert(AudioCodec.flacField(wavx, 0) == -1L)
    assert(AudioCodec.flacField(
      AudioCodec.mp3Bytes(3, 9, 0, mono = false), 0) == -1L)
    // and FLAC must not alias the WAV/MP3 gates
    assert(AudioCodec.wavField(cd, 0) == -1L)
    assert(AudioCodec.mp3Field(cd, 0) == -1L)
    // codegen'd expression + SQL surface
    GraftExtensions.register(spark)
    val got = Seq((1L, cd), (2L, "txt".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        graft.functions.Multimedia.flacSampleRate(col("payload")).as("r"),
        graft.functions.Multimedia.flacDurationMicros(col("payload"))
          .as("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((44100L, 10000000L)) && got(2L) == ((-1L, -1L)))
    val sq = spark.sql("SELECT graft_flac_field(X'00', 0) AS r")
      .collect()(0)
    assert(sq.getLong(0) == -1L)
  }

  test("m10 wav_field: header-only WAV probe — rate/channels/bits/" +
      "duration without sample decode") {
    import spark.implicits._
    // 44.1 kHz stereo, 22050 frames = exactly 0.5 s
    val wav = AudioCodec.wavBytes(44100, 2, 22050)((f, c) => f + c)
    assert(AudioCodec.wavField(wav, 0) == 44100L)
    assert(AudioCodec.wavField(wav, 1) == 2L)
    assert(AudioCodec.wavField(wav, 2) == 16L)
    assert(AudioCodec.wavField(wav, 3) == 500000L) // microseconds
    // mono 8 kHz, 8000 frames = 1 s exactly
    val mono = AudioCodec.wavBytes(8000, 1, 8000)((f, _) => f)
    assert(AudioCodec.wavField(mono, 3) == 1000000L)
    // non-WAV payloads hit the -1 sentinel: text, truncation, RIFF
    // magic with a corrupted WAVE tag
    assert(AudioCodec.wavField("not audio".getBytes("UTF-8"), 0) == -1L)
    assert(AudioCodec.wavField(wav.take(30), 0) == -1L)
    val rogue = wav.clone(); rogue(8) = 'J'
    assert(AudioCodec.wavField(rogue, 0) == -1L)
    // a WAV with a leading LIST chunk before fmt/data still parses
    // (the chunk walk, not fixed offsets)
    val listed = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(wav, 0, 12) // RIFF + size + WAVE
      out.write("LIST".getBytes("US-ASCII")); out.write(Array[Byte](4, 0, 0, 0))
      out.write("INFO".getBytes("US-ASCII"))
      out.write(wav, 12, wav.length - 12) // fmt + data as-is
      out.toByteArray
    }
    assert(AudioCodec.wavField(listed, 0) == 44100L)
    assert(AudioCodec.wavField(listed, 3) == 500000L)
    // the codegen'd expression path, mixed payloads in one plan
    val got = Seq((1L, wav), (2L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        Multimedia.wavSampleRate(col("payload")).as("r"),
        Multimedia.wavChannels(col("payload")).as("c"),
        Multimedia.wavDurationMicros(col("payload")).as("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((44100L, 2L, 500000L)))
    assert(got(2L) == ((-1L, -1L, -1L)))
  }

  test("m11 audioFeatures: planted PCM payloads report hand-computed " +
      "block RMS and zero-crossings; text payloads take the fallback") {
    import spark.implicits._
    val blocks = graft.operators.Multimodal.AudioBlocks
    // constant amplitude 1000, mono: every block RMS = 1000, zcr = 0
    val flat = AudioCodec.wavBytes(8000, 1, 800)((_, _) => 1000)
    // alternating ±1000: RMS = 1000, zcr = samples-per-block - 1
    val alt = AudioCodec.wavBytes(8000, 1, 800)((f, _) =>
      if (f % 2 == 0) 1000 else -1000)
    // silence: RMS = 0, zcr = 0
    val silent = AudioCodec.wavBytes(8000, 1, 800)((_, _) => 0)
    val rows = Seq(
      graft.operators.Multimodal.MediaRow(1L,
        graft.operators.Multimodal.MediaMeta("wav", flat.length.toLong, 8000),
        flat),
      graft.operators.Multimodal.MediaRow(2L,
        graft.operators.Multimodal.MediaMeta("wav", alt.length.toLong, 8000),
        alt),
      graft.operators.Multimodal.MediaRow(3L,
        graft.operators.Multimodal.MediaMeta("wav", silent.length.toLong, 8000),
        silent),
      graft.operators.Multimodal.MediaRow(4L,
        graft.operators.Multimodal.MediaMeta("txt", 4L, 0),
        "text".getBytes("UTF-8")))
    val got = graft.operators.Multimodal.audioFeatures(rows.toDS())
      .collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).is_wav && got(1L).sample_rate == 8000L &&
      got(1L).channels == 1L && got(1L).duration_us == 100000L)
    assert(got(1L).block_rms == Seq.fill(blocks)(1000L))
    assert(got(1L).block_zcr == Seq.fill(blocks)(0L))
    assert(got(2L).block_rms == Seq.fill(blocks)(1000L))
    // 100 samples per block, 99 consecutive pairs, every pair flips
    assert(got(2L).block_zcr == Seq.fill(blocks)(99L))
    assert(got(3L).block_rms == Seq.fill(blocks)(0L))
    assert(got(3L).block_zcr == Seq.fill(blocks)(0L))
    assert(!got(4L).is_wav && got(4L).sample_rate == -1L &&
      got(4L).duration_us == -1L && got(4L).block_rms.isEmpty)
    // kernel-level: a stereo payload reads CHANNEL 0 only (left
    // constant 500, right noisy) — RMS pins to the left channel
    val stereo = AudioCodec.wavBytes(8000, 2, 160)((f, c) =>
      if (c == 0) 500 else (f * 31 % 1997) - 998)
    val (rms, zcr) = AudioCodec.blockFeatures(stereo, 4).get
    assert(rms == Seq.fill(4)(500L) && zcr == Seq.fill(4)(0L))
  }

  test("m01 decodeFeatures: a real PNG row reports PIXEL statistics") {
    import spark.implicits._
    val png = ImageCodec.pngBytes(10, 10)((_, _) => 0xFFFFFF)
    val textB = "abc".getBytes("UTF-8")
    val rows = Seq(
      graft.operators.Multimodal.MediaRow(1L,
        graft.operators.Multimodal.MediaMeta("png", png.length.toLong, 0),
        png),
      graft.operators.Multimodal.MediaRow(2L,
        graft.operators.Multimodal.MediaMeta("jpeg", 3L, 0), textB))
    val feats = graft.operators.Multimodal
      .decodeFeatures(rows.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    // white pixels: integer luma (77+150+29)*255 >> 8 = 255
    assert(feats(1L).mean_byte == 255.0 && feats(1L).first_byte == 255)
    // text row keeps byte statistics ('a'=97,'b'=98,'c'=99)
    assert(feats(2L).mean_byte == 98.0 && feats(2L).first_byte == 97)
  }
}
