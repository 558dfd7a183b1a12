package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Media kernels (SURVEY.md §2d) — pixel-domain for real images,
  * byte-domain fallback for everything else.
  *
  * Payloads that ARE images (PNG/JPEG by magic sniff) decode through
  * [[ImageCodec]] (JDK imageio — a REAL codec, de-stubbed r9) and
  * resample as 2-D box-filtered grayscale thumbnails; non-media
  * payloads take the 1-D byte kernels (output byte i reads/averages
  * input block i·len/k — the deterministic stand-in the oracles
  * check on the synthetic text-payload corpus). The Spark-side
  * contract is identical either way: BinaryType → fixed-size
  * BinaryType, codegen'd, no UDF boundary, so a 100 TB thumbnail
  * pass stays inside whole-stage codegen — the decode is a static
  * JVM call from the generated code.
  */
object MultimediaKernel {
  def resample(payload: Array[Byte], k: Int): Array[Byte] =
    ImageCodec.thumbK(payload, k)
      .getOrElse(resampleBytes(payload, k))

  /** 1-D nearest-neighbor byte resample (the non-image path). */
  def resampleBytes(payload: Array[Byte], k: Int): Array[Byte] = {
    val len = payload.length
    if (len == 0) return Array.emptyByteArray
    val out = new Array[Byte](k)
    var i = 0
    while (i < k) {
      out(i) = payload((i.toLong * len / k).toInt)
      i += 1
    }
    out
  }

  /** Average-pool resample: output byte i is the integer mean of the
    * input block [i·len/k, (i+1)·len/k) — the 1-D analogue of the
    * box-filter downscale a real aHash runs before thresholding.
    * Unlike the nearest-neighbor pick, a small edit shifts every
    * block boundary by O(edit/len) and perturbs each MEAN slightly,
    * instead of re-picking unrelated bytes — the property that makes
    * the perceptual hash stable under near-duplicate perturbations
    * (measured: the dropped-word plants stay within a few bits).
    * Degenerate blocks (len < k) fall back to the boundary byte.
    * Real image payloads take the 2-D pixel path instead (see the
    * object Scaladoc). */
  def blockMean(payload: Array[Byte], k: Int): Array[Byte] =
    ImageCodec.thumbK(payload, k)
      .getOrElse(blockMeanBytes(payload, k))

  /** 1-D average-pool byte resample (the non-image path). */
  def blockMeanBytes(payload: Array[Byte], k: Int): Array[Byte] = {
    val len = payload.length
    if (len == 0) return Array.emptyByteArray
    val out = new Array[Byte](k)
    var i = 0
    while (i < k) {
      val lo = (i.toLong * len / k).toInt
      val hi = ((i + 1).toLong * len / k).toInt
      if (hi <= lo) out(i) = payload(math.min(lo, len - 1))
      else {
        var s = 0L
        var j = lo
        while (j < hi) { s += (payload(j) & 0xff); j += 1 }
        out(i) = (s / (hi - lo)).toByte
      }
      i += 1
    }
    out
  }

  /** Average-hash over an (already fixed-size) thumbnail: bit i set
    * iff unsigned byte i strictly exceeds the mean — compared in
    * integers (b·k > Σb), so the hash is exact and engine-portable.
    * Caller keeps k ≤ 62 so the packed hash stays a positive long. */
  def ahash(thumb: Array[Byte]): Long = {
    val k = thumb.length
    if (k == 0) return 0L
    var sum = 0L
    var i = 0
    while (i < k) { sum += (thumb(i) & 0xff); i += 1 }
    var h = 0L
    i = 0
    while (i < k) {
      if ((thumb(i) & 0xff).toLong * k > sum) h |= (1L << i)
      i += 1
    }
    h
  }
}

/** `byte_resample(payload, k)` — nearest-neighbor resample to k bytes. */
case class ByteResample(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"byte_resample target must be positive, got $k")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    MultimediaKernel.resample(v.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimediaKernel.resample($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `block_mean(payload, k)` — average-pool resample to k bytes. */
case class BlockMean(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"block_mean target must be positive, got $k")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    MultimediaKernel.blockMean(v.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimediaKernel.blockMean($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `png_dims(payload)` — header-only (width << 32 | height) probe of
  * a PNG payload, -1 for non-PNG; no pixel decode (m09). */
case class PngDims(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ImageCodec.pngDims(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ImageCodec.pngDims($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `image_dims(payload)` — format-dispatching header-only
  * (width << 32 | height) probe: PNG IHDR, JPEG SOF marker walk,
  * GIF logical screen, or WebP RIFF chunk walk (VP8 frame tag /
  * VP8L signature / VP8X canvas) by magic bytes; -1 for anything
  * else (m12).
  * One gate expression for a mixed-format media corpus — same
  * no-decode contract as [[PngDims]]. */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ImageCodec.imageDims(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ImageCodec.imageDims($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `wav_field(payload, idx)` — header-only WAV metadata probe
  * (m10): idx 0 = sample rate, 1 = channels, 2 = bits/sample,
  * 3 = duration in microseconds; -1 for non-WAV payloads. Same
  * no-decode contract as [[PngDims]], audio arm. */
case class WavField(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx <= 3, s"wav_field idx must be 0..3, got $idx")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    AudioCodec.wavField(v.asInstanceOf[Array[Byte]], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioCodec.wavField($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mp3_field(payload, idx)` — header-only MP3 (MPEG-1/2 Layer III)
  * frame probe (m17): idx 0 = sample rate, 1 = bitrate kbit/s, 2 =
  * channels, 3 = frame bytes; -1 for non-MP3. ID3v2 prefixes are
  * skipped by their syncsafe size; the sync scan is bounded. The
  * compressed-audio arm next to [[WavField]]'s PCM container. */
case class Mp3Field(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx <= 3, s"mp3_field idx must be 0..3, got $idx")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    AudioCodec.mp3Field(v.asInstanceOf[Array[Byte]], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioCodec.mp3Field($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gif_field(payload, idx)` — GIF ANIMATION probe (m20): idx 0 =
  * frame count, 1 = loop count (0 = forever, -1 = play once), 2 =
  * total duration centiseconds, 3 = animated flag; -1 for non-GIF.
  * The static-vs-animated admission gate after [[ImageDims]]'s size
  * pass; bounded block walk, never decodes LZW pixel data. */
case class GifField(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx <= 3, s"gif_field idx must be 0..3, got $idx")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ImageCodec.gifField(v.asInstanceOf[Array[Byte]], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ImageCodec.gifField($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `flac_field(payload, idx)` — header-only FLAC STREAMINFO probe
  * (m19): idx 0 = sample rate, 1 = channels, 2 = bits/sample, 3 =
  * duration micros (-1 when total samples is the spec's 0=unknown
  * sentinel), 4 = total samples; -1 for non-FLAC. The LOSSLESS
  * audio arm next to [[WavField]] (PCM) and [[Mp3Field]] (lossy). */
case class FlacField(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx <= 4, s"flac_field idx must be 0..4, got $idx")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    AudioCodec.flacField(v.asInstanceOf[Array[Byte]], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioCodec.flacField($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mp4_field(payload, idx)` — header-only MP4 metadata probe
  * (m13/m16): idx 0 = movie timescale, 1 = duration ticks, 2 =
  * duration in microseconds, 3 = track count, 4 = video (`vide`)
  * tracks, 5 = audio (`soun`) tracks; -1 for non-MP4 payloads. Same
  * no-decode contract as [[PngDims]]/[[WavField]], video arm. */
case class Mp4Field(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx <= 7, s"mp4_field idx must be 0..7, got $idx")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VideoCodec.mp4Field(v.asInstanceOf[Array[Byte]], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VideoCodec.mp4Field($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mp4_tracks(payload)` — the m16 track table: `handler/codec`
  * 4CC pairs per moov/trak, comma-joined in file order (e.g.
  * "vide/avc1,soun/mp4a"); "" for a track-less MP4, "-" for non-MP4.
  * Header-only (trak/mdia/hdlr + stbl/stsd box walk, hostile sizes
  * bounded) — the codec-gating arm of [[Mp4Field]]. */
case class Mp4Tracks(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      VideoCodec.mp4Tracks(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.VideoCodec.mp4Tracks($c))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `image_stats(payload, idx)` — DECODED-pixel luminance statistics
  * (m14): idx 0 = floor mean luma, 1 = luma range, 2 = floor
  * population variance; -1 for non-image payloads. The blank/flat
  * admission gate behind the header probes — the one media op here
  * that pays a real decode, so it runs AFTER [[ImageDims]] filters
  * by size/format. */
case class ImageStats(child: Expression, idx: Int)
    extends UnaryExpression {
  require(idx >= 0 && idx <= 2,
    s"image_stats idx must be 0..2, got $idx")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ImageCodec.grayStats(v.asInstanceOf[Array[Byte]], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ImageCodec.grayStats($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `exif_orientation(payload)` — header-only EXIF orientation probe
  * (m15): 1-8 from the JPEG APP1 TIFF IFD0, -1 for non-JPEG /
  * no-EXIF / malformed. The pre-geometry gate of a mobile-photo
  * corpus — same no-decode contract as [[PngDims]]. */
case class ExifOrientation(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ImageCodec.exifOrientation(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ImageCodec.exifOrientation($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ahash(thumb)` — average-hash bit pack of a thumbnail. */
case class AHash(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    MultimediaKernel.ahash(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimediaKernel.ahash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Multimedia {
  def byteResample(payload: Column, k: Int): Column =
    GraftShim.column(ByteResample(GraftShim.expression(payload), k))

  def blockMean(payload: Column, k: Int): Column =
    GraftShim.column(BlockMean(GraftShim.expression(payload), k))

  def aHash(payload: Column): Column =
    GraftShim.column(AHash(GraftShim.expression(payload)))

  def pngDims(payload: Column): Column =
    GraftShim.column(PngDims(GraftShim.expression(payload)))

  def imageDims(payload: Column): Column =
    GraftShim.column(ImageDims(GraftShim.expression(payload)))

  def exifOrientation(payload: Column): Column =
    GraftShim.column(ExifOrientation(GraftShim.expression(payload)))

  def imageMeanLuma(payload: Column): Column =
    GraftShim.column(ImageStats(GraftShim.expression(payload), 0))
  def imageLumaRange(payload: Column): Column =
    GraftShim.column(ImageStats(GraftShim.expression(payload), 1))
  def imageLumaVariance(payload: Column): Column =
    GraftShim.column(ImageStats(GraftShim.expression(payload), 2))

  def mp4Timescale(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 0))
  def mp4DurationTicks(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 1))
  def mp4DurationMicros(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 2))
  def mp4TrackCount(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 3))
  def mp4VideoTracks(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 4))
  def mp4AudioTracks(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 5))
  def mp4Frames(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 6))
  def mp4FpsMilli(payload: Column): Column =
    GraftShim.column(Mp4Field(GraftShim.expression(payload), 7))
  def mp4Tracks(payload: Column): Column =
    GraftShim.column(Mp4Tracks(GraftShim.expression(payload)))

  def mp3SampleRate(payload: Column): Column =
    GraftShim.column(Mp3Field(GraftShim.expression(payload), 0))
  def mp3BitrateKbps(payload: Column): Column =
    GraftShim.column(Mp3Field(GraftShim.expression(payload), 1))
  def mp3Channels(payload: Column): Column =
    GraftShim.column(Mp3Field(GraftShim.expression(payload), 2))
  def mp3FrameBytes(payload: Column): Column =
    GraftShim.column(Mp3Field(GraftShim.expression(payload), 3))

  def gifFrames(payload: Column): Column =
    GraftShim.column(GifField(GraftShim.expression(payload), 0))
  def gifLoopCount(payload: Column): Column =
    GraftShim.column(GifField(GraftShim.expression(payload), 1))
  def gifDurationCs(payload: Column): Column =
    GraftShim.column(GifField(GraftShim.expression(payload), 2))
  def gifAnimated(payload: Column): Column =
    GraftShim.column(GifField(GraftShim.expression(payload), 3))

  def flacSampleRate(payload: Column): Column =
    GraftShim.column(FlacField(GraftShim.expression(payload), 0))
  def flacChannels(payload: Column): Column =
    GraftShim.column(FlacField(GraftShim.expression(payload), 1))
  def flacBits(payload: Column): Column =
    GraftShim.column(FlacField(GraftShim.expression(payload), 2))
  def flacDurationMicros(payload: Column): Column =
    GraftShim.column(FlacField(GraftShim.expression(payload), 3))
  def flacTotalSamples(payload: Column): Column =
    GraftShim.column(FlacField(GraftShim.expression(payload), 4))

  def wavSampleRate(payload: Column): Column =
    GraftShim.column(WavField(GraftShim.expression(payload), 0))
  def wavChannels(payload: Column): Column =
    GraftShim.column(WavField(GraftShim.expression(payload), 1))
  def wavBits(payload: Column): Column =
    GraftShim.column(WavField(GraftShim.expression(payload), 2))
  def wavDurationMicros(payload: Column): Column =
    GraftShim.column(WavField(GraftShim.expression(payload), 3))
}
