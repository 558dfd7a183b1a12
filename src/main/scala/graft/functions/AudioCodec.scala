package graft.functions

/** Header-only WAV (RIFF) metadata probe — the audio arm of the
  * multimodal family (r12 verdict item 6; map2db has no audio
  * surface — this is the training-data-pipeline extension SURVEY §2d
  * specifies). Same design as [[ImageCodec.pngDims]] (m09): a 100 TB
  * media corpus's first pass is metadata extraction (duration/rate
  * gates, shard budgeting) and must never pay a sample decode per
  * blob — the probe is a bounded walk of the RIFF chunk list (public
  * container spec: "RIFF" + size + "WAVE", then (id, little-endian
  * u32 size) chunks; `fmt ` carries channels/rate/bits, `data`
  * carries the payload byte length), pure byte peeks, -1 on anything
  * that is not a well-formed WAV. The RIFF magic is ASCII, but the
  * full gate requires BOTH the "RIFF"/"WAVE" tags and a complete,
  * in-bounds chunk walk ending in valid fmt+data chunks — a text
  * payload cannot satisfy that by accident.
  */
object AudioCodec {

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)

  private def le32(p: Array[Byte], o: Int): Long =
    (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

  private def tag(p: Array[Byte], o: Int, s: String): Boolean =
    p(o) == s.charAt(0).toByte && p(o + 1) == s.charAt(1).toByte &&
      p(o + 2) == s.charAt(2).toByte && p(o + 3) == s.charAt(3).toByte

  /** Walk the chunk list: Some((sampleRate, channels, bitsPerSample,
    * dataBytes)) for a well-formed WAV, None otherwise. Bounded by
    * the payload length; never allocates, never reads samples. */
  def parseWav(p: Array[Byte]): Option[(Long, Int, Int, Long)] =
    parseWavData(p).map { case (r, c, b, _, n) => (r, c, b, n) }

  /** Full parse including the data-chunk byte OFFSET — the feature
    * kernels (m11) need to address samples; the header probes don't. */
  def parseWavData(p: Array[Byte])
      : Option[(Long, Int, Int, Int, Long)] = {
    // 44 = the minimal canonical header (RIFF hdr + PCM fmt + data hdr)
    if (p.length < 44) return None
    if (!tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return None
    var off = 12
    var rate = -1L
    var ch = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= p.length && (rate < 0 || dataLen < 0)) {
      val sz = le32(p, off + 4)
      if (sz < 0 || sz > Int.MaxValue.toLong) return None
      if (tag(p, off, "fmt ") && off + 8 + 16 <= p.length) {
        ch = le16(p, off + 10)
        rate = le32(p, off + 12)
        bits = le16(p, off + 22)
      } else if (tag(p, off, "data")) {
        dataOff = off + 8
        dataLen = sz
      }
      // chunks are word-aligned: odd sizes pad one byte (RIFF spec)
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || bits % 8 != 0 ||
      dataLen < 0) None
    else Some((rate, ch, bits, dataOff,
      math.min(dataLen, (p.length - dataOff).toLong)))
  }

  /** 16-bit LE sample of channel 0, frame i. */
  private def sample(p: Array[Byte], dataOff: Int, frameBytes: Int,
      i: Int): Int = {
    val o = dataOff + i * frameBytes
    ((p(o) & 0xff) | (p(o + 1) << 8)).toShort.toInt
  }

  /** m11: PCM BLOCK FEATURES without any codec — 16-bit PCM samples
    * sit raw in the data chunk, so frame-level audio features are
    * integer byte-walks (the same no-library contract as the m04/m06
    * byte kernels, applied to REAL audio payload layout): channel 0
    * is split into `nBlocks` equal sample ranges and each block
    * reports floor-RMS energy (⌊√(Σs²/n)⌋ — Σs² ≤ n·2³⁰ stays exact
    * in a long, the sqrt is exact in a double below 2⁵²) and the
    * zero-crossing count (sign flips between consecutive samples,
    * zero counted non-negative) — the two classic cheap gates a
    * media-ingest pipeline runs first (silence/clipping detection,
    * voiced-vs-noise screen). None for non-WAV / non-16-bit
    * payloads. */
  def blockFeatures(p: Array[Byte], nBlocks: Int)
      : Option[(Seq[Long], Seq[Long])] =
    parseWavData(p).flatMap { case (_, ch, bits, dataOff, dataLen) =>
      if (bits != 16) None
      else {
        val frameBytes = ch * 2
        val n = (dataLen / frameBytes).toInt
        if (n <= 0) None
        else {
          val rms = new Array[Long](nBlocks)
          val zcr = new Array[Long](nBlocks)
          var b = 0
          while (b < nBlocks) {
            val s0 = (b.toLong * n / nBlocks).toInt
            val s1 = math.max(s0 + 1,
              ((b + 1).toLong * n / nBlocks).toInt)
            val end = math.min(n, s1)
            var sum = 0L
            var zc = 0L
            var i = s0
            var prevNeg = sample(p, dataOff, frameBytes,
              math.max(0, s0)) < 0
            while (i < end) {
              val s = sample(p, dataOff, frameBytes, i)
              sum += s.toLong * s
              val neg = s < 0
              if (i > s0 && neg != prevNeg) zc += 1
              prevNeg = neg
              i += 1
            }
            val cnt = math.max(1, end - s0)
            rms(b) = math.floor(math.sqrt(sum.toDouble / cnt)).toLong
            zcr(b) = zc
            b += 1
          }
          Some((rms.toSeq, zcr.toSeq))
        }
      }
    }

  /** Field probe for the Catalyst expression: 0 = sample rate (Hz),
    * 1 = channels, 2 = bits/sample, 3 = duration in MICROSECONDS
    * (dataBytes · 10⁶ / (rate · ch · bits/8), integer floor — exact
    * and engine-portable). -1 for non-WAV / malformed payloads. */
  def wavField(p: Array[Byte], idx: Int): Long = parseWav(p) match {
    case None => -1L
    case Some((rate, ch, bits, dataLen)) => idx match {
      case 0 => rate
      case 1 => ch.toLong
      case 2 => bits.toLong
      case 3 =>
        val bytesPerSec = rate * ch * (bits / 8)
        if (bytesPerSec <= 0) -1L else dataLen * 1000000L / bytesPerSec
      case _ => -1L
    }
  }

  /** Spec helper: REAL deterministic PCM WAV bytes — `sample(frame,
    * channel)` returns the 16-bit sample value. Canonical 44-byte
    * header + interleaved little-endian PCM, so the spec's planted
    * payloads exercise the exact container layout a production blob
    * carries. */
  def wavBytes(rate: Int, channels: Int, frames: Int)(
      sample: (Int, Int) => Int): Array[Byte] = {
    val bits = 16
    val dataLen = frames * channels * (bits / 8)
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    tag("RIFF"); w32(36L + dataLen); tag("WAVE")
    tag("fmt "); w32(16L); w16(1) // PCM
    w16(channels); w32(rate.toLong)
    w32(rate.toLong * channels * (bits / 8)) // byte rate
    w16(channels * (bits / 8)) // block align
    w16(bits)
    tag("data"); w32(dataLen.toLong)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) { w16(sample(f, c) & 0xffff); c += 1 }
      f += 1
    }
    out.toByteArray
  }

  // ---- m17: MP3 frame-header probe (compressed-audio arm) -----------

  /** MPEG-1/2 Layer III bitrate tables, kbit/s; index 0 is "free"
    * and 15 is invalid (public ISO/IEC 11172-3 / 13818-3 tables). */
  private val Mp3BitrateV1L3 = Array(-1, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3BitrateV2L3 = Array(-1, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160, -1)

  /** Sample rates by version bits (V1 / V2 / V2.5), Hz. */
  private val Mp3RatesV1 = Array(44100, 48000, 32000, -1)
  private val Mp3RatesV2 = Array(22050, 24000, 16000, -1)
  private val Mp3RatesV25 = Array(11025, 12000, 8000, -1)

  /** First valid MP3 frame header as (sampleRate, bitrateKbps,
    * channels, frameBytes), or None. An ID3v2 tag prefix is skipped
    * via its syncsafe size (public id3.org spec); past it, the scan
    * walks at most 4096 bytes looking for the 11-bit sync — a
    * hostile payload can't loop, and random text can't alias the
    * gate by accident (sync + valid version/layer/bitrate/rate
    * indexes must all hold). Layer III only (the corpus format);
    * other layers return None — the honest scope, documented. */
  def parseMp3(p: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (p.length < 4) return None
    var off = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val sz = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
        ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
      off = 10 + sz
      if (off < 0 || off >= p.length) return None
    }
    val limit = math.min(p.length - 4, off + 4096)
    var i = off
    while (i <= limit) {
      if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xe0) == 0xe0) {
        val verBits = (p(i + 1) >> 3) & 0x3   // 0=V2.5 2=V2 3=V1
        val layerBits = (p(i + 1) >> 1) & 0x3 // 1 = Layer III
        val brIdx = (p(i + 2) >> 4) & 0xf
        val srIdx = (p(i + 2) >> 2) & 0x3
        val pad = (p(i + 2) >> 1) & 0x1
        val mono = ((p(i + 3) >> 6) & 0x3) == 3
        if (verBits != 1 && layerBits == 1) {
          val rate = verBits match {
            case 3 => Mp3RatesV1(srIdx)
            case 2 => Mp3RatesV2(srIdx)
            case _ => Mp3RatesV25(srIdx)
          }
          val kbps =
            if (verBits == 3) Mp3BitrateV1L3(brIdx)
            else Mp3BitrateV2L3(brIdx)
          if (rate > 0 && kbps > 0) {
            // Layer III frame length: V1 = 144·bps/rate + pad,
            // V2/V2.5 = 72·bps/rate + pad (public formula)
            val coef = if (verBits == 3) 144L else 72L
            val flen = coef * kbps * 1000 / rate + pad
            return Some((rate.toLong, kbps.toLong,
              if (mono) 1L else 2L, flen))
          }
        }
      }
      i += 1
    }
    None
  }

  /** Field probe for the Catalyst expression: 0 = sample rate, 1 =
    * bitrate kbit/s, 2 = channels, 3 = frame length in bytes; -1 for
    * non-MP3 / unsupported-layer payloads. */
  def mp3Field(p: Array[Byte], idx: Int): Long = parseMp3(p) match {
    case None => -1L
    case Some((rate, kbps, ch, flen)) => idx match {
      case 0 => rate
      case 1 => kbps
      case 2 => ch
      case 3 => flen
      case _ => -1L
    }
  }

  /** FLAC STREAMINFO probe (m19) — the LOSSLESS arm next to the WAV
    * PCM container (m10) and the MP3 compressed stream (m17),
    * completing the audio-format trio a media-corpus admission gate
    * dispatches over. Public format (xiph.org / RFC 9639): "fLaC"
    * magic, then metadata blocks each headed by 1 byte (bit 7 =
    * last-block flag, bits 0-6 = type) + a 24-bit big-endian length;
    * the FIRST block is REQUIRED to be STREAMINFO (type 0, length
    * 34), whose bit-packed payload carries sample rate (20 bits),
    * channels-1 (3), bits-per-sample-1 (5) and total samples (36).
    * Returns Some((rate, channels, bits, totalSamples)) or None;
    * hostile/truncated payloads fail the bounds checks, and a text
    * payload cannot alias the gate (magic + mandatory first-block
    * type/length + rate>0 must all hold). Header-only — never reads
    * an audio frame. */
  def parseFlac(p: Array[Byte]): Option[(Long, Int, Int, Long)] = {
    // 4 magic + 4 block header + 34 STREAMINFO
    if (p.length < 42) return None
    if (!tag(p, 0, "fLaC")) return None
    if ((p(4) & 0x7f) != 0) return None // first block MUST be type 0
    val blockLen = ((p(5) & 0xff) << 16) | ((p(6) & 0xff) << 8) |
      (p(7) & 0xff)
    if (blockLen != 34) return None
    val o = 8
    // bytes 10-13 of STREAMINFO: rate(20) ch-1(3) bps-1(5) start
    val rate = ((p(o + 10) & 0xffL) << 12) | ((p(o + 11) & 0xffL) << 4) |
      ((p(o + 12) & 0xf0L) >> 4)
    val ch = ((p(o + 12) >> 1) & 0x7) + 1
    val bits = (((p(o + 12) & 0x1) << 4) | ((p(o + 13) & 0xf0) >> 4)) + 1
    val samples = ((p(o + 13) & 0x0fL) << 32) |
      ((p(o + 14) & 0xffL) << 24) | ((p(o + 15) & 0xffL) << 16) |
      ((p(o + 16) & 0xffL) << 8) | (p(o + 17) & 0xffL)
    if (rate <= 0) None // rate 0 is invalid for audio streams (spec)
    else Some((rate, ch, bits, samples))
  }

  /** Field probe for the Catalyst expression: 0 = sample rate, 1 =
    * channels, 2 = bits/sample, 3 = duration micros (-1 when total
    * samples is 0 = unknown, the spec's sentinel), 4 = total
    * samples; -1 for non-FLAC payloads. */
  def flacField(p: Array[Byte], idx: Int): Long = parseFlac(p) match {
    case None => -1L
    case Some((rate, ch, bits, samples)) => idx match {
      case 0 => rate
      case 1 => ch.toLong
      case 2 => bits.toLong
      case 3 => if (samples == 0L) -1L else samples * 1000000L / rate
      case 4 => samples
      case _ => -1L
    }
  }

  /** Spec helper: a minimal fLaC magic + STREAMINFO block with the
    * given fields bit-packed exactly as an encoder writes them. */
  def flacBytes(rate: Long, channels: Int, bits: Int,
      samples: Long, blockType: Int = 0, blockLen: Int = 34)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(42)
    "fLaC".foreach(c => out.write(c.toInt))
    out.write(blockType & 0x7f)
    out.write((blockLen >> 16) & 0xff); out.write((blockLen >> 8) & 0xff)
    out.write(blockLen & 0xff)
    // min/max block size (16+16), min/max frame size (24+24): zeros
    (0 until 10).foreach(_ => out.write(0))
    out.write(((rate >> 12) & 0xff).toInt)
    out.write(((rate >> 4) & 0xff).toInt)
    out.write((((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bits - 1) >> 4) & 0x1)).toInt)
    out.write(((((bits - 1) & 0xf) << 4) | ((samples >> 32) & 0xf)).toInt)
    out.write(((samples >> 24) & 0xff).toInt)
    out.write(((samples >> 16) & 0xff).toInt)
    out.write(((samples >> 8) & 0xff).toInt)
    out.write((samples & 0xff).toInt)
    // MD5 signature: 16 zero bytes
    (0 until 16).foreach(_ => out.write(0))
    out.toByteArray
  }

  /** Spec helper: a minimal Layer III frame header (+ zero body) at
    * the given table indexes, optionally behind an ID3v2 tag — the
    * probes pin on the exact bit layout a real encoder writes. */
  def mp3Bytes(verBits: Int, brIdx: Int, srIdx: Int, mono: Boolean,
      id3Size: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // ver 2.4, flags
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      (0 until id3Size).foreach(_ => out.write(0))
    }
    out.write(0xff)
    out.write(0xe0 | (verBits << 3) | (1 << 1) | 1) // layer III, no CRC
    out.write((brIdx << 4) | (srIdx << 2)) // no padding
    out.write(if (mono) 0xc0 else 0x00)
    (0 until 16).foreach(_ => out.write(0))
    out.toByteArray
  }
}
