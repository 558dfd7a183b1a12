package graft.functions

/** MapsForge variable-length integer codec (ULEB128 / SLEB128).
  *
  * Decode semantics follow the reference parser exactly
  * (map2db.py:285-313): unsigned values carry 7 payload bits per byte
  * with a continuation msb; signed values carry 7 bits per
  * continuation byte and 6 bits + a sign bit (0x40) in the final
  * byte, i.e. sign-magnitude, not two's complement. Up to 8 bytes.
  *
  * Top-level object → static forwarders, so generated whole-stage
  * code can call `graft.functions.VarintCodec.decodeU(...)` directly.
  */
object VarintCodec {
  final val MaxBytes = 8

  def encodeU(value: Long): Array[Byte] = {
    require(value >= 0 && value < (1L << 56),
      s"ULEB128 value out of mapsforge 8-byte range: $value")
    var v = value
    val out = new Array[Byte](MaxBytes)
    var i = 0
    while (v >= 0x80L) {
      out(i) = ((v & 0x7FL) | 0x80L).toByte
      v >>>= 7
      i += 1
    }
    out(i) = v.toByte
    java.util.Arrays.copyOf(out, i + 1)
  }

  def decodeU(bytes: Array[Byte]): Long = {
    var out = 0L
    var i = 0
    while (i < bytes.length && i < MaxBytes) {
      val b = bytes(i) & 0xFF
      out += (b & 0x7FL) << (7 * i)
      if ((b & 0x80) == 0) return out
      i += 1
    }
    throw new IllegalArgumentException(
      s"unable to decode MF VBE-U from ${bytes.length} bytes")
  }

  def encodeS(value: Long): Array[Byte] = {
    val neg = value < 0
    var m = math.abs(value)
    require(m < (1L << 55), s"SLEB128 value out of range: $value")
    val out = new Array[Byte](MaxBytes)
    var i = 0
    while (m > 0x3FL) {
      out(i) = ((m & 0x7FL) | 0x80L).toByte
      m >>>= 7
      i += 1
    }
    out(i) = ((if (neg) 0x40L else 0x00L) | m).toByte
    java.util.Arrays.copyOf(out, i + 1)
  }

  def decodeS(bytes: Array[Byte]): Long = {
    var out = 0L
    var i = 0
    while (i < bytes.length && i < MaxBytes) {
      val b = bytes(i) & 0xFF
      if ((b & 0x80) == 0) {
        out += (b & 0x3FL) << (7 * i)
        return if ((b & 0x40) != 0) -out else out
      }
      out += (b & 0x7FL) << (7 * i)
      i += 1
    }
    throw new IllegalArgumentException(
      s"unable to decode MF VBE-S from ${bytes.length} bytes")
  }

  /** Number of bytes [[encodeU]] produces — used by the byte-budget
    * oracle check. */
  def encodedLengthU(value: Long): Int = {
    var v = value; var n = 1
    while (v >= 0x80L) { v >>>= 7; n += 1 }
    n
  }
}
