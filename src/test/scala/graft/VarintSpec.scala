package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VarintCodec

class VarintSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private val samples: Seq[Long] =
    (0L to 70L) ++ Seq(127L, 128L, 16383L, 16384L, (1L << 55) - 1) ++
      Seq.fill(2000)(math.abs(rng.nextLong()) % (1L << 55))

  test("ULEB128 roundtrip for all magnitudes") {
    samples.foreach { v =>
      assert(VarintCodec.decodeU(VarintCodec.encodeU(v)) == v)
    }
  }

  test("SLEB128 roundtrip incl. negatives (sign-magnitude, map2db.py:297-313)") {
    samples.flatMap(v => Seq(v, -v)).foreach { v =>
      assert(VarintCodec.decodeS(VarintCodec.encodeS(v)) == v)
    }
  }

  test("known byte patterns match the mapsforge wire format") {
    assert(VarintCodec.encodeU(0L).toSeq == Seq(0x00.toByte))
    assert(VarintCodec.encodeU(127L).toSeq == Seq(0x7F.toByte))
    assert(VarintCodec.encodeU(128L).toSeq ==
      Seq(0x80.toByte, 0x01.toByte))
    assert(VarintCodec.encodeU(300L).toSeq ==
      Seq(0xAC.toByte, 0x02.toByte))
    // signed: final byte holds 6 payload bits + sign bit 0x40
    assert(VarintCodec.encodeS(-1L).toSeq == Seq(0x41.toByte))
    assert(VarintCodec.encodeS(63L).toSeq == Seq(0x3F.toByte))
    // 64 needs a continuation byte: low 7 bits (0x40) + cont bit,
    // then an empty final byte carrying only the sign
    assert(VarintCodec.encodeS(64L).toSeq ==
      Seq(0xC0.toByte, 0x00.toByte))
    assert(VarintCodec.encodeS(-64L).toSeq ==
      Seq(0xC0.toByte, 0x40.toByte))
    // decode matches the reference's accumulate-then-sign algorithm
    assert(VarintCodec.decodeS(Array(0xC0.toByte, 0x40.toByte)) == -64L)
  }

  test("encodedLengthU matches actual encoding length") {
    samples.foreach { v =>
      assert(VarintCodec.encodedLengthU(v) == VarintCodec.encodeU(v).length)
    }
  }
}
