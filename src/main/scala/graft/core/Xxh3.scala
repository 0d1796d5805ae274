package graft.core

/** XXH3-64 one-shot (seed 0, default secret) — the public xxHash v0.8
  * algorithm by Yann Collet (BSD-2), re-expressed in Scala. Used as the
  * final digest of IsoHash2 for CONSTANT parity with the reference
  * (/root/reference/src/identify/ISOHash2.h:220 calls XXH3_64bits), so an
  * engine user joining against an existing gbd database on isohash2 values
  * gets matches. Verified against a byte-length sweep of vectors generated
  * from the upstream C implementation (Xxh3Spec).
  */
object Xxh3 {

  private val P32_1 = 0x9e3779b1L
  private val P32_2 = 0x85ebca77L
  private val P32_3 = 0xc2b2ae3dL
  private val P64_1 = 0x9e3779b185ebca87L
  private val P64_2 = 0xc2b2ae3d27d4eb4fL
  private val P64_3 = 0x165667b19e3779f9L
  private val P64_4 = 0x85ebca77c2b2ae63L
  private val P64_5 = 0x27d4eb2f165667c5L
  private val MX1 = 0x165667919e3779f9L
  private val MX2 = 0x9fb21c651e98df25L

  /** Default 192-byte secret (XXH3_kSecret — a published constant of the
    * algorithm, like MD5's sine table).
    */
  private val Secret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c, 0xf7, 0x21, 0xad, 0x1c,
    0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb, 0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f,
    0xcb, 0x79, 0xe6, 0x4e, 0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6, 0x81, 0x3a, 0x26, 0x4c,
    0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb, 0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3,
    0x71, 0x64, 0x48, 0x97, 0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7, 0xc7, 0x0b, 0x4f, 0x1d,
    0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31, 0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64,
    0xea, 0xc5, 0xac, 0x83, 0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26, 0x29, 0xd4, 0x68, 0x9e,
    0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc, 0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce,
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e)
    .map(_.toByte)

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def read32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  @inline private def read64(b: Array[Byte], i: Int): Long =
    read32(b, i) | (read32(b, i + 4) << 32)

  @inline private def sec64(i: Int): Long = read64(Secret, i)

  /** 128-bit product folded to 64 bits (lo ^ hi), unsigned. */
  @inline private def mul128Fold64(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) + (if (a < 0) b else 0L) + (if (b < 0) a else 0L)
    (a * b) ^ hi
  }

  @inline private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P64_2
    h ^= h >>> 29; h *= P64_3
    h ^ (h >>> 32)
  }

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37; h *= MX1
    h ^ (h >>> 32)
  }

  @inline private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= rotl(h, 49) ^ rotl(h, 24)
    h *= MX2
    h ^= (h >>> 35) + len
    h *= MX2
    h ^ (h >>> 28)
  }

  @inline private def mix16B(in: Array[Byte], i: Int, s: Int): Long =
    mul128Fold64(read64(in, i) ^ sec64(s), read64(in, i + 8) ^ sec64(s + 8))

  private def len0to16(b: Array[Byte], len: Int): Long = {
    if (len > 8) {
      // 9..16
      val lo = read64(b, 0) ^ (sec64(24) ^ sec64(32))
      val hi = read64(b, len - 8) ^ (sec64(40) ^ sec64(48))
      val acc = len.toLong + java.lang.Long.reverseBytes(lo) + hi + mul128Fold64(lo, hi)
      avalanche(acc)
    } else if (len >= 4) {
      // 4..8
      val in = read32(b, len - 4) + (read32(b, 0) << 32)
      val keyed = in ^ (sec64(8) ^ sec64(16))
      rrmxmx(keyed, len.toLong)
    } else if (len > 0) {
      // 1..3
      val c1 = b(0) & 0xffL
      val c2 = b(len >> 1) & 0xffL
      val c3 = b(len - 1) & 0xffL
      val combined = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val bitflip = ((read32(Secret, 0) ^ read32(Secret, 4)) & 0xffffffffL)
      avalanche64(combined ^ bitflip)
    } else {
      avalanche64(sec64(56) ^ sec64(64))
    }
  }

  private def len17to128(b: Array[Byte], len: Int): Long = {
    var acc = len.toLong * P64_1
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          acc += mix16B(b, 48, 96)
          acc += mix16B(b, len - 64, 112)
        }
        acc += mix16B(b, 32, 64)
        acc += mix16B(b, len - 48, 80)
      }
      acc += mix16B(b, 16, 32)
      acc += mix16B(b, len - 32, 48)
    }
    acc += mix16B(b, 0, 0)
    acc += mix16B(b, len - 16, 16)
    avalanche(acc)
  }

  private def len129to240(b: Array[Byte], len: Int): Long = {
    var acc = len.toLong * P64_1
    var i = 0
    while (i < 8) { acc += mix16B(b, 16 * i, 16 * i); i += 1 }
    acc = avalanche(acc)
    val nbRounds = len / 16
    while (i < nbRounds) { acc += mix16B(b, 16 * i, 16 * (i - 8) + 3); i += 1 }
    acc += mix16B(b, len - 16, 136 - 17)
    avalanche(acc)
  }

  private def hashLong(b: Array[Byte], len: Int): Long = {
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)

    @inline def accumulate512(off: Int, secOff: Int): Unit = {
      var i = 0
      while (i < 8) {
        val dv = read64(b, off + 8 * i)
        val dk = dv ^ sec64(secOff + 8 * i)
        acc(i ^ 1) += dv
        acc(i) += (dk & 0xffffffffL) * (dk >>> 32)
        i += 1
      }
    }

    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock  // 1024
    val nbBlocks = (len - 1) / blockLen

    var block = 0
    while (block < nbBlocks) {
      var s = 0
      while (s < nbStripesPerBlock) {
        accumulate512(block * blockLen + 64 * s, 8 * s)
        s += 1
      }
      // scramble
      var i = 0
      while (i < 8) {
        var a = acc(i)
        a ^= a >>> 47
        a ^= sec64(192 - 64 + 8 * i)
        a *= P32_1
        acc(i) = a
        i += 1
      }
      block += 1
    }

    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) {
      accumulate512(nbBlocks * blockLen + 64 * s, 8 * s)
      s += 1
    }
    // last stripe
    accumulate512(len - 64, 192 - 64 - 7)

    // merge (ends with the XXH3 avalanche, NOT the XXH64 one)
    var result = len.toLong * P64_1
    var i = 0
    while (i < 4) {
      result += mul128Fold64(acc(2 * i) ^ sec64(11 + 16 * i), acc(2 * i + 1) ^ sec64(11 + 16 * i + 8))
      i += 1
    }
    avalanche(result)
  }

  /** XXH3_64bits(data, len) with seed 0 and the default secret. */
  def hash(b: Array[Byte], len: Int): Long = {
    if (len <= 16) len0to16(b, len)
    else if (len <= 128) len17to128(b, len)
    else if (len <= 240) len129to240(b, len)
    else hashLong(b, len)
  }

  def hash(b: Array[Byte]): Long = hash(b, b.length)

  /** XXH3-64 of longs serialized little-endian (the ISOHash2 digest shape:
    * XXH3_64bits(buffer.data(), n * 8) over native-endian u64s).
    */
  def hashLongs(data: Array[Long]): Long = {
    val b = new Array[Byte](data.length * 8)
    var i = 0
    while (i < data.length) {
      val v = data(i)
      val o = 8 * i
      b(o) = v.toByte
      b(o + 1) = (v >>> 8).toByte
      b(o + 2) = (v >>> 16).toByte
      b(o + 3) = (v >>> 24).toByte
      b(o + 4) = (v >>> 32).toByte
      b(o + 5) = (v >>> 40).toByte
      b(o + 6) = (v >>> 48).toByte
      b(o + 7) = (v >>> 56).toByte
      i += 1
    }
    hash(b, b.length)
  }
}
