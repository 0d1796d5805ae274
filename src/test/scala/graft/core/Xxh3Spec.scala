package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth generated from the upstream public xxHash C implementation
  * (XXH3_64bits, seed 0, default secret) over a deterministic byte sweep
  * covering every size class: empty, 1-3, 4-8, 9-16, 17-128, 129-240, >240
  * (single block, multi-stripe, multi-block).
  */
class Xxh3Spec extends AnyFunSuite {

  private val buf: Array[Byte] = {
    val b = new Array[Byte](4096)
    var i = 0
    while (i < 4096) { b(i) = ((i.toLong * 2654435761L) >>> 24).toByte; i += 1 }
    b
  }

  private val byteVectors: Seq[(Int, Long)] = Seq(
    0 -> 0x2d06800538d394c2L, 1 -> 0xc44bdff4074eecdbL, 2 -> 0xb0a5d4f167a89d5eL,
    3 -> 0xe14090f554a5ea90L, 4 -> 0x2e8d078a566e9749L, 7 -> 0xe6f7770846c47df5L,
    8 -> 0xcd1c7f88482fcaefL, 9 -> 0xbfe43def699fa9e3L, 15 -> 0x9c71639666dfdbc2L,
    16 -> 0x81e9eb8634460bb9L, 17 -> 0x9998430fd0a655beL, 31 -> 0x6427c268ccd55706L,
    32 -> 0x938c25dd24c9cf3bL, 63 -> 0x9e5edf514e6c4ea2L, 64 -> 0x22a06b30c4c72936L,
    96 -> 0x324046d7ff9771f1L, 128 -> 0x75eca5c5d5594884L, 129 -> 0xa05da42e7a4e4667L,
    160 -> 0xd298ab4e6e7de4aaL, 192 -> 0xf27a9155f46c22d6L, 240 -> 0x5eb2467c8c9e3969L,
    241 -> 0x2d431e984c441f15L, 256 -> 0x1369aaf85f8b805aL, 384 -> 0x9768b21ad23ed0cfL,
    512 -> 0xdcfed6ee2883acd0L, 1024 -> 0xe99def1145f12936L, 2048 -> 0x53275d58cfba68fdL,
    4096 -> 0x9bf67f8deff876aeL)

  test("byte-length sweep matches the upstream C implementation") {
    byteVectors.foreach { case (len, expected) =>
      assert(Xxh3.hash(buf, len) == expected, s"len=$len")
    }
  }

  private val longInput: Array[Long] = {
    val a = new Array[Long](600)
    var i = 0
    while (i < 600) {
      a(i) = 0x9e3779b97f4a7c15L * (i + 1) ^ (0xabcdef0123456789L >>> (i % 13))
      i += 1
    }
    a
  }

  private val longVectors: Seq[(Int, Long)] = Seq(
    1 -> 0x782fc8e97cb5c5d0L, 2 -> 0x4c1172d3845a1a87L, 3 -> 0xc4812691bffd9227L,
    4 -> 0xac52bdf0e5470581L, 5 -> 0x7723bb5b1cdb3b7bL, 16 -> 0x679209f08756eadaL,
    17 -> 0xc09eed2431fd46acL, 30 -> 0x178c37e30e4722cdL, 31 -> 0xbe72371e6eb9cc7bL,
    100 -> 0x924c45b6adcfd4d6L, 599 -> 0xe6c74398481e0d70L)

  test("long-array form (the isohash2 digest shape) matches upstream") {
    longVectors.foreach { case (n, expected) =>
      assert(Xxh3.hashLongs(longInput.take(n)) == expected, s"n=$n")
    }
  }
}
