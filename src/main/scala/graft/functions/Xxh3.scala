package graft.functions

/** XXH3 64-bit, seed 0, default secret (public algorithm by Yann Collet,
  * xxHash v0.8 — ref FunctionsHashing.h ImplXXH3: XXH3_64bits(s, len));
  * validated against the reference's own pinned value for 'ClickHouse'
  * (tests/queries/0_stateless/02481_xxh3_hash_function.reference).
  */
object Xxh3 {

  private val P32_1 = 0x9E3779B1L
  private val P32_2 = 0x85EBCA77L
  private val P32_3 = 0xC2B2AE3DL
  private val P64_1 = 0x9E3779B185EBCA87L
  private val P64_2 = 0xC2B2AE3D27D4EB4FL
  private val P64_3 = 0x165667B19E3779F9L
  private val P64_4 = 0x85EBCA77C2B2AE63L
  private val P64_5 = 0x27D4EB2F165667C5L

  // the spec's 192-byte kSecret
  private val secret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c,
    0xf7, 0x21, 0xad, 0x1c, 0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb,
    0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f, 0xcb, 0x79, 0xe6, 0x4e,
    0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6,
    0x81, 0x3a, 0x26, 0x4c, 0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb,
    0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3, 0x71, 0x64, 0x48, 0x97,
    0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7,
    0xc7, 0x0b, 0x4f, 0x1d, 0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31,
    0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64, 0xea, 0xc5, 0xac, 0x83,
    0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26,
    0x29, 0xd4, 0x68, 0x9e, 0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc,
    0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce, 0x45, 0xcb, 0x3a, 0x8f,
    0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e
  ).map(_.toByte)

  @inline private def r64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 0
    while (j < 8) { v |= (b(i + j) & 0xffL) << (8 * j); j += 1 }
    v
  }
  @inline private def r32(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 0
    while (j < 4) { v |= (b(i + j) & 0xffL) << (8 * j); j += 1 }
    v
  }
  @inline private def sec64(i: Int): Long = r64(secret, i)
  @inline private def rotl(v: Long, s: Int): Long = (v << s) | (v >>> (64 - s))
  @inline private def swap32(x: Long): Long = {
    val v = x & 0xffffffffL
    ((v >>> 24) | ((v >>> 8) & 0xff00L) | ((v << 8) & 0xff0000L) |
      ((v << 24) & 0xff000000L)) & 0xffffffffL
  }
  @inline private def swap64(x: Long): Long = java.lang.Long.reverseBytes(x)
  @inline private def umulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)
  @inline private def mul128fold64(a: Long, b: Long): Long =
    (a * b) ^ umulHi(a, b)
  @inline private def xxh64Avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P64_2; h ^= h >>> 29; h *= P64_3; h ^= h >>> 32
    h
  }
  @inline private def xxh3Avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37; h *= 0x165667919E3779F9L; h ^= h >>> 32
    h
  }
  @inline private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= rotl(h, 49) ^ rotl(h, 24)
    h *= 0x9FB21C651E98DF25L
    h ^= (h >>> 35) + len
    h *= 0x9FB21C651E98DF25L
    h ^ (h >>> 28)
  }
  @inline private def mix16(b: Array[Byte], off: Int, secOff: Int): Long =
    mul128fold64(r64(b, off) ^ sec64(secOff),
      r64(b, off + 8) ^ sec64(secOff + 8))

  def hash64(b: Array[Byte]): Long = {
    val len = b.length
    if (len == 0)
      xxh64Avalanche(sec64(56) ^ sec64(64))
    else if (len <= 3) {
      val c1 = b(0) & 0xffL
      val c2 = b(len >> 1) & 0xffL
      val c3 = b(len - 1) & 0xffL
      val combined = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val bitflip = (r32(secret, 0) ^ r32(secret, 4)) & 0xffffffffL
      xxh64Avalanche(combined ^ bitflip)
    } else if (len <= 8) {
      val input1 = r32(b, 0)
      val input2 = r32(b, len - 4)
      val bitflip = sec64(8) ^ sec64(16)
      val input64 = input2 + (input1 << 32)
      rrmxmx(input64 ^ bitflip, len.toLong)
    } else if (len <= 16) {
      val bitflip1 = sec64(24) ^ sec64(32)
      val bitflip2 = sec64(40) ^ sec64(48)
      val inputLo = r64(b, 0) ^ bitflip1
      val inputHi = r64(b, len - 8) ^ bitflip2
      val acc = len.toLong + swap64(inputLo) + inputHi +
        mul128fold64(inputLo, inputHi)
      xxh3Avalanche(acc)
    } else if (len <= 128) {
      var acc = len.toLong * P64_1
      if (len > 32) {
        if (len > 64) {
          if (len > 96) {
            acc += mix16(b, 48, 96)
            acc += mix16(b, len - 64, 112)
          }
          acc += mix16(b, 32, 64)
          acc += mix16(b, len - 48, 80)
        }
        acc += mix16(b, 16, 32)
        acc += mix16(b, len - 32, 48)
      }
      acc += mix16(b, 0, 0)
      acc += mix16(b, len - 16, 16)
      xxh3Avalanche(acc)
    } else if (len <= 240) {
      var acc = len.toLong * P64_1
      var i = 0
      while (i < 8) { acc += mix16(b, 16 * i, 16 * i); i += 1 }
      acc = xxh3Avalanche(acc)
      val nb = len / 16
      i = 8
      while (i < nb) { acc += mix16(b, 16 * i, 16 * (i - 8) + 3); i += 1 }
      acc += mix16(b, len - 16, 136 - 17)
      xxh3Avalanche(acc)
    } else hashLong(b)
  }

  private def hashLong(b: Array[Byte]): Long = {
    val len = b.length
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)
    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock
    val nbBlocks = (len - 1) / blockLen

    def accumulate512(inOff: Int, secOff: Int): Unit = {
      var i = 0
      while (i < 8) {
        val dataVal = r64(b, inOff + 8 * i)
        val dataKey = dataVal ^ sec64(secOff + 8 * i)
        acc(i ^ 1) += dataVal
        acc(i) += (dataKey & 0xffffffffL) * (dataKey >>> 32)
        i += 1
      }
    }
    def scramble(secOff: Int): Unit = {
      var i = 0
      while (i < 8) {
        var a = acc(i)
        a ^= a >>> 47
        a ^= sec64(secOff + 8 * i)
        a *= P32_1
        acc(i) = a
        i += 1
      }
    }
    var blk = 0
    while (blk < nbBlocks) {
      var s = 0
      while (s < nbStripesPerBlock) {
        accumulate512(blk * blockLen + s * 64, s * 8)
        s += 1
      }
      scramble(192 - 64)
      blk += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) {
      accumulate512(nbBlocks * blockLen + s * 64, s * 8)
      s += 1
    }
    accumulate512(len - 64, 192 - 64 - 7)
    // merge
    var result = len.toLong * P64_1
    var i = 0
    while (i < 4) {
      result += mul128fold64(acc(2 * i) ^ sec64(11 + 16 * i),
        acc(2 * i + 1) ^ sec64(11 + 16 * i + 8))
      i += 1
    }
    xxh3Avalanche(result)
  }
}
