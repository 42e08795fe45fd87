package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Bit-exact ClickHouse hash functions (ref src/Functions/FunctionsHashing.h).
  *
  * cityHash64 = CityHash v1.0.2 (the frozen pre-1.1 variant the reference
  * vendors precisely because its values are part of the public API) with
  * CH's per-type element rule: POD integers go through
  * `intHash64(x ^ seed)` on the zero-extended value, Decimals and big ints
  * hash their little-endian scaled bytes, strings hash raw bytes; multiple
  * arguments (and tuple elements, recursively — flat args and tuples are
  * interchangeable, pinned by 00259_hashing_tuples) chain through
  * Hash128to64. sipHash64 = SipHash-2-4 with a zero key over the same
  * byte views, combining via sipHash64 of the two previous hashes.
  *
  * Results are CH UInt64; surfaced as Decimal(20,0) so values above
  * Long.MaxValue print unsigned, as the reference does.
  */
object ChHash {

  // ---- primitives ----

  /** ref src/Common/HashTable/Hash.h:26 (murmur-style finalizer). */
  def intHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** ref FunctionsHashing.h IntHash64Impl: fixed-seed xor before mixing. */
  def intHash64Impl(x: Long): Long = intHash64(x ^ 0x4cf2d2baae6da887L)

  /** CityHash's 128→64 fold (ref contrib/cityhash102 Hash128to64). */
  def hash128to64(lo: Long, hi: Long): Long = {
    val kMul = 0x9ddfea08eb382d69L
    var a = (lo ^ hi) * kMul
    a ^= a >>> 47
    var b = (hi ^ a) * kMul
    b ^= b >>> 47
    b * kMul
  }

  // ---- CityHash v1.0.2 (64-bit) ----

  private final val k0 = 0xc3a5c85c97cb3127L
  private final val k1 = 0xb492b66fbe98f273L
  private final val k2 = 0x9ae16a3b2f90404fL
  private final val k3 = 0xc949d7c7509e6557L

  private def fetch64(b: Array[Byte], i: Int): Long = {
    var r = 0L
    var j = 7
    while (j >= 0) { r = (r << 8) | (b(i + j) & 0xffL); j -= 1 }
    r
  }
  private def fetch32(b: Array[Byte], i: Int): Long = {
    var r = 0L
    var j = 3
    while (j >= 0) { r = (r << 8) | (b(i + j) & 0xffL); j -= 1 }
    r
  }
  private def rotate(v: Long, s: Int): Long =
    if (s == 0) v else (v >>> s) | (v << (64 - s))
  private def rotateByAtLeast1(v: Long, s0: Int): Long = {
    val s = s0 & 63
    (v >>> s) | (v << (64 - s))
  }
  private def shiftMix(v: Long): Long = v ^ (v >>> 47)
  private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(b: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(b, off)
      val bb = fetch64(b, off + len - 8)
      hashLen16(a, rotateByAtLeast1(bb + len, len)) ^ bb
    } else if (len >= 4) {
      val a = fetch32(b, off)
      hashLen16(len + (a << 3), fetch32(b, off + len - 4))
    } else if (len > 0) {
      val a = b(off) & 0xff
      val bb = b(off + (len >> 1)) & 0xff
      val c = b(off + len - 1) & 0xff
      val y = (a + (bb << 8)).toLong
      val z = (len + (c << 2)).toLong
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2
  }

  private def hashLen17to32(b: Array[Byte], off: Int, len: Int): Long = {
    val a = fetch64(b, off) * k1
    val bb = fetch64(b, off + 8)
    val c = fetch64(b, off + len - 8) * k2
    val d = fetch64(b, off + len - 16) * k0
    hashLen16(rotate(a - bb, 43) + rotate(c, 30) + d,
      a + rotate(bb ^ k3, 20) - c + len)
  }

  private def weakHashLen32WithSeeds(w: Long, x: Long, y: Long, z: Long,
      a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }
  private def weakHashLen32WithSeeds(s: Array[Byte], off: Int,
      a: Long, b: Long): (Long, Long) =
    weakHashLen32WithSeeds(fetch64(s, off), fetch64(s, off + 8),
      fetch64(s, off + 16), fetch64(s, off + 24), a, b)

  private def hashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    var z = fetch64(s, off + 24)
    var a = fetch64(s, off) + (len + fetch64(s, off + len - 16)) * k0
    var b = rotate(a + z, 52)
    var c = rotate(a, 37)
    a += fetch64(s, off + 8)
    c += rotate(a, 7)
    a += fetch64(s, off + 16)
    val vf = a + z
    val vs = b + rotate(a, 31) + c
    a = fetch64(s, off + 16) + fetch64(s, off + len - 32)
    z = fetch64(s, off + len - 8)
    b = rotate(a + z, 52)
    c = rotate(a, 37)
    a += fetch64(s, off + len - 24)
    c += rotate(a, 7)
    a += fetch64(s, off + len - 16)
    val wf = a + z
    val ws = b + rotate(a, 31) + c
    val r = shiftMix((vf + ws) * k2 + (wf + vs) * k0)
    shiftMix(r * k0 + vs) * k2
  }

  def cityHash64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 32) {
      if (len <= 16) hashLen0to16(s, 0, len) else hashLen17to32(s, 0, len)
    } else if (len <= 64) {
      hashLen33to64(s, 0, len)
    } else {
      var x = fetch64(s, 0)
      var y = fetch64(s, len - 16) ^ k1
      var z = fetch64(s, len - 56) ^ k0
      var v = weakHashLen32WithSeeds(s, len - 64, len.toLong, y)
      var w = weakHashLen32WithSeeds(s, len - 32, len.toLong * k1, k0)
      z += shiftMix(v._2) * k1
      x = rotate(z + x, 39) * k1
      y = rotate(y, 33) * k1
      var rem = (len - 1) & ~63
      var off = 0
      while (rem != 0) {
        x = rotate(x + y + v._1 + fetch64(s, off + 16), 37) * k1
        y = rotate(y + v._2 + fetch64(s, off + 48), 42) * k1
        x ^= w._2
        y ^= v._1
        z = rotate(z ^ w._1, 33)
        v = weakHashLen32WithSeeds(s, off, v._2 * k1, x + w._1)
        w = weakHashLen32WithSeeds(s, off + 32, z + w._2, y)
        val t = z; z = x; x = t
        off += 64
        rem -= 64
      }
      hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * k1 + z,
        hashLen16(v._2, w._2) + x)
    }
  }

  // ---- SipHash-2-4, zero key (ref src/Common/SipHash.h) ----

  def sipHash64(data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L
    var v1 = 0x646f72616e646f6dL
    var v2 = 0x6c7967656e657261L
    var v3 = 0x7465646279746573L
    val len = data.length

    @inline def round(): Unit = {
      v0 += v1; v1 = rotate64(v1, 13); v1 ^= v0; v0 = rotate64(v0, 32)
      v2 += v3; v3 = rotate64(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotate64(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotate64(v1, 17); v1 ^= v2; v2 = rotate64(v2, 32)
    }

    var i = 0
    while (i + 8 <= len) {
      val m = fetch64(data, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    // tail word: low bytes from remaining input, MSB = total length mod 256
    var tail = (len.toLong & 0xff) << 56
    var j = len - i - 1
    while (j >= 0) {
      tail |= (data(i + j) & 0xffL) << (8 * j)
      j -= 1
    }
    v3 ^= tail; round(); round(); v0 ^= tail
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  private def rotate64(v: Long, s: Int): Long = (v << s) | (v >>> (64 - s))

  /** sipHash64 combine: hash of the 16-byte little-endian (h1, h2) pair. */
  def sipCombine(h1: Long, h2: Long): Long = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      b(i) = ((h1 >>> (8 * i)) & 0xff).toByte
      b(8 + i) = ((h2 >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    sipHash64(b)
  }

  def toUnsignedDecimal(h: Long): Decimal =
    Decimal(new java.math.BigDecimal(
      new java.math.BigInteger(java.lang.Long.toUnsignedString(h))), 20, 0)

  // ---- SipHash keyed / 128-bit forms (ref src/Common/SipHash.h: CH's
  // streaming SipHash-2-4 with the non-reference 128 finalizer, plus the
  // upstream-reference 128 variant) ----
  /** Full SipHash state run; returns (lo, hi) where get64 = lo^hi for the
    * 64-bit form is NOT the contract — callers pick via the helpers. */
  private def sipRun(data: Array[Byte], k0: Long, k1: Long,
      ref128: Boolean): Array[Long] = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1
    if (ref128) v1 ^= 0xee
    val len = data.length
    @inline def round(): Unit = {
      v0 += v1; v1 = rotate64(v1, 13); v1 ^= v0; v0 = rotate64(v0, 32)
      v2 += v3; v3 = rotate64(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotate64(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotate64(v1, 17); v1 ^= v2; v2 = rotate64(v2, 32)
    }
    var i = 0
    while (i + 8 <= len) {
      val m = fetch64(data, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var tail = (len.toLong & 0xff) << 56
    var j = len - i - 1
    while (j >= 0) { tail |= (data(i + j) & 0xffL) << (8 * j); j -= 1 }
    v3 ^= tail; round(); round(); v0 ^= tail
    v2 ^= (if (ref128) 0xee else 0xff)
    round(); round(); round(); round()
    Array(v0, v1, v2, v3)
  }
  def sipHash64Keyed(k0: Long, k1: Long, data: Array[Byte]): Long = {
    val v = sipRun(data, k0, k1, ref128 = false)
    v(0) ^ v(1) ^ v(2) ^ v(3)
  }
  /** CH sipHash128 (lo, hi) — get128: (v0^v1, v2^v3). */
  def sipHash128Keyed(k0: Long, k1: Long, data: Array[Byte]): (Long, Long) = {
    val v = sipRun(data, k0, k1, ref128 = false)
    (v(0) ^ v(1), v(2) ^ v(3))
  }
  /** Upstream-reference SipHash128 (get128Reference). */
  def sipHash128RefKeyed(k0: Long, k1: Long,
      data: Array[Byte]): (Long, Long) = {
    val s = sipRun(data, k0, k1, ref128 = true)
    var v0 = s(0); var v1 = s(1); var v2 = s(2); var v3 = s(3)
    val lo = v0 ^ v1 ^ v2 ^ v3
    v1 ^= 0xdd
    var r = 0
    while (r < 4) {
      v0 += v1; v1 = rotate64(v1, 13); v1 ^= v0; v0 = rotate64(v0, 32)
      v2 += v3; v3 = rotate64(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotate64(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotate64(v1, 17); v1 ^= v2; v2 = rotate64(v2, 32)
      r += 1
    }
    val hi = v0 ^ v1 ^ v2 ^ v3
    (lo, hi)
  }

  /** halfMD5: first 8 MD5 bytes read big-endian (ref HalfMD5Impl:
    * byteswap of the LE word — unsigned UInt64 surface). */
  def halfMD5(b: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    var r = 0L
    var i = 0
    while (i < 8) { r = (r << 8) | (d(i) & 0xffL); i += 1 }
    r
  }

  /** CRC-32 with the 0xEDB88320 reflected table, zero init, NO final
    * inversion — CH's CRC32IEEE (ref src/Functions/CRC.cpp CRCImpl),
    * distinct from zlib crc32 (= CH CRC32 = Spark crc32). */
  private lazy val crcIeeeTab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var j = 0
      while (j < 8) {
        c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
        j += 1
      }
      t(i) = c
      i += 1
    }
    t
  }
  def crc32Ieee(b: Array[Byte]): Long = {
    var crc = 0
    var i = 0
    while (i < b.length) {
      crc = crcIeeeTab((crc ^ b(i)) & 0xff) ^ (crc >>> 8)
      i += 1
    }
    crc & 0xffffffffL
  }
  private lazy val crc64Tab: Array[Long] = {
    val poly = 0xc96c5795d7870f42L
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var j = 0
      while (j < 8) {
        c = if ((c & 1L) != 0) poly ^ (c >>> 1) else c >>> 1
        j += 1
      }
      t(i) = c
      i += 1
    }
    t
  }
  def crc64(b: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < b.length) {
      crc = crc64Tab(((crc ^ b(i)) & 0xff).toInt) ^ (crc >>> 8)
      i += 1
    }
    crc
  }

  /** javaHash over raw bytes (ref JavaHashImpl: 31·h + signed byte) and
    * the UTF16LE variant (bytes as LE code units — String.hashCode). */
  def javaHashBytes(b: Array[Byte]): Int = {
    var h = 0
    var i = 0
    while (i < b.length) { h = 31 * h + b(i); i += 1 }
    h
  }
  def javaHashUTF16LE(b: Array[Byte]): Int = {
    var h = 0
    var i = 0
    while (i + 1 < b.length) {
      val c = ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)).toChar
      h = 31 * h + c
      i += 2
    }
    h
  }

  /** jumpConsistentHash (public algorithm, Lamping & Veach 2014; ref
    * src/Functions/FunctionsConsistentHashing.h JumpConsistentHashImpl). */
  def jumpConsistentHash(key0: Long, buckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) *
        ((1L << 31).toDouble / (((key >>> 33) + 1).toDouble))).toLong
    }
    b.toInt
  }

  /** kostikConsistentHash / yandexConsistentHash (public algorithm; ref
    * contrib/consistent-hashing ConsistentHashing(x, n): 16-bit-block
    * bit-scheme with smooth 2^(k-1)→2^k transition). */
  def kostikConsistentHash(x: Long, n: Int): Int = {
    require(n > 0, "Can't map consistently to a zero values.")
    if (n == 1) return 0
    @inline def bitCount(v: Long): Int =
      64 - java.lang.Long.numberOfLeadingZeros(v)
    val lo = (x & 0xffffffffL).toInt
    val hi = (x >>> 32).toInt
    val a = lo & 0xffff; val b = (lo >>> 16) & 0xffff
    val c = hi & 0xffff; val d = (hi >>> 16) & 0xffff
    def forPow2(k2: Int): Int = {
      val cBlock = c & (k2 - 1)
      if (cBlock < 2) cBlock
      else {
        val y = bitCount(cBlock.toLong) - 1
        val y2 = 1 << y
        val z = java.lang.Integer.bitCount(cBlock)
        val ab = if (z % 2 == 0) a else b
        y2 + (ab & (y2 - 1))
      }
    }
    val k = bitCount((n - 1).toLong)
    val k2 = 1 << k
    val large = forPow2(k2)
    if (large < n) return large
    val k21 = 1 << (k - 1)
    var shift = 16 - k
    var res: Long = (d.toLong << shift) | (c.toLong >>> k)
    shift += 1
    res <<= shift
    res |= b.toLong >>> (k - 1)
    res <<= shift
    res |= a.toLong >>> (k - 1)
    val s = java.lang.Long.remainderUnsigned(res,
      large.toLong * (large + 1L))
    val large2 = (s / k2 + k21).toInt
    if (large2 < n) large2
    else forPow2(k21)
  }

  // ---- wyhash final v3 (public algorithm by Wang Yi; ref contrib/wyhash
  // via FunctionsHashing.h ImplWyHash64: wyhash(s, len, 0, _wyp)) ----
  private val wyp = Array(0xa0761d6478bd642fL, 0xe7037ed1a0b428dbL,
    0x8ebc6af09c88c6e3L, 0x589965cc75374cc3L)
  @inline private def umulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)
  @inline private def wymix(a0: Long, b0: Long): Long = {
    val lo = a0 * b0
    val hi = umulHi(a0, b0)
    lo ^ hi
  }
  private def wyr8(b: Array[Byte], i: Int): Long = fetch64(b, i)
  private def wyr4(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 0
    while (j < 4) { v |= (b(i + j) & 0xffL) << (8 * j); j += 1 }
    v
  }
  def wyHash64(b: Array[Byte]): Long = {
    val len = b.length
    var seed = 0L ^ wyp(0)
    var a = 0L; var x = 0L
    if (len <= 16) {
      if (len >= 4) {
        a = (wyr4(b, 0) << 32) | wyr4(b, (len >> 3) << 2)
        x = (wyr4(b, len - 4) << 32) | wyr4(b, len - 4 - ((len >> 3) << 2))
      } else if (len > 0) {
        a = ((b(0) & 0xffL) << 16) | ((b(len >> 1) & 0xffL) << 8) |
          (b(len - 1) & 0xffL)
        x = 0L
      }
    } else {
      var i = len; var p = 0
      if (i > 48) {
        var see1 = seed; var see2 = seed
        while (i > 48) {
          seed = wymix(wyr8(b, p) ^ wyp(1), wyr8(b, p + 8) ^ seed)
          see1 = wymix(wyr8(b, p + 16) ^ wyp(2), wyr8(b, p + 24) ^ see1)
          see2 = wymix(wyr8(b, p + 32) ^ wyp(3), wyr8(b, p + 40) ^ see2)
          p += 48; i -= 48
        }
        seed ^= see1 ^ see2
      }
      while (i > 16) {
        seed = wymix(wyr8(b, p) ^ wyp(1), wyr8(b, p + 8) ^ seed)
        i -= 16; p += 16
      }
      a = wyr8(b, p + i - 16); x = wyr8(b, p + i - 8)
    }
    wymix(wyp(1) ^ len.toLong, wymix(a ^ wyp(1), x ^ seed))
  }

  // ---- metrohash64_1, seed 0 (public algorithm by J. Andrew Rogers; ref
  // contrib/libmetrohash/src/metrohash64.cpp via ImplMetroHash64) ----
  def metroHash64(b: Array[Byte]): Long = {
    val k0 = 0xC83A91E1L; val k1 = 0x8648DBDBL
    val k2 = 0x7BDEC03BL; val k3 = 0x2F5870A5L
    @inline def rotr(v: Long, s: Int): Long = (v >>> s) | (v << (64 - s))
    val len = b.length
    var p = 0
    var hash = (k2 * k0) + len.toLong
    if (len >= 32) {
      var v0 = hash; var v1 = hash; var v2 = hash; var v3 = hash
      while (len - p >= 32) {
        v0 += fetch64(b, p) * k0; p += 8; v0 = rotr(v0, 29) + v2
        v1 += fetch64(b, p) * k1; p += 8; v1 = rotr(v1, 29) + v3
        v2 += fetch64(b, p) * k2; p += 8; v2 = rotr(v2, 29) + v0
        v3 += fetch64(b, p) * k3; p += 8; v3 = rotr(v3, 29) + v1
      }
      v2 ^= rotr(((v0 + v3) * k0) + v1, 33) * k1
      v3 ^= rotr(((v1 + v2) * k1) + v0, 33) * k0
      v0 ^= rotr(((v0 + v2) * k0) + v3, 33) * k1
      v1 ^= rotr(((v1 + v3) * k1) + v2, 33) * k0
      hash += v0 ^ v1
    }
    if (len - p >= 16) {
      var v0 = hash + fetch64(b, p) * k0; p += 8; v0 = rotr(v0, 33) * k1
      var v1 = hash + fetch64(b, p) * k1; p += 8; v1 = rotr(v1, 33) * k2
      v0 ^= rotr(v0 * k0, 35) + v1
      v1 ^= rotr(v1 * k3, 35) + v0
      hash += v1
    }
    if (len - p >= 8) {
      hash += fetch64(b, p) * k3; p += 8
      hash ^= rotr(hash, 33) * k1
    }
    if (len - p >= 4) {
      hash += wyr4(b, p) * k3; p += 4
      hash ^= rotr(hash, 15) * k1
    }
    if (len - p >= 2) {
      hash += (((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8)) * k3; p += 2
      hash ^= rotr(hash, 13) * k1
    }
    if (len - p >= 1) {
      hash += (b(p) & 0xffL) * k3
      hash ^= rotr(hash, 25) * k1
    }
    hash ^= rotr(hash, 33)
    hash *= k0
    hash ^= rotr(hash, 33)
    hash
  }

  // ---- FarmHash (public algorithm, Google; ref contrib/libfarmhash via
  // ImplFarmFingerprint64/ImplFarmHash64: Fingerprint64 = farmhashna's
  // Hash64, Hash64 = farmhashxo's dispatcher) ----
  private val fk0 = 0xc3a5c85c97cb3127L
  private val fk1 = 0xb492b66fbe98f273L
  private val fk2 = 0x9ae16a3b2f90404fL
  @inline private def fRot(v: Long, s: Int): Long =
    if (s == 0) v else (v >>> s) | (v << (64 - s))
  @inline private def fShiftMix(v: Long): Long = v ^ (v >>> 47)
  @inline private def fHashLen16(u: Long, v: Long): Long = hash128to64(u, v)
  @inline private def fHashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b2 = (v ^ a) * mul
    b2 ^= (b2 >>> 47)
    b2 * mul
  }
  private def fHashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len >= 8) {
      val mul = fk2 + len * 2L
      val a = fetch64(s, off) + fk2
      val b2 = fetch64(s, off + len - 8)
      val c = fRot(b2, 37) * mul + a
      val d = (fRot(a, 25) + b2) * mul
      fHashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = fk2 + len * 2L
      val a = wyr4(s, off)
      fHashLen16(len + (a << 3), wyr4(s, off + len - 4), mul)
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b2 = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = a + (b2 << 8)
      val z = len + (c << 2)
      fShiftMix(y * fk2 ^ z * fk0) * fk2
    } else fk2
  }
  private def fHashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = fk2 + len * 2L
    val a = fetch64(s, off) * fk1
    val b2 = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * fk2
    fHashLen16(fRot(a + b2, 43) + fRot(c, 30) + d,
      a + fRot(b2 + fk2, 18) + c, mul)
  }
  private def fWeak(w: Long, x: Long, y: Long, z: Long, a0: Long,
      b0: Long): (Long, Long) = {
    var a = a0 + w
    var b2 = fRot(b0 + a + z, 21)
    val c = a
    a += x; a += y
    b2 += fRot(a, 44)
    (a + z, b2 + c)
  }
  private def fWeak(s: Array[Byte], off: Int, a: Long,
      b2: Long): (Long, Long) =
    fWeak(fetch64(s, off), fetch64(s, off + 8), fetch64(s, off + 16),
      fetch64(s, off + 24), a, b2)
  private def fNaHashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = fk2 + len * 2L
    val a = fetch64(s, off) * fk2
    val b2 = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * fk2
    val y = fRot(a + b2, 43) + fRot(c, 30) + d
    val z = fHashLen16(y, a + fRot(b2 + fk2, 18) + c, mul)
    val e = fetch64(s, off + 16) * mul
    val f = fetch64(s, off + 24)
    val g = (y + fetch64(s, off + len - 32)) * mul
    val h = (z + fetch64(s, off + len - 24)) * mul
    fHashLen16(fRot(e + f, 43) + fRot(g, 30) + h,
      e + fRot(f + a, 18) + g, mul)
  }
  /** farmhashna::Hash64 == Fingerprint64. */
  def farmFingerprint64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 16) return fHashLen0to16(s, 0, len)
    if (len <= 32) return fHashLen17to32(s, 0, len)
    if (len <= 64) return fNaHashLen33to64(s, 0, len)
    val seed = 81L
    var x = seed
    var y = seed * fk1 + 113
    var z = fShiftMix(y * fk2 + 113) * fk2
    var v: (Long, Long) = (0L, 0L)
    var w: (Long, Long) = (0L, 0L)
    x = x * fk2 + fetch64(s, 0)
    var p = 0
    val end = ((len - 1) / 64) * 64
    val last64 = end + ((len - 1) & 63) - 63
    while (p != end) {
      x = fRot(x + y + v._1 + fetch64(s, p + 8), 37) * fk1
      y = fRot(y + v._2 + fetch64(s, p + 48), 42) * fk1
      x ^= w._2
      y += v._1 + fetch64(s, p + 40)
      z = fRot(z + w._1, 33) * fk1
      v = fWeak(s, p, v._2 * fk1, x + w._1)
      w = fWeak(s, p + 32, z + w._2, y + fetch64(s, p + 16))
      val t = z; z = x; x = t
      p += 64
    }
    val mul = fk1 + ((z & 0xff) << 1)
    p = last64
    w = (w._1 + ((len - 1) & 63), w._2)
    v = (v._1 + w._1, v._2)
    w = (w._1 + v._1, w._2)
    x = fRot(x + y + v._1 + fetch64(s, p + 8), 37) * mul
    y = fRot(y + v._2 + fetch64(s, p + 48), 42) * mul
    x ^= w._2 * 9
    y += v._1 * 9 + fetch64(s, p + 40)
    z = fRot(z + w._1, 33) * mul
    v = fWeak(s, p, v._2 * mul, x + w._1)
    w = fWeak(s, p + 32, z + w._2, y + fetch64(s, p + 16))
    val t = z; z = x; x = t
    fHashLen16(fHashLen16(v._1, w._1, mul) + fShiftMix(y) * fk0 + z,
      fHashLen16(v._2, w._2, mul) + x, mul)
  }
  private def fXoH32(s: Array[Byte], off: Int, len: Int, mul: Long,
      seed0: Long = 0L, seed1: Long = 0L): Long = {
    val a = fetch64(s, off) * fk1
    val b2 = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * fk2
    val u = fRot(a + b2, 43) + fRot(c, 30) + d + seed0
    val v = a + fRot(b2 + fk2, 18) + c + seed1
    val a2 = fShiftMix((u ^ v) * mul)
    fShiftMix((v ^ a2) * mul)
  }
  /** farmhashxo::Hash64 (CH farmHash64). >256 bytes delegates to the
    * uo variant, unimplemented here — CH test inputs are short. */
  def farmHash64(s: Array[Byte]): Long = {
    val len = s.length
    if (len <= 16) fHashLen0to16(s, 0, len)
    else if (len <= 32) fHashLen17to32(s, 0, len)
    else if (len <= 64) {
      val mul0 = fk2 - 30
      val mul1 = fk2 - 30 + 2L * len
      val h0 = fXoH32(s, 0, 32, mul0)
      val h1 = fXoH32(s, len - 32, 32, mul1)
      ((h1 * mul1) + h0) * mul1
    } else if (len <= 96) {
      val mul0 = fk2 - 114
      val mul1 = fk2 - 114 + 2L * len
      val h0 = fXoH32(s, 0, 32, mul0)
      val h1 = fXoH32(s, 32, 32, mul1)
      val h2 = fXoH32(s, len - 32, 32, mul1, h0, h1)
      (h2 * 9 + (h0 >>> 17) + (h1 >>> 21)) * mul1
    } else if (len <= 256) farmFingerprint64(s)
    else throw new UnsupportedOperationException(
      "farmHash64: inputs over 256 bytes not supported")
  }

  // ---- xxHash (ref FunctionsHashing.h ImplXxHash64/ImplXxHash32; the
  // XXH32/XXH64 algorithms are the public spec, seed 0) ----

  private val X64P1 = 0x9E3779B185EBCA87L
  private val X64P2 = 0xC2B2AE3D27D4EB4FL
  private val X64P3 = 0x165667B19E3779F9L
  private val X64P4 = 0x85EBCA77C2B2AE63L
  private val X64P5 = 0x27D4EB2F165667C5L

  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }
  private def le32(b: Array[Byte], i: Int): Int = {
    var v = 0; var k = 0
    while (k < 4) { v |= (b(i + k) & 0xff) << (8 * k); k += 1 }
    v
  }

  def xxHash64(b: Array[Byte]): Long = {
    val len = b.length
    @inline def round(acc: Long, in: Long): Long =
      rotate64(acc + in * X64P2, 31) * X64P1
    @inline def merge(acc0: Long, v: Long): Long = {
      val acc = acc0 ^ round(0L, v)
      acc * X64P1 + X64P4
    }
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = X64P1 + X64P2; var v2 = X64P2; var v3 = 0L; var v4 = -X64P1
        while (i <= len - 32) {
          v1 = round(v1, le64(b, i)); v2 = round(v2, le64(b, i + 8))
          v3 = round(v3, le64(b, i + 16)); v4 = round(v4, le64(b, i + 24))
          i += 32
        }
        var acc = rotate64(v1, 1) + rotate64(v2, 7) +
          rotate64(v3, 12) + rotate64(v4, 18)
        acc = merge(acc, v1); acc = merge(acc, v2)
        acc = merge(acc, v3); merge(acc, v4)
      } else X64P5
    h += len
    while (i <= len - 8) {
      h ^= round(0L, le64(b, i)); h = rotate64(h, 27) * X64P1 + X64P4; i += 8
    }
    if (i <= len - 4) {
      h ^= (le32(b, i) & 0xffffffffL) * X64P1
      h = rotate64(h, 23) * X64P2 + X64P3; i += 4
    }
    while (i < len) {
      h ^= (b(i) & 0xffL) * X64P5; h = rotate64(h, 11) * X64P1; i += 1
    }
    h ^= h >>> 33; h *= X64P2; h ^= h >>> 29; h *= X64P3; h ^= h >>> 32
    h
  }

  private val X32P1 = 0x9E3779B1
  private val X32P2 = 0x85EBCA77
  private val X32P3 = 0xC2B2AE3D
  private val X32P4 = 0x27D4EB2F
  private val X32P5 = 0x165667B1

  private def rotl32(v: Int, s: Int): Int = (v << s) | (v >>> (32 - s))

  /** XXH32 seed 0, returned zero-extended into a Long (CH UInt32). */
  def xxHash32(b: Array[Byte]): Long = {
    val len = b.length
    @inline def round(acc: Int, in: Int): Int =
      rotl32(acc + in * X32P2, 13) * X32P1
    var i = 0
    var h =
      if (len >= 16) {
        var v1 = X32P1 + X32P2; var v2 = X32P2; var v3 = 0; var v4 = -X32P1
        while (i <= len - 16) {
          v1 = round(v1, le32(b, i)); v2 = round(v2, le32(b, i + 4))
          v3 = round(v3, le32(b, i + 8)); v4 = round(v4, le32(b, i + 12))
          i += 16
        }
        rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18)
      } else X32P5
    h += len
    while (i <= len - 4) {
      h += le32(b, i) * X32P3; h = rotl32(h, 17) * X32P4; i += 4
    }
    while (i < len) {
      h += (b(i) & 0xff) * X32P5; h = rotl32(h, 11) * X32P1; i += 1
    }
    h ^= h >>> 15; h *= X32P2; h ^= h >>> 13; h *= X32P3; h ^= h >>> 16
    h & 0xffffffffL
  }

  /** MurmurHash2 32-bit (public algorithm by Austin Appleby; ref
    * FunctionsHashing.h MurmurHash2Impl32 — seed 0). */
  def murmurHash2_32(b: Array[Byte], seed: Int = 0): Long = {
    val m = 0x5bd1e995
    var len = b.length
    var h = seed ^ len
    var i = 0
    while (len >= 4) {
      var k = le32(b, i)
      k *= m; k ^= k >>> 24; k *= m
      h *= m; h ^= k
      i += 4; len -= 4
    }
    if (len >= 3) h ^= (b(i + 2) & 0xff) << 16
    if (len >= 2) h ^= (b(i + 1) & 0xff) << 8
    if (len >= 1) { h ^= b(i) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h & 0xffffffffL
  }

  /** MurmurHash64A (public algorithm; ref FunctionsHashing.h
    * MurmurHash2Impl64 seed 0, GccMurmurHashImpl seed 0xc70f6907). */
  def murmurHash64A(b: Array[Byte], seed: Long = 0L): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    val len = b.length
    var h = (seed ^ (len * m))
    var i = 0
    while (i <= len - 8) {
      var k = le64(b, i)
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 8
    }
    val tail = len & 7
    var j = tail - 1
    while (j >= 0) { h ^= (b(i + j) & 0xffL) << (8 * j); j -= 1 }
    if (tail > 0) h *= m
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  /** MurmurHash3 x86_32, seed 0 (public algorithm; ref
    * FunctionsHashing.h MurmurHash3Impl32). */
  def murmurHash3_32(b: Array[Byte]): Long = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = b.length
    var h = 0
    var i = 0
    while (i <= len - 4) {
      var k = le32(b, i)
      k *= c1; k = rotl32(k, 15); k *= c2
      h ^= k; h = rotl32(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val tail = len & 3
    if (tail >= 3) k ^= (b(i + 2) & 0xff) << 16
    if (tail >= 2) k ^= (b(i + 1) & 0xff) << 8
    if (tail >= 1) {
      k ^= b(i) & 0xff
      k *= c1; k = rotl32(k, 15); k *= c2; h ^= k
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    h & 0xffffffffL
  }

  /** MurmurHash3 x64_128, seed 0 → (h1, h2) (public algorithm; ref
    * FunctionsHashing.h MurmurHash3Impl64/128). */
  def murmurHash3_128(b: Array[Byte]): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    val len = b.length
    var h1 = 0L; var h2 = 0L
    val nblocks = len / 16
    var i = 0
    while (i < nblocks) {
      var k1 = le64(b, i * 16)
      var k2 = le64(b, i * 16 + 8)
      k1 *= c1; k1 = rotate64(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotate64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotate64(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotate64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val t = nblocks * 16
    var k1 = 0L; var k2 = 0L
    val tail = len & 15
    if (tail >= 15) k2 ^= (b(t + 14) & 0xffL) << 48
    if (tail >= 14) k2 ^= (b(t + 13) & 0xffL) << 40
    if (tail >= 13) k2 ^= (b(t + 12) & 0xffL) << 32
    if (tail >= 12) k2 ^= (b(t + 11) & 0xffL) << 24
    if (tail >= 11) k2 ^= (b(t + 10) & 0xffL) << 16
    if (tail >= 10) k2 ^= (b(t + 9) & 0xffL) << 8
    if (tail >= 9) {
      k2 ^= b(t + 8) & 0xffL
      k2 *= c2; k2 = rotate64(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (tail >= 8) k1 ^= (b(t + 7) & 0xffL) << 56
    if (tail >= 7) k1 ^= (b(t + 6) & 0xffL) << 48
    if (tail >= 6) k1 ^= (b(t + 5) & 0xffL) << 40
    if (tail >= 5) k1 ^= (b(t + 4) & 0xffL) << 32
    if (tail >= 4) k1 ^= (b(t + 3) & 0xffL) << 24
    if (tail >= 3) k1 ^= (b(t + 2) & 0xffL) << 16
    if (tail >= 2) k1 ^= (b(t + 1) & 0xffL) << 8
    if (tail >= 1) {
      k1 ^= b(t) & 0xffL
      k1 *= c1; k1 = rotate64(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= len; h2 ^= len
    h1 += h2; h2 += h1
    def fmix64(k0: Long): Long = {
      var k = k0
      k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
      k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
      k ^= k >>> 33
      k
    }
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  /** ref Common/HashTable/Hash.h intHash32<0x75D9543DE018BF45> (the
    * IntHash32Impl salt in FunctionsHashing.h:139) — xxHash32's combiner. */
  def intHash32Impl(key0: Long): Long = {
    var key = key0 ^ 0x75D9543DE018BF45L
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key & 0xffffffffL
  }
}

/** cityHash64 / sipHash64 over any argument list, CH semantics (ref
  * FunctionsHashing.h FunctionAnyHash): per-element hash by type, tuples
  * flattened recursively, chained combine. `city = true` selects the
  * CityHash combine + int-hash-for-PODs rule; false = SipHash byte rule.
  */
/** Identity wrapper marking a value as a CH UIntN: the carrier Spark
  * type is one width tier up (UInt8 rides in SMALLINT), so byte-hashing
  * functions need the original width. Evaluates to its child unchanged.
  */
case class ChUIntTag(child: Expression, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(c: Expression): ChUIntTag =
    copy(child = c)
  override def prettyName: String = s"toUInt${width * 8}"
}

case class ChAnyHash(city: Boolean, children: Seq[Expression],
    algo: String = "", widths: Seq[Int] = Nil, keyed: Boolean = false)
    extends Expression with CodegenFallback {

  // algo: "" → legacy city/sip flag; "xx64"/"xx32" → xxHash with CH's
  // combine rule (ref ImplXxHash64/ImplXxHash32 in FunctionsHashing.h);
  // "sip128"/"sip128ref" → FixedString(16) output; `keyed` marks
  // children.head as the (k0, k1) UInt64 key tuple (ref SipHashKeyed)
  private def algoName: String =
    if (algo.nonEmpty) algo else if (city) "city" else "sip"
  private def is128: Boolean =
    algoName == "sip128" || algoName == "sip128ref" ||
      algoName == "murmur128"

  override def dataType: DataType =
    if (is128) BinaryType
    else if (algoName == "xx32" || algoName == "murmur2_32" ||
      algoName == "murmur3_32") LongType
    else DecimalType(20, 0)
  override def nullable: Boolean = children.exists(_.nullable)

  private def dataChildren: Seq[Expression] =
    if (keyed) children.tail else children

  override def eval(input: InternalRow): Any = {
    var h = 0L
    var hHi = 0L // second lane of the 128-bit algos
    var first = true
    var sawNull = false

    // keyed forms evaluate the key tuple per row
    var k0 = 0L; var k1 = 0L
    if (keyed) {
      val kv = children.head.eval(input)
      if (kv == null) return null
      val row = kv.asInstanceOf[InternalRow]
      def keyLong(i: Int): Long =
        children.head.dataType.asInstanceOf[StructType](i).dataType match {
          case _: DecimalType =>
            row.getDecimal(i, 20, 0).toJavaBigDecimal.unscaledValue.longValue
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i).toLong
          case ShortType => row.getShort(i).toLong
          case ByteType => row.getByte(i).toLong
          case other => throw new UnsupportedOperationException(
            s"sipHash keyed: key component type $other")
        }
      k0 = keyLong(0); k1 = keyLong(1)
    }

    def pairBytes(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
        wide: Boolean): Array[Byte] = {
      val out = new Array[Byte](if (wide) 32 else 16)
      val words = if (wide) Array(aLo, aHi, bLo, bHi) else Array(aLo, bLo)
      var w = 0
      while (w < words.length) {
        var i = 0
        while (i < 8) {
          out(8 * w + i) = ((words(w) >>> (8 * i)) & 0xff).toByte
          i += 1
        }
        w += 1
      }
      out
    }

    def combine2(eLo: Long, eHi: Long): Unit = {
      if (first) { first = false; h = eLo; hHi = eHi }
      else algoName match {
        case "city" | "xx64" | "xxh3" | "metro" | "farm" =>
          h = ChHash.hash128to64(h, eLo)
        case "farmfp" => h = ChHash.hash128to64(h, eLo)
        case "wy" => h = ChHash.wyHash64(pairBytes(h, 0, eLo, 0, wide = false))
        case "halfmd5" =>
          h = ChHash.halfMD5(pairBytes(h, 0, eLo, 0, wide = false))
        case "xx32" | "murmur2_32" | "murmur3_32" =>
          h = ChHash.intHash32Impl(h) ^ eLo
        case "murmur2_64" | "murmur3_64" | "gcc" =>
          h = ChHash.intHash64Impl(h) ^ eLo
        case "sip128" =>
          val (lo, hi) = ChHash.sipHash128Keyed(k0, k1,
            pairBytes(h, hHi, eLo, eHi, wide = true))
          h = lo; hHi = hi
        case "sip128ref" =>
          // ref: unkeyed SipHash128ReferenceImpl::combineHashes uses the
          // NON-ref SipHash128Impl (combineHashesFunc<UInt128,
          // SipHash128Impl>), but SipHash128ReferenceKeyedImpl::
          // combineHashesKeyed re-applies sipHash128ReferenceKeyed itself
          // (FunctionsHashing.h:421-432).
          val (lo, hi) =
            if (keyed)
              ChHash.sipHash128RefKeyed(k0, k1,
                pairBytes(h, hHi, eLo, eHi, wide = true))
            else
              ChHash.sipHash128Keyed(0L, 0L,
                pairBytes(h, hHi, eLo, eHi, wide = true))
          h = lo; hHi = hi
        case "murmur128" =>
          val (lo, hi) = ChHash.murmurHash3_128(
            pairBytes(h, hHi, eLo, eHi, wide = true))
          h = lo; hHi = hi
        case _ => // sip (keyed or not)
          h = ChHash.sipHash64Keyed(k0, k1, pairBytes(h, 0, eLo, 0,
            wide = false))
      }
    }
    def combine(e: Long): Unit = combine2(e, 0L)
    def combineInt2(p: (Long, Long)): Unit = combine2(p._1, p._2)

    def leBytes(v: java.math.BigInteger, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      val src = v.toByteArray // big-endian two's-complement
      val neg = v.signum < 0
      java.util.Arrays.fill(out, if (neg) (-1).toByte else 0.toByte)
      var i = 0
      while (i < src.length && i < n) {
        out(i) = src(src.length - 1 - i)
        i += 1
      }
      out
    }

    def bytesElem2(b: Array[Byte]): (Long, Long) = algoName match {
      case "city" => (ChHash.cityHash64(b), 0L)
      case "xx64" => (ChHash.xxHash64(b), 0L)
      case "xx32" => (ChHash.xxHash32(b), 0L)
      case "murmur2_32" => (ChHash.murmurHash2_32(b), 0L)
      case "murmur2_64" => (ChHash.murmurHash64A(b), 0L)
      case "murmur3_32" => (ChHash.murmurHash3_32(b), 0L)
      case "murmur3_64" =>
        val (h1, h2) = ChHash.murmurHash3_128(b); (h1 ^ h2, 0L)
      case "gcc" => (ChHash.murmurHash64A(b, 0xc70f6907L), 0L)
      case "wy" => (ChHash.wyHash64(b), 0L)
      case "xxh3" => (Xxh3.hash64(b), 0L)
      case "metro" => (ChHash.metroHash64(b), 0L)
      case "farmfp" => (ChHash.farmFingerprint64(b), 0L)
      case "farm" => (ChHash.farmHash64(b), 0L)
      case "halfmd5" => (ChHash.halfMD5(b), 0L)
      case "sip128" => ChHash.sipHash128Keyed(k0, k1, b)
      case "sip128ref" => ChHash.sipHash128RefKeyed(k0, k1, b)
      case "murmur128" => ChHash.murmurHash3_128(b)
      case _ => (ChHash.sipHash64Keyed(k0, k1, b), 0L)
    }
    def bytesElem(b: Array[Byte]): Long = bytesElem2(b)._1
    def combineBytes(b: Array[Byte]): Unit = {
      val (lo, hi) = bytesElem2(b)
      combine2(lo, hi)
    }

    def intElem2(value: Long, width: Int): (Long, Long) = {
      val masked = width match {
        case 1 => value & 0xffL
        case 2 => value & 0xffffL
        case 4 => value & 0xffffffffL
        case _ => value
      }
      // int-hash-for-pods rule: city AND metro/farm families (ref
      // use_int_hash_for_pods in FunctionsHashing.h)
      if (algoName == "city" || algoName == "metro" ||
        algoName == "farmfp" || algoName == "farm")
        (ChHash.intHash64Impl(masked), 0L)
      else {
        val b = new Array[Byte](width)
        var i = 0
        while (i < width) { b(i) = ((value >>> (8 * i)) & 0xff).toByte; i += 1 }
        bytesElem2(b)
      }
    }
    def intElem(value: Long, width: Int): Long = intElem2(value, width)._1

    // `widths` is a FLATTENED pre-order slot list (struct fields expand,
    // an array is one slot applying to its elements) of CH literal-type
    // widths — a Spark int literal may be a CH UInt8. `fixed` is set
    // inside arrays: elements reuse the array's slot instead of consuming.
    val slotIt = widths.iterator
    def nextSlot(): Int = if (slotIt.hasNext) slotIt.next() else 0
    def intW(fixed: Boolean, fw: Int, spark: Int): Int = {
      val w = if (fixed) fw else nextSlot()
      if (w > 0) w else spark
    }
    def walk(v: Any, dt: DataType, fixed: Boolean = false,
        fw: Int = 0): Unit = {
      if (v == null) {
        sawNull = true
        if (!fixed) dt match {
          case st: StructType => // keep slot alignment for later children
            st.foreach(f => walk(null, f.dataType, fixed = false))
            return
          case _ => nextSlot()
        }
        return
      }
      dt match {
        case st: StructType =>
          val row = v.asInstanceOf[InternalRow]
          var i = 0
          while (i < st.length) {
            walk(row.get(i, st(i).dataType), st(i).dataType, fixed, fw)
            i += 1
          }
        case ByteType =>
          combineInt2(intElem2(v.asInstanceOf[Byte].toLong, intW(fixed, fw, 1)))
        case ShortType =>
          combineInt2(intElem2(v.asInstanceOf[Short].toLong, intW(fixed, fw, 2)))
        case IntegerType =>
          combineInt2(intElem2(v.asInstanceOf[Int].toLong, intW(fixed, fw, 4)))
        case LongType =>
          combineInt2(intElem2(v.asInstanceOf[Long], intW(fixed, fw, 8)))
        case BooleanType =>
          if (!fixed) nextSlot()
          combineInt2(intElem2(if (v.asInstanceOf[Boolean]) 1L else 0L, 1))
        case DateType => // CH Date = UInt16 days
          if (!fixed) nextSlot()
          combineInt2(intElem2(v.asInstanceOf[Int].toLong, 2))
        case TimestampType => // CH DateTime = UInt32 epoch seconds
          if (!fixed) nextSlot()
          combineInt2(intElem2(
            Math.floorDiv(v.asInstanceOf[Long], 1000000L), 4))
        case FloatType =>
          if (!fixed) nextSlot()
          combineInt2(intElem2(
            java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
              .toLong, 4))
        case DoubleType =>
          if (!fixed) nextSlot()
          combineInt2(intElem2(
            java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8))
        case d: DecimalType =>
          if (!fixed) nextSlot()
          // scaled value's little-endian bytes at the CH storage width;
          // Decimal32/64/128 all hash bytes (pinned by 01032)
          val unscaled = v.asInstanceOf[Decimal].toJavaBigDecimal
            .unscaledValue
          val width = if (d.precision <= 9) 4
            else if (d.precision <= 18) 8 else 16
          combineInt2(bytesElem2(leBytes(unscaled, width)))
        case StringType =>
          if (!fixed) nextSlot()
          combineInt2(bytesElem2(
            v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
              .getBytes))
        case BinaryType =>
          if (!fixed) nextSlot()
          combineInt2(bytesElem2(v.asInstanceOf[Array[Byte]]))
        case ArrayType(et, _) =>
          // ref FunctionsHashing.h executeArray: hash of the LENGTH
          // (IntHash64Impl/IntHash32Impl — the unsalted finalizer),
          // then each element's hash combined in order
          val arr = v.asInstanceOf[
            org.apache.spark.sql.catalyst.util.ArrayData]
          val n = arr.numElements()
          // length-hash finalizer follows the ToType: UInt64 results use
          // IntHash64, every other width (32-bit AND 128-bit) IntHash32
          // (ref executeArray's `if constexpr (is_same_v<ToType, UInt64>)`)
          combine(
            if (algoName == "xx32" || algoName == "murmur2_32" ||
              algoName == "murmur3_32" || is128)
              ChHash.intHash32Impl(n.toLong)
            else ChHash.intHash64Impl(n.toLong))
          val ew = if (fixed) fw else nextSlot()
          var i = 0
          while (i < n) {
            walk(arr.get(i, et), et, fixed = true, ew)
            i += 1
          }
        case other => throw new UnsupportedOperationException(
          s"${if (city) "cityHash64" else "sipHash64"}: unsupported type $other")
      }
    }

    dataChildren.foreach(c => walk(c.eval(input), c.dataType))
    if (sawNull) null
    else {
      // zero args → CH's fixed magic (FunctionsHashing.h executeImpl)
      val out = if (first) 0xe28dbde7fe22e41cL else h
      val outHi = if (first) 0L else hHi
      if (is128) {
        // FixedString(16): little-endian lo then hi (SipHash.h get128)
        val b = new Array[Byte](16)
        var i = 0
        while (i < 8) {
          b(i) = ((out >>> (8 * i)) & 0xff).toByte
          b(8 + i) = ((outHi >>> (8 * i)) & 0xff).toByte
          i += 1
        }
        b
      }
      else if (algoName == "xx32" || algoName == "murmur2_32" ||
        algoName == "murmur3_32") java.lang.Long.valueOf(out & 0xffffffffL)
      else ChHash.toUnsignedDecimal(out)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
