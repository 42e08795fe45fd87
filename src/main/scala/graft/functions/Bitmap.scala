package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bitmap aggregate + scalar functions over a compressed 64-bit bitset.
  *
  * Reference: `groupBitmap`/`groupBitmapState` and the `bitmap*` scalar
  * family (`/root/reference/src/AggregateFunctions/
  * AggregateFunctionGroupBitmap.cpp`, `src/Functions/FunctionsBitmap.cpp`).
  * CH backs these with RoaringBitmap; this implementation uses the same
  * two-level idea reduced to one level — a sorted sparse array of
  * (word index, 64-bit word) pairs — which compresses 64:1 on dense key
  * ranges, supports the full signed-64 domain, and gives O(n+m) merge for
  * every binary op without deserializing to a hash structure.
  *
  * Wire format (BinaryType columns): n:Int32 then n × (idx:Int64,
  * word:Int64), pairs sorted by idx, no zero words, big-endian.
  */
object Bitmap {

  /** Working representation: parallel sorted arrays. */
  final class BM(val idx: Array[Long], val words: Array[Long]) {
    def cardinality: Long = {
      var s = 0L; var i = 0
      while (i < words.length) { s += java.lang.Long.bitCount(words(i)); i += 1 }
      s
    }
  }

  val empty = new BM(Array.empty, Array.empty)

  def fromValues(vs: IterableOnce[Long]): BM = {
    val m = mutable.HashMap.empty[Long, Long]
    vs.iterator.foreach { v =>
      val w = Math.floorDiv(v, 64)
      val b = 1L << Math.floorMod(v, 64)
      m.update(w, m.getOrElse(w, 0L) | b)
    }
    fromMap(m)
  }

  def fromMap(m: collection.Map[Long, Long]): BM = {
    val ks = m.keys.toArray.sorted
    new BM(ks, ks.map(m))
  }

  def serialize(bm: BM): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 16 * bm.idx.length)
    buf.putInt(bm.idx.length)
    var i = 0
    while (i < bm.idx.length) { buf.putLong(bm.idx(i)); buf.putLong(bm.words(i)); i += 1 }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): BM = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val idx = new Array[Long](n); val words = new Array[Long](n)
    var i = 0
    while (i < n) { idx(i) = buf.getLong; words(i) = buf.getLong; i += 1 }
    new BM(idx, words)
  }

  /** Sorted-merge binary op; `f` combines the two words (absent = 0).
    * Zero results are dropped to keep the encoding canonical. */
  private def merge(a: BM, b: BM)(f: (Long, Long) => Long): BM = {
    val idx = mutable.ArrayBuilder.make[Long]
    val words = mutable.ArrayBuilder.make[Long]
    var i = 0; var j = 0
    def emit(k: Long, w: Long): Unit = if (w != 0L) { idx += k; words += w }
    while (i < a.idx.length || j < b.idx.length) {
      if (j >= b.idx.length || (i < a.idx.length && a.idx(i) < b.idx(j))) {
        emit(a.idx(i), f(a.words(i), 0L)); i += 1
      } else if (i >= a.idx.length || b.idx(j) < a.idx(i)) {
        emit(b.idx(j), f(0L, b.words(j))); j += 1
      } else {
        emit(a.idx(i), f(a.words(i), b.words(j))); i += 1; j += 1
      }
    }
    new BM(idx.result(), words.result())
  }

  def and(a: BM, b: BM): BM = merge(a, b)(_ & _)
  def or(a: BM, b: BM): BM = merge(a, b)(_ | _)
  def xor(a: BM, b: BM): BM = merge(a, b)(_ ^ _)
  def andnot(a: BM, b: BM): BM = merge(a, b)((x, y) => x & ~y)

  def contains(bm: BM, v: Long): Boolean = {
    val w = Math.floorDiv(v, 64)
    val i = java.util.Arrays.binarySearch(bm.idx, w)
    i >= 0 && (bm.words(i) & (1L << Math.floorMod(v, 64))) != 0L
  }

  def min(bm: BM): Option[Long] =
    if (bm.idx.isEmpty) None
    else Some(bm.idx(0) * 64 + java.lang.Long.numberOfTrailingZeros(bm.words(0)))

  def max(bm: BM): Option[Long] =
    if (bm.idx.isEmpty) None
    else {
      val last = bm.idx.length - 1
      Some(bm.idx(last) * 64 + 63 - java.lang.Long.numberOfLeadingZeros(bm.words(last)))
    }

  def toArray(bm: BM): Array[Long] = {
    val out = mutable.ArrayBuilder.make[Long]
    var i = 0
    while (i < bm.idx.length) {
      var w = bm.words(i)
      while (w != 0L) {
        val b = java.lang.Long.numberOfTrailingZeros(w)
        out += bm.idx(i) * 64 + b
        w &= w - 1
      }
      i += 1
    }
    out.result()
  }

  // ---- aggregates (add/merge/finalize, ref IAggregateFunction.h:150) ----

  // HashMap, not LongMap: Kryo round-trips scala Maps through a generic
  // Map serializer that rebuilds a HashMap, so a LongMap buffer fails to
  // decode after shuffle.
  type Buf = mutable.HashMap[Long, Long]

  private def reduceInto(b: Buf, v: Long): Buf = {
    val w = Math.floorDiv(v, 64)
    b.update(w, b.getOrElse(w, 0L) | (1L << Math.floorMod(v, 64)))
    b
  }

  private def mergeBufs(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, w) => a.update(k, a.getOrElse(k, 0L) | w) }
    a
  }

  /** groupBitmapState: bitmap of the values as a binary column.
    * Input is (value, include) so `-If`-style filtered bitmaps build in
    * one pass (CH's groupBitmapStateIf). */
  class GroupBitmapState extends Aggregator[(Long, Boolean), Buf, Array[Byte]] {
    def zero: Buf = mutable.HashMap.empty
    def reduce(b: Buf, in: (Long, Boolean)): Buf =
      if (in._2) reduceInto(b, in._1) else b
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b)
    def finish(b: Buf): Array[Byte] = serialize(fromMap(b))
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** groupBitmap: cardinality of the value bitmap (CH returns UInt64). */
  class GroupBitmap extends Aggregator[(Long, Boolean), Buf, Long] {
    def zero: Buf = mutable.HashMap.empty
    def reduce(b: Buf, in: (Long, Boolean)): Buf =
      if (in._2) reduceInto(b, in._1) else b
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b)
    def finish(b: Buf): Long = fromMap(b).cardinality
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** groupBitmapOrState over already-built bitmap (binary) columns. */
  class GroupBitmapOr extends Aggregator[Array[Byte], Buf, Array[Byte]] {
    def zero: Buf = mutable.HashMap.empty
    def reduce(b: Buf, bytes: Array[Byte]): Buf = {
      if (bytes != null) {
        val bm = deserialize(bytes)
        var i = 0
        while (i < bm.idx.length) {
          b.update(bm.idx(i), b.getOrElse(bm.idx(i), 0L) | bm.words(i)); i += 1
        }
      }
      b
    }
    def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b)
    def finish(b: Buf): Array[Byte] = serialize(fromMap(b))
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
