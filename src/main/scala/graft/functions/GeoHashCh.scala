package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geohash scalar functions (ref src/Functions/GeoHash.cpp:
  * geohashEncode / geohashDecode / geohashesInBox). The geohash scheme
  * itself is the public base32 bit-interleave; the reference-specific
  * behaviors reproduced here are precision clamping (0 or >12 → 12),
  * box saturation to the world rectangle, grid-aligned span coverage,
  * and the single-cell fallback when the aligned box is empty.
  */
object GeoHashCh {
  final val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  final val MaxPrecision = 12

  def clampPrecision(p: Int): Int =
    if (p <= 0 || p > MaxPrecision) MaxPrecision else p

  private def coordBits(precision: Int, isLon: Boolean): Int = {
    val bits = (precision * 5) / 2
    if ((precision & 1) == 1 && isLon) bits + 1 else bits
  }

  private def encodeCoord(coord: Double, min0: Double, max0: Double,
      bits: Int): Array[Int] = {
    val out = new Array[Int](bits)
    var min = min0; var max = max0
    var i = 0
    while (i < bits) {
      val mid = (max + min) / 2
      if (coord >= mid) { out(i) = 1; min = mid } else { max = mid }
      i += 1
    }
    out
  }

  def encode(lon: Double, lat: Double, precision0: Int): String = {
    val precision = clampPrecision(precision0)
    val lonBits = encodeCoord(lon, -180, 180, coordBits(precision, isLon = true))
    val latBits = encodeCoord(lat, -90, 90, coordBits(precision, isLon = false))
    val combined = new Array[Int](precision * 5)
    val half = (precision * 5) / 2
    var i = 0
    while (i < half) {
      combined(i * 2) = lonBits(i)
      combined(i * 2 + 1) = latBits(i)
      i += 1
    }
    if ((precision & 1) == 1) combined(half * 2) = lonBits(half)
    val sb = new StringBuilder(precision)
    var b = 0
    while (b < precision * 5) {
      val v = (combined(b) << 4) | (combined(b + 1) << 3) |
        (combined(b + 2) << 2) | (combined(b + 3) << 1) | combined(b + 4)
      sb.append(Alphabet.charAt(v))
      b += 5
    }
    sb.toString
  }

  def decode(s: String): (Double, Double) = {
    val precision = math.min(s.length, MaxPrecision)
    if (precision == 0) return (0.0, 0.0)
    val bits = new Array[Int](precision * 5)
    var i = 0
    while (i < precision) {
      val v = Alphabet.indexOf(s.charAt(i).toLower) & 0x1f
      bits(i * 5) = (v >> 4) & 1; bits(i * 5 + 1) = (v >> 3) & 1
      bits(i * 5 + 2) = (v >> 2) & 1; bits(i * 5 + 3) = (v >> 1) & 1
      bits(i * 5 + 4) = v & 1
      i += 1
    }
    val lonBits = new Array[Int](coordBits(precision, isLon = true))
    val latBits = new Array[Int](coordBits(precision, isLon = false))
    var j = 0
    while (j < precision * 5 - 1) {
      lonBits(j / 2) = bits(j); latBits(j / 2) = bits(j + 1); j += 2
    }
    if ((precision & 1) == 1) lonBits(j / 2) = bits(precision * 5 - 1)
    def dec(cs: Array[Int], min0: Double, max0: Double): Double = {
      var min = min0; var max = max0
      var mid = (max + min) / 2
      var k = 0
      while (k < cs.length) {
        if (cs(k) == 1) min = mid else max = mid
        mid = (max + min) / 2
        k += 1
      }
      mid
    }
    (dec(lonBits, -180, 180), dec(latBits, -90, 90))
  }

  def inBox(lonMin0: Double, latMin0: Double, lonMax0: Double,
      latMax0: Double, precision0: Int): Array[String] = {
    val precision = clampPrecision(precision0)
    if (lonMax0 < lonMin0 || latMax0 < latMin0 || lonMin0.isNaN ||
        lonMax0.isNaN || latMin0.isNaN || latMax0.isNaN)
      return Array.empty
    def sat(v: Double, lo: Double, hi: Double): Double =
      if (v < lo) lo else if (v > hi) hi else v
    val lonMinS = sat(lonMin0, -180, 180); val lonMaxS = sat(lonMax0, -180, 180)
    val latMinS = sat(latMin0, -90, 90); val latMaxS = sat(latMax0, -90, 90)
    val lonStep = math.scalb(360.0, -coordBits(precision, isLon = true))
    val latStep = math.scalb(180.0, -coordBits(precision, isLon = false))
    val lonMin = math.floor(lonMinS / lonStep) * lonStep
    val latMin = math.floor(latMinS / latStep) * latStep
    val lonMax = math.ceil(lonMaxS / lonStep) * lonStep
    val latMax = math.ceil(latMaxS / latStep) * latStep
    val lonItems = ((lonMax - lonMin) / lonStep).toInt
    val latItems = ((latMax - latMin) / latStep).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < lonItems) {
      var j = 0
      while (j < latItems) {
        out += encode(lonMin + lonStep * i, latMin + latStep * j, precision)
        j += 1
      }
      i += 1
    }
    if (out.isEmpty) out += encode(lonMin, latMin, precision)
    out.toArray
  }
}

/** geohashesInBox(lon_min, lat_min, lon_max, lat_max, precision). */
case class GeohashesInBox(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "geohashesInBox"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def d(a: Any): Double = a match {
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    }
    new GenericArrayData(GeoHashCh.inBox(d(vs(0)), d(vs(1)), d(vs(2)),
      d(vs(3)), d(vs(4)).toInt)
      .map(UTF8String.fromString(_)).toArray[Any])
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GeohashesInBox = copy(children = cs)
}

/** geohashEncode(lon, lat[, precision]). */
case class GeohashEncodeExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "geohashEncode"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def d(a: Any): Double = a match {
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    }
    val p = if (vs.length > 2) d(vs(2)).toInt else GeoHashCh.MaxPrecision
    UTF8String.fromString(GeoHashCh.encode(d(vs(0)), d(vs(1)), p))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GeohashEncodeExpr = copy(children = cs)
}

/** visibleWidth(x): display width of the value's text form (ref
  * src/Functions/visibleWidth.cpp — the width the Pretty formats
  * reserve). Formats through the same renderer the golden TSV output
  * uses, so nested quoting matches. */
case class VisibleWidth(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "visibleWidth"
  @transient private lazy val toScala =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(child.dataType)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val text =
      if (v == null) "NULL"
      else graft.golden.Golden.fmt(toScala(v))
    text.codePointCount(0, text.length).toLong
  }
  override protected def withNewChildInternal(c: Expression): VisibleWidth =
    copy(child = c)
}

/** geohashDecode(s) → tuple(longitude, latitude). */
case class GeohashDecodeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false)))
  override def prettyName: String = "geohashDecode"
  override protected def nullSafeEval(v: Any): Any = {
    val (lon, lat) = GeoHashCh.decode(v.toString)
    InternalRow(lon, lat)
  }
  override protected def withNewChildInternal(c: Expression)
      : GeohashDecodeExpr = copy(child = c)
}
