package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** H3 hierarchical-index functions — the table-free subset (ref
  * src/Functions/h3GetResolution.cpp, h3IsValid.cpp, h3ToParent.cpp,
  * h3ToChildren.cpp, h3ToCenterChild.cpp, h3ToString.cpp,
  * stringToH3.cpp, h3IsPentagon.cpp, h3IsResClassIII.cpp,
  * h3GetBaseCell.cpp, h3EdgeAngle.cpp, h3EdgeLength{M,Km}.cpp,
  * h3HexArea{M2,Km2}.cpp, h3NumHexagons.cpp, h3GetPentagonIndexes.cpp,
  * h3GetRes0Indexes.cpp, h3PointDist.cpp).
  *
  * H3 is Uber's public hexagonal-grid spec. Everything here operates on
  * the published 64-bit index layout (mode:4 @59, reserved:3 @56,
  * res:4 @52, baseCell:7 @45, then fifteen 3-bit digits) plus the
  * published per-resolution constant tables — no icosahedron projection
  * is needed. The geo-projection subset (geoToH3, h3ToGeo, kRing,
  * hexRing, h3Line, h3Distance, unidirectional edges, h3GetFaces) needs
  * the H3 library's base-cell orientation/neighbor tables, which are
  * not re-derivable from the spec and whose source is not vendored in
  * the reference (contrib/h3 submodule is not checked out) — those
  * remain unimplemented and are documented in COVERAGE.md.
  *
  * Constant-table provenance: the per-resolution edge-length / area
  * tables are H3's published averages; every entry a reference golden
  * probes (edgeLengthM res 1/2/4/10, hexArea res 5/13, all 16 km
  * entries) is pinned byte-for-byte by
  * tests/queries/0_stateless/01043/01044/01070/02160/02165.
  */
object H3Core {
  final val MaxRes = 15
  /** 12 pentagon base cells (published H3 spec; confirmed by the
    * reference's own 02212_h3_get_pentagon_indexes.reference). */
  final val PentagonBaseCells: Array[Int] =
    Array(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
  private final val PentagonSet = PentagonBaseCells.toSet

  /** Mean earth radius used by H3 (authalic, meters). */
  final val EarthRadiusM = 6371007.180918475
  final val EarthRadiusKm = 6371.007180918475

  /** Average hexagon edge length in meters per resolution (H3 3.x
    * published table; res 1/2/4/10 pinned by goldens 01043 + 01044). */
  final val EdgeLengthM: Array[Double] = Array(
    1107712.591, 418676.0055, 158244.6558, 59810.85794, 22606.3794,
    8544.408276, 3229.482772, 1220.629759, 461.3546837, 174.3756681,
    65.90780749, 24.9108114, 9.415526211, 3.559893033, 1.348574562,
    0.509713273)

  /** Average hexagon edge length in kilometers (independent H3 table —
    * NOT EdgeLengthM/1000; all 16 entries pinned by golden 02165). */
  final val EdgeLengthKm: Array[Double] = Array(
    1107.712591, 418.6760055, 158.2446558, 59.81085794, 22.6063794,
    8.544408276, 3.229482772, 1.220629759, 0.461354684, 0.174375668,
    0.065907807, 0.024910561, 0.009415526, 0.003559893, 0.001348575,
    0.000509713)

  /** Average hexagon area in km² (all 16 entries pinned by 02160). */
  final val HexAreaKm2: Array[Double] = Array(
    4250546.848, 607220.9782, 86745.85403, 12392.26486, 1770.323552,
    252.9033645, 36.1290521, 5.1612932, 0.7373276, 0.1053325, 0.0150475,
    0.0021496, 0.0003071, 0.0000439, 0.0000063, 0.0000009)

  /** Average hexagon area in m² (res 5/13 pinned by 01070). */
  final val HexAreaM2: Array[Double] = Array(
    4.250546848e12, 6.072209782e11, 8.674585403e10, 1.239226486e10,
    1.770323552e9, 2.529033645e8, 3.61290521e7, 5.1612932e6, 737327.6,
    105332.5, 15047.5, 2149.6, 307.1, 43.9, 6.3, 0.9)

  @inline def resolution(h: Long): Int = ((h >>> 52) & 0xF).toInt
  @inline def baseCell(h: Long): Int = ((h >>> 45) & 0x7F).toInt
  @inline private def digitOffset(r: Int): Int = (MaxRes - r) * 3
  @inline def digit(h: Long, r: Int): Int =
    ((h >>> digitOffset(r)) & 7L).toInt

  def checkRes(r: Int): Int =
    if (r < 0 || r > MaxRes)
      throw new IllegalArgumentException(
        s"The argument 'resolution' ($r) of H3 function is out of " +
          s"bounds because the maximum resolution in H3 library is 15" +
          " [ARGUMENT_OUT_OF_BOUND:69]")
    else r

  def isValid(h: Long): Boolean = {
    if (h < 0) return false // high bit must be 0
    if (((h >>> 59) & 0xF) != 1L) return false // mode must be CELL
    if (((h >>> 56) & 0x7) != 0L) return false // reserved bits
    val res = resolution(h)
    val bc = baseCell(h)
    if (bc >= 122) return false
    var foundNonZero = false
    var r = 1
    while (r <= res) {
      val d = digit(h, r)
      if (d > 6) return false
      if (!foundNonZero && d != 0) {
        // a pentagon's deleted K-axis subsequence: the first nonzero
        // digit under a pentagon base cell may not be 1
        if (d == 1 && PentagonSet(bc)) return false
        foundNonZero = true
      }
      r += 1
    }
    while (r <= MaxRes) { // digits beyond res must be 7 (unused)
      if (digit(h, r) != 7) return false
      r += 1
    }
    true
  }

  def isPentagon(h: Long): Boolean = {
    if (!PentagonSet(baseCell(h))) return false
    val res = resolution(h)
    var r = 1
    while (r <= res) { if (digit(h, r) != 0) return false; r += 1 }
    true
  }

  def isResClassIII(h: Long): Boolean = (resolution(h) & 1) == 1

  private def withRes(h: Long, r: Int): Long =
    (h & ~(0xFL << 52)) | (r.toLong << 52)
  private def withDigit(h: Long, r: Int, d: Int): Long = {
    val off = digitOffset(r)
    (h & ~(7L << off)) | (d.toLong << off)
  }

  def toParent(h: Long, parentRes0: Int): Long = {
    val parentRes = checkRes(parentRes0)
    val res = resolution(h)
    if (parentRes >= res) return h // CH: coarser-or-equal only shrinks
    var out = withRes(h, parentRes)
    var r = parentRes + 1
    while (r <= MaxRes) { out = withDigit(out, r, 7); r += 1 }
    out
  }

  def toChildren(h: Long, childRes0: Int): Array[Long] = {
    val childRes = checkRes(childRes0)
    val res = resolution(h)
    if (childRes < res) return Array.emptyLongArray
    if (childRes == res) return Array(h)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def rec(cur: Long, r: Int, onPentagonChain: Boolean): Unit = {
      if (r == childRes) { buf += cur; return }
      val next = withRes(cur, r + 1)
      var d = 0
      while (d <= 6) {
        // pentagons delete the K-axis (digit 1) child
        if (!(onPentagonChain && d == 1))
          rec(withDigit(next, r + 1, d), r + 1, onPentagonChain && d == 0)
        d += 1
      }
    }
    rec(h, res, isPentagon(h))
    buf.toArray
  }

  def toCenterChild(h: Long, childRes0: Int): Long = {
    val childRes = checkRes(childRes0)
    val res = resolution(h)
    if (childRes < res) return 0L // h3 lib: H3_NULL for coarser target
    var out = withRes(h, childRes)
    var r = res + 1
    while (r <= childRes) { out = withDigit(out, r, 0); r += 1 }
    out
  }

  def toHexString(h: Long): String = java.lang.Long.toHexString(h)

  /** sscanf("%llx") semantics: optional 0x/0X prefix, parse greedily,
    * ignore trailing junk (the reference accepts '0x…L' literals —
    * 02021_h3_is_pentagon). */
  def parseHex(s: String): Long = {
    var i = 0
    val n = s.length
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    if (i + 1 < n && s.charAt(i) == '0' &&
      (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) i += 2
    var v = 0L
    var any = false
    while (i < n && Character.digit(s.charAt(i), 16) >= 0) {
      v = (v << 4) | Character.digit(s.charAt(i), 16)
      any = true
      i += 1
    }
    if (!any) throw new IllegalArgumentException(
      s"Invalid H3 index string '$s' [ARGUMENT_OUT_OF_BOUND:69]")
    v
  }

  def numHexagons(res0: Int): Long = {
    val res = checkRes(res0)
    var p = 1L
    var i = 0
    while (i < res) { p *= 7; i += 1 }
    2L + 120L * p
  }

  /** All 122 res-0 cells: base cell b with every digit unused (7). */
  def res0Indexes(): Array[Long] = {
    val out = new Array[Long](122)
    var b = 0
    while (b < 122) {
      out(b) = (1L << 59) | (b.toLong << 45) | 0x1FFFFFFFFFFFL
      b += 1
    }
    out
  }

  /** The 12 pentagons of a resolution: pentagon base cell, digits
    * 1..res = 0, rest unused. */
  def pentagonIndexes(res0: Int): Array[Long] = {
    val res = checkRes(res0)
    PentagonBaseCells.map { bc =>
      var h = (1L << 59) | (res.toLong << 52) | (bc.toLong << 45)
      var r = res + 1
      var mask = 0L
      while (r <= MaxRes) { mask |= 7L << digitOffset(r); r += 1 }
      h | mask
    }
  }

  /** Haversine central angle in radians (H3 greatCircleDistanceRads;
    * args in DEGREES, lat first — ref h3PointDist.cpp). */
  def pointDistRads(lat1: Double, lon1: Double, lat2: Double,
      lon2: Double): Double = {
    val la1 = math.toRadians(lat1); val lo1 = math.toRadians(lon1)
    val la2 = math.toRadians(lat2); val lo2 = math.toRadians(lon2)
    val sinLat = math.sin((la2 - la1) / 2)
    val sinLng = math.sin((lo2 - lo1) / 2)
    val a = sinLat * sinLat +
      math.cos(la1) * math.cos(la2) * sinLng * sinLng
    2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }

  def edgeAngle(res0: Int): Double =
    math.toDegrees(EdgeLengthM(checkRes(res0)) / EarthRadiusM)
}

/** Generic scalar H3 expression: pulls Long/Int/Double operands per the
  * spec in `sig`, delegates to [[H3Core]]. Not on any 100 TB hot path —
  * CodegenFallback is fine here (same stance as GeoHashCh). */
case class H3FnExpr(name: String, children: Seq[Expression])
    extends Expression with CodegenFallback {
  import H3FnExpr._
  override def dataType: DataType = returnTypes(name)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = name
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def l(i: Int): Long = vs(i) match {
      case n: Number => n.longValue()
      case d: org.apache.spark.sql.types.Decimal => d.toLong
      case b: Boolean => if (b) 1L else 0L
      case o => o.toString.toLong
    }
    def i(idx: Int): Int = l(idx).toInt
    def d(idx: Int): Double = vs(idx) match {
      case n: Number => n.doubleValue()
      case o => o.toString.toDouble
    }
    name match {
      case "h3IsValid" => H3Core.isValid(l(0))
      case "h3GetResolution" => H3Core.resolution(l(0))
      case "h3GetBaseCell" => H3Core.baseCell(l(0))
      case "h3IsPentagon" => H3Core.isPentagon(l(0))
      case "h3IsResClassIII" => H3Core.isResClassIII(l(0))
      case "h3ToParent" => H3Core.toParent(l(0), i(1))
      case "h3ToCenterChild" => H3Core.toCenterChild(l(0), i(1))
      case "h3ToChildren" =>
        new GenericArrayData(H3Core.toChildren(l(0), i(1)))
      case "h3ToString" => UTF8String.fromString(H3Core.toHexString(l(0)))
      case "stringToH3" => H3Core.parseHex(vs(0).toString)
      case "h3NumHexagons" => H3Core.numHexagons(i(0))
      case "h3GetRes0Indexes" => new GenericArrayData(H3Core.res0Indexes())
      case "h3GetPentagonIndexes" =>
        new GenericArrayData(H3Core.pentagonIndexes(i(0)))
      case "h3EdgeAngle" => H3Core.edgeAngle(i(0))
      case "h3EdgeLengthM" => H3Core.EdgeLengthM(H3Core.checkRes(i(0)))
      case "h3EdgeLengthKm" => H3Core.EdgeLengthKm(H3Core.checkRes(i(0)))
      case "h3HexAreaM2" => H3Core.HexAreaM2(H3Core.checkRes(i(0)))
      case "h3HexAreaKm2" => H3Core.HexAreaKm2(H3Core.checkRes(i(0)))
      case "h3PointDistRads" =>
        H3Core.pointDistRads(d(0), d(1), d(2), d(3))
      case "h3PointDistM" =>
        H3Core.pointDistRads(d(0), d(1), d(2), d(3)) * H3Core.EarthRadiusM
      case "h3PointDistKm" =>
        H3Core.pointDistRads(d(0), d(1), d(2), d(3)) * H3Core.EarthRadiusKm
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): H3FnExpr = copy(children = cs)
}

object H3FnExpr {
  val returnTypes: Map[String, DataType] = Map(
    "h3IsValid" -> BooleanType,
    "h3GetResolution" -> IntegerType,
    "h3GetBaseCell" -> IntegerType,
    "h3IsPentagon" -> BooleanType,
    "h3IsResClassIII" -> BooleanType,
    "h3ToParent" -> LongType,
    "h3ToCenterChild" -> LongType,
    "h3ToChildren" -> ArrayType(LongType, containsNull = false),
    "h3ToString" -> StringType,
    "stringToH3" -> LongType,
    "h3NumHexagons" -> LongType,
    "h3GetRes0Indexes" -> ArrayType(LongType, containsNull = false),
    "h3GetPentagonIndexes" -> ArrayType(LongType, containsNull = false),
    "h3EdgeAngle" -> DoubleType,
    "h3EdgeLengthM" -> DoubleType,
    "h3EdgeLengthKm" -> DoubleType,
    "h3HexAreaM2" -> DoubleType,
    "h3HexAreaKm2" -> DoubleType,
    "h3PointDistRads" -> DoubleType,
    "h3PointDistM" -> DoubleType,
    "h3PointDistKm" -> DoubleType)
  val names: Seq[String] = returnTypes.keys.toSeq
}
