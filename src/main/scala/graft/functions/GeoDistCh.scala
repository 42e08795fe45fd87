package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Bit-matched port of the reference's fast geodesic distance (ref
  * src/Functions/greatCircleDistance.cpp): 1024-entry cos LUT, 512-entry
  * asin(sqrt) LUT with a Taylor branch under 0.122, latitude-interpolated
  * flat-model metric under 13° of longitude difference, float32
  * arithmetic throughout. The three methods share one kernel:
  * greatCircleAngle (degrees on the sphere), greatCircleDistance (sphere
  * meters), geoDistance (WGS84 ellipsoid meters). The tables are
  * deterministic math, not data, so results are reproducible to the
  * float ulp on any executor.
  */
object GeoDistCh {
  private val PiF = math.Pi.toFloat
  private val RadInDeg = (math.Pi / 180.0).toFloat
  private val RadInDegHalf = (math.Pi / 360.0).toFloat
  private val CosLutSize = 1024
  private val AsinSqrtLutSize = 512
  private val MetricLutSize = 1024
  private val EarthRadius = 6371007.180918475f
  private val EarthDiameter = 2 * EarthRadius

  private val cosLut: Array[Float] =
    Array.tabulate(CosLutSize + 1)(i =>
      math.cos(2 * math.Pi * i / CosLutSize).toFloat)
  private val asinSqrtLut: Array[Float] =
    Array.tabulate(AsinSqrtLutSize + 1)(i =>
      math.asin(math.sqrt(i.toDouble / AsinSqrtLutSize)).toFloat)
  private val sphereMetricLut = new Array[Float](MetricLutSize + 1)
  private val sphereMetricMetersLut = new Array[Float](MetricLutSize + 1)
  private val wgs84MetricMetersLut = new Array[Float](2 * (MetricLutSize + 1))
  locally {
    def sqr(v: Double): Double = v * v
    var i = 0
    while (i <= MetricLutSize) {
      val latitude = i * (math.Pi / MetricLutSize) - math.Pi * 0.5
      wgs84MetricMetersLut(i * 2) = sqr(111132.09 - 566.05 *
        math.cos(2 * latitude) + 1.20 * math.cos(4 * latitude)).toFloat
      wgs84MetricMetersLut(i * 2 + 1) = sqr(111415.13 * math.cos(latitude) -
        94.55 * math.cos(3 * latitude) + 0.12 * math.cos(5 * latitude)).toFloat
      sphereMetricMetersLut(i) =
        sqr((EarthDiameter * math.Pi / 360) * math.cos(latitude)).toFloat
      sphereMetricLut(i) = sqr(math.cos(latitude)).toFloat
      i += 1
    }
  }

  // C-cast float→size_t: negative/NaN/huge are implementation-defined;
  // long cast mirrors the x86 behavior the LUT indexing relies on
  private def idx(x: Float): Int = x.toLong.toInt

  private def degDiff(f0: Float): Float = {
    val f = math.abs(f0)
    if (f > 180) 360 - f else f
  }

  private def fastCos(x: Float): Float = {
    var y = math.abs(x) * (CosLutSize / PiF / 2.0f)
    var i = idx(y)
    y -= i
    i &= (CosLutSize - 1)
    cosLut(i) + (cosLut(i + 1) - cosLut(i)) * y
  }

  private def fastSin(x: Float): Float = {
    var y = math.abs(x) * (CosLutSize / PiF / 2.0f)
    var i = idx(y)
    y -= i
    i = (i - CosLutSize / 4) & (CosLutSize - 1)
    cosLut(i) + (cosLut(i + 1) - cosLut(i)) * y
  }

  private def fastAsinSqrt(x: Float): Float = {
    if (x < 0.122f) {
      val y = math.sqrt(x.toDouble).toFloat
      return y + x * y * 0.166666666666666f + x * x * y * 0.075f +
        x * x * x * y * 0.044642857142857f
    }
    if (x < 0.948f) {
      val x2 = x * AsinSqrtLutSize
      val i = idx(x2)
      return asinSqrtLut(i) + (asinSqrtLut(i + 1) - asinSqrtLut(i)) * (x2 - i)
    }
    math.asin(math.sqrt(x.toDouble)).toFloat
  }

  final val SphereDegrees = 0
  final val SphereMeters = 1
  final val Wgs84Meters = 2

  def distance(method: Int, lon1deg: Float, lat1deg: Float,
      lon2deg: Float, lat2deg: Float): Float = {
    val latDiff = degDiff(lat1deg - lat2deg)
    val lonDiff = degDiff(lon1deg - lon2deg)
    if (lonDiff < 13) {
      val latitudeMidpoint = (lat1deg + lat2deg + 180) * MetricLutSize / 360.0f
      val i = idx(latitudeMidpoint) & (MetricLutSize - 1)
      val frac = latitudeMidpoint - i
      var kLat = 0.0f
      var kLon = 0.0f
      method match {
        case SphereDegrees =>
          kLat = 1
          kLon = sphereMetricLut(i) +
            (sphereMetricLut(i + 1) - sphereMetricLut(i)) * frac
        case SphereMeters =>
          val s = EarthDiameter * PiF / 360.0f
          kLat = s * s
          kLon = sphereMetricMetersLut(i) +
            (sphereMetricMetersLut(i + 1) - sphereMetricMetersLut(i)) * frac
        case Wgs84Meters =>
          kLat = wgs84MetricMetersLut(i * 2) +
            (wgs84MetricMetersLut((i + 1) * 2) -
              wgs84MetricMetersLut(i * 2)) * frac
          kLon = wgs84MetricMetersLut(i * 2 + 1) +
            (wgs84MetricMetersLut((i + 1) * 2 + 1) -
              wgs84MetricMetersLut(i * 2 + 1)) * frac
      }
      math.sqrt((kLat * latDiff * latDiff +
        kLon * lonDiff * lonDiff).toDouble).toFloat
    } else {
      val s = fastSin(latDiff * RadInDegHalf)
      val s2 = fastSin(lonDiff * RadInDegHalf)
      val a = s * s + fastCos(lat1deg * RadInDeg) *
        fastCos(lat2deg * RadInDeg) * (s2 * s2)
      if (method == SphereDegrees) (360.0f / PiF) * fastAsinSqrt(a)
      else EarthDiameter * fastAsinSqrt(a)
    }
  }
}

/** Expression form: Float32 result like the reference (the golden text
  * rendering depends on float shortest-round-trip digits). */
case class GeoDistExpr(children: Seq[Expression], method: Int)
    extends Expression with CodegenFallback {
  override def dataType: DataType = FloatType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = method match {
    case GeoDistCh.SphereDegrees => "greatCircleAngle"
    case GeoDistCh.SphereMeters => "greatCircleDistance"
    case _ => "geoDistance"
  }
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def f(a: Any): Float = a match {
      case n: Number => n.floatValue()
      case other => other.toString.toFloat
    }
    GeoDistCh.distance(method, f(vs(0)), f(vs(1)), f(vs(2)), f(vs(3)))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GeoDistExpr = copy(children = cs)
}
