package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** CH DateTime64(scale[, timezone]) (ref src/DataTypes/DataTypeDateTime64.h):
  * a Decimal64 tick count (units of 10^-scale seconds since epoch)
  * rendered with exactly `scale` fraction digits in the column's
  * timezone. The internal carrier is a struct (ticks, scale, tz) — the
  * full Decimal64 precision survives, and scale/tz ride in the value
  * because Spark's UDT encoder reconstructs UDTs via their no-arg
  * constructor (instance parameters would be lost at collect).
  * Relational contexts are lowered to a µs TimestampType by
  * ChIpCoercionRule (sub-µs digits participate in display, not
  * comparisons — the documented µs cap, SURVEY §1.2). */
class DateTime64UDT(val scale: Int, val tz: Option[String])
    extends UserDefinedType[ChDT64] {
  def this() = this(3, None)
  override def sqlType: DataType = StructType(Seq(
    StructField("ticks", LongType, nullable = false),
    StructField("scale", IntegerType, nullable = false),
    StructField("tz", StringType, nullable = true)))
  override def serialize(obj: ChDT64): Any =
    ChDT64.pack(obj.ticks, obj.scale, obj.tz)
  override def deserialize(datum: Any): ChDT64 = {
    val r = datum.asInstanceOf[InternalRow]
    ChDT64(r.getLong(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(r.getUTF8String(2).toString))
  }
  override def userClass: Class[ChDT64] = classOf[ChDT64]
  override def typeName: String =
    s"datetime64($scale${tz.map(", " + _).getOrElse("")})"
  override def equals(o: Any): Boolean = o.isInstanceOf[DateTime64UDT]
  override def hashCode: Int = classOf[DateTime64UDT].hashCode
}

/** One DateTime64 value: `ticks` of 10^-scale seconds since epoch. */
case class ChDT64(ticks: Long, scale: Int, tz: Option[String]) {
  override def toString: String = ChDT64.render(ticks, scale, tz)
}

object ChDT64 {
  def pow10(n: Int): Long = { var r = 1L; var i = 0; while (i < n) { r *= 10; i += 1 }; r }

  /** Internal (Catalyst) form of a DateTime64 value. */
  def pack(ticks: Long, scale: Int, tz: Option[String]): InternalRow =
    InternalRow(ticks, scale,
      tz.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull)

  def toMicros(ticks: Long, scale: Int): Long =
    if (scale == 6) ticks
    else if (scale < 6) Math.multiplyExact(ticks, pow10(6 - scale))
    else Math.floorDiv(ticks, pow10(scale - 6))

  def fromMicros(micros: Long, scale: Int): Long =
    if (scale == 6) micros
    else if (scale < 6) Math.floorDiv(micros, pow10(6 - scale))
    else Math.multiplyExact(micros, pow10(scale - 6))

  def render(ticks: Long, scale: Int, tz: Option[String]): String = {
    val unit = pow10(scale)
    val secs = Math.floorDiv(ticks, unit)
    val frac = Math.floorMod(ticks, unit)
    val zone = java.time.ZoneId.of(tz.getOrElse("UTC"))
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(secs), zone)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
      f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
      f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (scale == 0) base
    else base + "." + ("%0" + scale + "d").format(frac)
  }

  /** Parse CH DateTime64 text `YYYY-MM-DD[ HH:MM:SS[.fraction]]` as
    * wall-clock in `tz`; fraction digits truncate/zero-pad to scale
    * (ref src/IO/readDecimalText.h readDateTime64Text). */
  def parse(s0: String, scale: Int, tz: Option[String]): Option[Long] = {
    val s = ChIp.trimNul(s0).trim
    val re = ("^(\\d{4})-(\\d{2})-(\\d{2})" +
      "(?:[ T](\\d{1,2}):(\\d{2})(?::(\\d{2})(?:\\.(\\d+))?)?)?$").r
    s match {
      case re(y, mo, d, h, mi, se, fr) =>
        try {
          val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
            Option(h).map(_.toInt).getOrElse(0),
            Option(mi).map(_.toInt).getOrElse(0),
            Option(se).map(_.toInt).getOrElse(0))
          val zone = java.time.ZoneId.of(tz.getOrElse("UTC"))
          val secs = ldt.atZone(zone).toInstant.getEpochSecond
          val fracTicks = Option(fr).map { f =>
            val fs = if (f.length >= scale) f.substring(0, scale)
              else f + "0" * (scale - f.length)
            if (fs.isEmpty) 0L else fs.toLong
          }.getOrElse(0L)
          Some(Math.addExact(Math.multiplyExact(secs, pow10(scale)), fracTicks))
        } catch { case _: Exception => None }
      case _ => None
    }
  }
}

/** toDateTime64(x, scale[, tz]) (ref FunctionsConversion.h). Accepts
  * String (parsed in tz), DateTime/Date, DateTime64 (rescaled), numeric
  * (epoch seconds with fractional part). */
case class ToDateTime64(child: Expression, scale: Int, tz0: Option[String],
    mode: Int = IpMode.Throw)
    extends UnaryExpression with CodegenFallback {
  // no explicit zone: a zoned input keeps its zone through the rescale
  // (ref FunctionsConversion.h: DateTime64 conversions inherit the
  // source column's timezone when none is given)
  def tz: Option[String] = tz0.orElse(child.dataType match {
    case d: DateTime64UDT => d.tz
    case _ => None
  })
  override def dataType: DataType = new DateTime64UDT(scale, tz)
  override def nullable: Boolean = child.nullable || mode == IpMode.Null
  override def prettyName: String = "toDateTime64"
  override protected def nullSafeEval(v: Any): Any = {
    val unit = ChDT64.pow10(scale)
    val ticks: Option[Long] = child.dataType match {
      case TimestampType =>
        Some(ChDT64.fromMicros(v.asInstanceOf[Long], scale))
      case _: DateTime64UDT =>
        // rescale in tick space — no µs round trip, digits survive
        val r = v.asInstanceOf[InternalRow]
        val (t0, s0) = (r.getLong(0), r.getInt(1))
        Some(
          if (scale == s0) t0
          else if (scale > s0) Math.multiplyExact(t0, ChDT64.pow10(scale - s0))
          else Math.floorDiv(t0, ChDT64.pow10(s0 - scale)))
      case DateType =>
        val d = java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        val zone = java.time.ZoneId.of(tz.getOrElse("UTC"))
        Some(d.atStartOfDay(zone).toInstant.getEpochSecond * unit)
      case _: NumericType =>
        val x: Double = v match {
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case s: Short => s.toDouble
          case b: Byte => b.toDouble
          case d: java.lang.Double => d.doubleValue
          case f: java.lang.Float => f.toDouble
          case d: Decimal => d.toDouble
          case other => other.toString.toDouble
        }
        // epoch seconds; below the type minimum clamps to 1900-01-01,
        // past the Decimal64 tick capacity throws (ref DECIMAL_OVERFLOW,
        // 01734_datetime64_from_float)
        // the minimum is the 1900-01-01 00:00:00 UTC instant — a zoned
        // column renders it at its 1900 offset (01691_DateTime64_clamp)
        val minSecs = -2208988800L
        if (x < minSecs) Some(minSecs * unit)
        else if (x > Long.MaxValue.toDouble / unit)
          throw new ArithmeticException(
            s"DateTime64($scale) overflow for value $x (DECIMAL_OVERFLOW)")
        else Some((x * unit).toLong)
      case _ => ChDT64.parse(v.toString, scale, tz)
    }
    ticks match {
      case Some(t0) =>
        // range maximum is the WALL time 2299-12-31 23:59:59 in the
        // column's zone: larger instants clamp to it (scale 9 can't
        // reach it — tick capacity throws first)
        val maxSecs = java.time.LocalDateTime.of(2299, 12, 31, 23, 59, 59)
          .atZone(java.time.ZoneId.of(tz.getOrElse("UTC")))
          .toInstant.getEpochSecond
        val t = if (Math.floorDiv(t0, unit) > maxSecs) maxSecs * unit else t0
        ChDT64.pack(t, scale, tz)
      case None => mode match {
        case IpMode.Null => null
        case IpMode.Default => ChDT64.pack(0L, scale, tz)
        case _ => throw new IllegalArgumentException(
          s"Cannot parse DateTime64 from '${v.toString}'")
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): ToDateTime64 =
    copy(child = c)
}

/** parseDateTime64BestEffort family (ref parseDateTimeBestEffort.cpp +
  * the DateTime64 tier): best-effort parse carried into the tick type. */
case class Dt64BestEffort(child: Expression, scale: Int, tz: Option[String],
    mode: Int, us: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = new DateTime64UDT(scale, tz)
  override def nullable: Boolean = child.nullable || mode == IpMode.Null
  override def prettyName: String = "parseDateTime64BestEffort"
  override protected def nullSafeEval(v: Any): Any = {
    // anchored inputs (Z / ±hh:mm / unix ts) are true instants and the
    // tz only affects display; wall-clock inputs are interpreted IN tz
    // (BestEffort's micros are wall-time-as-UTC for those)
    val parsed = BestEffort.parseMicrosAnchored(v.toString, us)
      .map { case (m, anchored) =>
        tz match {
          case Some(z) if !anchored =>
            val secs = Math.floorDiv(m, 1000000L)
            val frac = Math.floorMod(m, 1000000L)
            val ldt = java.time.LocalDateTime.ofInstant(
              java.time.Instant.ofEpochSecond(secs), java.time.ZoneOffset.UTC)
            ldt.atZone(java.time.ZoneId.of(z)).toInstant
              .getEpochSecond * 1000000L + frac
          case _ => m
        }
      }
    parsed match {
      case Some(m) => ChDT64.pack(ChDT64.fromMicros(m, scale), scale, tz)
      case None => mode match {
        case IpMode.Null => null
        case IpMode.Default => ChDT64.pack(0L, scale, tz)
        case _ => throw new IllegalArgumentException(
          s"Cannot parse DateTime64 from '${v.toString}'")
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): Dt64BestEffort =
    copy(child = c)
}

/** makeDateTime64(y, M, d, h, m, s[, frac[, scale[, tz]]]) (ref
  * src/Functions/makeDate.cpp FunctionMakeDateTime64; default scale 3):
  * invalid dates clamp to the type minimum 1900-01-01 00:00:00, time
  * components roll over arithmetically, and the fraction saturates at
  * 10^scale - 1. */
case class MakeDateTime64(children: Seq[Expression])
    extends Expression with CodegenFallback {
  private val scale: Int = children.lift(7) match {
    case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _)) =>
      v.intValue
    case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Decimal, _)) =>
      v.toDouble.toInt
    case _ => 3
  }
  private val tz: Option[String] = children.lift(8) match {
    case Some(org.apache.spark.sql.catalyst.expressions.Literal(s, _)) if s != null =>
      Some(s.toString)
    case _ => None
  }
  override def dataType: DataType = new DateTime64UDT(scale, tz)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "makeDateTime64"
  override def eval(input: InternalRow): Any = {
    val vs = children.take(7).map(_.eval(input))
    if (vs.exists(_ == null)) return null
    def n(i: Int): Long = vs(i) match {
      case x: Number => x.longValue
      case other => other.toString.toDouble.toLong
    }
    val unit = ChDT64.pow10(scale)
    val zone = java.time.ZoneId.of(tz.getOrElse("UTC"))
    // component domain: month 1-12, day 1-31, time 0-255, all finite —
    // else the type minimum 1900-01-01. Within the domain, a day past
    // the month's length ROLLS into the next month (Feb 30 → Mar 1),
    // as does an oversized hour/minute/second (ref makeDate.cpp).
    val anyBad = vs.exists {
      case d: java.lang.Double => d.isNaN || d.isInfinite
      case f: java.lang.Float => f.isNaN || f.isInfinite
      case _ => false
    }
    val secs =
      if (anyBad || n(1) < 1 || n(1) > 12 || n(2) < 1 || n(2) > 31 ||
          n(3) < 0 || n(3) > 255 || n(4) < 0 || n(4) > 255 ||
          n(5) < 0 || n(5) > 255) Long.MinValue
      else try {
        val d = java.time.LocalDate.of(n(0).toInt, n(1).toInt, 1)
          .plusDays(n(2) - 1)
        d.atStartOfDay(zone).toInstant.getEpochSecond +
          n(3) * 3600L + n(4) * 60L + n(5)
      } catch { case _: java.time.DateTimeException => Long.MinValue }
    val minSecs = -2208988800L // 1900-01-01 00:00:00 UTC
    if (secs < minSecs) return ChDT64.pack(minSecs * unit, scale, tz)
    // range maximum: 2299-12-31 23:59:59 with the fraction saturated
    val maxSecs = java.time.LocalDateTime.of(2299, 12, 31, 23, 59, 59)
      .atZone(zone).toInstant.getEpochSecond
    if (secs > maxSecs)
      return ChDT64.pack(maxSecs * unit + (unit - 1), scale, tz)
    val frac = if (vs.length > 6) math.min(math.max(n(6), 0L), unit - 1) else 0L
    // Decimal64 tick overflow throws, like the reference (DECIMAL_OVERFLOW)
    ChDT64.pack(Math.addExact(Math.multiplyExact(secs, unit), frac), scale, tz)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MakeDateTime64 = copy(children = cs)
}

/** makeDate / makeDate32 (ref src/Functions/makeDate.cpp FunctionMakeDate
  * with DateTraits / Date32Traits): args cast through Float32; out-of-
  * domain components yield the epoch default; in-domain day counts roll
  * through month ends the way the reference's date LUT index does. */
case class MakeChDate(children: Seq[Expression], wide: Boolean)
    extends Expression with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = if (wide) "makeDate32" else "makeDate"
  private val minYear = if (wide) 1900 else 1970
  private val maxYear = if (wide) 2299 else 2149
  private val maxPacked =
    if (wide) 2299L * 512 + 12 * 32 + 31 else 2149L * 512 + 6 * 32 + 6
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    // the reference converts every argument through Float32 first
    val fs = vs.map {
      case n: java.lang.Number => n.floatValue
      case d: org.apache.spark.sql.types.Decimal => d.toFloat
      case b: java.lang.Boolean => if (b) 1f else 0f
      case other => throw new IllegalArgumentException(
        s"$prettyName: argument must be a number, got $other")
    }
    val bad = fs.exists(f => f.isNaN || f.isInfinite)
    val y = fs(0).toLong; val m = fs(1).toLong; val d = fs(2).toLong
    if (bad || y < minYear || y > maxYear || m < 1 || m > 12 ||
      d < 1 || d > 31 || y * 512 + m * 32 + d > maxPacked) return 0
    java.time.LocalDate.of(y.toInt, m.toInt, 1).plusDays(d - 1)
      .toEpochDay.toInt
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MakeChDate = copy(children = cs)
}

/** makeDateTime (ref src/Functions/makeDate.cpp FunctionMakeDateTime):
  * hour/minute/second accepted up to 99 and rolled arithmetically, the
  * result saturating to the DateTime (UInt32) range; a timezone argument
  * tags the result so it renders in that zone's wall clock. */
case class MakeChDateTime(children: Seq[Expression])
    extends Expression with CodegenFallback {
  private val tz: Option[String] = children.lift(6) match {
    case Some(org.apache.spark.sql.catalyst.expressions.Literal(s, _))
        if s != null => Some(s.toString)
    case _ => None
  }
  override def dataType: DataType =
    if (tz.isEmpty) TimestampType else new DateTime64UDT(0, tz)
  override def nullable: Boolean = children.take(6).exists(_.nullable)
  override def prettyName: String = "makeDateTime"
  override def eval(input: InternalRow): Any = {
    val vs = children.take(6).map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val fs = vs.map {
      case n: java.lang.Number => n.floatValue
      case d: org.apache.spark.sql.types.Decimal => d.toFloat
      case b: java.lang.Boolean => if (b) 1f else 0f
      case other => throw new IllegalArgumentException(
        s"makeDateTime: argument must be a number, got $other")
    }
    val zone = java.time.ZoneId.of(tz.getOrElse("UTC"))
    val bad = fs.exists(f => f.isNaN || f.isInfinite)
    val y = fs(0).toLong; val mo = fs(1).toLong; val d = fs(2).toLong
    val h = fs(3).toLong; val mi = fs(4).toLong; val s = fs(5).toLong
    val secs: Long =
      if (bad || y < 1900 || mo < 1 || mo > 12 || d < 1 || d > 31 ||
        h < 0 || h > 99 || mi < 0 || mi > 99 || s < 0 || s > 99) -1L
      else if (y > 2299) 0xffffffffL
      else {
        val day = java.time.LocalDate.of(y.toInt, mo.toInt, 1)
          .plusDays(d - 1)
        val base = day.atStartOfDay(zone).toInstant.getEpochSecond
        val t = base + h * 3600 + mi * 60 + s
        if (t < 0) 0L else if (t > 0xffffffffL) 0xffffffffL else t
      }
    val clamped = if (secs < 0) 0L else secs
    if (tz.isEmpty) clamped * 1000000L
    else ChDT64.pack(clamped, 0, tz)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MakeChDateTime = copy(children = cs)
}

/** DateTime64 → Int64: the WHOLE seconds part, truncated toward zero
  * (ref DataTypeDateTime64 → Int64 via DecimalUtils::getWholePart), where
  * Spark's timestamp→long cast floors. */
case class Dt64ToInt64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "toInt64"
  override protected def nullSafeEval(v: Any): Any = {
    val r = v.asInstanceOf[InternalRow]
    val ticks = r.getLong(0)
    val unit = ChDT64.pow10(r.getInt(1))
    ticks / unit // Java integer division truncates toward zero
  }
  override protected def withNewChildInternal(c: Expression): Dt64ToInt64 =
    copy(child = c)
}
