package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH reinterpret / reinterpretAs* (ref src/Functions/reinterpretAs.cpp):
  * the raw little-endian bytes of the source value re-read as the target
  * type. Integers contribute their CH-width LE bytes (srcWidth carries
  * the CH literal width when the Spark type is wider), strings their
  * bytes; an integer target zero-pads/truncates to its width, a String
  * target trims trailing NUL bytes, FixedString(N) keeps exactly N.
  */
case class ChReinterpret(child: Expression, target: String, srcWidth: Int)
    extends UnaryExpression with CodegenFallback {

  private val t = {
    val raw = target.trim
    // DateTime('Asia/...') → DateTime (rendered in the UTC session)
    if (raw.startsWith("DateTime")) "DateTime" else raw
  }
  private val fixedLen: Int =
    if (t.startsWith("FixedString("))
      t.stripPrefix("FixedString(").stripSuffix(")").trim.toInt
    else -1

  override def dataType: DataType = t match {
    case "String" => StringType
    case _ if fixedLen > 0 => StringType
    case "UInt8" | "Int8" | "UInt16" | "Int16" | "Int32" => IntegerType
    case "UInt32" | "Int64" => LongType
    case "UInt64" => DecimalType(20, 0)
    case "Int128" | "UInt128" | "Int256" | "UInt256" => DecimalType(38, 0)
    case "Float32" => FloatType
    case "Float64" => DoubleType
    case "Date" => DateType
    case "DateTime" => TimestampType
    case other => throw new UnsupportedOperationException(
      s"reinterpret target $other")
  }
  override def nullable: Boolean = true

  private def leBytesOf(v: Long, width: Int): Array[Byte] = {
    val b = new Array[Byte](width)
    var i = 0
    while (i < width) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  private def srcBytes(input: Any): Array[Byte] = child.dataType match {
    case ByteType => leBytesOf(input.asInstanceOf[Byte].toLong,
      if (srcWidth > 0) srcWidth else 1)
    case ShortType => leBytesOf(input.asInstanceOf[Short].toLong,
      if (srcWidth > 0) srcWidth else 2)
    case IntegerType => leBytesOf(input.asInstanceOf[Int].toLong,
      if (srcWidth > 0) srcWidth else 4)
    case LongType => leBytesOf(input.asInstanceOf[Long],
      if (srcWidth > 0) srcWidth else 8)
    case FloatType => leBytesOf(java.lang.Float.floatToIntBits(
      input.asInstanceOf[Float]).toLong & 0xffffffffL, 4)
    case DoubleType => leBytesOf(java.lang.Double.doubleToLongBits(
      input.asInstanceOf[Double]), 8)
    case DateType => leBytesOf(input.asInstanceOf[Int].toLong, 2)
    case TimestampType => leBytesOf(
      Math.floorDiv(input.asInstanceOf[Long], 1000000L), 4)
    case d: DecimalType if d.scale == 0 =>
      leBytesOf(input.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toBigDecimal.toBigInt.longValue, 8)
    case StringType =>
      input.asInstanceOf[UTF8String].getBytes
    case BinaryType => input.asInstanceOf[Array[Byte]]
    case d: DecimalType =>
      // unscaled LE bytes at the CH storage width (Decimal(20,0) is this
      // engine's UInt64 carrier → 8 bytes)
      val width =
        if (d == DecimalType(20, 0)) 8
        else if (d.precision <= 9) 4 else if (d.precision <= 18) 8 else 16
      val unscaled =
        input.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue
      val out = new Array[Byte](width)
      val src = unscaled.toByteArray
      val neg = unscaled.signum < 0
      java.util.Arrays.fill(out, if (neg) (-1).toByte else 0.toByte)
      var i = 0
      while (i < src.length && i < width) {
        out(i) = src(src.length - 1 - i)
        i += 1
      }
      out
    case other => throw new UnsupportedOperationException(
      s"reinterpret source $other")
  }

  private def leLong(b: Array[Byte], width: Int): Long = {
    var v = 0L
    var i = 0
    while (i < width && i < b.length) {
      v |= (b(i) & 0xffL) << (8 * i)
      i += 1
    }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val b = srcBytes(input)
    t match {
      case "String" =>
        var n = b.length
        while (n > 0 && b(n - 1) == 0) n -= 1
        UTF8String.fromBytes(java.util.Arrays.copyOf(b, n))
      case _ if fixedLen > 0 =>
        UTF8String.fromBytes(java.util.Arrays.copyOf(b, fixedLen))
      case "UInt8" => java.lang.Integer.valueOf((leLong(b, 1) & 0xffL).toInt)
      case "Int8" => java.lang.Integer.valueOf(leLong(b, 1).toByte.toInt)
      case "UInt16" =>
        java.lang.Integer.valueOf((leLong(b, 2) & 0xffffL).toInt)
      case "Int16" => java.lang.Integer.valueOf(leLong(b, 2).toShort.toInt)
      case "Int32" => java.lang.Integer.valueOf(leLong(b, 4).toInt)
      case "UInt32" => java.lang.Long.valueOf(leLong(b, 4) & 0xffffffffL)
      case "Int64" => java.lang.Long.valueOf(leLong(b, 8))
      case "UInt64" => ChHash.toUnsignedDecimal(leLong(b, 8))
      case "Int128" | "UInt128" | "Int256" | "UInt256" =>
        // full-width little-endian read: zero-extended for UInt targets,
        // two's-complement sign-extended for Int. The Decimal(38,0)
        // carrier holds < 10^38; values beyond it return NULL rather
        // than a silently truncated number.
        val width = if (t.endsWith("128")) 16 else 32
        val n = math.min(width, b.length)
        val be = new Array[Byte](n)
        var i = 0
        while (i < n) { be(i) = b(n - 1 - i); i += 1 }
        val big =
          if (n == 0) java.math.BigInteger.ZERO
          else if (t.startsWith("U")) new java.math.BigInteger(1, be)
          else new java.math.BigInteger(be)
        val dec = new java.math.BigDecimal(big)
        if (dec.precision > 38) null else Decimal(dec, 38, 0)
      case "Float32" => java.lang.Float.valueOf(
        java.lang.Float.intBitsToFloat(leLong(b, 4).toInt))
      case "Float64" => java.lang.Double.valueOf(
        java.lang.Double.longBitsToDouble(leLong(b, 8)))
      case "Date" => java.lang.Integer.valueOf((leLong(b, 2) & 0xffffL).toInt)
      case "DateTime" =>
        java.lang.Long.valueOf((leLong(b, 4) & 0xffffffffL) * 1000000L)
    }
  }

  override protected def withNewChildInternal(c: Expression): ChReinterpret =
    copy(child = c)
  override def prettyName: String = s"reinterpretAs$t"
}
