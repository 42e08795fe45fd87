package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small CH scalar functions with no Spark builtin twin: bitmask
  * decomposition, XML component coding, regex match counting, character
  * n-grams, time-delta parsing, error-code names, decimal overflow
  * introspection (ref src/Functions — file cited per expression). */

/** bitmaskToArray / bitmaskToList (ref src/Functions/FunctionsCoding.h
  * FunctionBitmaskToArray): decompose into powers of two, smallest
  * first; the sign bit of a signed type contributes its (negative)
  * two's-complement value, so Int8 -1 → [1,2,4,8,16,32,64,-128]. */
case class ChBitmask(child: Expression, widthBits: Int, signed: Boolean,
    asList: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (asList) StringType else ArrayType(child.dataType, containsNull = false)
  override def prettyName: String =
    if (asList) "bitmaskToList" else "bitmaskToArray"
  override def nullSafeEval(v: Any): Any = {
    val x = v match {
      case n: java.lang.Number => n.longValue
      case d: org.apache.spark.sql.types.Decimal => d.toLong
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < widthBits) {
      if (((x >>> i) & 1L) == 1L) {
        // the top bit of a width-limited signed value is its negative
        // two's-complement weight; widthBits 64 relies on Long wrap
        val weight =
          if (!signed) 1L << i
          else if (i == widthBits - 1 && widthBits < 64) -(1L << i)
          else if (i == 63) Long.MinValue
          else 1L << i
        parts += weight
      }
      i += 1
    }
    if (asList) UTF8String.fromString(parts.mkString(","))
    else {
      val arr = child.dataType match {
        case ByteType => parts.map(_.toByte).toArray[Any]
        case ShortType => parts.map(_.toShort).toArray[Any]
        case IntegerType => parts.map(_.toInt).toArray[Any]
        case _ => parts.toArray[Any]
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }
  override protected def withNewChildInternal(c: Expression): ChBitmask =
    copy(child = c)
}

/** encodeXMLComponent (ref src/Functions/encodeXMLComponent.cpp):
  * escape the five XML-special characters. */
case class ChEncodeXml(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "encodeXMLComponent"
  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val sb = new StringBuilder
    s.foreach {
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '&' => sb.append("&amp;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&apos;")
      case c => sb.append(c)
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): ChEncodeXml =
    copy(child = c)
}

/** decodeXMLComponent (ref src/Functions/decodeXMLComponent.cpp): decode
  * the five named entities plus numeric `&#NNN;` / `&#xHHH;` forms;
  * unrecognized entities are passed through verbatim. */
case class ChDecodeXml(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "decodeXMLComponent"
  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi < 0) "" else s.substring(i + 1, semi)
        val decoded: Option[String] = body match {
          case "lt" => Some("<")
          case "gt" => Some(">")
          case "amp" => Some("&")
          case "quot" => Some("\"")
          case "apos" => Some("'")
          case b if b.startsWith("#x") || b.startsWith("#X") =>
            try Some(new String(Character.toChars(
              Integer.parseInt(b.substring(2), 16))))
            catch { case _: Exception => None }
          case b if b.startsWith("#") =>
            try Some(new String(Character.toChars(b.substring(1).toInt)))
            catch { case _: Exception => None }
          case _ => None
        }
        decoded match {
          case Some(d) => sb.append(d); i = semi + 1
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): ChDecodeXml =
    copy(child = c)
}

/** countMatches[CaseInsensitive] (ref src/Functions/countMatches.h):
  * count non-overlapping matches; a zero-length match stops the scan
  * without counting (the reference bails when no bytes were consumed). */
case class ChCountMatches(left: Expression, right: Expression,
    caseInsensitive: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (caseInsensitive) "countMatchesCaseInsensitive" else "countMatches"
  override def nullSafeEval(h: Any, p: Any): Any = {
    val flags = if (caseInsensitive)
      java.util.regex.Pattern.CASE_INSENSITIVE |
        java.util.regex.Pattern.UNICODE_CASE
    else 0
    val m = java.util.regex.Pattern.compile(p.toString, flags)
      .matcher(h.toString)
    var count = 0L
    var pos = 0
    var done = false
    while (!done && m.find(pos)) {
      if (m.end == m.start) done = true // zero bytes consumed: stop
      else { count += 1; pos = m.end }
    }
    count
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ChCountMatches = copy(left = l, right = r)
}

/** ngrams(string, n) (ref src/Functions/FunctionsStringHash.cpp family /
  * src/Functions/ngrams.cpp): sliding codepoint n-grams as an array. */
case class ChNgrams(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams"
  override def nullSafeEval(sv: Any, nv: Any): Any = {
    val s = sv.toString
    val n = nv.asInstanceOf[Number].intValue
    val cps = s.codePoints.toArray
    val out =
      if (n <= 0 || cps.length < n) Array.empty[Any]
      else (0 to cps.length - n).map { i =>
        UTF8String.fromString(
          new String(cps, i, n)): Any
      }.toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ChNgrams = copy(left = l, right = r)
}

/** parseTimeDelta (ref src/Functions/parseTimeDelta.cpp): sum of
  * `<number><unit>` terms with loose separators; year = 365 d,
  * month = 30.5 d. */
case class ChParseTimeDelta(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "parseTimeDelta"
  private val units: Map[String, Double] = Map(
    "years" -> 31536000d, "year" -> 31536000d, "yr" -> 31536000d,
    "y" -> 31536000d,
    "months" -> 2635200d, "month" -> 2635200d, "mo" -> 2635200d,
    "weeks" -> 604800d, "week" -> 604800d, "w" -> 604800d,
    "days" -> 86400d, "day" -> 86400d, "d" -> 86400d,
    "hours" -> 3600d, "hour" -> 3600d, "hr" -> 3600d, "h" -> 3600d,
    "minutes" -> 60d, "minute" -> 60d, "min" -> 60d, "m" -> 60d,
    "seconds" -> 1d, "second" -> 1d, "sec" -> 1d, "s" -> 1d,
    "milliseconds" -> 1e-3, "millisecond" -> 1e-3, "millisec" -> 1e-3,
    "ms" -> 1e-3,
    "microseconds" -> 1e-6, "microsecond" -> 1e-6, "microsec" -> 1e-6,
    "μs" -> 1e-6, "us" -> 1e-6,
    "nanoseconds" -> 1e-9, "nanosecond" -> 1e-9, "nanosec" -> 1e-9,
    "ns" -> 1e-9)
  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    var i = 0
    var total = 0.0
    def isSep(c: Char): Boolean =
      c == ' ' || c == ';' || c == '-' || c == '+' || c == ',' ||
        c == ':' || c == '.'
    while (i < s.length) {
      while (i < s.length && isSep(s.charAt(i))) i += 1
      if (i < s.length) {
        val numStart = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.'))
          i += 1
        if (i == numStart)
          throw new IllegalArgumentException(
            s"parseTimeDelta: invalid expression '$s'")
        val num = s.substring(numStart, i).toDouble
        while (i < s.length && s.charAt(i) == ' ') i += 1
        val unitStart = i
        while (i < s.length && (s.charAt(i).isLetter ||
          s.charAt(i) == 'μ')) i += 1
        val unit = s.substring(unitStart, i).toLowerCase
        if (unit.isEmpty)
          throw new IllegalArgumentException(
            s"parseTimeDelta: missing unit in '$s'")
        total += num * units.getOrElse(unit,
          throw new IllegalArgumentException(
            s"parseTimeDelta: unknown unit '$unit'"))
      }
    }
    total
  }
  override protected def withNewChildInternal(c: Expression): ChParseTimeDelta =
    copy(child = c)
}

/** errorCodeToName (ref src/Functions/errorCodeToName.cpp over the
  * generated [[ChErrorCodes]] table): unknown codes → empty string. */
case class ChErrorCodeToName(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "errorCodeToName"
  override def nullSafeEval(v: Any): Any = {
    val code = v match {
      case n: java.lang.Number => n.intValue
      case d: org.apache.spark.sql.types.Decimal => d.toLong.toInt
    }
    UTF8String.fromString(ChErrorCodes.names.getOrElse(code, ""))
  }
  override protected def withNewChildInternal(c: Expression): ChErrorCodeToName =
    copy(child = c)
}

/** isDecimalOverflow(d[, precision]) (ref
  * src/Functions/isDecimalOverflow.cpp): true when the decimal's digit
  * count exceeds the given precision (default: its type's precision). */
case class ChIsDecimalOverflow(child: Expression, prec: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ByteType
  override def prettyName: String = "isDecimalOverflow"
  override def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[org.apache.spark.sql.types.Decimal]
    val digits = d.toJavaBigDecimal.unscaledValue.abs.toString.length
    (if (digits > prec) 1 else 0).toByte
  }
  override protected def withNewChildInternal(c: Expression): ChIsDecimalOverflow =
    copy(child = c)
}

/** murmurHash3_128 (16-byte FixedString result: h1 LE ++ h2 LE, the
  * layout of the reference's union; ref FunctionsHashing.h
  * MurmurHash3Impl128). */
case class ChMurmur128(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "murmurHash3_128"
  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
      case other => other.toString.getBytes("UTF-8")
    }
    val (h1, h2) = ChHash.murmurHash3_128(bytes)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = ((h1 >>> (8 * i)) & 0xff).toByte
      out(8 + i) = ((h2 >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): ChMurmur128 =
    copy(child = c)
}
