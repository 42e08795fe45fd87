package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH IP address types and coding functions (ref
  * src/Functions/FunctionsCodingIP.cpp, src/Common/formatIPv6.{h,cpp},
  * src/DataTypes/DataTypeIPv4andIPv6.h).
  *
  * CH's IPv4/IPv6 are genuine types: they RENDER as dotted-quad /
  * RFC-5952 text but COMPARE and hash as UInt32 / FixedString(16). The
  * Spark-native shape for that duality is a UserDefinedType — display
  * comes from the user-class `toString`, while every relational
  * operation (join, sort, group) runs on the underlying atomic type,
  * lowered by [[graft.plans.ChIpCoercionRule]] so comparisons stay
  * codegen'd and shuffle keys stay primitive at scale.
  */
@SQLUserDefinedType(udt = classOf[IPv4UDT])
case class ChIPv4(v: Long) {
  override def toString: String = ChIp.formatIPv4(v)
}

@SQLUserDefinedType(udt = classOf[IPv6UDT])
class ChIPv6(val bytes: Array[Byte]) {
  override def toString: String = ChIp.formatIPv6(bytes)
  override def equals(o: Any): Boolean = o match {
    case x: ChIPv6 => java.util.Arrays.equals(bytes, x.bytes)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(bytes)
}

/** IPv4 = UInt32; carried as Long so unsigned order is natural. */
class IPv4UDT extends UserDefinedType[ChIPv4] {
  override def sqlType: DataType = LongType
  override def serialize(obj: ChIPv4): Any = obj.v
  override def deserialize(datum: Any): ChIPv4 =
    ChIPv4(datum.asInstanceOf[Long])
  override def userClass: Class[ChIPv4] = classOf[ChIPv4]
  override def typeName: String = "ipv4"
}

/** IPv6 = FixedString(16); binary compare IS the unsigned byte order. */
class IPv6UDT extends UserDefinedType[ChIPv6] {
  override def sqlType: DataType = BinaryType
  override def serialize(obj: ChIPv6): Any = obj.bytes
  override def deserialize(datum: Any): ChIPv6 =
    new ChIPv6(datum.asInstanceOf[Array[Byte]])
  override def userClass: Class[ChIPv6] = classOf[ChIPv6]
  override def typeName: String = "ipv6"
}

object ChIp {
  val ipv4 = new IPv4UDT
  val ipv6 = new IPv6UDT

  def isIpType(dt: DataType): Boolean =
    dt.isInstanceOf[IPv4UDT] || dt.isInstanceOf[IPv6UDT]

  /** FixedString inputs carry NUL padding — CH's parsers see the string
    * up to the buffer's trailing zeros. */
  def trimNul(s: String): String = {
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '\u0000') end -= 1
    if (end == s.length) s else s.substring(0, end)
  }

  // ---- IPv4 text ----

  /** Strict whole-string dotted-quad parse (ref formatIPv6.h parseIPv4:
    * 1-3 decimal digits per octet, values <= 255, exactly 4 octets). */
  def parseIPv4(s: String): Option[Long] = {
    var i = 0; var octet = 0; var value = 0L; var digits = 0
    var acc = 0L
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        acc = acc * 10 + (c - '0'); digits += 1
        if (digits > 3 || acc > 255) return None
      } else if (c == '.') {
        if (digits == 0 || octet >= 3) return None
        value = (value << 8) | acc; acc = 0; digits = 0; octet += 1
      } else return None
      i += 1
    }
    if (digits == 0 || octet != 3) None
    else Some((value << 8) | acc)
  }

  def formatIPv4(v: Long): String =
    s"${(v >>> 24) & 0xff}.${(v >>> 16) & 0xff}.${(v >>> 8) & 0xff}.${v & 0xff}"

  // ---- IPv6 text ----

  /** Whole-string IPv6 parse (ref formatIPv6.h parseIPv6 state machine:
    * `::` once, 1-4 hex digits per group, embedded dotted IPv4 tail
    * whose first octet comes from the preceding group's digits). */
  def parseIPv6(s: String): Option[Array[Byte]] = {
    val dst = new Array[Byte](16)
    var groups = 0
    var iter = 0            // write offset into dst
    var zptr = -1           // offset where "::" zero-block starts
    var i = 0
    val n = s.length
    if (n == 0) return None
    var groupStart = true
    var done = false
    // leading "::"
    if (s.charAt(0) == ':') {
      if (n < 2 || s.charAt(1) != ':') return None
      zptr = 0; i = 2
    }
    while (!done && i < n && groups < 8) {
      val c = s.charAt(i)
      if (c == ':') {
        i += 1
        if (i >= n) return None // trailing colon
        groupStart = true
        if (s.charAt(i) == ':') {
          if (zptr >= 0) return None // second "::"
          zptr = iter; i += 1
        } else if (groups == 0) return None // leading single colon
      } else if (c == '.') {
        // embedded IPv4: previous group's hex digits are its 1st octet
        if ((groups <= 1 && zptr < 0) || groupStart) return None
        groups -= 1; iter -= 2
        var first = 0
        var k = 0
        while (k < 2) {
          val hi = (dst(iter + k) >> 4) & 0x0f
          val lo = dst(iter + k) & 0x0f
          if (hi > 9 || lo > 9) return None
          first = first * 100 + hi * 10 + lo
          k += 1
        }
        if (first > 255) return None
        // parse ".b.c.d" (3 more octets) — strict to end of string
        var acc = first.toLong
        var octet = 0
        var digits = 1 // first octet already known
        i += 1
        var v = 0L; var d = 0
        while (i < n) {
          val ch = s.charAt(i)
          if (ch >= '0' && ch <= '9') {
            v = v * 10 + (ch - '0'); d += 1
            if (d > 3 || v > 255) return None
          } else if (ch == '.') {
            if (d == 0 || octet >= 2) return None
            acc = (acc << 8) | v; v = 0; d = 0; octet += 1
          } else return None
          i += 1
        }
        if (d == 0 || octet != 2) return None
        acc = (acc << 8) | v
        dst(iter) = ((acc >>> 24) & 0xff).toByte
        dst(iter + 1) = ((acc >>> 16) & 0xff).toByte
        dst(iter + 2) = ((acc >>> 8) & 0xff).toByte
        dst(iter + 3) = (acc & 0xff).toByte
        iter += 4; groups += 2
        done = true
      } else {
        if (!groupStart) done = true
        else {
          groupStart = false
          var value = 0; var xdigits = 0
          var more = true
          while (more && i < n && xdigits < 4) {
            val d = Character.digit(s.charAt(i), 16)
            if (d < 0) more = false
            else { value = (value << 4) | d; xdigits += 1; i += 1 }
          }
          if (xdigits == 0) done = true
          else {
            dst(iter) = ((value >> 8) & 0xff).toByte
            dst(iter + 1) = (value & 0xff).toByte
            iter += 2; groups += 1
          }
        }
      }
    }
    if (i < n) return None // trailing junk (whole-string parse)
    if (groups < 8 && zptr < 0) return None
    if (zptr >= 0) {
      val msize = iter - zptr
      val tail = java.util.Arrays.copyOfRange(dst, zptr, iter)
      java.util.Arrays.fill(dst, zptr, 16, 0.toByte)
      System.arraycopy(tail, 0, dst, 16 - msize, msize)
    }
    Some(dst)
  }

  /** toIPv6/IPv6StringToNum accept dotted IPv4 text too, mapping it to
    * ::ffff:a.b.c.d (ref formatIPv6.h parseIPv6orIPv4). A 16-char value
    * that fails text parse is reinterpreted bytewise — CH casts
    * FixedString(16) to IPv6 by reinterpretation, and the type width is
    * the only signal that survives the String carrier. */
  def parseIPv6orIPv4(s0: String): Option[Array[Byte]] = {
    val s = trimNul(s0)
    val parsed =
      if (s.nonEmpty && !s.contains(':')) parseIPv4(s).map(ipv4MappedBytes)
      else parseIPv6(s)
    parsed.orElse {
      if (s0.length == 16) Some(s0.toCharArray.map(_.toByte)) else None
    }
  }

  def ipv4MappedBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    b(10) = 0xff.toByte; b(11) = 0xff.toByte
    b(12) = ((v >>> 24) & 0xff).toByte
    b(13) = ((v >>> 16) & 0xff).toByte
    b(14) = ((v >>> 8) & 0xff).toByte
    b(15) = (v & 0xff).toByte
    b
  }

  /** inet_ntop6 with CH's rules (ref formatIPv6.cpp): first-longest
    * zero run of >= 2 words compressed to `::`; embedded-IPv4 rendering
    * at word 6 when the run covers words 0-5, or 0-4 with word 5 =
    * 0xffff. `zeroedTail` supports cutIPv6. */
  def formatIPv6(src: Array[Byte], zeroedTail: Int = 0): String = {
    val words = new Array[Int](8)
    var i = 0
    while (i < 16 - zeroedTail) {
      words(i / 2) |= (src(i) & 0xff) << ((1 - (i % 2)) << 3)
      i += 1
    }
    var bestBase = -1; var bestLen = 0
    var curBase = -1; var curLen = 0
    i = 0
    while (i < 8) {
      if (words(i) == 0) {
        if (curBase == -1) { curBase = i; curLen = 1 } else curLen += 1
      } else if (curBase != -1) {
        if (bestBase == -1 || curLen > bestLen) { bestBase = curBase; bestLen = curLen }
        curBase = -1
      }
      i += 1
    }
    if (curBase != -1 && (bestBase == -1 || curLen > bestLen)) {
      bestBase = curBase; bestLen = curLen
    }
    if (bestBase != -1 && bestLen < 2) bestBase = -1
    val sb = new StringBuilder(45)
    i = 0
    var doneV4 = false
    while (i < 8 && !doneV4) {
      if (bestBase != -1 && i >= bestBase && i < bestBase + bestLen) {
        if (i == bestBase) sb.append(':')
      } else {
        if (i != 0) sb.append(':')
        if (i == 6 && bestBase == 0 &&
            (bestLen == 6 || (bestLen == 5 && words(5) == 0xffff))) {
          val v4 =
            ((src(12) & 0xffL) << 24) | ((src(13) & 0xffL) << 16) |
              ((src(14) & 0xffL) << 8) | (src(15) & 0xffL)
          // zeroed tail applies to the dotted rendering too (cutIPv6)
          val masked =
            if (zeroedTail >= 4) 0L
            else v4 & (0xffffffffL << (8 * zeroedTail)) & 0xffffffffL
          sb.append(formatIPv4(masked))
          doneV4 = true
        } else sb.append(java.lang.Integer.toHexString(words(i)))
      }
      i += 1
    }
    if (!doneV4 && bestBase != -1 && bestBase + bestLen == 8) sb.append(':')
    sb.toString
  }
}

/** Conversion modes shared by the to/from-text IP expressions: 0 = throw
  * on bad input (CH default), 1 = NULL (OrNull), 2 = type default
  * (OrDefault, also CAST with cast_ipv4_ipv6_default_on_conversion_error). */
object IpMode { val Throw = 0; val Null = 1; val Default = 2 }

/** toIPv4 family: String → IPv4 (ref FunctionsCodingIP.cpp toIPv4). */
case class ToIPv4(child: Expression, mode: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ChIp.ipv4
  override def nullable: Boolean = child.nullable || mode == IpMode.Null
  override def prettyName: String = "toIPv4"
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: IPv4UDT => v
    case _: NumericType => v match {
      case l: Long => l & 0xffffffffL
      case i: Int => i.toLong & 0xffffffffL
      case i: Short => i.toLong & 0xffffffffL
      case i: Byte => i.toLong & 0xffffffffL
      case d: Decimal => d.toLong & 0xffffffffL
      case other => other.toString.toDouble.toLong & 0xffffffffL
    }
    case _ => parseText(ChIp.trimNul(v.toString))
  }
  private def parseText(s: String): Any = {
    ChIp.parseIPv4(s) match {
      case Some(x) => x
      case None => mode match {
        case IpMode.Null => null
        case IpMode.Default => 0L
        case _ => throw new IllegalArgumentException(
          s"Cannot parse IPv4 from '$s' (CANNOT_PARSE_IPV4)")
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): ToIPv4 = copy(child = c)
}

/** toIPv6 family: String (v6 or dotted v4) / IPv4 → IPv6. */
case class ToIPv6(child: Expression, mode: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ChIp.ipv6
  override def nullable: Boolean = child.nullable || mode == IpMode.Null
  override def prettyName: String = "toIPv6"
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: IPv6UDT => v
    case _: IPv4UDT => ChIp.ipv4MappedBytes(v.asInstanceOf[Long])
    case BinaryType if v.asInstanceOf[Array[Byte]].length == 16 => v
    case _ =>
      val s = v.toString
      ChIp.parseIPv6orIPv4(s) match {
        case Some(b) => b
        case None => mode match {
          case IpMode.Null => null
          case IpMode.Default => new Array[Byte](16)
          case _ => throw new IllegalArgumentException(
            s"Cannot parse IPv6 from '$s' (CANNOT_PARSE_IPV6)")
        }
      }
  }
  override protected def withNewChildInternal(c: Expression): ToIPv6 = copy(child = c)
}

/** IPv6StringToNum family: String → FixedString(16) bytes. */
case class Ipv6StringToNum(child: Expression, mode: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable || mode == IpMode.Null
  override def prettyName: String = "IPv6StringToNum"
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: IPv6UDT => v
    case _ =>
      ChIp.parseIPv6orIPv4(v.toString) match {
        case Some(b) => b
        case None => mode match {
          case IpMode.Null => null
          case IpMode.Default => new Array[Byte](16)
          case _ => throw new IllegalArgumentException(
            s"Cannot parse IPv6 from '${v.toString}' (CANNOT_PARSE_IPV6)")
        }
      }
  }
  override protected def withNewChildInternal(c: Expression): Ipv6StringToNum = copy(child = c)
}

/** IPv6NumToString(FixedString(16) | IPv6) → display text. */
case class Ipv6NumToString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "IPv6NumToString"
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(ChIp.formatIPv6(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Ipv6NumToString = copy(child = c)
}

/** IPv4ToIPv6(IPv4 | UInt32) → ::ffff:a.b.c.d (ref FunctionsCodingIP). */
case class Ipv4ToIpv6(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ChIp.ipv6
  override def prettyName: String = "IPv4ToIPv6"
  override protected def nullSafeEval(v: Any): Any = {
    val n = v match {
      case l: Long => l
      case i: Int => i.toLong
      case d: org.apache.spark.sql.types.Decimal => d.toLong
      case other => other.toString.toLong
    }
    ChIp.ipv4MappedBytes(n)
  }
  override protected def withNewChildInternal(c: Expression): Ipv4ToIpv6 = copy(child = c)
}

/** cutIPv6(ipv6, bytesToCutForIPv6, bytesToCutForIPv4): zero the tail —
  * the v4 count applies when the address is IPv4-mapped (ref
  * FunctionsCodingIP.cpp FunctionCutIPv6). Returns display String like
  * the reference (its return type is String, not IPv6). */
case class CutIPv6(ip: Expression, cut6: Expression, cut4: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ip, cut6, cut4)
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "cutIPv6"
  override def eval(input: InternalRow): Any = {
    val v = ip.eval(input)
    val c6 = cut6.eval(input)
    val c4 = cut4.eval(input)
    if (v == null || c6 == null || c4 == null) return null
    val b = v.asInstanceOf[Array[Byte]]
    val mapped = b(10) == 0xff.toByte && b(11) == 0xff.toByte &&
      (0 until 10).forall(b(_) == 0)
    val cut = math.min(16,
      (if (mapped) c4 else c6).toString.toInt)
    UTF8String.fromString(ChIp.formatIPv6(b, cut))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CutIPv6 = CutIPv6(cs(0), cs(1), cs(2))
}

/** IPv6CIDRToRange(ipv6, prefix) → (lower, upper) as IPv6 values (ref
  * FunctionsCodingIP.cpp applyCIDRMask). */
case class Ipv6CidrToRange(ip: Expression, cidr: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ip, cidr)
  override def dataType: DataType = StructType(Seq(
    StructField("_1", ChIp.ipv6, nullable = false),
    StructField("_2", ChIp.ipv6, nullable = false)))
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "IPv6CIDRToRange"
  override def eval(input: InternalRow): Any = {
    val v = ip.eval(input); val c = cidr.eval(input)
    if (v == null || c == null) return null
    val b = v.asInstanceOf[Array[Byte]]
    val bits = math.min(128, c.toString.toInt)
    val lo = new Array[Byte](16); val hi = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val keep = math.max(0, math.min(8, bits - 8 * i))
      val mask = (0xff << (8 - keep)) & 0xff
      lo(i) = (b(i) & mask).toByte
      hi(i) = ((b(i) & mask) | (~mask & 0xff)).toByte
      i += 1
    }
    InternalRow(lo, hi)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Ipv6CidrToRange = Ipv6CidrToRange(cs(0), cs(1))
}

/** IPv4CIDRToRange(ipv4, prefix) → (lower, upper) IPv4 values. */
case class Ipv4CidrToRange(ip: Expression, cidr: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(ip, cidr)
  override def dataType: DataType = StructType(Seq(
    StructField("_1", ChIp.ipv4, nullable = false),
    StructField("_2", ChIp.ipv4, nullable = false)))
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "IPv4CIDRToRange"
  override def eval(input: InternalRow): Any = {
    val v = ip.eval(input); val c = cidr.eval(input)
    if (v == null || c == null) return null
    val n = v match {
      case l: Long => l
      case i: Int => i.toLong
      case other => other.toString.toLong
    }
    val bits = math.min(32, c.toString.toInt)
    val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
    InternalRow(n & mask, (n & mask) | (~mask & 0xffffffffL))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Ipv4CidrToRange = Ipv4CidrToRange(cs(0), cs(1))
}

/** isIPv4String / isIPv6String (ref FunctionsCodingIP.cpp). */
case class IsIpString(child: Expression, v6: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = if (v6) "isIPv6String" else "isIPv4String"
  override protected def nullSafeEval(v: Any): Any =
    if (v6) ChIp.parseIPv6(v.toString).isDefined
    else ChIp.parseIPv4(v.toString).isDefined
  override protected def withNewChildInternal(c: Expression): IsIpString = copy(child = c)
}

/** Lower an IP-typed expression to its underlying atomic value (Long /
  * 16-byte binary). Pure passthrough — the internal representation IS
  * the underlying value — so comparisons and shuffles lowered through
  * this stay codegen'd primitives. */
case class IpUnwrap(child: Expression) extends UnaryExpression {
  private def isDt64 = child.dataType.isInstanceOf[DateTime64UDT]
  override def dataType: DataType = child.dataType match {
    case _: DateTime64UDT => TimestampType // instant field of the carrier
    case u: UserDefinedType[_] => u.sqlType
    case dt => dt
  }
  override def prettyName: String = "ip_unwrap"
  override protected def nullSafeEval(v: Any): Any =
    if (isDt64) {
      val r = v.asInstanceOf[InternalRow]
      ChDT64.toMicros(r.getLong(0), r.getInt(1))
    } else v
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isDt64) defineCodeGen(ctx, ev, c =>
      s"graft.functions.ChDT64$$.MODULE$$.toMicros($c.getLong(0), $c.getInt(1))")
    else defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(c: Expression): IpUnwrap = copy(child = c)
}

/** Render an IP value as its display String (toString / CAST AS String). */
case class IpToString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "ip_to_string"
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: IPv4UDT => UTF8String.fromString(ChIp.formatIPv4(v.asInstanceOf[Long]))
    case _: IPv6UDT =>
      UTF8String.fromString(ChIp.formatIPv6(v.asInstanceOf[Array[Byte]]))
    case u: DateTime64UDT =>
      UTF8String.fromString(u.deserialize(v).toString)
    case _ => UTF8String.fromString(v.toString)
  }
  override protected def withNewChildInternal(c: Expression): IpToString = copy(child = c)
}
