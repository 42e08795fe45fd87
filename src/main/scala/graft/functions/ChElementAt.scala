package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** CH toDate accepts days-since-epoch numbers, strings, and timestamps
  * (ref FunctionsConversion.h) — the numeric form has no ANSI Spark cast,
  * so the dispatch is type-directed here. */
case class ChToDate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | _: DecimalType =>
      input.asInstanceOf[java.lang.Number].intValue() // epoch days
    case StringType =>
      // CH readDateText accepts ANY single non-digit separator
      // (YYYY*M*D; ref src/IO/ReadHelpers.h readDateTextImpl)
      val s = input.asInstanceOf[UTF8String].toString
      "^(\\d{4})\\D(\\d{1,2})\\D(\\d{1,2})".r.findFirstMatchIn(s) match {
        case Some(m) =>
          try Integer.valueOf(java.time.LocalDate.of(m.group(1).toInt,
            m.group(2).toInt, m.group(3).toInt).toEpochDay.toInt)
          catch { case _: Exception => null }
        case _ =>
          try org.apache.spark.sql.catalyst.util.DateTimeUtils
            .stringToDate(input.asInstanceOf[UTF8String])
            .map(Integer.valueOf).orNull
          catch { case _: Exception => null }
      }
    case TimestampType | TimestampNTZType =>
      Math.floorDiv(input.asInstanceOf[java.lang.Long], 86400000000L).toInt
    case u: DateTime64UDT =>
      // the value's own timezone governs its calendar day
      val v = u.deserialize(input)
      val secs = Math.floorDiv(v.ticks, ChDT64.pow10(v.scale))
      java.time.Instant.ofEpochSecond(secs)
        .atZone(java.time.ZoneId.of(v.tz.getOrElse("UTC")))
        .toLocalDate.toEpochDay.toInt
    case _ => input
  }
  override protected def withNewChildInternal(c: Expression): ChToDate =
    copy(child = c)
  override def prettyName: String = "toDate"
}

/** CH subscript semantics for `arr[i]` / `map[k]` (ref
  * src/Functions/array/arrayElement.cpp): 1-based, negative indexes count
  * from the end, and an out-of-range index / missing map key yields the
  * ELEMENT TYPE'S DEFAULT VALUE (0, '', empty array, tuple of defaults)
  * rather than NULL or an error — unless the element type is Nullable
  * (array containsNull / map valueContainsNull), which defaults to NULL.
  * Spark's `element_at` throws under ANSI and `get` is NULL-on-miss and
  * 0-based, so CH's contract needs its own expression.
  */
case class ChElementAt(left: Expression, right: Expression,
    forceDefault: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(_, _) => right.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"array subscript must be integral, got $other")
    }
    case MapType(_, _, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subscript needs an array or map, got $other")
  }

  override def dataType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case MapType(_, vt, _) => vt
  }

  private def elementNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case MapType(_, _, n) => n
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elementNullable

  /** CH default value of a type (ref src/DataTypes/IDataType.h
    * getDefault): numeric zero, empty string, epoch date, zero
    * timestamp, empty array/map, tuple of member defaults. */
  def defaultOf(dt: DataType): Any = dt match {
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType | DateType => 0
    case LongType | TimestampType | TimestampNTZType => 0L
    case FloatType => 0f
    case DoubleType => 0d
    case BooleanType => false
    case StringType => UTF8String.EMPTY_UTF8
    case BinaryType => Array.empty[Byte]
    case d: DecimalType => Decimal(java.math.BigDecimal.ZERO, d.precision, d.scale)
    case ArrayType(_, _) => new GenericArrayData(Array.empty[Any])
    case MapType(_, _, _) =>
      ArrayBasedMapData(Array.empty[Any], Array.empty[Any])
    case s: StructType =>
      InternalRow.fromSeq(s.fields.map(f =>
        if (f.nullable) null else defaultOf(f.dataType)).toSeq)
    case CalendarIntervalType => new CalendarInterval(0, 0, 0L)
    case _ => null
  }

  // forceDefault: the column's DECLARED CH type has a non-Nullable
  // element, so an out-of-range subscript yields the type default even
  // though Spark's schema says containsNull (ref FunctionArrayElement)
  private def miss: Any =
    if (elementNullable && !forceDefault) null else defaultOf(dataType)

  override def nullSafeEval(container: Any, key: Any): Any =
    left.dataType match {
      case ArrayType(et, _) =>
        val arr = container.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val i0 = key match {
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l: Long => l
        }
        val idx = if (i0 < 0) n + i0 else i0 - 1 // 1-based; negatives from end
        if (idx < 0 || idx >= n) miss
        else if (arr.isNullAt(idx.toInt)) null
        else arr.get(idx.toInt, et)
      case MapType(kt, vt, _) =>
        val map = container.asInstanceOf[MapData]
        val keys = map.keyArray()
        val vals = map.valueArray()
        var i = 0
        // a missing map key yields the VALUE TYPE DEFAULT for a
        // non-Nullable value type, NULL for Map(K, Nullable(V)) (ref
        // src/Functions/array/arrayElement.cpp map path). Spark's map
        // schema says nullable for both, so the DECLARED nullability is
        // approximated by whether this map holds any NULL value
        // (02473 pins the Nullable case, 01825_from_map the default)
        var hasNullVal = false
        if (elementNullable && !forceDefault) {
          var j = 0
          while (!hasNullVal && j < map.numElements()) {
            if (vals.isNullAt(j)) hasNullVal = true
            j += 1
          }
        }
        var found: Any = if (hasNullVal) null else defaultOf(vt)
        var done = false
        while (!done && i < map.numElements()) {
          if (sameKey(keys.get(i, kt), key)) {
            found = if (vals.isNullAt(i)) null else vals.get(i, vt)
            done = true
          }
          i += 1
        }
        found
    }

  /** Key probe with numeric widening (map<int,_>[bigint literal] etc). */
  private def sameKey(k: Any, probe: Any): Boolean = (k, probe) match {
    case (a: UTF8String, b: UTF8String) => a == b
    case (a: Number, b: Number) =>
      val floating = a.isInstanceOf[java.lang.Double] ||
        a.isInstanceOf[java.lang.Float] ||
        b.isInstanceOf[java.lang.Double] || b.isInstanceOf[java.lang.Float]
      if (floating) a.doubleValue() == b.doubleValue()
      else a.longValue() == b.longValue()
    case (a, b) => a == b
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ChElementAt = copy(left = l, right = r)

  override def prettyName: String = "chElementAt"
}

/** CH length() is polymorphic: BYTE count for String/FixedString (ref
  * src/Functions/lengthUTF8.cpp's sibling length.cpp — String is a byte
  * blob; lengthUTF8 is the code-point variant), element count for
  * Array/Map. Spark's `length` is char-count for strings and rejects
  * arrays, so the dispatch needs its own expression.
  */
case class ChLength(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | ArrayType(_, _) | MapType(_, _, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"length needs a string, array or map, got $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => input.asInstanceOf[UTF8String].numBytes().toLong
    case BinaryType => input.asInstanceOf[Array[Byte]].length.toLong
    case ArrayType(_, _) => input.asInstanceOf[ArrayData].numElements().toLong
    case MapType(_, _, _) => input.asInstanceOf[MapData].numElements().toLong
    case _ => null
  }
  override protected def withNewChildInternal(c: Expression): ChLength =
    copy(child = c)
  override def prettyName: String = "length"
}

/** CH bitCount counts set bits WITHIN the operand's type width (ref
  * src/Functions/bitCount.cpp: __builtin_popcount on the native-width
  * value); Spark's bit_count sign-extends narrow ints to 64 bits, so
  * bitCount(toInt8(-1)) must be 8, not 64.
  */
case class ChBitCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case BooleanType => if (input.asInstanceOf[Boolean]) 1 else 0
    case ByteType => Integer.bitCount(input.asInstanceOf[Byte] & 0xFF)
    case ShortType => Integer.bitCount(input.asInstanceOf[Short] & 0xFFFF)
    case IntegerType => Integer.bitCount(input.asInstanceOf[Int])
    case LongType => java.lang.Long.bitCount(input.asInstanceOf[Long])
    case _ => null
  }
  override protected def withNewChildInternal(c: Expression): ChBitCount =
    copy(child = c)
  override def prettyName: String = "bitCount"
}

/** arrayAUC(scores, labels) exact port of the reference algorithm (ref
  * src/Functions/array/arrayAUC.cpp ArrayAUCImpl::apply): stable sort
  * descending by score (equal scores keep ARRAY order — no ½ tie
  * credit), step-walk accumulating count_positive per negative, NaN
  * when all labels are one class.
  */
case class ChArrayAUC(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, _), ArrayType(_, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"arrayAUC needs two arrays, got $other")
    }
  private def num(a: ArrayData, et: DataType, i: Int): Double =
    a.get(i, et) match {
      case n: java.lang.Number => n.doubleValue()
      case b: java.lang.Boolean => if (b) 1.0 else 0.0
      case d: Decimal => d.toDouble
      case _ => Double.NaN
    }
  override def nullSafeEval(s: Any, l: Any): Any = {
    val (sa, la) = (s.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])
    val (set, let) = (left.dataType.asInstanceOf[ArrayType].elementType,
      right.dataType.asInstanceOf[ArrayType].elementType)
    val n = sa.numElements()
    if (n != la.numElements() || n == 0) return null // ref throws; null here
    val idx = (0 until n).sortBy(i => -num(sa, set, i)) // stable in Scala
    var area = 0L
    var pos = 0L
    idx.foreach { i =>
      if (num(la, let, i) > 0) pos += 1 else area += pos
    }
    if (pos == 0 || pos == n) Double.NaN
    else area.toDouble / pos / (n - pos)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ChArrayAUC = copy(left = l, right = r)
  override def prettyName: String = "arrayAUC"
}

/** visitParamExtractRaw / simpleJSONExtractRaw (ref
  * src/Functions/visitParamExtractRaw.cpp): substring-search `"key":`,
  * then copy the VERBATIM source text of the value — leading whitespace
  * and string escapes preserved, quoted strings skipped opaquely,
  * brace/bracket depth balanced, stop at `,` `}` `]` at depth 0.
  * '' when the key is absent.
  */
case class ChVisitParamRaw(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(js: Any, key: Any): Any = {
    val s = js.asInstanceOf[UTF8String].toString
    val k = "\"" + key.asInstanceOf[UTF8String].toString + "\":"
    val at = s.indexOf(k)
    if (at < 0) return UTF8String.EMPTY_UTF8
    val sb = new StringBuilder
    var p = at + k.length
    var depth = 0
    var inStr = false
    var esc = false
    var done = false
    while (!done && p < s.length) {
      val c = s.charAt(p)
      if (inStr) {
        sb.append(c)
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true; sb.append(c)
        case '{' | '[' => depth += 1; sb.append(c)
        case '}' | ']' =>
          if (depth == 0) done = true else { depth -= 1; sb.append(c) }
        case ',' => if (depth == 0) done = true else sb.append(c)
        case other => sb.append(other)
      }
      if (!done) p += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ChVisitParamRaw =
    copy(left = l, right = r)
  override def prettyName: String = "visitParamExtractRaw"
}

/** emptyArrayToSingle(arr): an empty array becomes a one-element array
  * holding the element type's default value (ref
  * src/Functions/emptyArrayToSingle.cpp). */
case class EmptyArrayToSingle(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"emptyArrayToSingle needs an array, got $other")
  }
  override def dataType: DataType = child.dataType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() > 0) arr
    else {
      val ArrayType(et, nullable) = child.dataType
      // Nullable element type -> NULL, else the type default (ref
      // emptyArrayToSingle.cpp; pinned by 00452's [NULL] vs [0] rows)
      new GenericArrayData(Array[Any](
        if (nullable) null else ChElementAt(child, child).defaultOf(et)))
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "emptyArrayToSingle"
}
