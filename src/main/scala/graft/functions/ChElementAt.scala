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
      try org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToDate(input.asInstanceOf[UTF8String])
        .map(Integer.valueOf).orNull
      catch { case _: Exception => null }
    case TimestampType | TimestampNTZType =>
      Math.floorDiv(input.asInstanceOf[java.lang.Long], 86400000000L).toInt
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
case class ChElementAt(left: Expression, right: Expression)
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

  private def miss: Any = if (elementNullable) null else defaultOf(dataType)

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
        var found: Any = miss
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
