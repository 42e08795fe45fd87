package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Scalar `bitmap*` functions over the wire format in [[Bitmap]]
  * (ref `/root/reference/src/Functions/FunctionsBitmap.cpp`). These are
  * CodegenFallback expressions — bitmap ops are byte-blob merges, not
  * per-row arithmetic, so codegen would only inline the same calls. */
object BitmapExprs {

  /** bitmapAnd / bitmapOr / bitmapXor / bitmapAndnot → binary, and the
    * *Cardinality variants → bigint, plus bitmapHasAny / bitmapHasAll
    * / bitmapSubsetInRange-free ops keyed by `op`. */
  case class BitmapBinary(left: Expression, right: Expression, op: String)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = op match {
      case "and" | "or" | "xor" | "andnot" => BinaryType
      case "hasAny" | "hasAll" => BooleanType
      case _ => LongType // andCardinality / orCardinality / ...
    }
    override def nullIntolerant: Boolean = true
    override def prettyName: String = s"bitmap_$op"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = Bitmap.deserialize(l.asInstanceOf[Array[Byte]])
      val b = Bitmap.deserialize(r.asInstanceOf[Array[Byte]])
      op match {
        case "and" => Bitmap.serialize(Bitmap.and(a, b))
        case "or" => Bitmap.serialize(Bitmap.or(a, b))
        case "xor" => Bitmap.serialize(Bitmap.xor(a, b))
        case "andnot" => Bitmap.serialize(Bitmap.andnot(a, b))
        case "andCardinality" => Bitmap.and(a, b).cardinality
        case "orCardinality" => Bitmap.or(a, b).cardinality
        case "xorCardinality" => Bitmap.xor(a, b).cardinality
        case "andnotCardinality" => Bitmap.andnot(a, b).cardinality
        case "hasAny" => Bitmap.and(a, b).cardinality > 0
        case "hasAll" => Bitmap.andnot(b, a).cardinality == 0
      }
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BitmapBinary =
      copy(left = newLeft, right = newRight)
  }

  /** bitmapCardinality / bitmapMin / bitmapMax / bitmapToArray. CH returns
    * 0 for min/max of an empty bitmap per its UInt64 convention; here
    * empty → null (documented divergence: null is the honest SQL answer). */
  case class BitmapUnary(child: Expression, op: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = op match {
      case "toArray" => ArrayType(LongType, containsNull = false)
      case _ => LongType
    }
    override def nullIntolerant: Boolean = true
    override def prettyName: String = s"bitmap_$op"

    override def nullSafeEval(input: Any): Any = {
      val bm = Bitmap.deserialize(input.asInstanceOf[Array[Byte]])
      op match {
        case "cardinality" => bm.cardinality
        case "min" => Bitmap.min(bm).orNull
        case "max" => Bitmap.max(bm).orNull
        case "toArray" => new GenericArrayData(Bitmap.toArray(bm))
      }
    }
    override protected def withNewChildInternal(c: Expression): BitmapUnary =
      copy(child = c)
  }

  /** bitmapBuild(array<bigint>) → binary. */
  case class BitmapBuild(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bitmapBuild"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      Bitmap.serialize(Bitmap.fromValues(arr.toLongArray()))
    }
    override protected def withNewChildInternal(c: Expression): BitmapBuild =
      copy(child = c)
  }

  /** bitmapContains(bitmap, value) → boolean. */
  case class BitmapContains(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bitmapContains"
    override def nullSafeEval(l: Any, r: Any): Any =
      Bitmap.contains(Bitmap.deserialize(l.asInstanceOf[Array[Byte]]),
        r.asInstanceOf[Long])
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BitmapContains =
      copy(left = newLeft, right = newRight)
  }

  /** bitmapSubsetInRange(bm, start, end) — values in [start, end);
    * bitmapSubsetLimit(bm, start, limit) — up to `limit` smallest values
    * ≥ start; subBitmap(bm, offset, limit) — skip `offset` smallest
    * values, take the next `limit` (ref FunctionsBitmap.h
    * BitmapSubsetInRangeImpl / BitmapSubsetLimitImpl /
    * BitmapSubsetOffsetLimitImpl). */
  case class BitmapSubset(first: Expression, second: Expression,
      third: Expression, op: String)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = op
    override def nullSafeEval(b: Any, x: Any, y: Any): Any = {
      val values = Bitmap.toArray(
        Bitmap.deserialize(b.asInstanceOf[Array[Byte]]))
      def asLong(v: Any): Long = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case bt: Byte => bt.toLong
      }
      val a = asLong(x); val c = asLong(y)
      val out = op match {
        case "subsetInRange" => values.filter(v => v >= a && v < c)
        case "subsetLimit" => values.filter(_ >= a).take(c.toInt)
        case "subBitmap" => values.drop(a.toInt).take(c.toInt)
      }
      Bitmap.serialize(Bitmap.fromValues(out))
    }
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): BitmapSubset =
      copy(first = f, second = s, third = t)
  }

  // ---- Column API ----
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def bitmapBuild(arr: Column): Column = c(BitmapBuild(e(arr)))
  def bitmapToArray(bm: Column): Column = c(BitmapUnary(e(bm), "toArray"))
  def bitmapCardinality(bm: Column): Column = c(BitmapUnary(e(bm), "cardinality"))
  def bitmapMin(bm: Column): Column = c(BitmapUnary(e(bm), "min"))
  def bitmapMax(bm: Column): Column = c(BitmapUnary(e(bm), "max"))
  def bitmapAnd(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "and"))
  def bitmapOr(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "or"))
  def bitmapXor(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "xor"))
  def bitmapAndnot(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "andnot"))
  def bitmapAndCardinality(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "andCardinality"))
  def bitmapOrCardinality(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "orCardinality"))
  def bitmapXorCardinality(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "xorCardinality"))
  def bitmapAndnotCardinality(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "andnotCardinality"))
  def bitmapHasAny(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "hasAny"))
  def bitmapHasAll(a: Column, b: Column): Column = c(BitmapBinary(e(a), e(b), "hasAll"))
  def bitmapContains(bm: Column, v: Column): Column = c(BitmapContains(e(bm), e(v)))
  def bitmapSubsetInRange(bm: Column, a: Column, b: Column): Column =
    c(BitmapSubset(e(bm), e(a), e(b), "subsetInRange"))
  def bitmapSubsetLimit(bm: Column, a: Column, b: Column): Column =
    c(BitmapSubset(e(bm), e(a), e(b), "subsetLimit"))
  def subBitmap(bm: Column, a: Column, b: Column): Column =
    c(BitmapSubset(e(bm), e(a), e(b), "subBitmap"))
}
