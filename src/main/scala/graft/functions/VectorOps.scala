package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused array-vector kernels for the similarity/ANN hot paths.
  *
  * The composed-builtin forms (`aggregate(zip_with(a, b, (x, y) =>
  * x*y), 0.0, _+_)`) are higher-order functions, which Spark evaluates
  * INTERPRETED (no whole-stage codegen for HOF lambdas): every element
  * walks an expression tree and rebinds lambda variables, and every
  * `zip_with` materializes an intermediate array per row. In the
  * brute-force ANN scoring join that tree-walk runs |corpus|·|queries|·dim
  * times and dominates the stage (guide §4: eliminate non-codegen
  * expressions in the hot path).
  *
  * Each kernel below is ONE tight JVM loop with zero temporaries and
  * EXACTLY the numeric semantics of the form it replaces:
  *  - same left-to-right fold order (bit-identical IEEE-754 results),
  *  - widening casts only (float→double, integral→long), as the composed
  *    form's `cast("double")` / `cast("bigint")` did,
  *  - null result when lengths differ (zip_with pads with null, null
  *    poisons the fold) or when any consumed element is null.
  * VectorOpsSpec pins bit-for-bit equality against the composed forms.
  */
object VectorOps {

  private def numAsDouble(a: ArrayData, et: DataType, i: Int): Double =
    et match {
      case DoubleType => a.getDouble(i)
      case FloatType => a.getFloat(i).toDouble
      case LongType => a.getLong(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case ShortType => a.getShort(i).toDouble
      case ByteType => a.getByte(i).toDouble
      // decimal literals reach dotProduct() via the SQL registry;
      // Cast(decimal→double) is Decimal.toDouble — same op here
      case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
      case _ => throw new IllegalStateException(s"VectorOps: bad elem $et")
    }

  private def numAsLong(a: ArrayData, et: DataType, i: Int): Long =
    et match {
      case LongType => a.getLong(i)
      case IntegerType => a.getInt(i).toLong
      case ShortType => a.getShort(i).toLong
      case ByteType => a.getByte(i).toLong
      case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toLong
      case _ => throw new IllegalStateException(s"VectorOps: bad elem $et")
    }

  private def elemType(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType

  /** Java accessor expression yielding element i of `arr` as an unboxed
    * double — compile-time-specialized on the element type, mirroring
    * [[numAsDouble]] exactly (same widening casts, Decimal.toDouble). */
  private def javaAsDouble(arr: String, et: DataType, i: String): String =
    et match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case d: DecimalType =>
        s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other => throw new IllegalStateException(s"VectorOps: bad elem $other")
    }

  /** Same, as an unboxed long — mirrors [[numAsLong]]. */
  private def javaAsLong(arr: String, et: DataType, i: String): String =
    et match {
      case LongType => s"$arr.getLong($i)"
      case IntegerType => s"(long) $arr.getInt($i)"
      case ShortType => s"(long) $arr.getShort($i)"
      case ByteType => s"(long) $arr.getByte($i)"
      case d: DecimalType =>
        s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toLong()"
      case other => throw new IllegalStateException(s"VectorOps: bad elem $other")
    }

  /** r16: the kernels implement real whole-stage codegen (doGenCode
    * below) instead of CodegenFallback — a CodegenFallback expression
    * excludes its entire host operator from WholeStageCodegen
    * (CollapseCodegenStages rejects any plan whose expressions contain
    * one), so the ANN scoring projections ran as interpreted Project
    * nodes outside the codegen span. The generated loop is the same
    * tight loop as the interpreted eval — identical fold order, casts
    * and null semantics (VectorOpsSpec pins codegen == interpreted ==
    * composed bit-for-bit). */
  sealed trait VecBinary extends BinaryExpression {
    override def nullable: Boolean = true
    // null-intolerant on the array arguments themselves
    override def nullIntolerant: Boolean = true

    /** java type + zero literal of the accumulator. */
    protected def accType: String
    protected def accZero: String
    /** loop-body statement(s) updating `acc` from the two accessors. */
    protected def accUpdate(acc: String, xa: String, xb: String,
        ctx: CodegenContext): String

    protected def elemAccessor(arr: String, et: DataType, i: String): String

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (ta, tb) = (elemType(left.dataType), elemType(right.dataType))
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  $accType $acc = $accZero;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true;
           |      break;
           |    }
           |    ${accUpdate(acc, elemAccessor(a, ta, i), elemAccessor(b, tb, i), ctx)}
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $acc;
           |}
         """.stripMargin
      })
  }

  /** Σ aᵢ·bᵢ in double — fused
    * `aggregate(zip_with(a, b, (x, y) => x.cast(D) * y.cast(D)), 0.0, +)`.
    */
  case class DotD(left: Expression, right: Expression) extends VecBinary {
    override def dataType: DataType = DoubleType
    override protected def accType: String = "double"
    override protected def accZero: String = "0.0"
    override protected def elemAccessor(arr: String, et: DataType,
        i: String): String = javaAsDouble(arr, et, i)
    override protected def accUpdate(acc: String, xa: String, xb: String,
        ctx: CodegenContext): String = s"$acc += $xa * $xb;"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val (ta, tb) = (elemType(left.dataType), elemType(right.dataType))
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += numAsDouble(a, ta, i) * numAsDouble(b, tb, i)
        i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotD = copy(left = l, right = r)
  }

  /** Σ (aᵢ-bᵢ)² in double — fused
    * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, +)`. */
  case class L2SqD(left: Expression, right: Expression) extends VecBinary {
    override def dataType: DataType = DoubleType
    override protected def accType: String = "double"
    override protected def accZero: String = "0.0"
    override protected def elemAccessor(arr: String, et: DataType,
        i: String): String = javaAsDouble(arr, et, i)
    override protected def accUpdate(acc: String, xa: String, xb: String,
        ctx: CodegenContext): String = {
      val d = ctx.freshName("d")
      s"final double $d = $xa - $xb; $acc += $d * $d;"
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val (ta, tb) = (elemType(left.dataType), elemType(right.dataType))
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = numAsDouble(a, ta, i) - numAsDouble(b, tb, i)
        acc += d * d
        i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): L2SqD = copy(left = l, right = r)
  }

  /** Σ aᵢ·bᵢ in long (integral codes, e.g. int8 quantization) — fused
    * `aggregate(zip_with(a, b, (x, y) => x.cast(L) * y.cast(L)), 0L, +)`.
    */
  case class DotL(left: Expression, right: Expression) extends VecBinary {
    override def dataType: DataType = LongType
    override protected def accType: String = "long"
    override protected def accZero: String = "0L"
    override protected def elemAccessor(arr: String, et: DataType,
        i: String): String = javaAsLong(arr, et, i)
    override protected def accUpdate(acc: String, xa: String, xb: String,
        ctx: CodegenContext): String = s"$acc += $xa * $xb;"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val (ta, tb) = (elemType(left.dataType), elemType(right.dataType))
      val n = a.numElements()
      if (n != b.numElements()) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += numAsLong(a, ta, i) * numAsLong(b, tb, i)
        i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotL = copy(left = l, right = r)
  }

  import ColumnBridge.{column => CC, expression => EE}

  def dotD(a: Column, b: Column): Column = CC(DotD(EE(a), EE(b)))
  def l2sqD(a: Column, b: Column): Column = CC(L2SqD(EE(a), EE(b)))
  def dotL(a: Column, b: Column): Column = CC(DotL(EE(a), EE(b)))
}
