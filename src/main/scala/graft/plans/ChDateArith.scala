package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** ClickHouse date/time integer arithmetic (ref
  * src/Functions/FunctionDateOrDateTimeAddInterval.h and plus.cpp's
  * DataTypeDateTime + integral overloads): `DateTime + N` adds N
  * SECONDS, `Date + N` adds N DAYS, symmetrically for `N + t` and
  * `t - N`. Spark's Add/Subtract reject TIMESTAMP ± INT outright, so a
  * resolution rule rewrites them to the CH semantics: timestamps go
  * through an epoch-seconds round-trip (`CAST(ts AS BIGINT)` is epoch
  * seconds in Spark SQL), dates through DateAdd/DateSub.
  */
object ChDateArithRule extends Rule[LogicalPlan] {

  private def isTs(e: Expression) =
    e.resolved && e.dataType == TimestampType
  private def isDate(e: Expression) =
    e.resolved && e.dataType == DateType
  private def isInt(e: Expression) = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  })

  private def tsPlus(ts: Expression, n: Expression): Expression =
    Cast(Add(Cast(ts, LongType), Cast(n, LongType)), TimestampType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_ => true) {
      case Add(l, r, _) if isTs(l) && isInt(r) => tsPlus(l, r)
      case Add(l, r, _) if isInt(l) && isTs(r) => tsPlus(r, l)
      case Subtract(l, r, _) if isTs(l) && isInt(r) =>
        tsPlus(l, UnaryMinus(r))
      case Add(l, r, _) if isDate(l) && isInt(r) => DateAdd(l, Cast(r, IntegerType))
      case Add(l, r, _) if isInt(l) && isDate(r) => DateAdd(r, Cast(l, IntegerType))
      case Subtract(l, r, _) if isDate(l) && isInt(r) =>
        DateSub(l, Cast(r, IntegerType))
      // Spark's own ResolveBinaryArithmetic already turns date+int into
      // DateAdd but leaves a BIGINT operand to fail the type check — CH
      // allows UInt64 day counts (ref FunctionDateOrDateTimeAddInterval)
      case DateAdd(l, r) if r.resolved && r.dataType == LongType =>
        DateAdd(l, Cast(r, IntegerType))
      case DateSub(l, r) if r.resolved && r.dataType == LongType =>
        DateSub(l, Cast(r, IntegerType))
      // CH `/` is Float64 IEEE division (ref src/Functions/divide.cpp
      // DivideFloatingImpl): 1/0 = +inf, 1/-0.0 = -inf, 0/0 = nan —
      // neither Spark mode does that (ANSI throws, legacy NULLs), and
      // -0.0 divisors are indistinguishable via builtin comparisons, so
      // rewrite to the raw-JVM IeeeDivide expression (a distinct node,
      // so the rule is idempotent and applies in LEGACY mode too).
      // Decimal division keeps Spark's decimal path (CH Decimal/0 also
      // throws).
      case Divide(l, r, _) if isFloatish(l) && isFloatish(r) =>
        graft.functions.IeeeDivide(Cast(l, DoubleType), Cast(r, DoubleType))
      // UInt64 (Decimal(20,0) carrier) ± integer wraps modulo 2^64, the
      // CH unsigned overflow contract (ref src/Functions/plus.cpp on
      // UInt64: two's-complement wrap, always non-negative)
      case a @ Add(l, r, _)
          if a.resolved && a.dataType != DecimalType(38, 0) &&
            ((isU64(l) && isIntegral(r)) || (isIntegral(l) && isU64(r))) =>
        u64Wrap(Add(wide(l), wide(r)))
      case a @ Subtract(l, r, _)
          if a.resolved && a.dataType != DecimalType(38, 0) &&
            ((isU64(l) && isIntegral(r)) || (isIntegral(l) && isU64(r))) =>
        u64Wrap(Subtract(wide(l), wide(r)))
    }

  private val two64 = Literal(Decimal(
    new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64)), 38, 0),
    DecimalType(38, 0))
  // ONLY foldable top-half literals: Decimal(20,0) is also Spark's
  // sum(BIGINT) type, whose signed values must never be pmod-wrapped
  private def isU64(e: Expression) = e.resolved && e.foldable &&
    (e.dataType match {
      case d: DecimalType => d.scale == 0 && d.precision >= 20
      case _ => false
    }) &&
    (try {
      e.eval(null) match {
        case d: Decimal =>
          d.toJavaBigDecimal.unscaledValue.bitLength == 64
        case _ => false
      }
    } catch { case _: Exception => false })
  private def stripCasts(e: Expression): Expression = e match {
    case c: Cast => stripCasts(c.child)
    case other => other
  }
  private def isIntegral(e0: Expression) = {
    val e = stripCasts(e0)
    e.resolved && (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
  }
  private def wide(e: Expression) = Cast(e, DecimalType(38, 0))
  private def u64Wrap(e: Expression): Expression =
    Cast(Pmod(e, two64), DecimalType(20, 0))

  private def isFloatish(e: Expression) = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType => true
    case _ => false
  })
}
