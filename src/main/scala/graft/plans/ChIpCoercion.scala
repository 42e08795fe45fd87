package graft.plans

import graft.functions.{BoolUDT, ChIp, IpToString, IpUnwrap}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, NumericType, StringType, UserDefinedType}

/** CH's IPv4/IPv6 are UInt32 / FixedString(16) in every relational
  * context (compare, sort, arithmetic, range) while rendering as text
  * (ref src/DataTypes/DataTypeIPv4andIPv6.h: the serialization is the
  * only text-aware layer). The graft analogs are UDTs; this resolution
  * rule lowers them to their underlying atomic type wherever Spark's
  * operators need one, so plans stay codegen'd and shuffle/sort keys
  * stay primitive:
  *
  *  - comparisons/arithmetic with one IP side and one numeric side
  *    lower the IP to its number (02713_ip4_uint_compare semantics);
  *  - comparisons between two same-kind IPs lower both (binary byte
  *    order IS the IPv6 order);
  *  - SortOrder over an IP lowers the sort key (display column is
  *    unaffected — only the key expression changes);
  *  - Cast(ip AS String) renders the display form;
  *  - Sequence (range()) lowers IP bounds to numbers.
  */
object ChIpCoercionRule extends Rule[LogicalPlan] {

  private def isIp(e: Expression): Boolean = e.resolved &&
    (ChIp.isIpType(e.dataType) || e.dataType.isInstanceOf[BoolUDT] ||
      e.dataType.isInstanceOf[graft.functions.DateTime64UDT])
  private def lower(e: Expression): Expression =
    if (isIp(e)) IpUnwrap(e) else e
  private def isNum(dt: DataType): Boolean = dt.isInstanceOf[NumericType]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val p = plan.transformAllExpressionsWithPruning(_ => true) {
      case c: BinaryComparison
          if (isIp(c.left) || isIp(c.right)) &&
            c.left.resolved && c.right.resolved =>
        // a plain Date compared against a zoned DateTime64 converts at
        // the DateTime64's timezone (CH compares in the column's zone)
        def adapt(side: Expression, other: Expression): Expression =
          if (isIp(side)) lower(side)
          else (side.dataType, other.dataType) match {
            case (org.apache.spark.sql.types.DateType,
                d: graft.functions.DateTime64UDT) if d.tz.isDefined =>
              Cast(side, org.apache.spark.sql.types.TimestampType, d.tz)
            case _ => side
          }
        c.withNewChildren(Seq(adapt(c.left, c.right), adapt(c.right, c.left)))
      case a: BinaryArithmetic
          if (isIp(a.left) || isIp(a.right)) &&
            a.left.resolved && a.right.resolved =>
        a.withNewChildren(Seq(lower(a.left), lower(a.right)))
      case s: Sequence if s.children.exists(isIp) =>
        s.withNewChildren(s.children.map(lower))
      case In(v, list) if isIp(v) =>
        In(lower(v), list.map(lower))
      case c @ Cast(child, StringType, _, _) if isIp(child) =>
        IpToString(child)
      case c @ Cast(child, dt, _, _)
          if isIp(child) && (isNum(dt) || dt == org.apache.spark.sql.types
            .DateType || dt == org.apache.spark.sql.types.TimestampType) =>
        // a DateTime64's own timezone governs its date conversion
        val tzId = child.dataType match {
          case d: graft.functions.DateTime64UDT if d.tz.isDefined => d.tz
          case _ => c.timeZoneId
        }
        Cast(IpUnwrap(child), dt, tzId, c.evalMode)
      // timestamp-consuming functions take the DateTime64's instant
      case e @ (_: TimestampDiff | _: TimestampAdd | _: SubtractTimestamps |
          _: UnixTimestamp | _: ToUnixTimestamp | _: TimestampAddInterval |
          _: TimestampAddYMInterval |
          _: DateFormatClass | _: TruncTimestamp | _: TruncDate |
          _: GetDateField | _: GetTimeField | _: Least | _: Greatest |
          _: MonthsBetween | _: DateDiff | _: LastDay | _: NextDay |
          _: AddMonthsBase | _: FromUTCTimestamp | _: ToUTCTimestamp)
          if e.children.exists(isIp) && e.children.forall(_.resolved) =>
        e.withNewChildren(e.children.map(lower))
      // boolean contexts unwrap the CH Bool display type
      case And(l, r) if isIp(l) || isIp(r) => And(lower(l), lower(r))
      case Or(l, r) if isIp(l) || isIp(r) => Or(lower(l), lower(r))
      case Not(c) if isIp(c) => Not(lower(c))
      case If(p, a, b) if isIp(p) => If(lower(p), a, b)
      case cw: CaseWhen if cw.branches.exists(b => isIp(b._1)) =>
        cw.copy(branches = cw.branches.map { case (c, v) => (lower(c), v) })
    }
    val p2 = p.transformWithPruning(_ => true) {
      case f @ Filter(cond, child) if isIp(cond) =>
        Filter(IpUnwrap(cond), child)
    }
    p2.transformWithPruning(_ => true) {
      case node => node.transformExpressions {
        case so @ SortOrder(child, dir, no, same) if isIp(child) =>
          SortOrder(IpUnwrap(child), dir, no, same)
      }
    }
  }
}
