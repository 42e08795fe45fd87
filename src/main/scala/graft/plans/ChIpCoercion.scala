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
    (ChIp.isIpType(e.dataType) || e.dataType.isInstanceOf[BoolUDT])
  private def lower(e: Expression): Expression =
    if (isIp(e)) IpUnwrap(e) else e
  private def isNum(dt: DataType): Boolean = dt.isInstanceOf[NumericType]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val p = plan.transformAllExpressionsWithPruning(_ => true) {
      case c: BinaryComparison
          if (isIp(c.left) || isIp(c.right)) &&
            c.left.resolved && c.right.resolved =>
        c.withNewChildren(Seq(lower(c.left), lower(c.right)))
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
          if isIp(child) && isNum(dt) =>
        Cast(IpUnwrap(child), dt, c.timeZoneId, c.evalMode)
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
