package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** CH materialize(): turn a constant into a full column (ref
  * src/Functions/materialize.cpp). The Spark equivalent is an identity
  * node that reports non-foldable, so constant folding leaves it alone
  * and isConstant() sees a non-constant. */
case class MaterializeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def withNewChildInternal(c: Expression): MaterializeExpr =
    copy(child = c)
  override def prettyName: String = "materialize"
}

/** CH isConstant() (ref isConstant.cpp): whether the argument column is
  * constant. Evaluates the CHILD'S foldability, not its value — so NULL
  * literals still count as constant. */
case class IsConstantExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    // every non-literal input being Nothing-typed (NullType) means the
    // expression can only ever be NULL — CH folds that to a constant
    // column (01420_logical_functions_materialized_null). Inputs appear
    // as Attribute before binding and BoundReference after, so collect
    // both.
    {
      val inputs = child.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
          a.dataType
        case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
          b.dataType
      }
      if (child.foldable || (child.deterministic && inputs.nonEmpty &&
          inputs.forall(_ == org.apache.spark.sql.types.NullType))) 1
      else 0
    }
  override protected def withNewChildInternal(c: Expression): IsConstantExpr =
    copy(child = c)
  override def prettyName: String = "isConstant"
}

/** Freeze isConstant() at RESOLUTION time: CH decides constness on the
  * analyzed pipeline, while Spark's optimizer would later constant-fold
  * per-branch (a UNION ALL pushes projections into branches, turning the
  * column reference into a literal — 01118_is_constant pins that a union
  * column is NOT constant). A scalar subquery is a constant in CH. */
object ChIsConstantRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Literal, ScalarSubquery}
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    // attribute constness through the plan: aliased-to-foldable columns
    // are constants (SELECT 1 x), union outputs never are — a union
    // reuses its first branch's ExprIds, so union ids override
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.Union
    // cheap existence probe first: .output on a still-unresolved Project
    // (star expansion pending) throws, so don't touch plans that carry
    // no isConstant at all, and only read union outputs once resolved
    val hasIsConstant = plan.exists(_.expressions.exists(
      _.exists(_.isInstanceOf[IsConstantExpr])))
    if (!hasIsConstant) return plan
    val foldableAlias = scala.collection.mutable.HashSet.empty[Long]
    val unionIds = scala.collection.mutable.HashSet.empty[Long]
    plan.foreach {
      case u: Union if u.resolved =>
        u.output.foreach(a => unionIds += a.exprId.id)
      case p => p.expressions.foreach(_.foreach {
        case al: Alias if al.resolved && al.child.foldable =>
          foldableAlias += al.exprId.id
        case _ =>
      })
    }
    def attrConst(a: Attribute): Boolean =
      !unionIds.contains(a.exprId.id) &&
        (foldableAlias.contains(a.exprId.id) ||
          a.dataType == org.apache.spark.sql.types.NullType)
    plan.transformAllExpressionsWithSubqueries {
      case IsConstantExpr(c) if c.resolved =>
        val inputs = c.collect { case a: Attribute => a }
        val const = c.foldable || c.isInstanceOf[ScalarSubquery] ||
          (c.deterministic && inputs.nonEmpty && inputs.forall(attrConst))
        Literal(if (const) 1 else 0)
    }
  }
}

/** Display-unit tag for CH Interval types that Spark's interval types
  * can't encode (Week rides DayTimeInterval as 7n days, Quarter rides
  * YearMonthInterval as 3n months). Identity at execution; the golden
  * formatter walks the ANALYZED plan for this tag and divides the
  * printed count by `divisor` (CH shows a bare Interval as its COUNT in
  * the declared unit — ref DataTypeInterval serialization). */
case class ChIntervalTag(child: Expression, divisor: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = child.foldable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def withNewChildInternal(c: Expression): ChIntervalTag =
    copy(child = c)
  override def prettyName: String = "chIntervalUnit"
}
