package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** CH aggregates over an EMPTY set return the type default, not NULL:
  * `SELECT sum(x) FROM t WHERE 0` is 0 (ref
  * src/AggregateFunctions/AggregateFunctionSum.h insertResultInto on an
  * untouched state). Spark's Sum yields NULL. Only a global aggregate
  * (no grouping keys) can see an empty set — groups exist only with
  * rows — so wrap global sums in a default-valued coalesce. The -OrNull
  * combinator builds `when(count > 0, sum)` on top, which still yields
  * NULL on the empty set. */
object ChEmptyAggRule extends Rule[LogicalPlan] {
  private val tag = TreeNodeTag[Boolean]("graft.sumDefaulted")

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case agg: Aggregate
        if agg.resolved && agg.groupingExpressions.isEmpty &&
          conf.getConfString(
            "graft.ch.aggregate_functions_null_for_empty", "0").trim
            != "1" =>
      var changed = false
      // declared-nullability lookups below are scoped to the tables the
      // plan actually reads — a cross-table column-name collision with
      // differing declared nullability must not flip the zero-fill
      // (advice r11; same failure mode ChTypeNameOf guards against)
      val scope = agg.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          s.identifier.name.toLowerCase
      }.toSet
      val rewritten = agg.aggregateExpressions.map { ne =>
        ne.transform {
          case ae @ AggregateExpression(f, _, false, None, _)
              if ae.getTagValue(tag).isEmpty && defaultable(f, scope) =>
            ae.setTagValue(tag, true)
            changed = true
            Coalesce(Seq(ae, emptyDefault(f, ae.dataType)))
        }.asInstanceOf[NamedExpression]
      }
      if (changed) agg.copy(aggregateExpressions = rewritten) else agg
  }

  /** Sums always default; min/max/first/last default only when the
    * VALUE is non-Nullable in CH terms — a when(cond, v) mask from the
    * -If combinator doesn't make it Nullable, an explicit
    * Nullable(T) cast (KnownNullable) does. */
  /** CH-visible non-nullability of an expression: a when(cond, v) mask
    * from -If doesn't make it Nullable, an explicit Nullable(T) cast
    * (KnownNullable) does; CH CAST (cast_keep_nullable=0) strips it. */
  def chNonNullable(e: Expression): Boolean = chNonNullable(e, Set.empty)

  /** `scope`: lowercased names of the tables the caller's plan reads —
    * restricts the declared-type lookup so a column-name collision in an
    * UNRELATED table can't change the answer. Empty = global lookup. */
  def chNonNullable(e: Expression, scope: Set[String]): Boolean = e match {
    case CaseWhen(branches, None) =>
      branches.forall(b => chNonNullable(b._2, scope))
    case _: KnownNullable => false
    // CAST strips nullability — except of the NULL literal itself
    // (CAST(NULL AS T) stays Nullable(T); coercion wraps bare NULL
    // branch values this way)
    case c: Cast =>
      c.child.dataType != org.apache.spark.sql.types.NullType
    case t: graft.functions.ChUIntTag => chNonNullable(t.child, scope)
    // a staged-table column is Spark-nullable by construction (views are
    // built over CAST(NULL…) unions), but its CH nullability is the
    // DECLARED one: sum over a declared non-Nullable column zero-fills
    // even though the Spark attribute reports nullable (00584)
    case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
      val declared =
        graft.ChSql.declaredColumnTypeIn(a.name, scope) match {
          case None if scope.isEmpty => graft.ChSql.declaredColumnType(a.name)
          case x => x
        }
      declared match {
        case Some(t) => !t.matches("(?is)\\s*(Nullable|LowCardinality\\s*\\(\\s*Nullable)\\b.*")
        case None => !a.nullable
      }
    case other => !other.nullable
  }

  private def defaultable(
      f: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction, scope: Set[String]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    f match {
      // a CH-Nullable input makes sum Nullable too: all-NULL input
      // yields NULL, not 0 (01281_sum_nullable)
      case s: Sum => chNonNullable(s.child, scope)
      case Min(c) => chNonNullable(c, scope)
      case Max(c) => chNonNullable(c, scope)
      case First(c, _) => chNonNullable(c, scope)
      case Last(c, _) => chNonNullable(c, scope)
      // avg over the empty set is 0/0 = nan (ref
      // AggregateFunctionAvg.h: divides untouched sums), not NULL
      case a: Average if a.dataType ==
          org.apache.spark.sql.types.DoubleType =>
        chNonNullable(a.child, scope)
      case _ => false
    }
  }

  /** The value CH's insertResultInto emits from an untouched state:
    * the type default for sum/min/max/any, nan for avg (0/0). */
  private def emptyDefault(
      f: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction,
      dt: org.apache.spark.sql.types.DataType): Expression = f match {
    case _: org.apache.spark.sql.catalyst.expressions.aggregate.Average =>
      Literal(Double.NaN, org.apache.spark.sql.types.DoubleType)
    case _ => Literal.default(dt)
  }
}
