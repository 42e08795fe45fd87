package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generic aggregate-combinator CHAIN synthesis (ref
  * src/AggregateFunctions/AggregateFunctionCombinatorFactory.cpp: CH
  * peels combinator suffixes right-to-left until a registered base
  * remains, so `sumOrNullIf` or `groupUniqArrayStateArray` are legal
  * names). Distributive bases use the value-is-the-state simplification:
  * -State yields the finalized value and -Merge re-aggregates those
  * values (set/list bases: union of the collected pieces), which matches
  * the reference observably everywhere states aren't rendered as raw
  * bytes. -ForEach runs the base's element-level fold positionally
  * across collected rows; -Array feeds each row's elements into the
  * aggregate. Unsupported shapes throw, leaving the name unresolved.
  */
object CombinatorChain {

  /** CH setting aggregate_functions_null_for_empty=1 turns every
    * aggregate into its -OrNull form (ref Settings.h); the golden
    * harness forwards SET statements as graft.ch.* confs. */
  private def nullForEmpty: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(
      "graft.ch.aggregate_functions_null_for_empty", "0").trim == "1"
  /** Zero-fill for sum over an empty/all-filtered set — but ONLY when the
    * input is CH-non-Nullable: `sumIf(NULL, 1)` stays NULL while
    * `sumIf(1, NULL)` is 0 (02494_combinators_with_null_argument). The
    * nullability check needs the RESOLVED input, hence the deferred
    * [[ChSumZeroFill]] wrap. */
  private def orZero(c: Column, probe: Column): Column =
    if (nullForEmpty) c
    else {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(ChSumZeroFill(
        ColumnBridge.expression(c), ColumnBridge.expression(probe)))
    }

  /** Element-level fold twin: combine an accumulator with one element.
    * A null accumulator means "nothing yet"; null elements are absent. */
  private case class Fold(step: (Column, Column) => Column,
      finish: Column => Column = identity,
      // per-position accumulator seed, from a sample element — must
      // carry the ACCUMULATOR type (a typed null by default)
      seedElem: Column => Column =
        x => get(slice(array(x), 1, 0), lit(0)))

  private case class Base(
      name: String,
      rowAgg: Seq[Column] => Column,
      fold: Option[Fold] = None,
      // positional combine of two STATES (-ForEach…Merge); defaults to
      // the element fold where values and states coincide
      mergeFold: Option[Fold] = None,
      mergeAgg: Option[Column => Column] = None,
      arrayAgg: Option[Column => Column] = None) {
    def foldForMerge: Option[Fold] = mergeFold.orElse(fold)
  }

  private val bases: Map[String, Base] = Seq(
    Base("sum", as => orZero(sum(as.head), as.head),
      fold = Some(Fold((acc, x) =>
        when(acc.isNull, x).otherwise(
          when(x.isNull, acc).otherwise(acc + x)))),
      mergeAgg = Some(c => orZero(sum(c), c)),
      // null-skipping fold with a typed-null seed: an all-NULL (or empty)
      // row array folds to NULL, so sumArray([NULL, NULL]) stays NULL
      // while the zero-fill still applies for non-Nullable elements
      arrayAgg = Some(arr => orZero(sum(aggregate(arr,
        get(slice(arr, 1, 0), lit(0)).cast("bigint"),
        (acc, x) => when(acc.isNull, x.cast("bigint")).otherwise(
          when(x.isNull, acc).otherwise(acc + x.cast("bigint"))))), arr))),
    Base("count", {
      case Seq() => count(lit(1))
      case as => count(when(as.map(_.isNotNull).reduce(_ && _), lit(1)))
    },
      fold = Some(Fold((acc, x) => coalesce(acc, lit(0L)) +
        when(x.isNotNull, 1L).otherwise(0L))),
      mergeFold = Some(Fold((acc, x) =>
        coalesce(acc, lit(0L)) + coalesce(x, lit(0L)))),
      mergeAgg = Some(c => coalesce(sum(c), lit(0)).cast("bigint")),
      arrayAgg = Some(arr => coalesce(sum(size(filter(arr,
        x => x.isNotNull))), lit(0)).cast("bigint"))),
    Base("min", as => min(as.head),
      fold = Some(Fold((acc, x) => when(acc.isNull, x)
        .otherwise(when(x.isNull, acc).otherwise(least(acc, x))))),
      mergeAgg = Some(min),
      arrayAgg = Some(arr => min(array_min(arr)))),
    Base("max", as => max(as.head),
      fold = Some(Fold((acc, x) => when(acc.isNull, x)
        .otherwise(when(x.isNull, acc).otherwise(greatest(acc, x))))),
      mergeAgg = Some(max),
      arrayAgg = Some(arr => max(array_max(arr)))),
    Base("avg", as => avg(as.head)),
    Base("any", as => first(as.head, ignoreNulls = true),
      mergeAgg = Some(c => first(c, ignoreNulls = true))),
    Base("anyLast", as => last(as.head, ignoreNulls = true),
      mergeAgg = Some(c => last(c, ignoreNulls = true))),
    Base("uniq", as => count_distinct(as.head),
      arrayAgg = Some(arr =>
        size(array_distinct(flatten(collect_list(arr)))).cast("bigint"))),
    Base("uniqExact", as => count_distinct(as.head),
      arrayAgg = Some(arr =>
        size(array_distinct(flatten(collect_list(arr)))).cast("bigint"))),
    Base("groupArray", as => collect_list(as.head),
      mergeAgg = Some(c => flatten(collect_list(c))),
      arrayAgg = Some(arr => flatten(collect_list(arr)))),
    Base("groupUniqArray", as => array_sort(collect_set(as.head)),
      fold = Some(Fold((acc, x) => when(x.isNull, acc).otherwise(
        array_union(coalesce(acc, slice(array(x), 1, 0)), array(x))),
        acc => array_sort(acc),
        seedElem = x => slice(array(x), 1, 0))),
      mergeFold = Some(Fold((acc, x) => when(x.isNull, acc).otherwise(
        array_union(coalesce(acc, slice(x, 1, 0)), x)),
        acc => array_sort(acc),
        seedElem = x => slice(x, 1, 0))),
      mergeAgg = Some(c =>
        array_sort(array_distinct(flatten(collect_list(c))))),
      arrayAgg = Some(arr =>
        array_sort(array_distinct(flatten(collect_list(arr))))))
  ).map(b => b.name.toLowerCase -> b).toMap

  private sealed trait Comb
  private case object CIf extends Comb
  private case object CArray extends Comb
  private case object CForEach extends Comb
  private case object COrNull extends Comb
  private case object COrDefault extends Comb
  private case object CState extends Comb
  private case object CMerge extends Comb

  private val suffixes: Seq[(String, Comb)] = Seq(
    "OrDefault" -> COrDefault, "OrNull" -> COrNull, "ForEach" -> CForEach,
    "Array" -> CArray, "Merge" -> CMerge, "SimpleState" -> CState,
    "State" -> CState, "If" -> CIf)

  /** name → (base, chain innermost-first). */
  private def parse(name: String): Option[(Base, List[Comb])] = {
    bases.get(name.toLowerCase) match {
      case Some(b) => Some((b, Nil))
      case None =>
        suffixes.collectFirst {
          case (sfx, comb) if name.endsWith(sfx) && name.length > sfx.length =>
            parse(name.dropRight(sfx.length)).map { case (b, chain) =>
              (b, chain :+ comb)
            }
        }.flatten
    }
  }

  /** True when the chain exists AND has a representable shape. A plain
    * base name returns false — those keep their dedicated registrations. */
  def supports(name: String): Boolean = parse(name) match {
    case Some((b, chain)) if chain.nonEmpty =>
      val shape = chain.filter(c => c == CArray || c == CForEach ||
        c == CMerge)
      shape match {
        case Nil => true
        case CMerge :: Nil => b.mergeAgg.isDefined
        case CArray :: Nil => b.arrayAgg.isDefined
        case CArray :: CMerge :: Nil => b.arrayAgg.isDefined
        case CForEach :: Nil => b.fold.isDefined
        case CForEach :: CMerge :: Nil => b.fold.isDefined
        case CForEach :: CArray :: Nil => b.fold.isDefined
        case CForEach :: CMerge :: CArray :: Nil => b.fold.isDefined
        case _ => false
      }
    case _ => false
  }

  /** Build the aggregate Column for a combinator-chain call. */
  def build(name: String, args0: Seq[Column]): Column = {
    val (base, chain) = parse(name).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregate $name"))
    var args = args0
    // -If conditions sit after the value args, outermost last. An -If
    // INSIDE a -Merge (anyIfMerge) was already applied when the STATE
    // was built — the merge call takes only the state, no condition
    // (ref AggregateFunctionCombinatorIf: the combinator transforms the
    // nested function, so Merge(If(f)) has If's argument baked in).
    val mergeIdx = chain.indexOf(CMerge)
    val conds = scala.collection.mutable.ArrayBuffer.empty[Column]
    chain.zipWithIndex.reverse.foreach {
      case (CIf, idx) if mergeIdx < 0 || idx > mergeIdx =>
        conds += args.last; args = args.dropRight(1)
      case _ =>
    }
    // CH conditions are UInt8 0/1 — normalize to boolean
    // an -If INSIDE a -ForEach takes an ARRAY condition applied
    // elementwise (ref Combinator docs: combinators transform the
    // nested function, so inner If sees the per-position calls)
    val ifIdx = chain.indexOf(CIf)
    val feIdx = chain.indexOf(CForEach)
    val elementwiseIf = ifIdx >= 0 && feIdx > ifIdx && conds.nonEmpty
    val cond: Option[Column] =
      if (elementwiseIf) None
      else conds.map(_.cast("boolean")).reduceOption(_ && _)
    def mask(c: Column): Column = cond match {
      case Some(p) => when(p, c)
      case None => c
    }
    val masked =
      if (elementwiseIf)
        args.map(a => zip_with(a, conds.head,
          (x, c) => when(c.cast("boolean"), x)))
      else args.map(mask)
    val shape = chain.filter(c => c == CArray || c == CForEach ||
      c == CMerge)
    val result: Column = shape match {
      case Nil => base.rowAgg(masked)
      case CMerge :: Nil => base.mergeAgg.get(masked.head)
      case CArray :: Nil => base.arrayAgg.get(masked.head)
      // array of states, merged: same elements-into-aggregate shape
      case CArray :: CMerge :: Nil => base.arrayAgg.get(masked.head)
      case CForEach :: Nil =>
        foreachAgg(base, collect_list(masked.head))
      case CForEach :: CMerge :: Nil =>
        foreachAgg(base, collect_list(masked.head), merge = true)
      // -Array outside -ForEach: each ELEMENT (an array) is one
      // positional row
      case CForEach :: CArray :: Nil =>
        foreachAgg(base, flatten(collect_list(masked.head)))
      // rows hold ARRAYS of positional states: every element is one
      // state-row for the positional fold
      case CForEach :: CMerge :: CArray :: Nil =>
        foreachAgg(base, flatten(collect_list(masked.head)), merge = true)
      case other => throw new IllegalArgumentException(
        s"unsupported combinator shape $other in $name")
    }
    val withOrNull = if (chain.contains(COrNull)) {
      val contributed = masked.headOption match {
        case Some(v) => count(when(v.isNotNull, lit(1)))
        case None => count(when(cond.getOrElse(lit(true)), lit(1)))
      }
      when(contributed > 0, result)
    } else result
    // -OrDefault: an empty set yields the return type's default (0, '',
    // []) instead of NULL (ref AggregateFunctionOrFill.h kind=kDefault).
    // The default literal depends on the RESOLVED result type, so the
    // wrap is a RuntimeReplaceable that materializes at analysis time.
    if (chain.contains(COrDefault))
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        ChDefaultIfNull(org.apache.spark.sql.graftbridge.ColumnBridge
          .expression(withOrNull)))
    else withOrNull
  }

  /** Expression-level hook for dedicated registrations (sumIf). */
  def sumZeroFill(
      agg: org.apache.spark.sql.catalyst.expressions.Expression,
      probe: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ChSumZeroFill(agg, probe)

  /** Positional fold of `rows` (a collected ARRAY of row-arrays):
    * result[i] = base-fold over the i-th elements. zip_with pads the
    * shorter side with nulls, which the folds treat as absent, so the
    * seed can be the empty array and ragged rows work out. */
  private def foreachAgg(base: Base, rows: Column,
      merge: Boolean = false): Column = {
    val fold = (if (merge) base.foldForMerge else base.fold)
      .getOrElse(throw new IllegalArgumentException(
        s"-ForEach unsupported for ${base.name}"))
    // seed mirrors the FIRST row's positions; zip_with pads when later
    // rows are longer, and the step treats null accumulators as empty
    val seed = transform(get(rows, lit(0)), fold.seedElem)
    fold.finish(aggregate(rows, seed,
      (acc, row) => zip_with(acc, row, (a, x) => fold.step(a, x))))
  }
}

/** `coalesce(child, Literal.default(child.dataType))` where the default
  * literal can only be chosen once the child's type is resolved — the
  * -OrDefault combinator wrap (ref AggregateFunctionOrFill.h). Replacement
  * is a plain Coalesce, so codegen sees no custom expression.
  */
/** Conditional empty-set zero-fill for sum-family combinators: coalesce to
  * the type default only when the probe expression is CH-non-Nullable
  * (ref AggregateFunctionSum.h + AggregateFunctionNull wrap: a Nullable
  * input yields NULL when no non-NULL value was aggregated). The probe is
  * never evaluated; [[ChSumZeroFillRule]] rewrites this node during
  * RESOLUTION — it cannot be RuntimeReplaceable because the probe's bare
  * attributes would trip the MISSING_GROUP_BY analysis check before the
  * optimizer could drop them. Array-typed probes check ELEMENT
  * nullability (-Array form).
  */
case class ChSumZeroFill(
    agg: org.apache.spark.sql.catalyst.expressions.Expression,
    probe: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, Literal}
  override def children: Seq[Expression] = Seq(agg, probe)
  override def dataType: org.apache.spark.sql.types.DataType = agg.dataType
  override def nullable: Boolean = agg.nullable
  def resolvedForm: Expression = {
    val nonNullable = probe.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, containsNull) =>
        !containsNull && graft.plans.ChEmptyAggRule.chNonNullable(probe)
      case _ => graft.plans.ChEmptyAggRule.chNonNullable(probe)
    }
    if (nonNullable) Coalesce(Seq(agg, Literal.default(agg.dataType)))
    else agg
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ChSumZeroFill =
    copy(agg = cs(0), probe = cs(1))
}

/** Resolution rule: replace [[ChSumZeroFill]] with its decided form as
  * soon as both sides are resolved — before the analyzer's
  * aggregate-reference checks see the probe's bare attributes. */
object ChSumZeroFillRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case z: ChSumZeroFill if z.childrenResolved => z.resolvedForm
    }
}

case class ChDefaultIfNull(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {
  import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, Literal}
  override lazy val replacement: Expression =
    Coalesce(Seq(child, Literal.default(child.dataType)))
  override protected def withNewChildInternal(newChild: Expression)
      : ChDefaultIfNull = copy(child = newChild)
}
