package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Long-tail aggregate functions from the reference's registry (ref
  * src/AggregateFunctions/registerAggregateFunctions.cpp:20-94), expressed
  * as Column builders over Spark's built-in aggregates and higher-order
  * array functions — no UDAF state, so every one of these stays inside
  * whole-stage codegen and partial (map-side) aggregation where the
  * underlying collect permits.
  *
  * Scale notes: sumCount/singleValueOrNull/anyHeavy/boundingRatio compose
  * plain distributive aggregates (one shuffle, partial agg on the map
  * side). intervalLengthSum/maxIntersections collect the group's interval
  * endpoints into an array and fold it — linear in group size, the same
  * memory shape as the reference's PODArray state; fine for the
  * event-per-entity groups they're meant for, same caveat as CH's own
  * 0xFFFFFF-element cap (AggregateFunctionIntervalLengthSum.h:37).
  */
object NicheAggs {

  /** sumCount(x) → tuple (sum, count) in one pass (ref
    * AggregateFunctionSumCount.h). Count counts non-NULL rows, matching
    * the Null-combinator wrap CH applies to Nullable input. */
  def sumCount(x: Column): Column =
    struct(sum(x).as("sum"), count(x).as("count"))

  /** singleValueOrNull(x): the value if exactly one distinct non-NULL
    * value was seen, else NULL (ref AggregateFunctionMinMaxAny.h
    * AggregateFunctionSingleValueOrNullData::changeIfBetter). */
  def singleValueOrNull(x: Column): Column =
    when(count_distinct(x) === 1, first(x, ignoreNulls = true))

  /** anyHeavy(x): the heavy-hitter value (ref AggregateFunctionMinMaxAny.h
    * AggregateFunctionAnyHeavyData — Boyer-Moore majority vote). The
    * reference guarantees the majority element only when one exists
    * (frequency > 50%); otherwise the result is arbitrary. The exact mode
    * is the deterministic superset of that contract. */
  def anyHeavy(x: Column): Column = mode(x)

  /** boundingRatio(x, y): slope between the leftmost and rightmost points,
    * (y@max(x) − y@min(x)) / (max(x) − min(x)) (ref
    * AggregateFunctionBoundingRatio.h getBoundingRatio). */
  def boundingRatio(x: Column, y: Column): Column = {
    val den = max(x).cast("double") - min(x).cast("double")
    val num = max_by(y, x).cast("double") - min_by(y, x).cast("double")
    // single point → 0/0 = nan (ref getBoundingRatio's plain double
    // division; Spark's Divide yields NULL on zero, so pin it)
    when(den === 0.0, lit(Double.NaN)).otherwise(num / den)
  }

  /** intervalLengthSum(begin, end): total length of the union of the
    * group's intervals (overlaps merged). Reversed intervals count by
    * absolute length; zero-length intervals are skipped (ref
    * AggregateFunctionIntervalLengthSum.h Data::add). Result is DOUBLE;
    * callers on integral inputs cast to bigint to mirror the reference's
    * UInt64 return tier. */
  def intervalLengthSum(begin: Column, end: Column): Column = {
    val seg = when(begin =!= end,
      struct(least(begin, end).cast("double").as("b"),
        greatest(begin, end).cast("double").as("e")))
    // sorted segments, then one linear sweep: acc.cur = rightmost covered
    // point so far, contribution = part of [b,e] past acc.cur
    val sorted = array_sort(collect_list(seg))
    aggregate(sorted,
      struct(lit(0.0).as("total"), lit(Double.MinValue).as("cur")),
      (acc, s) => struct(
        (acc.getField("total") +
          greatest(s.getField("e") -
            greatest(s.getField("b"), acc.getField("cur")), lit(0.0)))
          .as("total"),
        greatest(acc.getField("cur"), s.getField("e")).as("cur")),
      acc => acc.getField("total"))
  }

  /** maxIntersections(begin, end): maximum number of simultaneously
    * overlapping intervals. Endpoint sweep sorted by (position, weight) —
    * an end (−1) sorts before a begin (+1) at the same position, so
    * touching intervals do not intersect (ref
    * AggregateFunctionMaxIntersections.h insertResultInto). */
  def maxIntersections(begin: Column, end: Column): Column =
    sweep(begin, end).getField("mx").cast("bigint")

  /** maxIntersectionsPosition: the position where [[maxIntersections]]
    * first reaches its maximum (strict-improvement scan, so the FIRST
    * position attaining the max wins). */
  def maxIntersectionsPosition(begin: Column, end: Column): Column =
    sweep(begin, end).getField("pos")

  /** groupArrayInsertAt([default[, length]])(x, pos): array with x at
    * position pos (0-based), gaps filled with the type default or the
    * given default, optionally padded/truncated to a fixed length (ref
    * AggregateFunctionGroupArrayInsertAt.h). */
  def groupArrayInsertAt(x: Column, pos: Column, dflt: Option[Column],
      len: Option[Column]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val pairs = collect_list(struct(pos.cast("int").as("p"), x.as("v")))
    val maxN = coalesce(
      array_max(transform(pairs, s => s.getField("p"))) + 1, lit(0))
    val n = len.map(_.cast("int")).getOrElse(maxN)
    val filled = transform(sequence(lit(0), n - 1, lit(1)), i => {
      val hits = transform(filter(pairs, s => s.getField("p") === i),
        s => s.getField("v"))
      dflt match {
        case Some(d) => coalesce(get(hits, lit(0)), d)
        // no default given: the element type's default — chElementAt's
        // out-of-range value, type-default-coalesced for Spark-nullable
        // element columns (CH strings default to '', not NULL)
        case None => ColumnBridge.column(ChDefaultIfNull(ChElementAt(
          ColumnBridge.expression(hits),
          org.apache.spark.sql.catalyst.expressions.Literal(1))))
      }
    })
    when(n > 0, filled).otherwise(slice(transform(pairs,
      s => s.getField("v")), 1, 0))
  }

  /** groupArrayLast(n)(x): ring buffer of the last n values in the
    * reference's RAW slot order — slot j holds the latest element whose
    * 0-based insert index ≡ j (mod n), so [1..10] into n=3 reads
    * [10,8,9], not chronological (ref AggregateFunctionGroupArray.h
    * GroupArrayGeneralData last semantics; 02520_group_array_last). */
  def groupArrayLast(x: Column, n0: Column): Column =
    lastRing(collect_list(x), n0)

  /** -Array twin: elements of all row arrays feed the same ring. */
  def groupArrayLastArray(arr: Column, n0: Column): Column =
    lastRing(flatten(collect_list(arr)), n0)

  private def lastRing(lst: Column, n0: Column): Column = {
    val n = n0.cast("int")
    val m = size(lst)
    when(m <= n, lst).otherwise(
      transform(sequence(lit(0), n - 1, lit(1)), j =>
        get(lst, m - 1 - ((m - 1 - j) % n))))
  }

  /** categoricalInformationValue(cat1, …, catN, tag): per-category
    * information value (ref AggregateFunctionCategoricalIV.h):
    * IV[i] = (a/A − b/B)·(ln(a/A) − ln(b/B)) with a = rows where cat_i≠0
    * ∧ tag≠0, b = rows where cat_i≠0 ∧ tag=0, A/B the tag totals. Rows
    * with any NULL argument are skipped (Null-combinator wrap); float
    * division reproduces the reference's nan/inf edge values. */
  def categoricalIV(cats: Seq[Column], tag: Column): Column = {
    val valid = (cats :+ tag).map(_.isNotNull).reduce(_ && _)
    val tagSet = tag.cast("double") =!= 0.0
    def cnt(p: Column): Column =
      coalesce(sum(when(valid && p, 1.0)), lit(0.0))
    val totalTag = cnt(tagSet)
    val totalNoTag = cnt(!tagSet)
    // Spark's `/` and `log` return NULL on zero/non-positive input; the
    // reference computes in IEEE floats (0/0 = nan, ln(0) = -inf), so
    // spell the edge values out
    def ieeeDiv(n: Column, d: Column): Column =
      when(d =!= 0.0, n / d)
        .otherwise(when(n === 0.0, lit(Double.NaN))
          .otherwise(lit(Double.PositiveInfinity)))
    def ieeeLn(c: Column): Column =
      when(c.isNaN, lit(Double.NaN))
        .when(c > 0.0, log(c))
        .when(c === 0.0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    val ivs = cats.map { c =>
      val in = c.cast("double") =!= 0.0
      val a = ieeeDiv(cnt(in && tagSet), totalTag)
      val b = ieeeDiv(cnt(in && !tagSet), totalNoTag)
      (a - b) * (ieeeLn(a) - ieeeLn(b))
    }
    // the empty set still yields the array — 0/0 division produces the
    // reference's [nan] (01043_categorical_iv arrayPopBack case)
    array(ivs: _*)
  }

  private def sweep(begin: Column, end: Column): Column = {
    val pts = flatten(collect_list(array(
      struct(begin.cast("double").as("p"), lit(1).as("d")),
      struct(end.cast("double").as("p"), lit(-1).as("d")))))
    aggregate(array_sort(pts),
      struct(lit(0L).as("cur"), lit(0L).as("mx"),
        lit(null).cast("double").as("pos")),
      (acc, s) => {
        val cur = acc.getField("cur") + s.getField("d")
        struct(cur.as("cur"),
          greatest(acc.getField("mx"), cur).as("mx"),
          when(cur > acc.getField("mx"), s.getField("p"))
            .otherwise(acc.getField("pos")).as("pos"))
      })
  }
}
