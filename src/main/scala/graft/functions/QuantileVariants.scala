package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** bfloat16 truncation: the most significant 16 bits of the Float32
  * representation, re-expanded to Float32 (ref
  * AggregateFunctions/QuantileBFloat16Histogram.h toBFloat16/toFloat32).
  */
case class ChBFloat16(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = FloatType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val f = input match {
      case d: java.lang.Double => d.floatValue()
      case f0: java.lang.Float => f0.floatValue()
      case d: org.apache.spark.sql.types.Decimal => d.toFloat
      case n: Number => n.floatValue()
    }
    java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(
      java.lang.Float.floatToRawIntBits(f) & 0xFFFF0000))
  }
  override protected def withNewChildInternal(c: Expression): ChBFloat16 =
    copy(child = c)
}

/** The reference's long-tail quantile variants as Column formulations over
  * a per-group collected list — the golden-scale shape; the sketch tier at
  * 100 TB stays quantileTDigest/percentile_approx (SCALE.md). Semantics are
  * pinned to the reference implementations cited per function.
  */
object QuantileVariants {

  /** First `v` of the (v-sorted) pair list whose running weight sum
    * reaches `threshold`; last element if none does (ref
    * QuantileExactWeighted.h get: `accumulated >= threshold`, `--it` at
    * end). `lst` is array<struct<v,w>> sorted by v.
    */
  private def pickAtCum(lst: Column, threshold: Column): Column = {
    // The threshold expression typically contains its own O(n) aggregate
    // over `lst` (e.g. ceil(W·level)), so it MUST ride in the fold's zero
    // — evaluated once per group. Embedded in the lambda body it would be
    // re-evaluated per element: O(n²) per group (observed as a wedged
    // 20k-row group). Same for the typed-NULL element: inside the lambda
    // it is derived from `e`, not from a slice of `lst`.
    val folded = aggregate(lst,
      struct(threshold.as("t"), lit(0.0).as("c"),
        get(slice(lst, 1, 0), lit(0)).as("s")),
      (acc, e) => when(acc.getField("s").isNotNull, acc).otherwise {
        val c2 = acc.getField("c") + e.getField("w")
        val t = acc.getField("t")
        val nullElem = when(lit(false), e)
        when(c2 >= t, struct(t.as("t"), c2.as("c"), e.as("s")))
          .otherwise(struct(t.as("t"), c2.as("c"), nullElem.as("s")))
      })
    coalesce(folded.getField("s"), element_at(lst, -1)).getField("v")
  }

  private def pairs(x: Column, w: Column): Column =
    sort_array(collect_list(struct(x.as("v"), w.cast("double").as("w"))))

  /** quantileExactLow / quantileExactHigh (ref QuantileExact.h
    * QuantileExactLow/High getImpl): Python statistics.median_low/high at
    * level 0.5; elems[floor(level·n)] otherwise. Returns the input type.
    */
  def exactLowHigh(x: Column, p: Column, high: Boolean): Column = {
    val lst = sort_array(collect_list(x))
    val s = size(lst)
    val half =
      if (high) floor(s / 2)
      else when(s % 2 === 1, floor(s / 2)).otherwise(floor(s / 2) - 1)
    val n = when(p === 0.5, half)
      .otherwise(when(p < 1, floor(p * s)).otherwise((s - 1).cast("double")))
    when(s === 0, lit(null)).otherwise(element_at(lst, n.cast("int") + 1))
  }

  /** quantileExactInclusive (R-7 / Excel PERCENTILE.INC) and
    * quantileExactExclusive (R-6 / PERCENTILE.EXC), ref QuantileExact.h:
    * h = level·(n−1)+1 or level·(n+1); trunc to n; clamp to min/max;
    * linear interpolation between adjacent order statistics. Float64.
    */
  def exactInterp(x: Column, p0: Column, exclusive: Boolean): Column = {
    // SQL literals parse as exact decimals; the reference computes levels
    // in Float64 (h = level·(n±1) association pins the printed digits)
    val p = p0.cast("double")
    val lst = sort_array(collect_list(x.cast("double")))
    val s = size(lst)
    val h = if (exclusive) p * (s + 1) else p * (s - 1) + 1
    val n = floor(h)
    val ni = n.cast("int")
    when(s === 0, lit(null))
      .when(n >= s.cast("double"), element_at(lst, s))
      .when(n < 1, element_at(lst, 1))
      .otherwise(element_at(lst, ni) +
        (h - n) * (element_at(lst, ni + 1) - element_at(lst, ni)))
  }

  /** quantileExactWeighted (ref QuantileExactWeighted.h get): value-sorted
    * histogram walk — first value whose cumulative weight reaches
    * ceil(level·W). Discrete: returns an actual input value, no
    * interpolation. */
  def exactWeighted(x: Column, w: Column, p: Column): Column = {
    val lst = pairs(x, w)
    val total = aggregate(lst, lit(0.0), (a, e) => a + e.getField("w"))
    when(size(lst) === 0, lit(null))
      .otherwise(pickAtCum(lst, ceil(total * p)))
  }

  /** quantileInterpolatedWeighted (ref QuantileInterpolatedWeighted.h):
    * per-distinct-value weights, cumulative-distribution points
    * x_i = (cum_i − w_i/2)/W, linear interpolation with flat ends. The
    * O(d²) distinct-value scan is the golden-scale shape; huge groups
    * pre-aggregate (value → weight) before this runs. */
  def interpolatedWeighted(x: Column, w: Column, p0: Column): Column = {
    val p = p0.cast("double")
    val pl = collect_list(struct(x.cast("double").as("v"),
      w.cast("double").as("w")))
    val ds = array_sort(array_distinct(transform(pl, e => e.getField("v"))))
    val total = aggregate(pl, lit(0.0), (a, e) => a + e.getField("w"))
    // One ascending walk over the distinct values, interpolating on the
    // fly: cum weight → x_i = (cum − w_i/2)/W; p in (x_{i−1}, x_i] →
    // interpolate between the two points, p below x_0 / above x_last →
    // flat ends. x_i is strictly increasing (w_i > 0), so this matches
    // the reference's binary search + size−2 shortcut. Scalars (p, W)
    // ride in the fold's ZERO — referencing a derived array or fold
    // inside the lambda would re-evaluate it per element (O(n²)); `pl`
    // references inside the lambda are plain aggregate-result attribute
    // reads, so the per-value weight lookup stays O(n) per element.
    val nd = lit(null).cast("double")
    val folded = aggregate(ds,
      struct(p.as("p"), total.as("tw"), lit(0.0).as("cum"),
        nd.as("xp"), nd.as("yp"), nd.as("res")),
      (acc, v) => {
        val wi = aggregate(filter(pl, e => e.getField("v") === v),
          lit(0.0), (a, e) => a + e.getField("w"))
        val cum2 = acc.getField("cum") + wi
        val xi = (cum2 - wi * 0.5) / acc.getField("tw")
        val pp = acc.getField("p")
        val res0 = acc.getField("res")
        val xp = acc.getField("xp")
        val yp = acc.getField("yp")
        val res = when(res0.isNotNull, res0)
          .when(pp <= xi,
            when(xp.isNull || pp <= xp, v)
              .otherwise(yp + (v - yp) * (pp - xp) / (xi - xp)))
          .otherwise(nd)
        struct(pp.as("p"), acc.getField("tw").as("tw"), cum2.as("cum"),
          xi.as("xp"), v.as("yp"), res.as("res"))
      })
    // p above the last distribution point: flat end at the last value
    coalesce(folded.getField("res"), folded.getField("yp"))
  }

  /** quantileTimingWeighted (ref QuantileTiming.h medium-state get over
    * weighted inserts): value discretization as quantileTiming (exact
    * below 1024, 16-wide buckets to 30000, clamped above), element at
    * rank floor(level·N) of the weight-expanded multiset, NaN when all
    * weights are zero. Float64 (the empty case must carry nan). */
  def timingWeighted(x: Column, w: Column, p: Column): Column = {
    val bucket = when(x > 30000, lit(30000L))
      .when(x < 1024, floor(x))
      .otherwise(lit(1024L) + floor((x - 1024) / 16) * 16)
    val lst = filter(pairs(bucket, w), e => e.getField("w") > 0)
    val total = aggregate(lst, lit(0.0), (a, e) => a + e.getField("w"))
    val rank = when(p < 1, floor(p * total) + 1).otherwise(total)
    when(size(lst) === 0, lit(Double.NaN))
      .otherwise(pickAtCum(lst, rank).cast("double"))
  }

  /** quantileBFloat16(Weighted) (ref QuantileBFloat16Histogram.h):
    * histogram over bfloat16-truncated values, first bucket whose
    * cumulative weight reaches ceil(level·W); NaN inputs skipped, NaN on
    * empty. Float64. */
  def bfloat16(x: Column, w: Column, p: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => CC, expression => EE}
    val xb = CC(ChBFloat16(EE(x.cast("double"))))
    val lst = filter(pairs(xb, w), e => !isnan(e.getField("v")))
    val total = aggregate(lst, lit(0.0), (a, e) => a + e.getField("w"))
    when(size(lst) === 0, lit(Double.NaN))
      .otherwise(pickAtCum(lst, ceil(total * p)).cast("double"))
  }

  /** quantileBFloat16 over an ARRAY argument (the arrayReduce path, ref
    * src/Functions/array/arrayReduce.cpp): same histogram walk, unit
    * weights. */
  def bfloat16Arr(arr: Column, p: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => CC, expression => EE}
    val lst = sort_array(transform(
      filter(arr, v => !isnan(v.cast("double"))),
      v => struct(CC(ChBFloat16(EE((v.cast("double"))))).as("v"),
        lit(1.0).as("w"))))
    val total = size(lst).cast("double")
    when(size(lst) === 0, lit(Double.NaN))
      .otherwise(pickAtCum(lst, ceil(total * p.cast("double"))).cast("double"))
  }
}
