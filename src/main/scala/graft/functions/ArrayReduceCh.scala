package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** arrayReduce('agg', arr…): apply an aggregate-function NAME to array
  * contents (ref src/Functions/array/arrayReduce.cpp). Re-expressed as
  * pure Column compositions over the array (no real aggregation node —
  * the reduction is row-local). Covers the scalar aggs, the two-array
  * forms (simpleLinearRegression, sumMap), and the parametric -Resample
  * combinator (ref AggregateFunctionResample.h: bucket i holds keys in
  * [start + i*step, start + (i+1)*step) ∩ [start, end)).
  */
object ArrayReduceCh {

  private val Resample = """(\w+)Resample\(\s*(-?\d+)\s*,\s*(-?\d+)\s*,\s*(-?\d+)\s*\)""".r
  private val UpTo = """uniqUpTo\(\s*(\d+)\s*\)""".r

  def build(name: String, arrs: Seq[Column]): Column = name.trim match {
    case Resample(base, s, e, st) =>
      resample(base, s.toLong, e.toLong, st.toLong, arrs)
    case "sum" => dsum(arrs.head)
    case "min" => array_min(arrs.head)
    case "max" => array_max(arrs.head)
    case "count" => size(arrs.head).cast("bigint")
    case "avg" => dsum(arrs.head) / size(arrs.head)
    case "any" => get(arrs.head, lit(0))
    case "anyLast" => get(arrs.head, size(arrs.head) - 1)
    case "uniq" | "uniqExact" =>
      size(array_distinct(arrs.head)).cast("bigint")
    case "groupArray" | "groupArrayState" | "quantileState" |
         "quantilesState" | "medianState" => arrs.head
    case "uniqState" | "uniqExactState" | "groupUniqArrayState" =>
      array_sort(array_distinct(arrs.head))
    case "sumState" => dsum(arrs.head)
    case "minState" => array_min(arrs.head)
    case "maxState" => array_max(arrs.head)
    case "avgState" =>
      struct(dsum(arrs.head).as("s"), size(arrs.head).cast("bigint").as("c"))
    case "groupUniqArray" => array_distinct(arrs.head)
    case UpTo(k) =>
      // uniqUpTo(K): exact distinct up to K, K+1 past it (ref
      // AggregateFunctionUniqUpTo.h)
      least(size(array_distinct(arrs.head)).cast("bigint"),
        lit(k.toLong + 1))
    case "quantileBFloat16" | "medianBFloat16" =>
      QuantileVariants.bfloat16Arr(arrs.head, lit(0.5))
    case "simpleLinearRegression" => simpleLinReg(arrs(0), arrs(1))
    case "sumMap" => sumMap(arrs(0), arrs(1))
    case other =>
      throw new IllegalArgumentException(s"arrayReduce: unsupported $other")
  }

  private def dsum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** OLS fit over paired arrays → tuple(k, b); degenerate inputs give
    * (nan, nan) through IEEE double arithmetic, matching the reference
    * (ref AggregateFunctionSimpleLinearRegression.h). */
  private def simpleLinReg(xs: Column, ys: Column): Column = {
    val n = size(xs).cast("double")
    val sx = dsum(xs); val sy = dsum(ys)
    val sxy = dsum(zip_with(xs, ys, (a, b) =>
      a.cast("double") * b.cast("double")))
    val sxx = dsum(zip_with(xs, xs, (a, b) =>
      a.cast("double") * b.cast("double")))
    val k = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b = (sy - k * sx) / n
    struct(k.as("k"), b.as("b"))
  }

  /** sumMap over array-of-arrays key/value pairs: flatten, group by key,
    * sum; sorted-key tuple-of-arrays output (ref
    * AggregateFunctionSumMap.h). O(distinct·n) per row — row-local. */
  private def sumMap(ks: Column, vs: Column): Column = {
    val fk = flatten(ks); val fv = flatten(vs)
    val dk = array_sort(array_distinct(fk))
    val pairs = zip_with(fk, fv, (a, b) => struct(a.as("k"), b.as("v")))
    struct(dk.as("k"),
      transform(dk, key => aggregate(pairs, lit(0L), (acc, p) =>
        acc + when(p.getField("k") <=> key,
          p.getField("v").cast("bigint")).otherwise(lit(0L)))).as("v"))
  }

  private def resample(base: String, start: Long, end: Long, step: Long,
      arrs: Seq[Column]): Column = {
    require(step > 0 && end > start, s"Resample($start,$end,$step)")
    val nBuckets = ((end - start) + step - 1) / step
    require(nBuckets <= 1024, s"Resample: $nBuckets buckets")
    val vals = arrs(0); val keys = arrs(1)
    val pairs = zip_with(vals, keys, (v, k) =>
      struct(v.as("v"), k.cast("long").as("k")))
    def bucket(i: Long): Column = {
      val lo = start + i * step
      val hi = math.min(lo + step, end)
      transform(filter(pairs, p =>
        p.getField("k") >= lit(lo) && p.getField("k") < lit(hi)),
        p => p.getField("v"))
    }
    val per = (0L until nBuckets).map { i =>
      val b = bucket(i)
      base match {
        case "sum" => dsum(b)
        case "min" => array_min(b)
        case "max" => array_max(b)
        case "count" => size(b).cast("bigint")
        case "avg" => dsum(b) / size(b)
        case "uniq" | "uniqExact" => size(array_distinct(b)).cast("bigint")
        case "groupArray" => b
        case "stddevPop" =>
          // CH moment formula: (Σx² − (Σx)²/n)/n — NOT avg-of-squares;
          // the FP rounding differs in the last digits (ref
          // AggregateFunctionsStatisticsSimple VarMoments::getPopulation)
          val n = size(b).cast("double")
          val s1 = dsum(b)
          val s2 = dsum(transform(b, x =>
            x.cast("double") * x.cast("double")))
          sqrt((s2 - s1 * s1 / n) / n)
        case other => throw new IllegalArgumentException(
          s"arrayReduce: unsupported ${other}Resample")
      }
    }
    array(per: _*)
  }
}
