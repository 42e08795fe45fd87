package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregate-function combinators -OrDefault/-OrNull (ref
  * `/root/reference/src/AggregateFunctions/AggregateFunctionOrFill.h` —
  * the "OrFill" template backs both names) and -Resample
  * (`AggregateFunctionResample.h`).
  *
  * Spark-first: -OrDefault is a coalesce over the aggregate; -Resample is
  * a static array of conditionally-filtered aggregates, one per bucket —
  * all codegen'd built-ins, one aggregation pass (Spark evaluates the N
  * bucket aggregates in the same HashAggregate), no custom state.
  */
object Combinators {

  /** aggOrDefault: the default value when the aggregate saw no rows. */
  def orDefault(agg: Column, default: Column): Column = coalesce(agg, default)

  /** countOrNull-style: null instead of 0 when nothing matched. */
  def countOrNull(cond: Column): Column = {
    val c = count(when(cond, lit(1)))
    when(c === 0, lit(null)).otherwise(c)
  }

  /** aggResample(start, end, step)(key): one aggregate per key bucket
    * [start+i·step, start+(i+1)·step), returned as an array. `mk` receives
    * the bucket membership condition and builds the bucketed aggregate
    * (e.g. `c => sum(when(c, value))`). Bucket bounds are literals,
    * matching CH's constant-parameter contract. */
  def resample(key: Column, start: Long, end: Long, step: Long)(
      mk: Column => Column): Column = {
    require(step > 0 && end > start, "resample needs step > 0, end > start")
    val buckets = (start until end by step).map { b =>
      mk(key >= b && key < math.min(b + step, end))
    }
    array(buckets: _*)
  }
}
