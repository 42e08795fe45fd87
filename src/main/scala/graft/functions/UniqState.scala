package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-visible uniq sketch columns — the -State/-Merge contract for
  * approximate distinct counting.
  *
  * Reference: `uniqState`/`uniqMerge` over `ColumnAggregateFunction`
  * (`/root/reference/src/Columns/ColumnAggregateFunction.h:54`,
  * `src/AggregateFunctions/AggregateFunctionUniq.h`): a sketch is a real
  * column value that can be stored, shuffled, re-aggregated and finalized
  * later.
  *
  * Spark-first: the DataSketches HLL built-ins are exactly this surface —
  * `hll_sketch_agg` produces a binary sketch column, `hll_union_agg`
  * re-aggregates stored sketches, `hll_union` merges two sketch values
  * scalar-wise, `hll_sketch_estimate` finalizes. All codegen'd built-ins
  * with map-side partial aggregation; sketch size is O(2^lgK), constant
  * per group. (The exact-state twin is `Bitmap.GroupBitmapState`.)
  */
object UniqState {

  /** uniqState(x): binary HLL sketch aggregate (default lgK=12 ≈ ±1.6%). */
  def uniqState(c: Column): Column = hll_sketch_agg(c)
  def uniqState(c: Column, lgK: Int): Column = hll_sketch_agg(c, lit(lgK))

  /** uniqMerge(stateCol): merge stored sketches and finalize to a count —
    * CH's uniqMerge. */
  def uniqMerge(state: Column): Column =
    hll_sketch_estimate(hll_union_agg(state))

  /** uniqMergeState(stateCol): merge stored sketches keeping the sketch —
    * CH's -MergeState combinator. */
  def uniqMergeState(state: Column): Column = hll_union_agg(state)

  /** Scalar pairwise merge of two sketch values. */
  def uniqUnion(a: Column, b: Column): Column = hll_union(a, b)

  /** Finalize one sketch value to its estimate. */
  def uniqEstimate(state: Column): Column = hll_sketch_estimate(state)
}
