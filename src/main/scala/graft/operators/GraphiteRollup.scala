package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphiteMergeTree-style retention rollup (ref
  * `src/Processors/Merges/Algorithms/GraphiteRollupSortedAlgorithm.h`,
  * `src/Storages/MergeTree/registerStorageMergeTree.cpp` graphite config):
  * metrics older than an age threshold are re-bucketed to a coarser time
  * precision and aggregated — the classic tiered-downsampling model
  * (e.g. keep 1-minute points for a day, 5-minute for a week, 1-hour
  * after that).
  *
  * Spark-first shape: a single CASE-based bucket projection followed by
  * one hash aggregation — one shuffle on (series, bucket), fully
  * parallel, no windows. At 100 TB the groupBy keys are
  * (path, coarse time), so cardinality drops with every tier and the
  * map-side partial aggregation absorbs most of the input.
  *
  * @param retentions (ageSeconds, precisionSeconds) tiers, sorted by age
  *                   ascending; rows older than `age` (relative to `now`)
  *                   use that tier's precision. The first tier usually has
  *                   age 0 (the raw precision).
  */
object GraphiteRollup {

  /** Bucket a timestamp column to the precision of the tier its age
    * selects. Ages are evaluated coarsest-last, exactly like the
    * reference walks the retention list. */
  def bucketExpr(ts: Column, now: Column, retentions: Seq[(Long, Long)])
      : Column = {
    val age = unix_timestamp(now) - unix_timestamp(ts)
    val sorted = retentions.sortBy(_._1)
    // fold from the coarsest tier down: later (older) tiers win; the
    // bucket is epoch seconds (bigint) so both dialects compare exactly
    val epoch = unix_timestamp(ts)
    sorted.foldLeft(lit(null).cast("bigint")) { case (acc, (ageSec, prec)) =>
      when(age >= ageSec, epoch - pmod(epoch, lit(prec))).otherwise(acc)
    }
  }

  /** Roll up `df` per the retention config.
    *
    * @param pathCol  metric/series identifier column
    * @param timeCol  event-time column (timestamp)
    * @param valueCol metric value column
    * @param aggFn    "avg" | "sum" | "min" | "max" | "any" — the rollup
    *                 aggregation from the graphite pattern config
    * @param now      reference instant for age computation (pass a fixed
    *                 literal for deterministic tests)
    */
  def rollup(df: DataFrame, pathCol: String, timeCol: String,
      valueCol: String, retentions: Seq[(Long, Long)], aggFn: String,
      now: Column): DataFrame = {
    val v = col(valueCol)
    val agg: Column = aggFn match {
      case "avg" => avg(v)
      case "sum" => sum(v)
      case "min" => min(v)
      case "max" => max(v)
      case "any" => first(v)
      case other => throw new IllegalArgumentException(
        s"unsupported graphite rollup function $other")
    }
    df.withColumn("__bucket",
        bucketExpr(col(timeCol), now, retentions))
      .groupBy(col(pathCol), col("__bucket").as(timeCol))
      .agg(agg.as(valueCol))
  }
}
