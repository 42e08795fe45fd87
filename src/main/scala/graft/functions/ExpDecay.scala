package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially time-decayed window aggregates + nonNegativeDerivative.
  *
  * Reference: `exponentialTimeDecayed{Sum,Count,Avg,Max}` and
  * `nonNegativeDerivative`
  * (`/root/reference/src/Processors/Transforms/WindowTransform.cpp:1597-2537`):
  * over the window frame ending at the current row,
  * `result = Σ_i exp((t_i − t_curr)/decay) · v_i` (count: v_i = 1;
  * avg: decayed sum / decayed count; max: max of the decayed terms).
  *
  * Spark-first formulation: rebase times to the partition minimum and use
  * the prefix-scan identity
  * `Σ exp((t_i − t_c)/λ)·v_i = exp(−(t_c−b)/λ) · Σ exp((t_i−b)/λ)·v_i`,
  * so each function is a plain codegen'd `sum`/`max` over a running
  * window — incremental, no custom aggregate, scales like any built-in
  * windowed sum. Numerical bound: the rebased exponent is
  * (partition time span)/λ, so spans must stay under ~700·λ (double
  * overflow at exp(709)); CH has the same granularity assumption in
  * monitoring workloads where λ tracks the query horizon.
  *
  * All time arguments are numeric seconds (cast timestamps with
  * `unix_micros(ts)/1e6` for sub-second precision).
  */
object ExpDecay {

  private def frames(partitionBy: Seq[Column], orderBy: Seq[Column]) = {
    val wPart = Window.partitionBy(partitionBy: _*)
    val wRun = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (wPart, wRun)
  }

  /** exponentialTimeDecayedSum(decay)(value, time) over a running frame. */
  def decayedSum(value: Column, timeSec: Column, decay: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val (wPart, wRun) = frames(partitionBy, orderBy)
    val rel = timeSec - min(timeSec).over(wPart)
    sum(value * exp(rel / decay)).over(wRun) * exp(-rel / decay)
  }

  /** exponentialTimeDecayedCount(decay)(time). */
  def decayedCount(timeSec: Column, decay: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    decayedSum(lit(1.0), timeSec, decay, partitionBy, orderBy)

  /** exponentialTimeDecayedAvg(decay)(value, time). */
  def decayedAvg(value: Column, timeSec: Column, decay: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    decayedSum(value, timeSec, decay, partitionBy, orderBy) /
      decayedCount(timeSec, decay, partitionBy, orderBy)

  /** exponentialTimeDecayedMax(decay)(value, time): max of decayed terms
    * (positive rescaling preserves the argmax, so the same rebasing
    * applies). */
  def decayedMax(value: Column, timeSec: Column, decay: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val (wPart, wRun) = frames(partitionBy, orderBy)
    val rel = timeSec - min(timeSec).over(wPart)
    max(value * exp(rel / decay)).over(wRun) * exp(-rel / decay)
  }

  /** nonNegativeDerivative(metric, time[, interval]): rate of change per
    * `intervalSec`, clamped at 0; 0 on the first partition row and on
    * non-increasing time (ref WindowTransform.cpp:2509-2537). */
  def nonNegativeDerivative(metric: Column, timeSec: Column,
      intervalSec: Double, partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val dv = metric - lag(metric, 1).over(w)
    val dt = timeSec - lag(timeSec, 1).over(w)
    when(dv.isNull || dt.isNull || dt <= 0, lit(0.0))
      .otherwise(greatest(dv / dt * intervalSec, lit(0.0)))
  }
}
