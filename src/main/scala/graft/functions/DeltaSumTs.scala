package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** deltaSumTimestamp (ref AggregateFunctionDeltaSumTimestamp.h): sum of
  * positive deltas in ARRIVAL order, with a timestamp-ordered state merge
  * — partial states carry (sum, first, first_ts, last, last_ts) so two
  * shards whose ts ranges do not interleave combine exactly like the
  * reference (cross-boundary delta added when the later shard's first
  * value exceeds the earlier's last). This is the real partial-aggregation
  * contract, not the value-as-state simplification, because the merge is
  * what the -State/-Merge golden exercises.
  */
case class DeltaTsBuf(sum: Double, first: Double, firstTs: Long,
    last: Double, lastTs: Long, seen: Boolean)

object DeltaSumTs {
  def empty: DeltaTsBuf = DeltaTsBuf(0, 0, 0, 0, 0, seen = false)

  def addRow(b: DeltaTsBuf, value: Double, ts: Long): DeltaTsBuf = {
    val sum = if (b.seen && b.last < value) b.sum + (value - b.last) else b.sum
    if (!b.seen) DeltaTsBuf(sum, value, ts, value, ts, seen = true)
    else DeltaTsBuf(sum, b.first, b.firstTs, value, ts, seen = true)
  }

  private def before(l: DeltaTsBuf, r: DeltaTsBuf): Boolean =
    l.lastTs < r.firstTs ||
      (l.lastTs == r.firstTs && (l.lastTs < r.lastTs || l.firstTs < r.firstTs))

  def mergeBuf(a: DeltaTsBuf, b: DeltaTsBuf): DeltaTsBuf = {
    if (!a.seen) return b
    if (!b.seen) return a
    if (before(a, b)) {
      val cross = if (b.first > a.last) b.first - a.last else 0.0
      DeltaTsBuf(a.sum + cross + b.sum, a.first, a.firstTs,
        b.last, b.lastTs, seen = true)
    } else if (before(b, a)) {
      val cross = if (a.first > b.last) a.first - b.last else 0.0
      DeltaTsBuf(a.sum + cross + b.sum, b.first, b.firstTs,
        a.last, a.lastTs, seen = true)
    } else {
      // all timestamps equal: deterministic pick (ref merge tail)
      if (a.first < b.first)
        DeltaTsBuf(a.sum + b.sum, b.first, a.firstTs, b.last, a.lastTs,
          seen = true)
      else DeltaTsBuf(a.sum + b.sum, a.first, a.firstTs, a.last, a.lastTs,
        seen = true)
    }
  }
}

class DeltaSumTsAgg extends Aggregator[(Double, Long), DeltaTsBuf, Double] {
  override def zero: DeltaTsBuf = DeltaSumTs.empty
  override def reduce(b: DeltaTsBuf, x: (Double, Long)): DeltaTsBuf =
    DeltaSumTs.addRow(b, x._1, x._2)
  override def merge(a: DeltaTsBuf, b: DeltaTsBuf): DeltaTsBuf =
    DeltaSumTs.mergeBuf(a, b)
  override def finish(b: DeltaTsBuf): Double = b.sum
  override def bufferEncoder: org.apache.spark.sql.Encoder[DeltaTsBuf] =
    ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}

/** -State form: the finalized value IS the state struct. */
class DeltaSumTsStateAgg
    extends Aggregator[(Double, Long), DeltaTsBuf, DeltaTsBuf] {
  override def zero: DeltaTsBuf = DeltaSumTs.empty
  override def reduce(b: DeltaTsBuf, x: (Double, Long)): DeltaTsBuf =
    DeltaSumTs.addRow(b, x._1, x._2)
  override def merge(a: DeltaTsBuf, b: DeltaTsBuf): DeltaTsBuf =
    DeltaSumTs.mergeBuf(a, b)
  override def finish(b: DeltaTsBuf): DeltaTsBuf = b
  override def bufferEncoder: org.apache.spark.sql.Encoder[DeltaTsBuf] =
    ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[DeltaTsBuf] =
    ExpressionEncoder()
}

/** -Merge form: re-aggregate state structs. */
class DeltaSumTsMergeAgg extends Aggregator[DeltaTsBuf, DeltaTsBuf, Double] {
  override def zero: DeltaTsBuf = DeltaSumTs.empty
  override def reduce(b: DeltaTsBuf, s: DeltaTsBuf): DeltaTsBuf =
    DeltaSumTs.mergeBuf(b, s)
  override def merge(a: DeltaTsBuf, b: DeltaTsBuf): DeltaTsBuf =
    DeltaSumTs.mergeBuf(a, b)
  override def finish(b: DeltaTsBuf): Double = b.sum
  override def bufferEncoder: org.apache.spark.sql.Encoder[DeltaTsBuf] =
    ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}

/** exponentialMovingAverage(half_decay)(value, time) (ref
  * Common/ExponentiallySmoothedCounter.h): state is one (value, time)
  * pair in the exponential coordinate system; merging remaps the older
  * state to the newer reference time, so partial aggregation is exact up
  * to float associativity. finish divides by the closed-form weight sum
  * 1/(1-2^(-1/h)). */
class EmaAgg(halfDecay: Double)
    extends Aggregator[(Double, Double), (Double, Double), Double] {
  private def scale(dt: Double): Double = math.pow(2.0, -dt / halfDecay)
  private def merge2(a: (Double, Double), b: (Double, Double)) = {
    if (a._2 > b._2) (a._1 + b._1 * scale(a._2 - b._2), a._2)
    else if (a._2 < b._2) (b._1 + a._1 * scale(b._2 - a._2), b._2)
    else (a._1 + b._1, a._2)
  }
  override def zero: (Double, Double) = (0.0, Double.NegativeInfinity)
  override def reduce(b: (Double, Double), x: (Double, Double)) =
    if (b._2 == Double.NegativeInfinity) x else merge2(b, x)
  override def merge(a: (Double, Double), b: (Double, Double)) =
    if (a._2 == Double.NegativeInfinity) b
    else if (b._2 == Double.NegativeInfinity) a
    else merge2(a, b)
  override def finish(b: (Double, Double)): Double =
    b._1 * (1.0 - scale(1.0))
  override def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Double)] =
    ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}

/** SQL-callable exponentialTimeDecayed{Sum,Count,Avg,Max} (ref
  * WindowTransform.cpp:1597+): state keeps decayed accumulators at a
  * moving reference time (the max time seen), remapped on merge like
  * [[EmaAgg]] but with natural-e decay. Window-capable: Spark evaluates
  * udafs over ROWS frames incrementally, matching the reference's
  * windowed use; the plain aggregate form decays to the max time.
  * kind: 0=sum, 1=count, 2=avg, 3=max.
  */
class ExpDecayAgg(decay: Double, kind: Int) extends Aggregator[
    (Double, Double), (Double, Double, Double, Double), Double] {
  // state: (sum, count, maxTerm, refTime)
  private def remap(s: (Double, Double, Double, Double), t: Double) = {
    val k = math.exp((s._4 - t) / decay)
    (s._1 * k, s._2 * k, s._3 * k, t)
  }
  override def zero: (Double, Double, Double, Double) =
    (0.0, 0.0, Double.NegativeInfinity, Double.NegativeInfinity)
  override def reduce(b0: (Double, Double, Double, Double),
      x: (Double, Double)): (Double, Double, Double, Double) = {
    val (v, t) = x
    if (b0._4 == Double.NegativeInfinity) (v, 1.0, v, t)
    else {
      val (b, tv) = if (t >= b0._4) (remap(b0, t), v)
        else (b0, v * math.exp((t - b0._4) / decay))
      (b._1 + tv, b._2 + math.exp((t - b._4) / decay),
        math.max(b._3, tv), b._4)
    }
  }
  override def merge(a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): (Double, Double, Double, Double) = {
    if (a._4 == Double.NegativeInfinity) b
    else if (b._4 == Double.NegativeInfinity) a
    else {
      val (hi, lo) = if (a._4 >= b._4) (a, b) else (b, a)
      val r = remap(lo, hi._4)
      (hi._1 + r._1, hi._2 + r._2, math.max(hi._3, r._3), hi._4)
    }
  }
  override def finish(s: (Double, Double, Double, Double)): Double =
    kind match {
      case 0 => s._1
      case 1 => s._2
      case 2 => s._1 / s._2
      case _ => s._3
    }
  override def bufferEncoder: org.apache.spark.sql.Encoder[
      (Double, Double, Double, Double)] = ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
