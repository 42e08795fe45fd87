package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Funnel / behavior aggregate functions (SURVEY §2.4 "Funnel/behavior").
  *
  * Reference: `windowFunnel` / `retention` / `sequenceMatch`
  * (`/root/reference/src/AggregateFunctions/AggregateFunctionWindowFunnel.cpp`,
  * `AggregateFunctionRetention.cpp`, `AggregateFunctionSequenceMatch.cpp`):
  * ordered event-pattern matching inside an aggregate, contract = add /
  * merge / finalize (`IAggregateFunction.h:150-184`) — exactly Spark's
  * `Aggregator[IN, BUF, OUT]`, used here so partial aggregation and
  * shuffle-side merge work the same way they do for built-ins (map-side
  * partial state per user, one shuffle on the group key).
  *
  * Buffers hold (ts, step) pairs only for events that are funnel steps, so
  * state is bounded by the per-user step-event count, not the event count.
  */
object Funnel {

  type Ev = (Long, Int) // (epochMicros, 1-based step index; 0 = not a step)

  /** windowFunnel(window): max funnel depth reached where each step happens
    * within `windowMicros` of the chain's step-1 time, events processed in
    * ts order. Chain start slides to the latest step-1 seen, matching the
    * reference's sliding-window search for the deepest chain. */
  class WindowFunnel(windowMicros: Long, steps: Int)
      extends Aggregator[Ev, ArrayBuffer[Ev], Int] {
    def zero: ArrayBuffer[Ev] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Ev], e: Ev): ArrayBuffer[Ev] = {
      if (e._2 > 0) b += e; b
    }
    def merge(a: ArrayBuffer[Ev], b: ArrayBuffer[Ev]): ArrayBuffer[Ev] = a ++= b
    def finish(b: ArrayBuffer[Ev]): Int = {
      val evs = b.sortBy(e => (e._1, e._2))
      // start(k) = step-1 timestamp of some chain that has reached depth k
      val start = new Array[Long](steps + 1)
      java.util.Arrays.fill(start, Long.MinValue)
      var depth = 0
      evs.foreach { case (t, s) =>
        if (s == 1) {
          start(1) = t // latest step-1: tightest window for later steps
          if (depth < 1) depth = 1
        } else if (s >= 2 && s <= steps && start(s - 1) != Long.MinValue &&
          t - start(s - 1) >= 0 && t - start(1) <= windowMicros) {
          start(s) = start(s - 1)
          if (s > depth) depth = s
        }
      }
      depth
    }
    def bufferEncoder: Encoder[ArrayBuffer[Ev]] = Encoders.kryo[ArrayBuffer[Ev]]
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** retention(cond1..condN): array r where r(0) = any(cond1) and
    * r(i) = any(cond1) && any(cond_i+1). Input = bitmask of satisfied
    * conditions for the row. */
  class Retention(n: Int) extends Aggregator[Int, Array[Boolean], Seq[Int]] {
    def zero: Array[Boolean] = new Array[Boolean](n)
    def reduce(b: Array[Boolean], mask: Int): Array[Boolean] = {
      var i = 0
      while (i < n) { if ((mask & (1 << i)) != 0) b(i) = true; i += 1 }
      b
    }
    def merge(a: Array[Boolean], b: Array[Boolean]): Array[Boolean] = {
      var i = 0; while (i < n) { a(i) = a(i) || b(i); i += 1 }; a
    }
    def finish(b: Array[Boolean]): Seq[Int] =
      if (!b(0)) Seq.fill(n)(0)
      else b.indices.map(i => if (i == 0 || b(i)) 1 else 0)
    def bufferEncoder: Encoder[Array[Boolean]] = Encoders.kryo[Array[Boolean]]
    def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** sequenceMatch('(?1).*(?2)…'): true when steps 1..k appear as a
    * subsequence in ts order (the `.*`-separated pattern subset of the
    * reference's pattern language). */
  class SequenceMatch(steps: Int) extends Aggregator[Ev, ArrayBuffer[Ev], Boolean] {
    def zero: ArrayBuffer[Ev] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Ev], e: Ev): ArrayBuffer[Ev] = {
      if (e._2 > 0) b += e; b
    }
    def merge(a: ArrayBuffer[Ev], b: ArrayBuffer[Ev]): ArrayBuffer[Ev] = a ++= b
    def finish(b: ArrayBuffer[Ev]): Boolean = {
      val evs = b.sortBy(e => (e._1, e._2))
      var want = 1
      evs.foreach { case (_, s) => if (want <= steps && s == want) want += 1 }
      want > steps
    }
    def bufferEncoder: Encoder[ArrayBuffer[Ev]] = Encoders.kryo[ArrayBuffer[Ev]]
    def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
  }
}
