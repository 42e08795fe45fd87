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

  /** (epochMicros, eventId, step): eventId is the deterministic tiebreak
    * for equal timestamps — the oracle sorts by (ts, event_id) too. */
  type SEv = (Long, Long, Int)

  /** sequenceCount('(?1).*(?2)…'): number of NON-OVERLAPPING complete
    * chains, scanning greedily in ts order (ref
    * `AggregateFunctionSequenceMatch.h:651` AggregateFunctionSequenceCount:
    * after a match completes the scan restarts at the next event). */
  class SequenceCount(steps: Int)
      extends Aggregator[SEv, ArrayBuffer[SEv], Long] {
    def zero: ArrayBuffer[SEv] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[SEv], e: SEv): ArrayBuffer[SEv] = {
      if (e._3 > 0) b += e; b
    }
    def merge(a: ArrayBuffer[SEv], b: ArrayBuffer[SEv]): ArrayBuffer[SEv] = a ++= b
    def finish(b: ArrayBuffer[SEv]): Long = {
      val evs = b.sortBy(e => (e._1, e._2))
      var want = 1
      var cnt = 0L
      evs.foreach { case (_, _, s) =>
        if (s == want) {
          if (want == steps) { cnt += 1; want = 1 } else want += 1
        }
      }
      cnt
    }
    def bufferEncoder: Encoder[ArrayBuffer[SEv]] = Encoders.kryo[ArrayBuffer[SEv]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** (epochMicros, eventId, eventName, mask): bit 0 of mask = base
    * condition, bit i (1-based) = condition i. */
  type NEv = (Long, Long, String, Int)

  /** sequenceNextNode(direction, base)(ts, event, baseCond, cond1..condN)
    * (ref `AggregateFunctionSequenceNextNode.cpp`): find the chain of N
    * CONSECUTIVE events (in ts order; reversed for backward) matching
    * cond1..condN whose first event satisfies the base condition, and
    * return the name of the event immediately after it (before it, for
    * backward) — null when no chain matches or the chain ends the stream.
    *
    * Bases: "head" (chain must start at the stream's first event),
    * "first_match", "last_match". CH's "tail" is backward+head on the
    * reversed stream, which is how it's expressed here. */
  class SequenceNextNode(forward: Boolean, base: String, n: Int)
      extends Aggregator[NEv, ArrayBuffer[NEv], String] {
    require(Set("head", "first_match", "last_match")(base), s"bad base $base")
    def zero: ArrayBuffer[NEv] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[NEv], e: NEv): ArrayBuffer[NEv] = { b += e; b }
    def merge(a: ArrayBuffer[NEv], b: ArrayBuffer[NEv]): ArrayBuffer[NEv] = a ++= b
    def finish(b: ArrayBuffer[NEv]): String = {
      val sorted = b.sortBy(e => (e._1, e._2))
      val seq = if (forward) sorted else sorted.reverse
      def bit(i: Int, c: Int) = (seq(i)._4 & (1 << c)) != 0
      def matchAt(i: Int): Boolean =
        i + n <= seq.length && bit(i, 0) &&
          (0 until n).forall(j => bit(i + j, j + 1))
      val starts = base match {
        case "head" => if (seq.nonEmpty && matchAt(0)) Seq(0) else Seq.empty
        case "first_match" => seq.indices.find(matchAt).toSeq
        case "last_match" => seq.indices.findLast(matchAt).toSeq
      }
      starts.headOption
        .filter(_ + n < seq.length)
        .map(i => seq(i + n)._3)
        .orNull
    }
    def bufferEncoder: Encoder[ArrayBuffer[NEv]] = Encoders.kryo[ArrayBuffer[NEv]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
