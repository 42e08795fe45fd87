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

  /** windowFunnel(window[, modes])(ts, cond1..condN): deepest level k such
    * that a chain step-1..step-k exists where every step's timestamp is
    * within `window` of the CHAIN's step-1 timestamp (the chain-first
    * timestamp propagates level to level; a later step-1 restarts the
    * level-1 chain). Input is (ts, condition bitmask) — one row may satisfy
    * several conditions. Exact re-expression of the reference's
    * getEventLevel scan (AggregateFunctionWindowFunnel.h:154-215) including
    * the strict_deduplication / strict_order / strict_increase modes. */
  class WindowFunnel(window: Long, steps: Int,
      strictDedup: Boolean = false, strictOrder: Boolean = false,
      strictIncrease: Boolean = false)
      extends Aggregator[(Long, Long), ArrayBuffer[Ev], Int] {
    def zero: ArrayBuffer[Ev] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Ev], e: (Long, Long)): ArrayBuffer[Ev] = {
      val (ts, mask) = e
      var any = false
      var i = 1
      while (i <= steps) {
        if ((mask & (1L << (i - 1))) != 0) { b += ((ts, i)); any = true }
        i += 1
      }
      // strict_order tracks non-step events as level 0 "interventions"
      if (strictOrder && !any) b += ((ts, 0))
      b
    }
    def merge(a: ArrayBuffer[Ev], b: ArrayBuffer[Ev]): ArrayBuffer[Ev] = a ++= b
    def finish(b: ArrayBuffer[Ev]): Int = {
      if (b.isEmpty) return 0
      if (!strictOrder && steps == 1) return 1
      val evs = b.sortBy(identity) // (ts, level) lexicographic, like the ref
      // eventsTs(i) = (chain-first ts, previous-step ts) of a chain that
      // has reached level i+1 inside the window
      val eventsTs = new Array[(Long, Long)](steps)
      var firstEvent = false
      var i = 0
      var broke = false
      while (!broke && i < evs.length) {
        val (timestamp, level) = evs(i)
        val eventIdx = level - 1
        if (strictOrder && eventIdx == -1) {
          // an intervening non-step event after the chain started stops
          // the scan (C++ `break`); before any step-1 it is ignored
          if (firstEvent) broke = true
        } else if (eventIdx == 0) {
          eventsTs(0) = (timestamp, timestamp)
          firstEvent = true
        } else if (strictDedup && eventsTs(eventIdx) != null) {
          return evs(i - 1)._2
        } else if (strictOrder && firstEvent && eventsTs(eventIdx - 1) == null) {
          var ev = 0
          while (ev < steps) {
            if (eventsTs(ev) == null) return ev
            ev += 1
          }
          return steps
        } else if (eventsTs(eventIdx - 1) != null) {
          val (first, prev) = eventsTs(eventIdx - 1)
          val timeMatched = timestamp <= first + window &&
            (!strictIncrease || prev < timestamp)
          if (timeMatched) {
            eventsTs(eventIdx) = (first, timestamp)
            if (eventIdx + 1 == steps) return steps
          }
        }
        i += 1
      }
      var ev = steps
      while (ev > 0) {
        if (eventsTs(ev - 1) != null) return ev
        ev -= 1
      }
      0
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

  /** The sequenceMatch pattern language (ref
    * AggregateFunctionSequenceMatch.h parsePattern): `(?N)` condition
    * refs, `.` any event, `.*` any events, `(?t<=N)`/`<`/`>=`/`>`/`==`
    * time constraints between the neighboring matched events. An
    * implicit leading `.*` lets the match start anywhere. */
  sealed trait PAct
  final case class PSpecific(idx: Int) extends PAct // 0-based condition
  case object PAny extends PAct
  case object PStar extends PAct
  final case class PTime(op: String, dur: Long) extends PAct

  def parsePattern(p: String): Vector[PAct] = {
    val acts = Vector.newBuilder[PAct]
    acts += PStar // implicit: match can start anywhere
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(
      s"sequenceMatch pattern: $msg at ${p.drop(i)}")
    while (i < p.length) {
      if (p.startsWith("(?t", i)) {
        i += 3
        val op = if (p.startsWith("<=", i)) "<="
          else if (p.startsWith(">=", i)) ">="
          else if (p.startsWith("==", i)) "=="
          else if (p.startsWith("<", i)) "<"
          else if (p.startsWith(">", i)) ">"
          else fail("unknown time condition")
        i += op.length
        val ds = p.drop(i).takeWhile(_.isDigit)
        if (ds.isEmpty) fail("could not parse duration")
        i += ds.length
        if (i >= p.length || p.charAt(i) != ')') fail("expected ')'")
        i += 1
        acts += PTime(op, ds.toLong)
      } else if (p.startsWith("(?", i)) {
        i += 2
        val ds = p.drop(i).takeWhile(_.isDigit)
        if (ds.isEmpty) fail("could not parse event number")
        i += ds.length
        if (i >= p.length || p.charAt(i) != ')') fail("expected ')'")
        i += 1
        acts += PSpecific(ds.toInt - 1)
      } else if (p.startsWith(".*", i)) { acts += PStar; i += 2 }
      else if (p.charAt(i) == '.') { acts += PAny; i += 1 }
      else fail("unexpected symbol")
    }
    acts.result()
  }

  /** Backtracking pattern match over events sorted by ts — exact
    * re-expression of the reference's backtrackingMatch
    * (AggregateFunctionSequenceMatch.h:365-464). Returns (matched,
    * next-start index) so sequenceCount can scan non-overlapping
    * matches. */
  private def backtrackingMatch(evs: IndexedSeq[(Long, Long)], start: Int,
      actions: Vector[PAct]): (Boolean, Int) = {
    var ai = 0
    var ei = start
    var base = start
    val stack = new ArrayBuffer[(Int, Int, Int)] // (ai, ei, base)
    def doBacktrack(): Boolean = {
      var ok = false
      while (!ok && stack.nonEmpty) {
        val (a, e, b) = stack.remove(stack.length - 1)
        ai = a; ei = e + 1; base = b
        if (ei != evs.length) ok = true
      }
      ok
    }
    var iters = 0
    var broke = false
    while (!broke && ai < actions.length && ei < evs.length) {
      actions(ai) match {
        case PSpecific(idx) =>
          if (((evs(ei)._2 >> idx) & 1L) == 1L) {
            base = ei; ai += 1; ei += 1
          } else if (!doBacktrack()) broke = true
        case PAny => base = ei; ai += 1; ei += 1
        case PStar =>
          stack += ((ai, ei, base)); base = ei; ai += 1
        case PTime(op, dur) =>
          val t = evs(ei)._1; val b0 = evs(base)._1
          val ok = op match {
            case "<=" => t <= b0 + dur
            case "<" => t < b0 + dur
            case ">=" => t >= b0 + dur
            case ">" => t > b0 + dur
            case _ => t == b0 + dur
          }
          if (ok) { stack += ((ai, ei, base)); base = ei; ai += 1 }
          else if (op == "<=" || op == "<") {
            if (!doBacktrack()) broke = true
          } else { // >=, >, ==: advance the event, backtrack at the end
            ei += 1
            if (ei == evs.length && !doBacktrack()) broke = true
          }
      }
      iters += 1
      if (iters > 1000000) throw new IllegalStateException(
        "sequenceMatch: pattern application exceeds max iterations")
    }
    // trailing actions that can match the empty tail
    while (ai < actions.length && (actions(ai) match {
      case PStar | PTime("<=", _) | PTime("<", _) => true
      case PTime(">=", 0L) => true
      case _ => false
    })) ai += 1
    var next = ei
    if (next == start) next += 1
    (ai == actions.length, next)
  }

  private def condsInPattern(actions: Vector[PAct]): Long =
    actions.collect { case PSpecific(i) => 1L << i }.foldLeft(0L)(_ | _)

  /** Linear NFA simulation for time-free patterns — exact re-expression
    * of the reference's dfaMatch (AggregateFunctionSequenceMatch.h:
    * 318-363); backtracking on a Kleene-heavy pattern over 10^6 events
    * exceeds the iteration cap, the state-set walk never does (that is
    * the point of the reference's 00823 test). State k's transition is
    * actions' k-th event action; `.*` marks the preceding state
    * self-looping. */
  private def dfaMatch(evs: IndexedSeq[(Long, Long)],
      actions: Vector[PAct]): Boolean = {
    // build states: one per event action (+ final); leading implicit
    // PStar marks state 0 as kleene
    val trans = ArrayBuffer.empty[Int] // -1 none, -2 any, >=0 specific cond
    val kleene = ArrayBuffer.empty[Boolean]
    trans += -1; kleene += false
    actions.foreach {
      case PSpecific(i) =>
        trans(trans.length - 1) = i
        trans += -1; kleene += false
      case PAny =>
        trans(trans.length - 1) = -2
        trans += -1; kleene += false
      case PStar => kleene(kleene.length - 1) = true
      case PTime(_, _) =>
        throw new IllegalStateException("dfaMatch on a timed pattern")
    }
    val n = trans.length
    var active = new Array[Boolean](n)
    var next = new Array[Boolean](n)
    active(0) = true
    var nActive = 1
    var ei = 0
    while (ei < evs.length && nActive > 0 && !active(n - 1)) {
      nActive = 0
      java.util.Arrays.fill(next, false)
      val mask = evs(ei)._2
      var st = 0
      while (st < n) {
        if (active(st)) {
          trans(st) match {
            case -1 =>
            case -2 => next(st + 1) = true; nActive += 1
            case c => if (((mask >> c) & 1L) == 1L) {
              next(st + 1) = true; nActive += 1
            }
          }
          if (kleene(st)) { next(st) = true; nActive += 1 }
        }
        st += 1
      }
      val tmp = active; active = next; next = tmp
      ei += 1
    }
    active(n - 1)
  }

  private def hasTime(actions: Vector[PAct]): Boolean =
    actions.exists(_.isInstanceOf[PTime])

  /** sequenceMatch('pattern')(ts, cond1..condN): input is (ts, bitmask of
    * satisfied conditions); every row is stored (`.`/`.*` match any
    * event). */
  class SequenceMatchPat(pattern: String)
      extends Aggregator[(Long, Long), ArrayBuffer[(Long, Long)], Boolean] {
    @transient private lazy val actions = parsePattern(pattern)
    def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[(Long, Long)], e: (Long, Long)): ArrayBuffer[(Long, Long)] = {
      if (e._2 != 0L) b += e // ref Data::add: only rows with >=1 event
      b
    }
    def merge(a: ArrayBuffer[(Long, Long)], b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = a ++= b
    def finish(b: ArrayBuffer[(Long, Long)]): Boolean = {
      // a condition referenced by the pattern that never fired → false
      val met = b.foldLeft(0L)(_ | _._2)
      val need = condsInPattern(actions)
      if ((met & need) != need) return false
      val evs = b.sortBy(_._1).toIndexedSeq
      if (hasTime(actions)) backtrackingMatch(evs, 0, actions)._1
      else dfaMatch(evs, actions)
    }
    def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
      Encoders.kryo[ArrayBuffer[(Long, Long)]]
    def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
  }

  /** sequenceCount('pattern')(ts, cond1..condN): non-overlapping match
    * count, each scan resuming where the previous match stopped. */
  class SequenceCountPat(pattern: String)
      extends Aggregator[(Long, Long), ArrayBuffer[(Long, Long)], Long] {
    @transient private lazy val actions = parsePattern(pattern)
    def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[(Long, Long)], e: (Long, Long)): ArrayBuffer[(Long, Long)] = {
      if (e._2 != 0L) b += e // ref Data::add: only rows with >=1 event
      b
    }
    def merge(a: ArrayBuffer[(Long, Long)], b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = a ++= b
    def finish(b: ArrayBuffer[(Long, Long)]): Long = {
      val met = b.foldLeft(0L)(_ | _._2)
      val need = condsInPattern(actions)
      if ((met & need) != need) return 0L
      val evs = b.sortBy(_._1).toIndexedSeq
      var cnt = 0L
      var i = 0
      var go = true
      while (go && i < evs.length) {
        val (m, next) = backtrackingMatch(evs, i, actions)
        if (m) { cnt += 1; i = next } else go = false
      }
      cnt
    }
    def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
      Encoders.kryo[ArrayBuffer[(Long, Long)]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
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
