package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def funnelDepth(events: Seq[(Long, Int)], windowMicros: Long, steps: Int): Int = {
    val wf = udaf(new Funnel.WindowFunnel(windowMicros, steps),
      ExpressionEncoder[(Long, Long)]())
    events.toDF("ts", "step")
      .agg(wf(col("ts"),
        expr("CASE WHEN step > 0 THEN shiftleft(1L, step - 1) ELSE 0L END"))
        .as("d"))
      .as[Int].head()
  }

  test("windowFunnel counts steps in order within the window") {
    assert(funnelDepth(Seq((0L, 1), (10L, 2), (20L, 3)), 100L, 3) == 3)
  }

  test("windowFunnel stops when a step is outside the window") {
    assert(funnelDepth(Seq((0L, 1), (10L, 2), (200L, 3)), 100L, 3) == 2)
  }

  test("windowFunnel ignores out-of-order steps") {
    assert(funnelDepth(Seq((0L, 2), (10L, 1), (20L, 3)), 100L, 3) == 1)
    assert(funnelDepth(Seq((0L, 2), (10L, 1), (20L, 2), (30L, 3)), 100L, 3) == 3)
  }

  test("windowFunnel restarts the chain from the latest step-1") {
    // first chain times out, the later step-1 rescues it
    assert(funnelDepth(Seq((0L, 1), (150L, 1), (200L, 2)), 100L, 3) == 2)
  }

  test("windowFunnel: no step-1 means depth 0") {
    assert(funnelDepth(Seq((0L, 2), (10L, 3)), 100L, 3) == 0)
  }

  test("sequenceMatch finds the subsequence regardless of noise") {
    val sm = udaf(new Funnel.SequenceMatch(2), ExpressionEncoder[(Long, Int)]())
    val got = Seq((0L, 2), (5L, 1), (10L, 0), (20L, 2))
      .toDF("ts", "step")
      .agg(sm(col("ts"), col("step")).as("m")).as[Boolean].head()
    assert(got) // 1 at t=5, then 2 at t=20
  }

  test("sequenceMatch false when order never satisfied") {
    val sm = udaf(new Funnel.SequenceMatch(2), ExpressionEncoder[(Long, Int)]())
    val got = Seq((0L, 2), (5L, 2), (10L, 1))
      .toDF("ts", "step")
      .agg(sm(col("ts"), col("step")).as("m")).as[Boolean].head()
    assert(!got)
  }

  test("sequenceCount counts greedy non-overlapping chains") {
    val sc = udaf(new Funnel.SequenceCount(2),
      ExpressionEncoder[(Long, Long, Int)]())
    def count(evs: Seq[(Long, Int)]): Long =
      evs.zipWithIndex.map { case ((t, s), i) => (t, i.toLong, s) }
        .toDF("ts", "id", "step")
        .agg(sc(col("ts"), col("id"), col("step")).as("n")).as[Long].head()
    // 1 2 1 2 → 2 chains; 1 1 2 2 → 1 (the second 1 is consumed as noise
    // while a chain is in progress, and the restart finds no further 1→2)
    assert(count(Seq((0L, 1), (1L, 2), (2L, 1), (3L, 2))) == 2)
    assert(count(Seq((0L, 1), (1L, 1), (2L, 2), (3L, 2))) == 1)
    // 2 before any 1 never matches
    assert(count(Seq((0L, 2), (1L, 1))) == 0)
    // noise (step 0) ignored
    assert(count(Seq((0L, 1), (1L, 0), (2L, 2))) == 1)
  }

  test("sequenceNextNode: bases and directions") {
    def next(forward: Boolean, base: String,
        evs: Seq[(Long, String, Int)]): Option[String] = {
      val nn = udaf(new Funnel.SequenceNextNode(forward, base, 2),
        ExpressionEncoder[(Long, Long, String, Int)]())
      evs.zipWithIndex.map { case ((t, n, m), i) => (t, i.toLong, n, m) }
        .toDF("ts", "id", "name", "mask")
        .agg(nn(col("ts"), col("id"), col("name"), col("mask")).as("n"))
        .as[Option[String]].head()
    }
    // mask: 1 = base, 2 = cond1 (A), 4 = cond2 (B)
    val A = 1 | 2; val B = 1 | 4; val X = 1
    // stream: X A B C A B D (consecutive A,B at idx 1 and 4)
    val evs = Seq((0L, "x", X), (1L, "a", A), (2L, "b", B), (3L, "c", X),
      (4L, "a", A), (5L, "b", B), (6L, "d", X))
    assert(next(true, "first_match", evs).contains("c"))
    assert(next(true, "last_match", evs).contains("d"))
    assert(next(true, "head", evs).isEmpty) // stream starts with x, not A
    // head matches when the chain starts the stream
    assert(next(true, "head", evs.drop(1)).contains("c"))
    // backward first_match: first chain scanning from the END is (A,B)
    // at idx 4-5 reversed → the "next" node is the event BEFORE it
    assert(next(false, "first_match",
      Seq((0L, "p", X), (1L, "b", B), (2L, "a", A))).contains("p"))
    // chain at the very end of the stream → no next node
    assert(next(true, "first_match",
      Seq((0L, "a", A), (1L, "b", B))).isEmpty)
  }

  test("retention requires the anchor condition") {
    val ret = udaf(new Funnel.Retention(3), ExpressionEncoder[Int]())
    // user saw cond2 and cond3 but never cond1 → all zeros
    val got = Seq(2, 4).toDF("mask")
      .agg(ret(col("mask")).as("r")).as[Seq[Int]].head()
    assert(got == Seq(0, 0, 0))
    val got2 = Seq(1, 4).toDF("mask")
      .agg(ret(col("mask")).as("r")).as[Seq[Int]].head()
    assert(got2 == Seq(1, 0, 1))
  }
}
