package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def funnelDepth(events: Seq[(Long, Int)], windowMicros: Long, steps: Int): Int = {
    val wf = udaf(new Funnel.WindowFunnel(windowMicros, steps),
      ExpressionEncoder[(Long, Int)]())
    events.toDF("ts", "step")
      .agg(wf(col("ts"), col("step")).as("d"))
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
