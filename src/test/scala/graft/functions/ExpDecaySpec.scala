package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpDecaySpec extends SparkSpec {
  import spark.implicits._

  private val pb = Seq(col("g"))
  private val ob = Seq(col("t"))

  test("decayedSum: a value decays by exp(-dt/lambda); fresh value adds fully") {
    // g, t, v: one partition, values at t=0 and t=10, lambda=10
    val df = Seq((1, 0.0, 100.0), (1, 10.0, 7.0)).toDF("g", "t", "v")
    val got = df.select(col("t"),
        ExpDecay.decayedSum(col("v"), col("t"), 10.0, pb, ob).as("s"))
      .as[(Double, Double)].collect().toMap
    assert(math.abs(got(0.0) - 100.0) < 1e-9)
    assert(math.abs(got(10.0) - (100.0 * math.exp(-1.0) + 7.0)) < 1e-9)
  }

  test("decayedCount and decayedAvg are consistent") {
    val df = Seq((1, 0.0, 4.0), (1, 5.0, 8.0), (1, 20.0, 1.0)).toDF("g", "t", "v")
    val got = df.select(col("t"),
        ExpDecay.decayedSum(col("v"), col("t"), 10.0, pb, ob).as("s"),
        ExpDecay.decayedCount(col("t"), 10.0, pb, ob).as("c"),
        ExpDecay.decayedAvg(col("v"), col("t"), 10.0, pb, ob).as("a"))
      .as[(Double, Double, Double, Double)].collect()
    got.foreach { case (_, s, c, a) => assert(math.abs(a - s / c) < 1e-9) }
    // count at t=20: 1 + exp(-1.5) + exp(-2)
    val c20 = got.find(_._1 == 20.0).get._3
    assert(math.abs(c20 - (1 + math.exp(-1.5) + math.exp(-2.0))) < 1e-9)
  }

  test("decayedMax picks the dominating decayed term") {
    // old huge value still dominates shortly after; fades later
    val df = Seq((1, 0.0, 100.0), (1, 1.0, 5.0), (1, 100.0, 5.0))
      .toDF("g", "t", "v")
    val got = df.select(col("t"),
        ExpDecay.decayedMax(col("v"), col("t"), 10.0, pb, ob).as("m"))
      .as[(Double, Double)].collect().toMap
    assert(math.abs(got(1.0) - 100.0 * math.exp(-0.1)) < 1e-9) // old wins
    assert(math.abs(got(100.0) - 5.0) < 1e-9)                  // fresh wins
  }

  test("nonNegativeDerivative clamps negatives, zero on first row and dt<=0") {
    val df = Seq(
      (1, 0.0, 10.0), (1, 10.0, 30.0),  // +2/s
      (1, 20.0, 5.0),                   // negative -> 0
      (1, 20.0, 9.0)                    // dt = 0 -> 0
    ).toDF("g", "t", "v")
    val got = df.select(col("t"), col("v"),
        ExpDecay.nonNegativeDerivative(col("v"), col("t"), 1.0, pb,
          Seq(col("t"), col("v"))).as("d"))
      .as[(Double, Double, Double)].collect()
      .map { case (t, v, d) => (t, v) -> d }.toMap
    assert(got((0.0, 10.0)) == 0.0)
    assert(math.abs(got((10.0, 30.0)) - 2.0) < 1e-9)
    assert(got((20.0, 5.0)) == 0.0)
    assert(got((20.0, 9.0)) == 0.0)
  }
}
