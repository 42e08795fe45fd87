package graft

import org.apache.spark.sql.functions._

/** Approximate sketches: outputs differ from the reference's sketch
  * internals by design (SURVEY §7.3 uniqTheta note) — assert semantic
  * bounds instead of exact values. */
class QuantileApproxSpec extends SparkSpec {
  import spark.implicits._

  test("percentile_approx within 1% of exact at accuracy 1000") {
    val li = Tables.load(spark, SparkSpec.tiny, "lineitem")
    val both = li.groupBy("l_returnflag").agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx"),
      expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .as[(String, Double, Double)].collect()
    both.foreach { case (flag, a, e) =>
      assert(math.abs(a - e) / e < 0.01, s"$flag: approx $a vs exact $e")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.load(spark, SparkSpec.tiny, "events")
    val (approx, exact) = ev.agg(
      approx_count_distinct($"user_id").as("a"),
      countDistinct($"user_id").as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
