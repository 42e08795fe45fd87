package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraphiteMergeTree retention rollup semantics (ref
  * GraphiteRollupSortedAlgorithm.h): tier selection by age, bucket
  * alignment to the tier precision, per-bucket aggregation. */
class GraphiteRollupSpec extends SparkSpec {

  import spark.implicits._

  private val now = lit("2024-01-10 00:00:00").cast("timestamp")
  private val tiers = Seq((0L, 60L), (86400L, 3600L), (604800L, 86400L))

  test("tier selection by age: raw / hourly / daily") {
    val rows = Seq(
      // age < 1 day → 60 s buckets
      ("cpu", "2024-01-09 10:00:10", 1.0),
      ("cpu", "2024-01-09 10:00:50", 3.0),
      // 1 day <= age < 7 days → hourly buckets
      ("cpu", "2024-01-05 14:10:00", 10.0),
      ("cpu", "2024-01-05 14:50:00", 30.0),
      // age >= 7 days → daily buckets
      ("cpu", "2024-01-01 03:00:00", 5.0),
      ("cpu", "2024-01-01 21:00:00", 7.0)
    ).toDF("path", "ts0", "value")
      .withColumn("ts", $"ts0".cast("timestamp")).drop("ts0")

    val out = GraphiteRollup.rollup(rows, "path", "ts", "value",
        tiers, "avg", now)
      .orderBy("ts").collect()

    assert(out.length === 3)
    // daily bucket of Jan 1 = epoch of 2024-01-01 00:00:00
    assert(out(0).getLong(1) === 1704067200L)
    assert(out(0).getDouble(2) === 6.0)
    // hourly bucket of Jan 5 14:00
    assert(out(1).getLong(1) === 1704463200L)
    assert(out(1).getDouble(2) === 20.0)
    // minute bucket of Jan 9 10:00
    assert(out(2).getLong(1) === 1704794400L)
    assert(out(2).getDouble(2) === 2.0)
  }

  test("rollup aggregations: sum/min/max honor the pattern function") {
    val rows = Seq(
      ("m", "2024-01-01 00:00:01", 2.0),
      ("m", "2024-01-01 00:00:02", 8.0)
    ).toDF("path", "ts0", "value")
      .withColumn("ts", $"ts0".cast("timestamp")).drop("ts0")
    def agg(fn: String): Double =
      GraphiteRollup.rollup(rows, "path", "ts", "value", tiers, fn, now)
        .collect()(0).getDouble(2)
    assert(agg("sum") === 10.0)
    assert(agg("min") === 2.0)
    assert(agg("max") === 8.0)
  }

  test("plan is a single hash aggregation — no window, no extra shuffle") {
    val rows = Seq(("m", "2024-01-01 00:00:01", 2.0))
      .toDF("path", "ts0", "value")
      .withColumn("ts", $"ts0".cast("timestamp")).drop("ts0")
    val plan = GraphiteRollup.rollup(rows, "path", "ts", "value",
        tiers, "avg", now)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("HashAggregate"))
  }
}
