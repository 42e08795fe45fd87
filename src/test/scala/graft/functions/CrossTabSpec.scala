package graft.functions

import graft.{ChSql, SparkSpec}

/** Cross-tab association statistics (ref AggregateFunctions/CrossTab.h). */
class CrossTabSpec extends SparkSpec {

  test("cramersV matches the reference's observed-pairs chi-square") {
    // CH sums chi² over OBSERVED pairs only (ref CrossTab.h
    // getPhiSquared), so perfect 2-category association yields
    // sqrt(0.5) — not the textbook 1.0 (zero cells are never visited)
    val v = ChSql.sql(spark,
      "SELECT round(cramersV(number % 2, number % 2), 6) AS v FROM numbers(100)",
      SparkSpec.tiny).collect()(0).getDouble(0)
    assert(v === 0.707107)
  }

  test("category values containing tabs and colons do not collide") {
    // 'a\tb' + 'c' must not be confused with 'a' + 'b\tc' (the old
    // tab-joined composite key collided here and crashed the finisher);
    // colons in values must not confuse the length-prefixed key either
    val rows = spark.createDataFrame(Seq(
      ("a\tb", "c"), ("a", "b\tc"), ("x:1", ":y"),
      ("a\tb", "c"), ("a", "b\tc"), ("x:1", ":y"),
      ("p", "q"), ("p", "r"))).toDF("a", "b")
    rows.createOrReplaceTempView("ct_tabs")
    val r = ChSql.sql(spark,
      """SELECT round(cramersV(a, b), 4) AS v,
        |       round(theilsU(a, b), 4) AS u,
        |       round(contingency(a, b), 4) AS c FROM ct_tabs""".stripMargin,
      SparkSpec.tiny).collect()(0)
    // no crash, and all three stats are finite
    assert(!r.getDouble(0).isNaN && r.getDouble(0) >= 0 && r.getDouble(0) <= 1)
    assert(!r.getDouble(2).isNaN)
  }
}
