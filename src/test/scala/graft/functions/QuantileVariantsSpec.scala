package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile variant semantics pinned to the reference's own test outputs:
  * 00979_quantileExcatExclusive_and_Inclusive, 00315_quantile_off_by_one,
  * 00129_quantile_timing_weighted (tests/queries/0_stateless/).
  */
class QuantileVariantsSpec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): Any = {
    ChRegistry.register(spark)
    spark.sql(q).head.get(0)
  }

  test("quantileExactInclusive/Exclusive match 00979 outputs") {
    ChRegistry.register(spark)
    (0 until 1000).toDF("x").createOrReplaceTempView("num979")
    val excl = spark.sql(
      "SELECT quantilesExactExclusive(x, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999) FROM num979")
      .head.getSeq[Double](0)
    assert(excl === Seq(249.25, 499.5, 749.75, 899.9, 949.9499999999999,
      989.99, 998.999))
    val incl = spark.sql(
      "SELECT quantilesExactInclusive(x, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999) FROM num979")
      .head.getSeq[Double](0)
    assert(incl === Seq(249.75, 499.5, 749.25, 899.1, 949.05, 989.01,
      998.001))
    assert(sql1("SELECT quantileExactExclusive(x, 0.6) FROM num979") === 599.6)
    assert(sql1("SELECT quantileExactInclusive(x, 0.6) FROM num979") === 599.4)
  }

  test("quantileExactLow/High follow Python median_low/median_high") {
    ChRegistry.register(spark)
    Seq(1, 2, 3, 4).toDF("x").createOrReplaceTempView("ql4")
    Seq(1, 2, 3).toDF("x").createOrReplaceTempView("ql3")
    assert(sql1("SELECT quantileExactLow(x) FROM ql4") === 2)
    assert(sql1("SELECT quantileExactHigh(x) FROM ql4") === 3)
    assert(sql1("SELECT quantileExactLow(x) FROM ql3") === 2)
    assert(sql1("SELECT quantileExactHigh(x) FROM ql3") === 2)
    // non-median level: elems[floor(level·n)]
    (0 until 10).toDF("x").createOrReplaceTempView("ql10")
    assert(sql1("SELECT quantileExactLow(x, 0.25) FROM ql10") === 2)
    assert(sql1("SELECT quantileExactHigh(x, 0.25) FROM ql10") === 2)
    assert(sql1("SELECT quantileExactLow(x, 1.0) FROM ql10") === 9)
  }

  test("weighted quantiles match 00315 outputs") {
    ChRegistry.register(spark)
    Seq(1, 1, 1, 10, 10, 10, 10, 100, 100, 100).toDF("x")
      .createOrReplaceTempView("q315")
    assert(sql1("SELECT quantileExactWeighted(x, 1, 0.5) FROM q315") === 10)
    val qs = spark.sql(
      "SELECT quantilesExactWeighted(x, 1, 0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1) FROM q315")
      .head.getSeq[Int](0)
    assert(qs === Seq(1, 1, 1, 1, 10, 10, 10, 10, 100, 100, 100))
    assert(sql1("SELECT quantileInterpolatedWeighted(x, 1, 0.5) FROM q315") === 10)
    val qi = spark.sql(
      "SELECT quantilesInterpolatedWeighted(x, 1, 0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1) FROM q315")
      .head.getSeq[Int](0)
    assert(qi === Seq(1, 1, 2, 4, 7, 10, 35, 61, 87, 100, 100))
  }

  test("timing weighted matches 00129 outputs incl nan-on-zero-weight") {
    ChRegistry.register(spark)
    (0 until 100).toDF("t").createOrReplaceTempView("q129")
    assert(sql1("SELECT medianTimingWeighted(t, IF(t = 77, 10, 1)) FROM q129") === 54.0)
    assert(sql1("SELECT quantileTimingWeighted(t, IF(t = 77, 10, 0), 0.5) FROM q129") === 77.0)
    assert(sql1("SELECT medianTimingWeighted(t, 0) FROM q129")
      .asInstanceOf[Double].isNaN)
    val qs = spark.sql(
      "SELECT quantilesTimingWeighted(t, IF(t = 77, 10, 1), 0.5, 0.9) FROM q129")
      .head.getSeq[Double](0)
    assert(qs === Seq(54.0, 89.0))
  }

  test("quantileBFloat16 histogram semantics") {
    ChRegistry.register(spark)
    Seq(1.0, 2.0, 3.0, 4.0).toDF("x").createOrReplaceTempView("qbf")
    // threshold = ceil(4·0.5) = 2 → second bucket
    assert(sql1("SELECT quantileBFloat16(x, 0.5) FROM qbf") === 2.0)
    // bfloat16 keeps 8 mantissa bits: 257 truncates to 256
    Seq(257.0f).toDF("x").createOrReplaceTempView("qbf1")
    assert(sql1("SELECT quantileBFloat16(x, 0.5) FROM qbf1") === 256.0)
    // NaN inputs are skipped (ref 01813_quantileBfloat16_nans)
    Seq(Double.NaN, 5.0, 6.0).toDF("x").createOrReplaceTempView("qbf2")
    assert(sql1("SELECT quantileBFloat16(x, 0.5) FROM qbf2") === 5.0)
  }

  test("quantileDeterministic is the exact interpolated quantile") {
    ChRegistry.register(spark)
    (0 until 100).toDF("x").createOrReplaceTempView("qdet")
    assert(sql1("SELECT quantileDeterministic(x, x, 0.5) FROM qdet") === 49.5)
  }
}
