package graft.functions

import graft.{ChSql, SparkSpec}

/** Relative-error contract for the approximate-uniq sketch tier (ref
  * AggregateFunctionUniqCombined.h K=17, AggregateFunctionUniq.h HLL12 =
  * 2^12 registers, uniqTheta default 4096 samples). Sketch INTERNALS
  * intentionally differ from the reference (SURVEY §7.3); what this spec
  * pins is the accuracy class: uniqCombined/uniqCombined64 within 1% and
  * uniqHLL12/uniqTheta within 5% of the true cardinality at 10^3, 10^5
  * and 10^7 distinct values. Mirrors QuantileApproxSpec's
  * bound-not-bits pattern.
  */
class SketchErrorSpec extends SparkSpec {

  private def estimates(n: Long): Map[String, Long] = {
    spark.range(n).createOrReplaceTempView("sketch_probe")
    val row = ChSql.sql(spark,
      """SELECT uniqCombined(id) AS c, uniqCombined64(id) AS c64,
        |       uniqHLL12(id) AS h, uniqTheta(id) AS t
        |FROM sketch_probe""".stripMargin, SparkSpec.tiny).collect()(0)
    Map("uniqCombined" -> row.getLong(0), "uniqCombined64" -> row.getLong(1),
      "uniqHLL12" -> row.getLong(2), "uniqTheta" -> row.getLong(3))
  }

  private def check(n: Long): Unit = {
    val est = estimates(n)
    val bounds = Map("uniqCombined" -> 0.01, "uniqCombined64" -> 0.01,
      "uniqHLL12" -> 0.05, "uniqTheta" -> 0.05)
    for ((fn, e) <- est) {
      val rel = math.abs(e - n).toDouble / n
      assert(rel <= bounds(fn),
        f"$fn at n=$n: estimate $e, relative error $rel%.4f > ${bounds(fn)}")
    }
  }

  test("sketch relative error at 10^3 distinct values")(check(1000L))
  test("sketch relative error at 10^5 distinct values")(check(100000L))
  test("sketch relative error at 10^7 distinct values")(check(10000000L))
}
