package graft.functions

import graft.{ChSql, SparkSpec}

/** sparkbar / stem / co-moment matrix semantics pinned to the reference's
  * own test outputs: 02016_aggregation_spark_bar, 01890_stem,
  * 02515_aggregate_functions_statistics (tests/queries/0_stateless/).
  */
class Round8FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(q: String): Any =
    ChSql.sql(spark, q, SparkSpec.tiny).head.get(0)

  private def sparkbarFixture(): Unit =
    Seq((1L, "2020-01-01"), (4L, "2020-01-02"), (5L, "2020-01-03"),
      (2L, "2020-01-04"), (3L, "2020-01-05"), (7L, "2020-01-06"),
      (6L, "2020-01-07"), (8L, "2020-01-08"), (2L, "2020-01-11"))
      .toDF("cnt", "d")
      .selectExpr("cnt", "CAST(d AS DATE) AS event_date")
      .createOrReplaceTempView("spark_bar_test")

  test("sparkbar matches 02016 auto-range rows") {
    sparkbarFixture()
    assert(one("SELECT sparkbar(2)(event_date,cnt) FROM spark_bar_test") === "▅█")
    assert(one("SELECT sparkbar(3)(event_date,cnt) FROM spark_bar_test") === "▄█▃")
    assert(one("SELECT sparkbar(4)(event_date,cnt) FROM spark_bar_test") === "▄▅█▃")
    assert(one("SELECT sparkbar(5)(event_date,cnt) FROM spark_bar_test") === "▃▂▆█▂")
    assert(one("SELECT sparkbar(9)(event_date,cnt) FROM spark_bar_test") === "▂▅▂▃▆█  ▂")
    assert(one("SELECT sparkbar(11)(event_date,cnt) FROM spark_bar_test") === "▁▄▅▂▃▇▆█  ▂")
  }

  test("sparkbar matches 02016 explicit-range and edge rows") {
    sparkbarFixture()
    assert(one("SELECT sparkbar(11,toDate('2020-01-02'),toDate('2020-01-05'))(event_date,cnt) FROM spark_bar_test")
      === "▆ █  ▃  ▅  ")
    // y ≤ 0 contributes no points → empty render
    assert(one("SELECT sparkbar(2)(number, -number) FROM numbers(10)") === "")
    // negative y widens the auto range but is not plotted
    assert(one("SELECT sparkbar(10)(number, number - 7) FROM numbers(10)")
      === "        ▄█")
  }

  test("stem('en') reproduces the 01890 Porter vectors") {
    val pairs = Seq(
      "given" -> "given", "combinatorial" -> "combinatori",
      "collection" -> "collect", "possibility" -> "possibl",
      "studied" -> "studi", "commonplace" -> "commonplac",
      "packing" -> "pack")
    for ((w, want) <- pairs)
      assert(one(s"SELECT stem('en', '$w')") === want, s"stem($w)")
    // unhandled language: identity (documented divergence)
    assert(one("SELECT stem('xx', 'word')") === "word")
  }

  private def fhFixture(): Unit =
    Seq((1, 5.6, -4.4, 2.6), (2, -9.6, 3.0, 3.3), (3, -1.3, -4.0, 1.2),
      (4, 5.3, 9.7, 2.3), (5, 4.4, 0.037, 1.222), (6, -8.6, -7.8, 2.1233),
      (7, 5.1, 9.3, 8.1222), (8, 7.9, -3.6, 9.837),
      (9, -8.2, 0.62, 8.43555), (10, -3.0, 7.3, 6.762))
      .toDF("a_value", "b_value", "c_value", "d_value")
      .createOrReplaceTempView("fh")

  private def mat(q: String): Seq[Seq[Double]] =
    ChSql.sql(spark, q, SparkSpec.tiny).head
      .getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)

  test("corrMatrix / covar matrices match 02515 outputs") {
    fhFixture()
    val corr = mat("SELECT arrayMap(x -> arrayMap(y -> round(y, 5), x), corrMatrix(a_value, b_value, c_value, d_value)) FROM fh")
    assert(corr === Seq(
      Seq(1.0, -0.09561, 0.24287, 0.74554),
      Seq(-0.09561, 1.0, 0.17303, 0.10558),
      Seq(0.24287, 0.17303, 1.0, 0.25797),
      Seq(0.74554, 0.10558, 0.25797, 1.0)))
    val cs = mat("SELECT arrayMap(x -> arrayMap(y -> round(y, 5), x), covarSampMatrix(a_value, b_value, c_value, d_value)) FROM fh")
    assert(cs === Seq(
      Seq(9.16667, -1.95556, 4.5335, 7.49776),
      Seq(-1.95556, 45.63378, 7.20628, 2.36899),
      Seq(4.5335, 7.20628, 38.01103, 5.28296),
      Seq(7.49776, 2.36899, 5.28296, 11.03352)))
    val cp = mat("SELECT arrayMap(x -> arrayMap(y -> round(y, 5), x), covarPopMatrix(a_value, b_value, c_value, d_value)) FROM fh")
    assert(cp === Seq(
      Seq(8.25, -1.76, 4.08015, 6.74799),
      Seq(-1.76, 41.0704, 6.48565, 2.13209),
      Seq(4.08015, 6.48565, 34.20993, 4.75467),
      Seq(6.74799, 2.13209, 4.75467, 9.93017)))
  }

  test("groupArraySample: fixed seed is deterministic, size/subset hold") {
    (0 until 100).toDF("x").coalesce(1).createOrReplaceTempView("gas")
    def run(): Seq[Int] =
      ChSql.sql(spark, "SELECT groupArraySample(10, 42)(x) FROM gas",
        SparkSpec.tiny).head.getSeq[Int](0).toSeq
    val a = run(); val b = run()
    assert(a === b, "same seed, same session: identical sample")
    assert(a.length === 10 && a.forall(v => v >= 0 && v < 100))
    assert(a.distinct.length === 10, "positions are sampled without replacement")
    // n larger than the group: whole group comes back
    val full = ChSql.sql(spark,
      "SELECT groupArraySample(500, 42)(x) FROM gas", SparkSpec.tiny)
      .head.getSeq[Int](0)
    assert(full.length === 100)
  }

  test("matrix aggregates: degenerate group shapes match the reference") {
    fhFixture()
    val corr1 = mat("SELECT corrMatrix(a_value) FROM (SELECT a_value FROM fh LIMIT 1)")
    assert(corr1.length === 1 && corr1.head.head.isNaN)
    val pop1 = mat("SELECT covarPopMatrix(a_value) FROM (SELECT a_value FROM fh LIMIT 1)")
    assert(pop1 === Seq(Seq(0.0)))
    val samp1 = mat("SELECT covarSampMatrix(a_value) FROM (SELECT a_value FROM fh LIMIT 1)")
    assert(samp1.head.head.isNaN)
    val corr0 = mat("SELECT corrMatrix(a_value) FROM (SELECT a_value FROM fh LIMIT 0)")
    assert(corr0.head.head.isNaN)
  }
}
