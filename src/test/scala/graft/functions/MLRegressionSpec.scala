package graft.functions

import graft.{ChSql, SparkSpec}

/** stochasticLinearRegression / stochasticLogisticRegression /
  * evalMLMethod (ref AggregateFunctionMLMethod.h). The reference's SGD
  * is visit-order-dependent, so there is no cross-engine oracle — these
  * specs pin the CONTRACT instead: the linear aggregate recovers the
  * exact generating weights (the optimum SGD converges toward), the
  * logistic aggregate separates separable data, and both are
  * deterministic under repartitioning (the audit-trail property VERDICT
  * r7 asked for on the stochastic family). */
class MLRegressionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def mkLinear() = {
    // exact plane y = 2·x1 + 3·x2 + 1 on a 20×20 grid
    val df = spark.range(400).select(
      (col("id") % 20).cast("double").as("x1"),
      (col("id") / 20).cast("double").as("x2"))
      .withColumn("y", col("x1") * 2 + col("x2") * 3 + 1)
    df.createOrReplaceTempView("mlr_lin")
  }

  test("linear recovers exact generating weights; evalMLMethod applies") {
    mkLinear()
    val r = ChSql.sql(spark,
      """WITH (SELECT stochasticLinearRegression(0.1, 0.0, 5, 'SGD')(y, x1, x2)
        |      FROM mlr_lin) AS model
        |SELECT round(evalMLMethod(model, 5.0, 7.0), 6) AS p""".stripMargin,
      SparkSpec.tiny).collect()(0)
    assert(r.getDouble(0) == 32.0) // 2·5 + 3·7 + 1
  }

  test("linear is deterministic under repartitioning") {
    mkLinear()
    def weights(parts: Int): Seq[Double] = {
      val df = spark.table("mlr_lin").repartition(parts)
      df.createOrReplaceTempView("mlr_lin_p")
      ChSql.sql(spark,
        "SELECT stochasticLinearRegression(0.1, 0.0, 5, 'SGD')(y, x1, x2) " +
          "AS m FROM mlr_lin_p", SparkSpec.tiny)
        .select(col("m.w")).collect()(0).getSeq[Double](0)
    }
    val a = weights(1)
    val b = weights(7)
    assert(a.length == 3)
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    assert(math.abs(a(0) - 2.0) < 1e-9 && math.abs(a(1) - 3.0) < 1e-9 &&
      math.abs(a(2) - 1.0) < 1e-9)
  }

  test("l2 shrinks weights toward zero (bias unregularized)") {
    mkLinear()
    val w = ChSql.sql(spark,
      "SELECT stochasticLinearRegression(0.1, 1000.0, 5, 'SGD')(y, x1, x2) " +
        "AS m FROM mlr_lin", SparkSpec.tiny)
      .select(col("m.w")).collect()(0).getSeq[Double](0)
    assert(w(0) < 2.0 && w(0) > 0.0)
    assert(w(1) < 3.0 && w(1) > 0.0)
  }

  test("logistic separates separable data, deterministically") {
    val df = spark.range(200).select(
      (col("id").cast("double") / 10 - 10).as("x"))
      .withColumn("y", when(col("x") > 0, 1.0).otherwise(0.0))
    df.createOrReplaceTempView("mlr_log")
    def probs(parts: Int): (Double, Double) = {
      spark.table("mlr_log").repartition(parts)
        .createOrReplaceTempView("mlr_log_p")
      val r = ChSql.sql(spark,
        """WITH (SELECT stochasticLogisticRegression(1.0, 0.0, 5, 'SGD')(y, x)
          |      FROM mlr_log_p) AS model
          |SELECT evalMLMethod(model, 5.0) AS hi,
          |       evalMLMethod(model, -5.0) AS lo""".stripMargin,
        SparkSpec.tiny).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val (hi1, lo1) = probs(1)
    val (hi7, lo7) = probs(7)
    assert(hi1 > 0.9 && lo1 < 0.1)
    assert(hi1 == hi7 && lo1 == lo7) // bit-equal: sorted batch, fixed iters
  }

  test("MLFit.logisticFit: distributed multi-pass path") {
    val df = spark.range(500).select(
      (col("id").cast("double") / 25 - 10).as("x"))
      .withColumn("y", when(col("x") > 0, 1.0).otherwise(0.0))
    val w = graft.operators.MLFit.logisticFit(df, "y", Seq("x"),
      iters = 80, lr = 1.0)
    val hi = MLRegression.sigmoid(w(0) * 5.0 + w(1))
    val lo = MLRegression.sigmoid(w(0) * -5.0 + w(1))
    assert(hi > 0.9 && lo < 0.1)
  }
}
