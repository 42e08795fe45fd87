package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r15 optimization guard: the fused vector kernels (VectorOps.DotD /
  * L2SqD / DotL) must be BIT-IDENTICAL to the composed
  * `aggregate(zip_with(...))` builtin forms they replaced in the
  * similarity/ANN hot path — same left-to-right fold order, same widening
  * casts, same null semantics (length mismatch or null element → null).
  */
class VectorOpsSpec extends SparkSpec {

  // the pre-r15 composed forms, verbatim
  private def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def l2sqComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)
  private def dotLComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("bigint") * y.cast("bigint")),
      lit(0L), (acc, v) => acc + v)

  private def floatRows(n: Int, dim: Int): Seq[(Array[Float], Array[Float])] = {
    val rnd = new scala.util.Random(7)
    // adversarial magnitudes so a different summation order WOULD differ
    Seq.fill(n)((
      Array.fill(dim)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat),
      Array.fill(dim)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat)))
  }

  test("DotD / L2SqD bit-identical to composed forms on float arrays") {
    val s = spark
    import s.implicits._
    val df = floatRows(200, 64).toDF("a", "b")
    val got = df.select(
      VectorOps.dotD(col("a"), col("b")).as("fd"),
      dotComposed(col("a"), col("b")).as("cd"),
      VectorOps.l2sqD(col("a"), col("b")).as("fl"),
      l2sqComposed(col("a"), col("b")).as("cl")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("DotD on double arrays and mixed float/double literals") {
    val s = spark
    import s.implicits._
    val df = floatRows(50, 16)
      .map { case (a, b) => (a.map(_.toDouble), b.map(_.toDouble)) }
      .toDF("a", "b")
    val got = df.select(
      VectorOps.dotD(col("a"), col("b")).as("fd"),
      dotComposed(col("a"), col("b")).as("cd")).collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }

  test("DotL bit-identical on tinyint code arrays (int8 ANN path)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // Seq[Byte], not Array[Byte]: the latter encodes as BINARY
    val df = Seq.fill(100)((
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte))).toDF("a", "b")
    val got = df.select(
      VectorOps.dotL(col("a"), col("b")).as("fd"),
      dotLComposed(col("a"), col("b")).as("cd")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("decimal array literals (SQL registry dotProduct path)") {
    val s = spark
    val df = s.sql(
      "SELECT array(1.5, 2.25, -3.125) AS a, array(0.5, -1.75, 2.5) AS b")
    val got = df.select(
      VectorOps.dotD(col("a"), col("b")).as("fd"),
      dotComposed(col("a"), col("b")).as("cd")).collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }

  test("null semantics: length mismatch, null element, null array") {
    val s = spark
    val df = s.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D)),
        |  (array(1.0D, 2.0D), array(3.0D, CAST(NULL AS DOUBLE))),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D, 4.0D)),
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D))
        |  AS t(a, b)""".stripMargin)
    val got = df.select(
      VectorOps.dotD(col("a"), col("b")).as("fd"),
      dotComposed(col("a"), col("b")).as("cd"),
      VectorOps.l2sqD(col("a"), col("b")).as("fl"),
      l2sqComposed(col("a"), col("b")).as("cl")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      assert(r.isNullAt(2) === r.isNullAt(3), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
      if (!r.isNullAt(2)) assert(r.getDouble(2) === r.getDouble(3))
    }
    // row 4 is the only non-null one
    assert(got.count(!_.isNullAt(0)) === 1)
  }

  test("NaN / infinity propagate exactly like the composed fold") {
    val s = spark
    val df = s.sql(
      """SELECT * FROM VALUES
        |  (array(CAST('NaN' AS DOUBLE), 2.0D), array(3.0D, 4.0D)),
        |  (array(1.0E308D, 1.0E308D), array(1.0E308D, 1.0E308D))
        |  AS t(a, b)""".stripMargin)
    val got = df.select(
      VectorOps.dotD(col("a"), col("b")).as("fd"),
      dotComposed(col("a"), col("b")).as("cd")).collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }

  test("codegen and interpreted paths agree bit-for-bit (r16 doGenCode)") {
    // r16: the kernels gained real whole-stage codegen; the generated
    // loop must produce exactly the interpreted eval's bits, including
    // null semantics (length mismatch, null element)
    val s = spark
    import s.implicits._
    val df = floatRows(100, 64).toDF("a", "b")
    val rnd = new scala.util.Random(13)
    val dfL = Seq.fill(50)((
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte))).toDF("a", "b")
    def run(): (Seq[(Long, Long)], Seq[Long], Seq[Boolean]) = {
      val d = df.select(
        VectorOps.dotD(col("a"), col("b")), VectorOps.l2sqD(col("a"), col("b")))
        .collect().map(r => (
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)),
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)))).toSeq
      val l = dfL.select(VectorOps.dotL(col("a"), col("b")))
        .collect().map(_.getLong(0)).toSeq
      val nulls = s.sql(
        """SELECT * FROM VALUES
          |  (array(1.0D, 2.0D), array(3.0D)),
          |  (array(1.0D, 2.0D), array(3.0D, CAST(NULL AS DOUBLE))),
          |  (array(1.0D, 2.0D), array(3.0D, 4.0D))
          |  AS t(a, b)""".stripMargin)
        .select(VectorOps.dotD(col("a"), col("b")))
        .collect().map(_.isNullAt(0)).toSeq
      (d, l, nulls)
    }
    val mode = "spark.sql.codegen.factoryMode"
    val ws = "spark.sql.codegen.wholeStage"
    val prev = (s.conf.get(mode), s.conf.get(ws))
    try {
      s.conf.set(mode, "CODEGEN_ONLY"); s.conf.set(ws, "true")
      val cg = run()
      s.conf.set(mode, "NO_CODEGEN"); s.conf.set(ws, "false")
      val interp = run()
      assert(cg._1 == interp._1)
      assert(cg._2 == interp._2)
      assert(cg._3 == interp._3 && cg._3 == Seq(true, true, false))
    } finally { s.conf.set(mode, prev._1); s.conf.set(ws, prev._2) }
  }

  test("Similarity.cosine with hoisted norms matches pairwise cosine") {
    val s = spark
    import s.implicits._
    val df = floatRows(100, 64).toDF("a", "b")
    val hoisted = df
      .withColumn("na", graft.operators.Similarity.norm(col("a")))
      .withColumn("nb", graft.operators.Similarity.norm(col("b")))
      .select(round(graft.operators.Similarity.dot(col("a"), col("b"))
        / (col("na") * col("nb")), 6).as("h"),
        round(graft.operators.Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .collect()
    hoisted.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }
}
