package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WithFillSpec extends SparkSpec {
  import spark.implicits._

  test("chunked interpolate carries values across chunk boundaries") {
    // Sparse data on a 1..10000 grid; chunkSize 100 forces ~100 chunks and
    // long null runs that must be filled from a PREVIOUS chunk's carry-out.
    val data = Seq((5L, 1.5), (250L, 2.5), (9000L, 9.0)).toDF("k", "v")
    val grid = spark.range(1, 10001).toDF("k")
    val joined = grid.join(data, Seq("k"), "left")
    val filled = WithFill.interpolate(joined, "k", Seq("v"), chunkSize = 100L)
      .select($"k", $"v").as[(Long, Option[Double])].collect().toMap
    assert(filled(4L).isEmpty)          // before first value
    assert(filled(5L).contains(1.5))
    assert(filled(249L).contains(1.5))  // carried across chunk boundary
    assert(filled(250L).contains(2.5))
    assert(filled(8999L).contains(2.5)) // carried across ~87 chunks
    assert(filled(10000L).contains(9.0))
  }

  test("chunked interpolate matches a global-window reference") {
    val rnd = new scala.util.Random(3)
    val data = (1 to 40).map(_ => (rnd.nextInt(2000).toLong + 1, rnd.nextDouble()))
      .distinct.toDF("k", "v")
    val grid = spark.range(1, 2001).toDF("k")
    val joined = grid.join(data.groupBy("k").agg(max("v").as("v")), Seq("k"), "left")
    val expected = joined.withColumn("v",
        last($"v", ignoreNulls = true).over(
          org.apache.spark.sql.expressions.Window.orderBy($"k")
            .rowsBetween(Long.MinValue, 0)))
      .select($"k", $"v").as[(Long, Option[Double])].collect().toMap
    val got = WithFill.interpolate(joined, "k", Seq("v"), chunkSize = 64L)
      .select($"k", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got == expected)
  }

  test("fillLong grid + carry forward end-to-end") {
    val df = Seq((2L, 10.0), (5L, 20.0)).toDF("k", "v")
    val got = WithFill.fillLong(spark, df, "k", 1, 8, carryForward = Seq("v"))
      .select($"k", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty && got(2L).contains(10.0) && got(4L).contains(10.0)
      && got(5L).contains(20.0) && got(8L).contains(20.0))
  }
}
