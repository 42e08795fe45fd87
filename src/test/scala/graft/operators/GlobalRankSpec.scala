package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def randDf(n: Int) = {
    val rnd = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, rnd.nextInt(50))).toDF("id", "v")
  }

  test("withRowNumber matches a global window row_number") {
    val df = randDf(500)
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy($"v", $"id")))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val got = GlobalRank.withRowNumber(df, Seq($"v", $"id"), "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("ntile matches the SQL ntile for sizes that do and don't divide") {
    for (n <- Seq(500, 497); k <- Seq(4, 7)) {
      val df = randDf(n)
      val expected = df.withColumn("t",
          ntile(k).over(Window.orderBy($"v", $"id")))
        .select($"id", $"t").as[(Long, Int)].collect().toMap
      val got = GlobalRank.ntile(df, Seq($"v", $"id"), k, "t")
        .select($"id", $"t").as[(Long, Int)].collect().toMap
      assert(got == expected, s"n=$n k=$k")
    }
  }

  test("ntile with fewer rows than buckets") {
    val df = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    val got = GlobalRank.ntile(df, Seq($"v", $"id"), 4, "t")
      .select($"id", $"t").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2))
  }

  test("limitWithTies == rank() <= n, including ties at the boundary") {
    val df = Seq(10, 10, 9, 8, 8, 8, 7, 1).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    for (n <- Seq(3, 4)) {
      val expected = df.withColumn("rk", rank().over(Window.orderBy($"v".desc)))
        .filter($"rk" <= n).select("id").as[Long].collect().toSet
      val got = GlobalRank.limitWithTies(df, $"v", descending = true, n = n)
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"n=$n")
    }
    // n=4: the 4th row value is 8, and ALL tied 8s come along
    assert(GlobalRank.limitWithTies(df, $"v", descending = true, n = 4)
      .count() == 6)
  }

  test("plans: offsets join is broadcast; no cartesian product anywhere") {
    val df = randDf(200)
    val rankPlan = GlobalRank.withRowNumber(df, Seq($"v", $"id"), "rn")
      .queryExecution.executedPlan.toString
    assert(rankPlan.contains("Broadcast"), s"expected broadcast:\n$rankPlan")
    assert(!rankPlan.contains("CartesianProduct"))
    val tiesPlan = GlobalRank.limitWithTies(df, $"v", descending = true, n = 3)
      .queryExecution.executedPlan.toString
    assert(tiesPlan.contains("Broadcast"), s"expected broadcast:\n$tiesPlan")
    assert(!tiesPlan.contains("CartesianProduct"))
  }

  test("limitWithTies ascending") {
    val df = Seq(5, 1, 1, 2, 3).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = GlobalRank.limitWithTies(df, $"v", descending = false, n = 2)
      .select("v").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 1))
  }
}
