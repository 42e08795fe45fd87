package graft.functions

import graft.{ChSql, SparkSpec}
import graft.operators.Dictionaries
import org.apache.spark.SparkException

/** The three scale guards: block-local window functions, SQL-callable
  * sumMap group state, and driver-collected dictionaries must all fail
  * fast with a message naming the scalable alternative instead of
  * silently serializing / OOMing at 100 TB.
  */
class ScaleGuardSpec extends SparkSpec {

  private def rootCauseMsg(t: Throwable): String = {
    var cur = t; val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("neighbor() fails past graft.blockLocal.maxRows with guidance") {
    spark.conf.set("graft.blockLocal.maxRows", "5")
    try {
      val e = intercept[Exception] {
        ChSql.sql(spark,
          "SELECT neighbor(number, 1) FROM numbers(10)",
          SparkSpec.tiny).collect()
      }
      assert(rootCauseMsg(e).contains("PARTITION BY"))
    } finally spark.conf.unset("graft.blockLocal.maxRows")
    // under the limit it still works
    val ok = ChSql.sql(spark,
      "SELECT neighbor(number, 1) AS n FROM numbers(3)",
      SparkSpec.tiny).collect().map(r => Option(r.get(0)))
    assert(ok.toSeq == Seq(Some(1L), Some(2L), None))
  }

  test("runningDifference() honors the same guard") {
    spark.conf.set("graft.blockLocal.maxRows", "5")
    try {
      val e = intercept[Exception] {
        ChSql.sql(spark,
          "SELECT runningDifference(number) FROM numbers(10)",
          SparkSpec.tiny).collect()
      }
      assert(rootCauseMsg(e).contains("graft.blockLocal.maxRows"))
    } finally spark.conf.unset("graft.blockLocal.maxRows")
  }

  test("SQL sumMap fails past graft.mapAgg.maxPairs with guidance") {
    spark.conf.set("graft.mapAgg.maxPairs", "4")
    try {
      val e = intercept[Exception] {
        ChSql.sql(spark,
          "SELECT sumMap([number, number + 1], [1, 1]) FROM numbers(10)",
          SparkSpec.tiny).collect()
      }
      assert(rootCauseMsg(e).contains("explode"))
    } finally spark.conf.unset("graft.mapAgg.maxPairs")
    // small groups unaffected
    val r = ChSql.sql(spark,
      "SELECT sumMap(['a', 'b', 'a'], [1, 2, 3]) AS m",
      SparkSpec.tiny).collect()(0).getStruct(0)
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getSeq[Long](1) == Seq(4L, 2L))
  }

  test("createDictionary caps collected rows and names dictGet") {
    import spark.implicits._
    val big = spark.range(0, Dictionaries.MaxDictRows + 10)
      .selectExpr("id AS k", "id AS v")
    val e = intercept[IllegalArgumentException] {
      Dictionaries.createDictionary("guard_spec_big", big, "k")
    }
    assert(e.getMessage.contains("dictGet"))
  }
}
