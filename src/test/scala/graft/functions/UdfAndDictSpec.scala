package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Dictionaries
import org.apache.spark.sql.functions._

class UdfAndDictSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE FUNCTION macro-expands into call sites") {
    assert(UserDefinedSqlFunctions.maybeExecute(spark,
      "CREATE FUNCTION linear AS (x, k, b) -> k*x + b"))
    val got = spark.sql("SELECT linear(10, 2, 1)").collect()(0).getInt(0)
    assert(got == 21)
    // params shadow columns of the same name only inside the body
    // (dayofweek here is the CH-registered DAYOFWEEK: Monday=1..Sunday=7)
    assert(UserDefinedSqlFunctions.maybeExecute(spark,
      "CREATE FUNCTION isWeekend AS (d) -> dayofweek(d) IN (6, 7)"))
    val n = graft.ChSql.sql(spark,
      "SELECT count(*) FROM orders WHERE isWeekend(o_orderdate)",
      SparkSpec.tiny).collect()(0).getLong(0)
    assert(n > 0)
  }

  test("non-CREATE statements are passed over") {
    assert(!UserDefinedSqlFunctions.maybeExecute(spark, "SELECT 1"))
  }

  test("dictGet resolves via broadcast join with defaults") {
    val nation = Tables.load(spark, SparkSpec.tiny, "nation")
    val customer = Tables.load(spark, SparkSpec.tiny, "customer")
    val out = Dictionaries.dictGet(customer, nation,
      "c_nationkey", "n_nationkey", "n_name", "nation_name",
      default = Some(lit("UNKNOWN")))
    assert(out.filter($"nation_name" === "UNKNOWN").count() == 0)
    assert(out.count() == customer.count())
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("dictHas flags membership") {
    val supplier = Tables.load(spark, SparkSpec.tiny, "supplier")
    val customer = Tables.load(spark, SparkSpec.tiny, "customer")
    val out = Dictionaries.dictHas(customer, supplier,
      "c_nationkey", "s_nationkey", "has_supplier")
    val both = out.groupBy("has_supplier").count().collect()
    assert(both.map(_.getBoolean(0)).toSet.size >= 1)
  }

  test("rangeHashed dictGet picks the value valid at the probe time") {
    val dict = Seq(
      (1L, 0L, 10L, "v0"), (1L, 10L, 20L, "v1"), (2L, 0L, 100L, "w0")
    ).toDF("k", "from", "to", "v")
    val fact = Seq((1L, 5L), (1L, 15L), (1L, 25L), (2L, 50L))
      .toDF("k", "at")
    val got = Dictionaries.dictGetRange(fact, dict,
      "k", "at", "k", "from", "to", "v", "val")
      .select("k", "at", "val").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 5L, Some("v0")), (1L, 15L, Some("v1")),
      (1L, 25L, None), (2L, 50L, Some("w0"))))
  }

  test("dictGet/dictHas are SQL-callable through ChSql after createDictionary") {
    val nation = Tables.load(spark, SparkSpec.tiny, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Dictionaries.createDictionary("nations", nation, "n_nationkey")
    val r = graft.ChSql.sql(spark,
      """SELECT dictGet('nations', 'n_name', 0) AS name0,
        |       dictGetOrDefault('nations', 'n_name', 9999, 'none') AS dflt,
        |       dictHas('nations', 1) AS h1,
        |       dictHas('nations', 9999) AS h2""".stripMargin,
      SparkSpec.tiny).collect()(0)
    val expected = nation.filter(col("n_nationkey") === 0)
      .select("n_name").collect()(0).getString(0)
    assert(r.getString(0) == expected)
    assert(r.getString(1) == "none")
    assert(r.getBoolean(2) && !r.getBoolean(3))
    // and as a per-row probe over a fact table
    val n = graft.ChSql.sql(spark,
      "SELECT count(*) AS n FROM customer WHERE dictHas('nations', c_nationkey)",
      SparkSpec.tiny).collect()(0).getLong(0)
    assert(n > 0)
  }

  test("rangeHashed dictGet preserves duplicate fact rows") {
    val dict = Seq((1L, 0L, 10L, "v0")).toDF("k", "from", "to", "v")
    // two IDENTICAL fact rows — the old per-fact-row-window overlap
    // resolution collapsed these to one
    val fact = Seq((1L, 5L), (1L, 5L), (1L, 7L)).toDF("k", "at")
    val got = Dictionaries.dictGetRange(fact, dict,
      "k", "at", "k", "from", "to", "v", "val")
    assert(got.count() == 3)
    assert(got.filter($"at" === 5L).count() == 2)
  }

  test("rangeHashed dictGet: overlapping ranges resolve to latest from") {
    val dict = Seq(
      (1L, 0L, 100L, "old"), (1L, 50L, 80L, "new")
    ).toDF("k", "from", "to", "v")
    val fact = Seq((1L, 10L), (1L, 60L), (1L, 90L)).toDF("k", "at")
    val got = Dictionaries.dictGetRange(fact, dict,
      "k", "at", "k", "from", "to", "v", "val")
      .select("at", "val").as[(Long, String)].collect().toSet
    assert(got == Set((10L, "old"), (60L, "new"), (90L, "old")))
  }
}
