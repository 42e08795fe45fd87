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

  test("hierarchical dictionary walks match the 01778 reference outputs") {
    // the 01778 fixture: id→parent (1,0) (2,1) (3,1) (4,2)
    val d = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)).toDF("id", "pid")
    Dictionaries.createHierarchicalDictionary("h01778", d, "id", "pid")
    def arrs(fn: String): Seq[Seq[Long]] = (0 to 5).map { k =>
      graft.ChSql.sql(spark, s"SELECT $fn('h01778', $k)", SparkSpec.tiny)
        .collect()(0).getSeq[Long](0).toSeq
    }
    assert(arrs("dictGetHierarchy") === Seq(
      Seq(), Seq(1L), Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 2L, 1L), Seq()))
    assert(arrs("dictGetChildren") === Seq(
      Seq(1L), Seq(2L, 3L), Seq(4L), Seq(), Seq(), Seq()))
    assert(arrs("dictGetDescendants") === Seq(
      Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L), Seq(4L), Seq(), Seq(), Seq()))
    val lvl1 = (0 to 5).map { k =>
      graft.ChSql.sql(spark,
        s"SELECT dictGetDescendants('h01778', $k, 1)", SparkSpec.tiny)
        .collect()(0).getSeq[Long](0).toSeq
    }
    assert(lvl1 === Seq(
      Seq(1L), Seq(2L, 3L), Seq(4L), Seq(), Seq(), Seq()))
    val isIn = (0 to 5).map { k =>
      graft.ChSql.sql(spark, s"SELECT dictIsIn('h01778', $k, $k)",
        SparkSpec.tiny).collect()(0).getInt(0)
    }
    assert(isIn === Seq(0, 1, 1, 1, 1, 0))
    // ancestor test: 4 is under 1 but 3 is not under 2
    assert(graft.ChSql.sql(spark, "SELECT dictIsIn('h01778', 4, 1)",
      SparkSpec.tiny).collect()(0).getInt(0) === 1)
    assert(graft.ChSql.sql(spark, "SELECT dictIsIn('h01778', 3, 2)",
      SparkSpec.tiny).collect()(0).getInt(0) === 0)
  }

  test("hierarchical dictionary: deeper tree, level-2 order and cycles") {
    // 1→(2,3); 2→(4,6); 3→(5,7): the level-strategy stack expands the
    // LAST child first, so level-2 of key 1 is ch(3)++ch(2) = [5,7,4,6]
    val d = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (6L, 2L),
      (5L, 3L), (7L, 3L)).toDF("id", "pid")
    Dictionaries.createHierarchicalDictionary("hdeep", d, "id", "pid")
    assert(graft.ChSql.sql(spark,
      "SELECT dictGetDescendants('hdeep', 1, 2)", SparkSpec.tiny)
      .collect()(0).getSeq[Long](0).toSeq === Seq(5L, 7L, 4L, 6L))
    assert(graft.ChSql.sql(spark,
      "SELECT dictGetDescendants('hdeep', 1)", SparkSpec.tiny)
      .collect()(0).getSeq[Long](0).toSeq ===
      Seq(2L, 3L, 5L, 7L, 4L, 6L))
    // cycle: 10→11→10 — walks terminate instead of looping
    val c = Seq((10L, 11L), (11L, 10L)).toDF("id", "pid")
    Dictionaries.createHierarchicalDictionary("hcycle", c, "id", "pid")
    val p = graft.ChSql.sql(spark, "SELECT dictGetHierarchy('hcycle', 10)",
      SparkSpec.tiny).collect()(0).getSeq[Long](0).toSeq
    assert(p === Seq(10L, 11L))
    val dd = graft.ChSql.sql(spark, "SELECT dictGetDescendants('hcycle', 10)",
      SparkSpec.tiny).collect()(0).getSeq[Long](0).toSeq
    assert(dd.nonEmpty && dd.size <= 4)
  }
}
