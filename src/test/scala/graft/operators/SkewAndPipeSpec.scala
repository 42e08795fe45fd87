package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewAndPipeSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain aggregation") {
    val li = Tables.load(spark, SparkSpec.tiny, "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), 8,
      partials = Seq(sum("l_quantity").as("pq"), count(lit(1)).as("pn")),
      finals = Seq(sum("pq").as("q"), sum("pn").as("n")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted.map(t => (t._1, math.round(t._2), t._3)) ==
      plain.map(t => (t._1, math.round(t._2), t._3)))
  }

  test("saltedJoin equals plain join") {
    val li = Tables.load(spark, SparkSpec.tiny, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val o = Tables.load(spark, SparkSpec.tiny, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), 4).count()
    assert(salted == plain)
  }

  test("executable UDF pipes rows through a process per partition") {
    val docs = Tables.load(spark, SparkSpec.tiny, "documents").limit(20)
      .select($"doc_id".cast("string").as("s"))
    val out = ExecutableUdf.pipe(spark, docs, "s",
      Seq("sed", "s/^/row-/")).as[String].collect().toSet
    assert(out.size == 20 && out.forall(_.startsWith("row-")))
  }

  test("pipeWithId joins command output back to its input row") {
    val docs = Tables.load(spark, SparkSpec.tiny, "documents").limit(20)
      .select($"doc_id", $"lang")
    // awk echoes the id ($1) and transforms the value ($2)
    val out = ExecutableUdf.pipeWithId(spark, docs, "doc_id", "lang",
      Seq("awk", "-F\t", "{print $1 \"\\t<\" $2 \">\"}"), "tagged")
    assert(out.count() == 20)
    val rows = out.select($"doc_id", $"lang", $"tagged")
      .as[(Long, String, String)].collect()
    assert(rows.forall { case (_, lang, tagged) => tagged == s"<$lang>" })
  }
}
