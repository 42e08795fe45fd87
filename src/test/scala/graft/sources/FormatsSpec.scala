package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format surface (SURVEY §2.1: CSV/TSV/JSONEachRow/Parquet/
  * ORC of the reference's 32-in/39-out formats, ref
  * src/Formats/registerFormats.cpp) + the INSERT pipeline shape
  * (ref InterpreterInsertQuery.cpp:240 buildChainImpl). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("graft-fmt").toString
  private lazy val nation = Tables.load(spark, SparkSpec.tiny, "nation")

  test("parquet/orc/csv/json/tsv write+read roundtrip preserves data") {
    val want = nation.orderBy("n_nationkey").collect().toSeq.map(_.toString)
    // parquet + orc: schema-full
    for (fmt <- Seq("parquet", "orc")) {
      nation.write.mode("overwrite").format(fmt).save(s"$dir/$fmt")
      val got = spark.read.format(fmt).load(s"$dir/$fmt")
        .orderBy("n_nationkey").collect().toSeq.map(_.toString)
      assert(got == want, s"$fmt roundtrip")
    }
    // csv + tsv (CH CSV/TSV formats) + json (JSONEachRow)
    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv").orderBy("n_nationkey").collect().toSeq.map(_.toString)
    assert(csv == want, "csv roundtrip")
    nation.write.mode("overwrite").option("header", "true")
      .option("sep", "\t").csv(s"$dir/tsv")
    val tsv = spark.read.option("header", "true").option("sep", "\t")
      .option("inferSchema", "true").csv(s"$dir/tsv")
      .orderBy("n_nationkey").collect().toSeq.map(_.toString)
    assert(tsv == want, "tsv roundtrip")
    nation.write.mode("overwrite").json(s"$dir/json")
    val json = spark.read.json(s"$dir/json")
      .select("n_nationkey", "n_name", "n_regionkey") // json reorders cols
      .orderBy("n_nationkey").collect().toSeq.map(_.toString)
    assert(json == want, "jsoneachrow roundtrip")
  }

  test("INSERT pipeline: append + overwrite semantics on a table") {
    nation.limit(5).write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ins")
    nation.limit(5).write.mode("append").format("parquet")
      .insertInto("graft_ins")
    assert(spark.table("graft_ins").count() == 10)
    // mutation via overwrite-by-expression (ref MutationsInterpreter.h:37 —
    // ALTER DELETE rewrites parts; here: rewrite the table minus the rows)
    val remaining = spark.table("graft_ins").filter($"n_nationkey" =!= 0)
    val cnt = remaining.count()
    remaining.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ins2")
    assert(spark.table("graft_ins2").count() == cnt)
    spark.sql("DROP TABLE IF EXISTS graft_ins")
    spark.sql("DROP TABLE IF EXISTS graft_ins2")
  }

  test("numbers/zeros/generateRandom table functions") {
    // numbers(N) (ref src/Storages/System/StorageSystemNumbers.h:25)
    assert(spark.range(1000).agg(sum("id")).collect()(0).getLong(0) == 499500L)
    // generateRandom: deterministic with seed
    val r1 = spark.range(100).select(rand(7).as("r")).agg(sum("r")).collect()(0).getDouble(0)
    val r2 = spark.range(100).select(rand(7).as("r")).agg(sum("r")).collect()(0).getDouble(0)
    assert(r1 == r2)
    // values() ≈ Seq.toDF
    assert(Seq((1, "a"), (2, "b")).toDF("k", "v").count() == 2)
  }
}
