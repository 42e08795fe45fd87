package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class UniqStateSpec extends SparkSpec {
  import spark.implicits._

  test("uniqState → store → uniqMerge equals direct estimation; close to exact") {
    val ev = Tables.load(spark, SparkSpec.tiny, "events")
    // partial sketches per (event_type, user_id % 4) "shard"
    val states = ev.groupBy($"event_type", (col("user_id") % 4).as("shard"))
      .agg(UniqState.uniqState(col("user_id")).as("st"))
    // sketches are real column values: write/read round-trip survives
    val dir = java.nio.file.Files.createTempDirectory("uniq_state").toString
    states.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val merged = stored.groupBy("event_type")
      .agg(UniqState.uniqMerge(col("st")).as("approx"))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val a = merged(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: approx $a vs exact $n")
    }
  }

  test("merge is associative up to sketch-mode promotion") {
    // the union path can promote the sketch's internal representation, so
    // estimates agree within error bounds rather than bit-exactly
    val df = (1 to 5000).map(i => (i % 7, (i * 31) % 997)).toDF("g", "v")
    val direct = df.groupBy("g")
      .agg(UniqState.uniqEstimate(UniqState.uniqState(col("v"))).as("e"))
      .as[(Int, Long)].collect().toMap
    val sharded = df.withColumn("sh", col("v") % 8)
      .groupBy("g", "sh").agg(UniqState.uniqState(col("v")).as("st"))
      .groupBy("g").agg(UniqState.uniqMerge(col("st")).as("e"))
      .as[(Int, Long)].collect().toMap
    direct.foreach { case (g, d) =>
      assert(math.abs(sharded(g) - d).toDouble / d < 0.05, s"g=$g $d vs ${sharded(g)}")
    }
  }

  test("scalar hll_union of two sketch values") {
    val a = Seq(1, 2, 3).toDF("v").agg(UniqState.uniqState(col("v")).as("s"))
    val b = Seq(3, 4, 5).toDF("v").agg(UniqState.uniqState(col("v")).as("s"))
    val u = a.crossJoin(b.withColumnRenamed("s", "s2"))
      .select(UniqState.uniqEstimate(
        UniqState.uniqUnion(col("s"), col("s2"))).as("n"))
      .as[Long].head()
    assert(u == 5L)
  }
}
