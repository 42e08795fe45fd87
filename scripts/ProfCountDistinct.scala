// Dev-scratch: q_count_distinct through the engine (Tables.load + ChSql
// session) vs a raw-parquet DataFrame on the SAME session, interleaved —
// isolates engine overhead from host variance. Not part of src/main.
import org.apache.spark.sql.SparkSession

object ProfCountDistinct {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.ChExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = graft.SparkEntry.queries("q_count_distinct")(spark, sfDir)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.countDistinct("o_custkey")
        .as("uniq_cust"))
      .orderBy("o_orderstatus")
    def t(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    t(engine); t(raw) // warm
    val e = collection.mutable.ArrayBuffer[Double]()
    val r = collection.mutable.ArrayBuffer[Double]()
    (1 to 9).foreach { _ => e += t(engine); r += t(raw) }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[prof] engine median=${med(e.toSeq)}%.3f min=${e.min}%.3f | raw median=${med(r.toSeq)}%.3f min=${r.min}%.3f")
    println("[prof] engine plan:")
    println(engine.queryExecution.executedPlan.toString.take(2500))
    println("[prof] raw plan:")
    println(raw.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
