// Dev-scratch control: the bench's q_count_distinct shape on a VANILLA
// Spark session (no ChExtensions, no registry) to split host slowness
// from engine-session overhead. Run from sbt console or via scala-cli
// equivalent; kept out of src/main on purpose.
//
// Usage: sbt -batch 'set Compile/unmanagedSourceDirectories += baseDirectory.value / "scripts"' "runMain VanillaControl"
import org.apache.spark.sql.SparkSession

object VanillaControl {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    orders.createOrReplaceTempView("orders")
    val df = spark.sql(
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS uniq_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    df.write.format("noop").mode("overwrite").save() // warm
    val times = (1 to 7).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[control] vanilla count_distinct median=${times(times.size / 2)}%.3f min=${times.head}%.3f")
    spark.stop()
  }
}
