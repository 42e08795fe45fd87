package graft

import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler for the bench headline set: splits each query
  * into DataFrame construction, analysis+optimization, and execution so a
  * uniform per-query overhead drift can be attributed (round-7 verdict
  * item). Not part of the driver contract.
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.ChExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    try Bench.headline.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.format("noop")
        .mode("overwrite").save() // warm
    } catch { case e: Throwable => System.err.println(e.getMessage) }
    Bench.headline.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis + optimization + planning
      val tPlan = ms(t1)
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = ms(t2)
      println(f"[prof] $name%-20s build=$tBuild%8.1f plan=$tPlan%8.1f exec=$tExec%8.1f")
    }
    spark.stop()
  }
}
