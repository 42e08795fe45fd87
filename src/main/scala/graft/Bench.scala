package graft

import org.apache.spark.sql.SparkSession

/** Bench runner (driver contract): headline queries at
  * SPARK_GRAFT_SF_DIR on local[32]; prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is forced end-to-end with a noop sink (count() alone lets
  * Catalyst prune the compute). One tiny warmup query first so JVM/codegen
  * startup is not billed to the first headline entry.
  */
object Bench {

  /** Representative spread: scan, hash agg, joins, window, sort/topN, asof
    * (custom op), minhash LSH, ANN, tumble windows, text pipeline. */
  val headline: Seq[String] = Seq(
    "q_scan_project", "q_agg_basic", "q_join_inner", "q_join_chain",
    "q_window_rank", "q_topn", "q_count_distinct", "q_asof_join",
    "q_tumble_agg", "q_dedup_minhash", "q_ann_topk", "q_text_analysis")

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

    // one Dataset per query: construction + analysis happen once (a
    // prepared statement); each timed run still executes the full scan +
    // compute through the noop sink (no data is cached between runs)
    val built = scala.collection.mutable.HashMap
      .empty[String, org.apache.spark.sql.DataFrame]
    def force(name: String): Unit =
      built.getOrElseUpdate(name, SparkEntry.queries(name)(spark, sfDir))
        .write.format("noop").mode("overwrite").save()

    // warmup: JVM + codegen + parquet footer caches. Guarded — a broken
    // warmup query must degrade to a cold first headline run, not zero the
    // round's entire perf signal (round-6 post-mortem).
    try force("q_prewhere")
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Median-of-7 per query, with the runs INTERLEAVED (round-robin over
    // the headline set) rather than back-to-back runs per query: the
    // host shows multi-second sustained slow windows (VM steal), and
    // back-to-back runs let one window poison every sample of one query.
    // Interleaving spreads a window across queries so each median
    // tolerates it. `value`/`queries` carry medians; `queries_min` floors.
    // (r9 profile: identical-plan engine-vs-raw in one JVM differ ≤8%;
    // the same query's wall time varies >2x across host windows, so more
    // interleaved rounds = better slow-window rejection.)
    val runs = 7
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val samples = headline.map(n => n -> scala.collection.mutable.ArrayBuffer
      .empty[Double]).toMap
    (1 to runs).foreach { _ =>
      headline.foreach { name =>
        val t0 = System.nanoTime()
        try force(name)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200) }
        samples(name) += (System.nanoTime() - t0) / 1e9
      }
    }
    val results = headline.map { name =>
      val times = samples(name).sorted
      (name, times(times.size / 2), times.head)
    }
    def obj(f: ((String, Double, Double)) => Double): String = results
      .map { r => "\"" + r._1 + f"\":${f(r)}%.3f" }
      .mkString("{", ",", "}")
    val errObj = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${obj(_._2)},"queries_min":${obj(_._3)},"errors":$errObj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
