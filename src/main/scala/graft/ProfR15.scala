package graft

/** Scratch: run one golden file with full stack traces
  * (not part of the API). args(0) = .sql path. */
object ProfR15 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    try {
      val (got, want) = golden.Golden.runFile(spark, args(0), sfDir)
      val diffs = got.zipAll(want, "<missing>", "<missing>")
        .filter(p => p._1 != p._2)
      println(s"diffs=${diffs.size} of ${want.size}")
      diffs.take(40).foreach { case (g, w) =>
        println(s"  got=<$g> want=<$w>")
      }
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
