package graft
object DebugTf {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(4)
    spark.sparkContext.setLogLevel("ERROR")
    val f = args(0)
    try {
      val (a, e) = golden.Golden.runFile(spark, f, "/root/testdata/sf0.001")
      a.zipAll(e, "<missing>", "<missing>").zipWithIndex
        .filter { case ((x, y), _) => x != y }.take(10)
        .foreach { case ((x, y), i) => println(s"line $i got=<$x> want=<$y>") }
      println(s"len ${a.length} vs ${e.length}")
    } catch { case ex: Throwable =>
      println("ERR " + ex.getMessage.take(300))
      ex.getStackTrace.take(12).foreach(t => println("  " + t))
    }
    spark.stop()
  }
}
