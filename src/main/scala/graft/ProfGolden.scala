package graft

/** Scratch: sweep candidate golden files, print PASS/FAIL per file
  * (not part of the API). args(0) = file with one .sql path per line. */
object ProfGolden {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val list = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(args(0))).toArray.map(_.toString).filter(_.nonEmpty)
    val sfDir = "/root/testdata/sf0.001"
    var pass = 0
    val res = new java.io.PrintWriter("/tmp/golden_results.txt")
    def clean(s: String): String =
      s.filter(c => c >= 32 && c < 127).take(1500)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    list.foreach { path =>
      try {
        val fut = Future(golden.Golden.runFile(spark, path, sfDir))
        val (actual, expected) =
          try Await.result(fut, 60.seconds)
          catch { case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelAllJobs()
            throw new RuntimeException("TIMEOUT 60s") }
        if (actual == expected) { pass += 1; res.println(s"PASS $path") }
        else {
          val diff = actual.zipAll(expected, "<missing>", "<missing>")
            .filter { case (a, b) => a != b }.take(12)
          res.println(s"FAIL $path " + clean(
            diff.map { case (a, b) => s"got=<$a> want=<$b>" }.mkString(" | ")))
        }
      } catch {
        case e: Throwable =>
          val m = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replace('\n', ' ').trim
          res.println(s"ERR  $path ${clean(m)}")
          if (list.length <= 3) e.printStackTrace()
      }
      res.flush()
    }
    res.println(s"total pass $pass / ${list.length}")
    res.close()
    println(s"[golden] total pass $pass / ${list.length}")
    spark.stop()
  }
}
