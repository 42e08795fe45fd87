package graft

/** Scratch: sweep candidate golden files, print PASS/FAIL per file
  * (not part of the API). args(0) = file with one .sql path per line. */
object ProfGolden {
  def main(args: Array[String]): Unit = {
    var spark = Engine.session(
      sys.env.getOrElse("SWEEP_CORES", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val list = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(args(0))).toArray.map(_.toString).filter(_.nonEmpty)
    val sfDir = "/root/testdata/sf0.001"
    var pass = 0
    val res = new java.io.PrintWriter(
      if (args.length > 1) args(1) else "/tmp/golden_results.txt")
    def clean(s: String): String =
      s.filter(c => c >= 32 && c < 127).take(1500)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    // cached (unbounded) pool: a hung file leaks its thread, and the
    // fixed-size global EC would eventually refuse to START new futures,
    // hanging the whole sweep on Await
    implicit val sweepEc: ExecutionContext =
      ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newCachedThreadPool(r => {
          val t = new Thread(r); t.setDaemon(true); t
        }))
    def rebuild(): Unit = {
      // cancel only — spark.stop() BLOCKS while an abandoned timed-out
      // collect is still in flight (observed hang); a poisoned session
      // ends the chunk via JVM exit and the outer loop restarts
      try spark.sparkContext.cancelAllJobs()
      catch { case _: Throwable => }
    }
    // each timeout leaks a (possibly CPU-spinning) abandoned thread —
    // after a few the JVM is saturated; bail out and let the outer loop
    // restart a clean JVM from the remaining files
    var timeouts = 0
    def runOne(path: String): Either[String, (Seq[String], Seq[String])] =
      try {
        val s0 = spark
        val fut = Future(golden.Golden.runFile(s0, path, sfDir))
        try Right(Await.result(fut,
          sys.env.getOrElse("SWEEP_TIMEOUT_S", "60").toInt.seconds))
        catch { case _: java.util.concurrent.TimeoutException =>
          rebuild(); timeouts += 1; Left("TIMEOUT 60s") }
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .replace('\n', ' ').trim)
      }
    list.foreach { path =>
      var r = runOne(path)
      // an OOM/cancel can poison the session; rebuild + one retry so one
      // bad file doesn't fail the rest of the sweep
      r.left.foreach { m =>
        if (m.contains("Eagerly executed") || m.contains("OutOfMemory") ||
            m.contains("SparkContext") || m.contains("stopped")) {
          rebuild(); r = runOne(path)
        }
      }
      r match {
        case Right((actual, expected)) if actual == expected =>
          pass += 1; res.println(s"PASS $path")
        case Right((actual, expected)) =>
          val diff = actual.zipAll(expected, "<missing>", "<missing>")
            .filter { case (a, b) => a != b }.take(12)
          res.println(s"FAIL $path " + clean(
            diff.map { case (a, b) => s"got=<$a> want=<$b>" }.mkString(" | ")))
        case Left(m) => res.println(s"ERR  $path ${clean(m)}")
      }
      res.flush()
    }
    res.println(s"total pass $pass / ${list.length}")
    res.close()
    println(s"[golden] total pass $pass / ${list.length}")
    spark.stop()
  }
}
