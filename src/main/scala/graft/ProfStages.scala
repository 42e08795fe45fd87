package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Round-15 measurement tool: per-stage wall/task-time breakdown of one
  * declared query (guide §1: find WHERE the time goes before changing
  * anything). args: <query> [runs=3]. Runs the query through the noop
  * sink `runs` times after one warmup and prints every completed stage
  * with its duration, task count, and shuffle bytes.
  */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(32)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // AtomicBoolean, not a plain var: written by the main thread, read on
    // the listener-bus thread (r15 ADVICE — a plain var has no visibility
    // guarantee across those threads)
    val collecting = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting.get()) {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          val m = si.taskMetrics
          stages.add(f"    stage ${si.stageId}%4d ${wall}%6d ms  " +
            f"tasks=${si.numTasks}%3d  exec=${m.executorRunTime}%6d ms  " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead}%9d  " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten}%9d  " +
            si.name.takeWhile(_ != '\n').take(60))
        }
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save() // warmup + cache fill
    (1 to runs).foreach { r =>
      stages.clear(); collecting.set(true)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e6
      // deterministic drain: deliver everything posted so far, THEN stop
      // collecting (replaces the 300 ms sleep heuristic, which could drop
      // stages or attribute them to the wrong run)
      org.apache.spark.graftbridge.ListenerBridge
        .waitUntilListenersProcessed(spark.sparkContext)
      collecting.set(false)
      println(f"[profstages] $name run $r: $dt%.0f ms")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
