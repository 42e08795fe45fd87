package graft

import org.apache.spark.sql.SparkSession

/** Untimed bench-input re-layout (r16).
  *
  * Every driver fixture is a single-row-group parquet file, and row
  * groups are the parquet split atom — so every scan is ONE task at any
  * core count, and the driver's 8-vs-32-core scaling measurement reads
  * ~1.0 for engine and control alike (r15 PERF `suspect_cpus_ignored`;
  * r15 VERDICT "Next round" item 1 asks for exactly this re-write).
  *
  * Before any timing, Bench re-writes each table into a fresh per-invocation
  * temp directory as multiple parquet files — same rows, same values, same
  * logical types, only the physical layout changes — so scans split and the
  * core-count signal measures the engine again. Both the engine and the
  * control session read the SAME re-laid-out copy, so the engine/control
  * ratio gate stays apples-to-apples.
  *
  * This is NOT result caching or cross-run precomputation: the copy holds
  * the raw input rows (no query result, no derived intermediate), is built
  * fresh on every Bench invocation from the parquet inputs, and is deleted
  * on exit. `/root/testdata` itself is read-only and is never modified.
  */
object BenchLayout {

  /** Files per table, sized so the compute-bearing scans yield at least
    * as many tasks as the largest core count the driver benches with (32):
    * with N files the scan runs N tasks at 32 cores (1 wave) and N tasks
    * in N/8 waves at 8 cores, so a compute-bound stage finally shows the
    * core ratio. Tiny dimension tables stay single-file (nation, region —
    * splitting 25 rows is pure scheduling overhead). */
  val filesPerTable: Map[String, Int] = Map(
    "lineitem" -> 32,
    "orders" -> 16,
    "events" -> 16,
    "documents" -> 32, // heavy per-row work: ShingleHashes/TextStats scans
    "embeddings" -> 16,
    "customer" -> 8,
    "part" -> 8,
    "supplier" -> 2)

  /** Re-layout `sfDir` into a temp dir; None (caller falls back to the
    * original dir) if anything goes wrong — a broken re-layout must
    * degrade to the r15 behaviour, not zero the round's bench. */
  def relayout(spark: SparkSession, sfDir: String): Option[String] =
    try {
      val t0 = System.nanoTime()
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench_sf")
      tmp.toFile.deleteOnExit()
      Tables.names.foreach { n =>
        val src = s"$sfDir/$n.parquet"
        val dst = s"${tmp.toAbsolutePath}/$n.parquet"
        val nf = filesPerTable.getOrElse(n, 1)
        if (nf <= 1) {
          java.nio.file.Files.copy(java.nio.file.Paths.get(src),
            java.nio.file.Paths.get(dst))
        } else {
          // Raw read with the same nanosAsLong guard Tables.load uses so a
          // TIMESTAMP(NANOS) fixture generation round-trips as int64 nanos
          // (Tables.load's LongType branch then converts identically);
          // the current timestamp[us] generation round-trips as NTZ.
          val prev =
            spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try {
            val srcDf = spark.read.parquet(src)
            srcDf.repartition(nf).write.mode("overwrite").parquet(dst)
            // Integrity guard: the bench must time the SAME data. A
            // re-layout that dropped or duplicated rows would silently
            // change what every query computes over; fail the relayout
            // (-> fall back to the original dir) instead.
            val n0 = srcDf.count()
            val n1 = spark.read.parquet(dst).count()
            require(n0 == n1,
              s"relayout row-count drift for $n: src=$n0 dst=$n1")
          } finally prev match {
            case Some(v) =>
              spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None =>
              spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
        }
      }
      System.err.println(
        f"[bench] relayout $sfDir -> $tmp (${(System.nanoTime() - t0) / 1e9}%.1f s, untimed)")
      Some(tmp.toAbsolutePath.toString)
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] relayout failed, falling back to $sfDir: ${e.getMessage}")
        None
    }

  /** Best-effort recursive delete of the temp copy at the end of the run. */
  def cleanup(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
}
