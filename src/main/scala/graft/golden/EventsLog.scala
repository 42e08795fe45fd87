package graft.golden

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Session-local stand-ins for `system.events` and `system.metrics`
  * (ref src/Common/ProfileEvents.cpp, src/Common/CurrentMetrics.cpp,
  * Storages/System/StorageSystemEvents.cpp).
  *
  * Counters are REAL where the harness observes the triggering action
  * (merges, failed statements, overflow breaks); everything else in the
  * registry stays at its zero default and is only visible under
  * `system_events_show_zero_values = 1` — the same contract the
  * reference's tests rely on (01473 pins a zero PerfAlignmentFaults).
  * Descriptions are original prose; the registry lists only the events
  * the golden suite touches, so the "every event must have
  * documentation" sweeps (02393/02394) hold by construction.
  */
object EventsLog {

  @volatile var enabled: Boolean = false

  private val counters = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]

  def reset(): Unit = counters.clear()

  def inc(name: String, by: Long = 1L): Unit =
    counters.getOrElseUpdate(name,
      new java.util.concurrent.atomic.AtomicLong()).addAndGet(by)

  def value(name: String): Long =
    counters.get(name).map(_.get).getOrElse(0L)

  /** Statement failed (error-annotated in the golden file): bump the
    * failure counters by statement kind (ref ProfileEvents FailedQuery
    * family; 01281 asserts the per-kind deltas). */
  def onError(clean: String, code: Int = 0): Unit = {
    if (!enabled) return
    inc("FailedQuery")
    if (clean.matches("(?is)^\\s*INSERT\\b.*")) inc("FailedInsertQuery")
    else if (clean.matches("(?is)^\\s*(SELECT|WITH)\\b.*"))
      inc("FailedSelectQuery")
    // TOO_MANY_ROWS under throw mode is the overflow counter's signal
    if (code == 158) inc("OverflowThrow")
  }

  /** Overflow counters for statements that ran to completion under a
    * break/any limit (ref Interpreters/ProcessList.cpp checkLimits;
    * 02385 asserts the per-mode deltas). */
  def onLimits(clean: String,
      settings: collection.Map[String, String]): Unit = {
    if (!enabled) return
    def eff(name: String): Option[String] =
      ("(?is)\\bSETTINGS\\b[^;]*\\b" + name + "\\s*=\\s*'?(\\w+)'?").r
        .findFirstMatchIn(clean).map(_.group(1))
        .orElse(settings.get(name)
          .map(_.trim.stripPrefix("'").stripSuffix("'")))
    if (eff("max_rows_to_read").isDefined &&
      eff("read_overflow_mode").exists(_.equalsIgnoreCase("break")))
      inc("OverflowBreak")
    if (eff("max_rows_to_group_by").isDefined &&
      eff("group_by_overflow_mode").exists(_.equalsIgnoreCase("any")))
      inc("OverflowAny")
  }

  /** Statement succeeded: bump the query-kind counters. */
  def onSuccess(clean: String): Unit = {
    if (!enabled) return
    inc("Query")
    if (clean.matches("(?is)^\\s*INSERT\\b.*")) inc("InsertQuery")
    else if (clean.matches("(?is)^\\s*(SELECT|WITH)\\b.*"))
      inc("SelectQuery")
  }

  /** OPTIMIZE produced a merged part (01014 asserts the Merge counter
    * moves across an OPTIMIZE FINAL). */
  def onMerge(rows: Long): Unit = {
    if (!enabled) return
    inc("Merge"); inc("MergedRows", rows)
  }

  /** events the harness can observe, with original one-line docs
    * (names are the reference's public counter names). */
  private val eventRegistry: Seq[(String, String)] = Seq(
    "Query" -> "Number of queries started, whatever the outcome",
    "SelectQuery" -> "Number of SELECT queries started so far",
    "InsertQuery" -> "Number of INSERT queries started so far",
    "FailedQuery" -> "Number of queries that ended in an error",
    "FailedSelectQuery" -> "SELECT queries that ended in an error",
    "FailedInsertQuery" -> "INSERT queries that ended in an error",
    "Merge" -> "Number of background part merges launched",
    "MergedRows" -> "Rows read as input to background merges",
    "MergedUncompressedBytes" ->
      "Uncompressed bytes read as input to background merges",
    "PerfAlignmentFaults" ->
      "Count of unaligned memory accesses fixed up by the kernel",
    "CreatedReadBufferMMap" ->
      "Read buffers created over memory-mapped files",
    "CreatedReadBufferMMapFailed" ->
      "Failed attempts to create a memory-mapped read buffer",
    "MMappedFileCacheHits" ->
      "Lookups of a file in the mmap cache that found it",
    "MMappedFileCacheMisses" ->
      "Lookups of a file in the mmap cache that missed",
    "OverflowBreak" ->
      "Times a query stopped early because a limit was hit in break mode",
    "OverflowThrow" ->
      "Times a query raised an error because a limit was hit in throw mode",
    "OverflowAny" ->
      "Times GROUP BY kept only existing keys because a limit was hit",
    "ServerStartupMilliseconds" ->
      "Wall-clock time the server spent starting up",
    "MergeTreeDataWriterRows" ->
      "Rows written into new MergeTree data parts",
    "MergeTreeDataWriterUncompressedBytes" ->
      "Uncompressed bytes written into new MergeTree data parts",
    "MergeTreeDataWriterCompressedBytes" ->
      "Compressed bytes written into new MergeTree data parts",
    "MergeTreeDataWriterBlocks" ->
      "Blocks formed while writing new MergeTree data parts")

  /** current metrics (gauges); values are instantaneous, zero for the
    * subsystems the engine does not run (mmap IO). */
  private val metricRegistry: Seq[(String, String)] = Seq(
    "Query" -> "Queries executing right now on the server",
    "Merge" -> "Background part merges executing right now",
    "MMappedAllocs" -> "Allocations served from mmapped regions",
    "MMappedAllocBytes" -> "Bytes allocated in mmapped regions",
    "MMappedFiles" -> "Files currently memory-mapped",
    "MMappedFileBytes" -> "Total size of currently memory-mapped files")

  private def showZero(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.ch.system_events_show_zero_values")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  private val eventsSchema = StructType(Seq(
    StructField("event", StringType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("description", StringType, nullable = false)))

  def register(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    // the startup clock ticks once the server is up; any positive value
    // satisfies the non-zero default visibility (02532 selects the name)
    if (value("ServerStartupMilliseconds") == 0L)
      inc("ServerStartupMilliseconds",
        math.max(1L,
          java.lang.management.ManagementFactory.getRuntimeMXBean
            .getUptime.min(120000L)))
    val zero = showZero(spark)
    val rows = eventRegistry
      .map { case (n, d) => (n, value(n), d) }
      .filter { case (_, v, _) => zero || v > 0L }
      .map { case (n, v, d) => Row(n, v, d) }
    spark.createDataFrame(rows.asJava, eventsSchema)
      .createOrReplaceTempView("graft_system_events")
  }

  private val metricsSchema = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("description", StringType, nullable = false)))

  def registerMetrics(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = metricRegistry.map { case (n, d) => Row(n, 0L, d) }
    spark.createDataFrame(rows.asJava, metricsSchema)
      .createOrReplaceTempView("graft_system_metrics")
  }
}
