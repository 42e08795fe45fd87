package graft.golden

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** Memory-table DDL emulation for the golden harness: the reference's
  * stateless tests stage data with `CREATE TABLE … ENGINE = Memory` (or
  * MergeTree — storage is irrelevant to the SELECT under test) plus
  * `INSERT INTO`, then query it (ref src/Storages/StorageMemory.h — an
  * in-process row buffer addressed by name). Here a table is a temp view
  * over an in-memory DataFrame; INSERT unions new rows through a cast to
  * the declared schema. Statements handled here produce no output lines —
  * the clickhouse-test contract.
  */
object DdlEmu {

  private val createRe =
    "(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*\\((.*)\\)\\s*(ENGINE\\s*=?.*)$".r
  /** Executed mutations per table, for the system.mutations stand-in
    * (ref src/Storages/StorageInMemoryMetadata + system.mutations): the
    * harness applies mutations synchronously, so is_done is always 1. */
  val mutationsLog = new java.util.concurrent.CopyOnWriteArrayList[
    (String, String)]() // (table, command)

  /** Names created via CREATE TEMPORARY TABLE: the statement-level
    * EXISTS forms ignore them unless TEMPORARY is spelled out (01048). */
  val tempTables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // CH temporary tables carry no ENGINE clause
  private val createTempRe =
    "(?is)^CREATE\\s+TEMPORARY\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*\\((.*)\\)\\s*$".r
  private val createAsNumbersRe =
    "(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s+AS\\s+numbers\\s*\\(\\s*(\\d+)\\s*\\)\\s*$".r
  private val dropRe =
    "(?is)^DROP\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*(?:SYNC\\s*)?$".r
  private val truncateRe =
    "(?is)^TRUNCATE\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*$".r
  private val insertRe =
    "(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?\\s*(\\([^)]*\\))?\\s*(VALUES\\s*\\(.*|SELECT\\b.*|WITH\\b.*|FORMAT\\s+\\w+.*)$".r
  // lightweight mutations (ref src/Interpreters/MutationsInterpreter.cpp:
  // a mutation is a SELECT rewriting the affected columns) — storage
  // rewrite is irrelevant here, the view is rebuilt over the same rows
  private val alterUpdateRe =
    "(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+UPDATE\\s+(.*?)\\s+WHERE\\s+(.*?)\\s*(?:SETTINGS\\s+.*)?$".r
  private val alterTtlRe =
    ("(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+" +
      "(?:MODIFY|MATERIALIZE)\\s+TTL\\s*(.*?)" +
      "\\s*(?:SETTINGS\\s+.*)?$").r
  /** Declared TTL expression per table (MODIFY TTL records; MATERIALIZE
    * TTL / OPTIMIZE re-applies). */
  private val ttlExprs = scala.collection.concurrent.TrieMap
    .empty[String, String]
  /** Column-level TTL expressions per table (MODIFY COLUMN … TTL). */
  private val colTtlExprs = scala.collection.concurrent.TrieMap
    .empty[String, Map[String, String]]
  /** DETACHed tables' data, restored by ATTACH. */
  private val detachedDf = scala.collection.concurrent.TrieMap
    .empty[String, DataFrame]
  /** Engine text of CTAS tables (DETACH volatility check). */
  private val ctasEngines = scala.collection.concurrent.TrieMap
    .empty[String, String]
  /** DETACHed partitions' rows, keyed (table, partition-value text). */
  private val detachedParts = scala.collection.concurrent.TrieMap
    .empty[(String, String), DataFrame]
  /** Replicated-table insert-block dedup keys (see insertRe). */
  private val insertedBlocks =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String, String)]()
  /** File-engine tables: name → (path under user_files, format). Reads
    * re-parse the file; INSERTs write through (append, or truncate
    * under engine_file_truncate_on_insert=1) — ref
    * src/Storages/StorageFile.cpp. */
  private val fileBacked = scala.collection.concurrent.TrieMap
    .empty[String, (String, String)]

  private def renderFileRows(fm: String, casted: DataFrame): Seq[String] =
    fm.toLowerCase match {
      case "tsv" | "tabseparated" =>
        casted.collect().toSeq.map(r =>
          r.toSeq.map(Golden.fmt).mkString("\t"))
      case "jsoneachrow" | "ndjson" =>
        graft.formats.ChOutputFormats.render("jsoneachrow",
          casted.schema, Seq(casted.collect().toSeq),
          graft.formats.ChOutputFormats.Ctx(_ => None))
      case _ => graft.formats.ChOutputFormats.render(fm,
        casted.schema, Seq(casted.collect().toSeq),
        graft.formats.ChOutputFormats.Ctx(_ => None))
    }

  private def readFileBackedDf(spark: SparkSession,
      name: String): DataFrame = {
    val (rel, fm) = fileBacked(name)
    val d = decls(name)
    import org.apache.spark.sql.types.DataType
    val p = graft.ChSql.userFilesPath(rel)
    if (!java.nio.file.Files.exists(p)) return emptyDf(spark, d)
    val data = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("\\", "\\\\")
    val sub = graft.formats.DescFormat.selectSql(fm, data,
      Map.empty[String, String]).getOrElse(return emptyDf(spark, d))
    val raw = spark.sql(s"SELECT * FROM $sub __fb")
    if (fm.toLowerCase.startsWith("json") || fm.toLowerCase == "ndjson") {
      // name-matched columns; missing declared ones take their DEFAULT
      // expression (input_format_defaults_for_omitted_fields; 01622)
      var df = raw
      d.cols.foreach { case (n, t) =>
        val dt = DataType.fromDDL(t)
        if (!df.columns.contains(n)) {
          val de = defExprs.getOrElse(name, Map.empty).get(n)
          df = de match {
            case Some(e) => df.withColumn(n,
              expr(graft.ChSql.translate(e).trim).cast(dt))
            case None => df.withColumn(n, defaultFor(dt))
          }
        } else df = df.withColumn(n, col(s"`$n`").cast(dt))
      }
      df.select(d.cols.map(c => col(s"`${c._1}`")).toSeq: _*)
    } else
      raw.select(d.cols.zipWithIndex.map { case ((n, t), i) =>
        col(s"c${i + 1}").cast(DataType.fromDDL(t)).as(n)
      }.toSeq: _*)
  }

  private val attachFromRe =
    ("(?is)^ATTACH\\s+TABLE\\s+`?([\\w.]+)`?\\s+FROM\\s+'([^']*)'\\s*" +
      "\\(([^)]*)\\)\\s*ENGINE\\s*=?\\s*(.+)$").r
  private val insertFileRe =
    ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?FUNCTION\\s+file\\s*\\(\\s*" +
      "['\"]([^'\"]+)['\"]\\s*,\\s*['\"](\\w+)['\"]\\s*,\\s*" +
      "['\"]([^'\"]*)['\"]\\s*\\)\\s*" +
      "(VALUES\\s*\\(.*|SELECT\\b.*|WITH\\b.*)$").r
  /** LIVE VIEW name → (source tables, refresh version). */
  private val liveViewVer = scala.collection.concurrent.TrieMap
    .empty[String, (Set[String], Long)]
  graft.ChSql.liveViewVersion =
    (n: String) => liveViewVer.get(n).map(v => math.max(1L, v._2))
  private val useRe = "(?is)^USE\\s+`?([\\w.]+)`?\\s*$".r
  private val alterPartSingleRe =
    ("(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+" +
      "(DETACH|DROP|ATTACH)\\s+PART\\s+'([^']+)'\\s*$").r
  private val alterPartRe =
    ("(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+" +
      "(DETACH|DROP|ATTACH)\\s+PARTITION\\s+(.+)$").r
  private val alterDeleteRe =
    "(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+DELETE\\s+WHERE\\s+(.*?)\\s*(?:SETTINGS\\s+.*)?$".r
  private val renameRe =
    "(?is)^RENAME\\s+TABLE\\s+(.+)$".r
  // CREATE TABLE x ENGINE = … AS y (storage clause BEFORE the source)
  private val createAsTableRe2 =
    ("(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "`?([\\w.]+)`?\\s+ENGINE\\s*=?[^;]*?\\s+AS\\s+`?([\\w.]+)`?\\s*$").r
  private val createDbRe =
    "(?is)^CREATE\\s+DATABASE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?(\\w+)`?\\s*(?:ENGINE\\s*=.*)?$".r
  private val dropDbRe =
    "(?is)^DROP\\s+DATABASE\\s+(?:IF\\s+EXISTS\\s+)?`?(\\w+)`?\\s*(?:SYNC\\s*)?$".r
  // CREATE TABLE x AS y [ENGINE = …]: clone another table's schema (the
  // storage clause is irrelevant to the SELECT under test)
  private val createAsTableRe =
    ("(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "`?([\\w.]+)`?\\s+AS\\s+`?([\\w.]+)`?\\s*(?:ENGINE\\s*=.*)?$").r
  // CTAS: CREATE TABLE x [ENGINE = …] AS SELECT … (storage dropped; the
  // view stays lazy — the staged sources in these tests are immutable)
  private val ctasRe =
    ("(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "`?([\\w.]+)`?\\s*((?:ENGINE|ORDER|PARTITION|PRIMARY|SETTINGS)\\b" +
      "[^;]*?)?\\bAS\\s+((?:SELECT|WITH)\\b.*)$").r

  // CREATE [MATERIALIZED] VIEW (ref src/Storages/StorageView.cpp /
  // StorageMaterializedView.cpp): both are emulated as DEFERRED views —
  // the select re-registers after every mutating statement, so the view
  // is always-current (CH's view contract; for MATERIALIZED this matches
  // the common create-then-insert test pattern, not insert-then-create).
  private val createViewRe =
    ("(?is)^CREATE\\s+(?:OR\\s+REPLACE\\s+)?(MATERIALIZED\\s+|LIVE\\s+)?VIEW\\s+" +
      "(?:IF\\s+NOT\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*(\\([^)]*\\))?\\s*" +
      "(?:TO\\s+`?([\\w.]+)`?\\s*)?" +
      "(?:ENGINE\\b[^;]*?)?\\s*(?:POPULATE\\s+)?AS\\s+((?:SELECT|WITH)\\b.*)$").r
  private val dropViewRe =
    "(?is)^DROP\\s+VIEW\\s+(?:IF\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*(?:SYNC)?\\s*$".r
  /** view name → (colDefs, select), in creation order */
  private val viewDefs = new java.util.LinkedHashMap[String, (String, String)]()
  /** Whether `name` is a registered VIEW (EXISTS VIEW, 01048). */
  def isView(name: String): Boolean = viewDefs.containsKey(name)

  private def registerView(spark: SparkSession, sfDir: String,
      name: String, colDefs: String, select: String): Unit = {
    // a VIEW over bare system.numbers is legal (reads are lazy; the
    // consumer's LIMIT stops the scan) — stand in a 10M+1 range, the
    // same floor numbersBound uses, so LIMIT-bounded reads through the
    // view work (01946 sleep_view)
    val select1 =
      if (select.matches("(?is).*\\bsystem\\.numbers(?:_mt)?\\b.*"))
        select.replaceAll("(?i)\\bFROM\\s+system\\.numbers(?:_mt)?\\b",
          "FROM (SELECT id AS number FROM range(10000001))")
      else select
    val df0 = graft.ChSql.sql(spark, select1.trim, sfDir)
    val df = Option(colDefs).map(_.trim.stripPrefix("(").stripSuffix(")"))
      .filter(_.nonEmpty).map { cd =>
        val cols = parseCols(cd)
        df0.toDF(cols.map(_._1): _*)
          .select(cols.map { case (n, t) => col(n).cast(t).as(n) }: _*)
      }.getOrElse(df0)
    df.createOrReplaceTempView(name)
  }

  /** Views capture their sources' plans at registration; after any
    * mutation, re-register every live view so it reads current data. */
  /** The TYPE text declaring an Object('JSON') column — including the
    * Object(Nullable('JSON')) variant. */
  private val objTypeRe =
    "(?is)^(Object\\s*\\(\\s*(?:Nullable\\s*\\(\\s*)?" +
      "'?(json|JSON)'?\\s*\\)?\\s*\\)|JSON)\\s*$"
  private val objColRe = "(?is)^`?\\w+`?\\s+" + objTypeRe.drop(6)

  /** Publish an Object('JSON') insert: swap in the rebuilt frame,
    * record the part (with its per-batch schema snapshot), refresh the
    * toTypeName text. */
  private def commitObjectInsert(spark: SparkSession, sfDir: String,
      name: String, res: Option[JsonObject.InsertResult]): Boolean =
    res match {
      case Some(r) =>
        r.full.createOrReplaceTempView(name)
        PartsLog.onInsert(spark, name, r.batch, r.batchStates)
        chTypes(name) = chTypes.getOrElse(name, Map.empty) ++
          JsonObject.objCols(name).map(c =>
            c -> JsonObject.typeText(name, c)).toMap
        refreshViews(spark, sfDir)
        true
      case None => sys.error(
        "NOT_IMPLEMENTED: unsupported shape in Object('JSON')")
    }

  private def refreshViews(spark: SparkSession, sfDir: String): Unit = {
    val it = viewDefs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      try registerView(spark, sfDir, e.getKey, e.getValue._1, e.getValue._2)
      catch { case _: Exception => }
    }
  }

  /** Declared (CH-translated) column types per created table, so INSERT
    * can cast to them and TRUNCATE can rebuild the empty frame. */
  private case class Decl(cols: Seq[(String, String)])
  private val decls = scala.collection.concurrent.TrieMap.empty[String, Decl]
  // table inventory for the merge() table function
  graft.ChSql.knownTables = () => decls.keys.toSeq
  // declared column names, for merge()'s schema-unification check
  graft.ChSql.knownTableColumns =
    (t: String) => decls.get(t).map(_.cols.map(_._1))
  // star expansion excludes ALIAS/MATERIALIZED columns (the view carries
  // them for explicit references, so ChSql must expand `*` itself)
  graft.ChSql.starVisibleColumns = (t0: String) => {
    val t = t0.stripPrefix("__graft_final_")
    val hidden = aliasExprs.get(t).exists(_.nonEmpty) ||
      matCols.get(t).exists(_.nonEmpty)
    if (!hidden) None
    else decls.get(t).map(_.cols.map(_._1)
      .filterNot(matCols.getOrElse(t, Set.empty)))
  }

  /** Column names DECLARED Nullable(...) per LIVE table: the join-gap
    * default fill (join_use_nulls=0) must leave those NULL while
    * non-Nullable columns take the type default. Keyed by table so DROP
    * forgets a section's declarations. */
  private val nullableDeclared = scala.collection.concurrent.TrieMap
    .empty[String, Set[String]]
  def isDeclaredNullable(col: String): Boolean = {
    // output columns may carry a CH qualified display name (`t.a`, the
    // join-naming rewrite) — nullability is declared on the short name
    val short = col.toLowerCase.split('.').last
    nullableDeclared.values.exists(_.contains(short))
  }
  /** Table-scoped variant: when the caller knows which relations feed
    * the plan (grouping-set fill), only THOSE tables' declarations
    * count — a same-named Nullable column on an unrelated table must
    * not suppress the fill. Tables absent from the map declared no
    * Nullable columns. Falls back to the global lookup when none of the
    * candidate names is a known source (subquery/TVF shapes). */
  def isDeclaredNullableIn(col: String, tables: Set[String]): Boolean = {
    val short = col.toLowerCase.split('.').last
    val scoped = tables.map(_.stripPrefix("__graft_final_").toLowerCase)
    if (scoped.nonEmpty &&
        decls.keys.map(_.toLowerCase).exists(scoped.contains))
      nullableDeclared.exists { case (t, cols) =>
        scoped.contains(t.toLowerCase) && cols.contains(short) }
    else isDeclaredNullable(col)
  }
  /** Per-file reset (the map is session-global; one test's declarations
    * must not leak into the next file's fill decisions). */
  def resetNullables(): Unit = {
    nullableDeclared.clear(); defExprs.clear()
    // the file() table function's user_files dir is per-file state too
    scala.util.Try {
      val root = java.nio.file.Paths.get(graft.ChSql.userFilesDir)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).sorted(
          java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    aliasExprs.clear(); matCols.clear(); descColsMap.clear()
    distributedAlias.clear(); replicaPrimary.clear()
    ttlExprs.clear(); colTtlExprs.clear(); detachedDf.clear()
    detachedParts.clear(); insertedBlocks.clear(); liveViewVer.clear()
    fileBacked.clear(); ctasEngines.clear(); dictDefs.clear()
    tempTables.clear(); mutationsLog.clear()
    PartsLog.reset(); JsonObject.reset(); QueryCache.reset()
    EventsLog.reset()
    graft.ChSql.currentDb = ""
    engines.clear(); staged.clear(); chTypes.clear()
    viewDefs.clear(); createdDdl.clear()
  }

  /** Per-file session cleanup: drop helper views this emulation registered
    * (a failed test would otherwise leak `__graft_final_*` into the next
    * file's SHOW TABLES / EXISTS output). */
  /** Tables that already existed when the current golden file began —
    * SHOW TABLES must not list another file's leftovers. */
  @volatile var sessionBaseline: Set[String] = Set.empty

  def resetSession(spark: SparkSession): Unit = {
    sessionBaseline = decls.keys.toSet
    for (n <- engines.keys)
      spark.catalog.dropTempView(s"__graft_final_$n")
    val it = viewDefs.keySet().iterator()
    while (it.hasNext) spark.catalog.dropTempView(it.next())
    resetNullables()
    QueryLog.reset()
    WindowView.reset()
  }

  // ------------------------------------------------- engine-typed merges
  // Summing/Replacing/CollapsingMergeTree merge semantics (ref
  // src/Processors/Merges/Algorithms/SummingSortedAlgorithm.cpp,
  // ReplacingSortedAlgorithm.cpp, CollapsingSortedAlgorithm.cpp): rows
  // with an equal sort key collapse when parts merge. Here the staged
  // rows carry a hidden insertion-order column; OPTIMIZE applies the
  // engine's transform in place, and `FROM t FINAL` reads through a
  // `__graft_final_<t>` view that applies it lazily.
  private case class EngineSpec(kind: String, keys: Seq[String],
    sumCols: Seq[String], ver: Option[String], sign: Option[String])
  private val engines =
    scala.collection.concurrent.TrieMap.empty[String, EngineSpec]
  /** rows + `__graft_seq` for engine-typed tables */
  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val seqCounter = new java.util.concurrent.atomic.AtomicLong()

  private def flattenTuple(s: String): Seq[String] = {
    val t = s.trim
    val inner = if (t.startsWith("(")) t.stripPrefix("(").stripSuffix(")")
      else t
    splitTop(inner).map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty)
  }

  /** Parse the ENGINE tail into a merge spec; None = plain storage. */
  private def parseEngine(tail0: String): Option[EngineSpec] = {
    val tail = tail0.trim
    val m = "(?is)^ENGINE\\s*=?\\s*(\\w+)\\s*(\\((.*?)\\))?\\s*(.*)$".r
      .findFirstMatchIn(tail).getOrElse(return None)
    val engName = m.group(1)
    // ENGINE Join(ANY, LEFT, k): the storage DEDUPS at insert — first
    // row per key wins, last with join_any_take_last_row=1 (ref
    // src/Storages/StorageJoin.cpp); ALL-strictness keeps every row
    if (engName.equalsIgnoreCase("join")) {
      val args = Option(m.group(3)).map(splitTop(_).map(_.trim))
        .getOrElse(Seq.empty).filter(_.nonEmpty)
      if (args.length >= 3 && args.head.equalsIgnoreCase("any")) {
        val takeLast = m.group(4) != null && m.group(4).matches(
          "(?is).*join_any_take_last_row\\s*=\\s*1.*")
        return Some(EngineSpec("joinany",
          args.drop(2).map(_.stripPrefix("`").stripSuffix("`")), Nil,
          if (takeLast) Some("last") else None, None))
      }
      return None
    }
    val kind = engName.toLowerCase match {
      case "summingmergetree" => "summing"
      case "replacingmergetree" => "replacing"
      case "collapsingmergetree" => "collapsing"
      case "aggregatingmergetree" => "aggregating"
      case _ => return None
    }
    val args = Option(m.group(3)).map(splitTop(_).map(_.trim))
      .getOrElse(Seq.empty).filter(_.nonEmpty)
    val clauses = m.group(4)
    // one nesting level inside the tuple (toYYYYMM(d), intHash32(k))
    val balTuple = "\\((?:[^()]|\\([^()]*\\))*\\)"
    val orderBy = (s"(?is)\\bORDER\\s+BY\\s+($balTuple|.*?)" +
      "(?=\\s+(?:PARTITION|PRIMARY|SETTINGS|SAMPLE|TTL)\\b|\\s*$)").r
      .findFirstMatchIn(clauses).map(_.group(1).trim)
    val partBy = (s"(?is)\\bPARTITION\\s+BY\\s+($balTuple|" +
      "\\w+$balTuple|\\S+)").r
      .findFirstMatchIn(clauses).map(_.group(1).trim)
    // deprecated syntax: (date, [sampling,] keyTuple, granularity[, extra])
    val granIdx = args.indexWhere(a => a.matches("\\d+"), 1)
    if (orderBy.isEmpty && granIdx >= 2) {
      val date = args(0).stripPrefix("`").stripSuffix("`")
      val keys = date +: flattenTuple(args(granIdx - 1))
      val extra = args.drop(granIdx + 1).headOption
      kind match {
        case "summing" =>
          Some(EngineSpec(kind, keys, extra.map(flattenTuple)
            .getOrElse(Seq.empty), None, None))
        case "replacing" => Some(EngineSpec(kind, keys, Nil,
          extra.map(_.stripPrefix("`").stripSuffix("`")), None))
        case _ => Some(EngineSpec(kind, keys, Nil, None,
          extra.map(_.stripPrefix("`").stripSuffix("`"))))
      }
    } else if (orderBy.isDefined) {
      val keys0 = flattenTuple(orderBy.get)
        .filterNot(_.equalsIgnoreCase("tuple()"))
      // merges only combine rows of one partition — the partition
      // expression joins the grouping key
      val keys = keys0 ++ partBy.map(_.trim).filter(_.nonEmpty).toSeq
      kind match {
        case "summing" => Some(EngineSpec(kind, keys,
          args.headOption.map(flattenTuple).getOrElse(Seq.empty),
          None, None))
        case "replacing" => Some(EngineSpec(kind, keys, Nil,
          args.headOption.map(_.stripPrefix("`").stripSuffix("`")), None))
        case _ => Some(EngineSpec(kind, keys, Nil, None,
          args.headOption.map(_.stripPrefix("`").stripSuffix("`"))))
      }
    } else None
  }

  /** Apply the engine's merge to staged rows (which carry __graft_seq). */
  private def mergeTransform(df: DataFrame, spec: EngineSpec,
      types: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dataCols = df.columns.filterNot(_ == "__graft_seq").toSeq
    val keyAliases = spec.keys.zipWithIndex.map { case (k, i) => s"__gk$i" }
    val withKeys = spec.keys.zip(keyAliases).foldLeft(df) {
      case (d, (k, a)) => d.withColumn(a, expr(k))
    }
    spec.kind match {
      case "replacing" =>
        val ord = spec.ver.map(v => Seq(col(v).desc, col("__graft_seq").desc))
          .getOrElse(Seq(col("__graft_seq").desc))
        val w = (if (keyAliases.isEmpty)
            Window.partitionBy(lit(1))
          else Window.partitionBy(keyAliases.map(col): _*))
          .orderBy(ord: _*)
        withKeys.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1)
          .select(dataCols.head, dataCols.tail :+ "__graft_seq": _*)
      case "summing" =>
        val schema = df.schema
        val sums =
          if (spec.sumCols.nonEmpty) spec.sumCols
          else dataCols.filter { c =>
            !spec.keys.contains(c) && (schema(c).dataType match {
              case _: org.apache.spark.sql.types.NumericType => true
              case _ => false
            })
          }
        // Nested "maps" (ref SummingSortedAlgorithm.cpp MapDescription;
        // 00146/00148): a Nested group `X.ID, X.Num…` — all arrays, the
        // first the key — merges by summing values per key, keys
        // sorted, entries whose every value sums to zero erased.
        val nestedGroups: Seq[(String, Seq[String])] = dataCols
          .filter(_.contains("."))
          .groupBy(_.takeWhile(_ != '.')).toSeq
          .filter { case (p, cs) =>
            cs.length >= 2 &&
              cs.forall(c => schema(c).dataType
                .isInstanceOf[org.apache.spark.sql.types.ArrayType]) &&
              cs.tail.forall(c => schema(c).dataType
                .asInstanceOf[org.apache.spark.sql.types.ArrayType]
                .elementType
                .isInstanceOf[org.apache.spark.sql.types.NumericType]) &&
              (spec.sumCols.isEmpty || spec.sumCols.contains(p) ||
                cs.forall(spec.sumCols.contains))
          }
          .map { case (p, cs) => (p, cs.toSeq) } // declaration order
        val nestedCols = nestedGroups.flatMap(_._2).toSet
        val aggs = dataCols.map { c =>
          if (sums.contains(c)) {
            // CH sums in the column's own width — wraparound, not
            // promotion (SummingSortedAlgorithm keeps the column type)
            val s0 = sum(col(c))
            val wrapped = types.get(c)
              .map(_.toLowerCase.takeWhile(_.isLetterOrDigit)) match {
              case Some("uint8") => pmod(s0, lit(256L))
              case Some("uint16") => pmod(s0, lit(65536L))
              case Some("uint32") => pmod(s0, lit(4294967296L))
              case Some("int8") =>
                pmod(s0 + lit(128L), lit(256L)) - lit(128L)
              case Some("int16") =>
                pmod(s0 + lit(32768L), lit(65536L)) - lit(32768L)
              case Some("int32") => pmod(s0 + lit(2147483648L),
                lit(4294967296L)) - lit(2147483648L)
              case _ => s0
            }
            wrapped.cast(schema(c).dataType).as(c)
          } else if (nestedCols.contains(c))
            flatten(collect_list(col(s"`$c`"))).as(c)
          else min_by(col(c), col("__graft_seq")).as(c)
        } :+ min(col("__graft_seq")).as("__graft_seq")
        val g0 = (if (keyAliases.isEmpty) withKeys.groupBy()
          else withKeys.groupBy(keyAliases.map(col): _*))
          .agg(aggs.head, aggs.tail: _*)
        // per-key value summation for the Nested map groups
        val g = nestedGroups.foldLeft(g0) { case (acc0, (_, cs)) =>
          val idC = cs.head
          val valCs = cs.tail
          val ids = col(s"`$idC`")
          val keys0 = array_sort(array_distinct(ids))
          def sumsFor(v: String) = {
            val et = schema(v).dataType
              .asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType
            transform(keys0, k => aggregate(
              zip_with(ids, col(s"`$v`"),
                (i, n) => struct(i.as("i"), n.as("n"))),
              lit(0L).cast(et),
              (accum, p) => accum +
                when(p.getField("i") === k, p.getField("n")).otherwise(0)))
          }
          val sumCols2 = valCs.map(v => sumsFor(v))
          // erase entries whose every value summed to zero
          val liveIdx = filter(
            transform(keys0, (_, i) => i),
            i => sumCols2.map(s => get(s, i) =!= 0)
              .reduce(_ || _))
          var acc = acc0.withColumn(idC,
            transform(liveIdx, i => get(keys0, i)))
          valCs.zip(sumCols2).foreach { case (v, s) =>
            acc = acc.withColumn(v, transform(liveIdx, i => get(s, i))
              .cast(schema(v).dataType))
          }
          acc
        }
        // a fully-zeroed summed row is deleted on merge (ref
        // SummingSortedAlgorithm.cpp current_row_is_zero)
        val keep = sums.map(c => coalesce(col(c) =!= 0, lit(false)))
          .reduceOption(_ || _).getOrElse(lit(true))
        g.filter(keep)
          .select(dataCols.head, dataCols.tail :+ "__graft_seq": _*)
      case "aggregating" =>
        // AggregatingMergeTree merge: rows with an equal sort key
        // combine by MERGING each AggregateFunction column's state (ref
        // src/Processors/Merges/Algorithms/AggregatingSortedAlgorithm);
        // plain and SimpleAggregateFunction columns keep first/fn value
        val aggFnRe =
          "(?is)^\\s*(Simple)?AggregateFunction\\s*\\(\\s*([A-Za-z_]\\w*).*".r
        val aggs = dataCols.map { c =>
          val isKey = spec.keys.contains(c)
          val m = types.get(c).flatMap(aggFnRe.findFirstMatchIn)
          if (isKey || m.isEmpty) min_by(col(c), col("__graft_seq")).as(c)
          else {
            val fn = m.get.group(2).toLowerCase
            val e = fn match {
              case "uniq" | "uniqexact" | "groupuniqarray" =>
                array_sort(array_distinct(flatten(collect_list(col(c)))))
              case "grouparray" | "quantile" | "quantiles" | "median" =>
                flatten(collect_list(col(c)))
              case "sum" | "count" | "sumwithoverflow" =>
                sum(col(c)).cast(df.schema(c).dataType)
              case "min" => min(col(c))
              case "max" => max(col(c))
              case "any" => min_by(col(c), col("__graft_seq"))
              case "anylast" => max_by(col(c), col("__graft_seq"))
              case "avg" => struct(
                sum(col(c).getField("s")).as("s"),
                sum(col(c).getField("c")).as("c"))
              case _ => min_by(col(c), col("__graft_seq"))
            }
            e.as(c)
          }
        } :+ min(col("__graft_seq")).as("__graft_seq")
        (if (keyAliases.isEmpty) withKeys.groupBy()
         else withKeys.groupBy(keyAliases.map(col): _*))
          .agg(aggs.head, aggs.tail: _*)
          .select(dataCols.head, dataCols.tail :+ "__graft_seq": _*)
      case "joinany" =>
        // StorageJoin ANY: first row per key (insertion order), last
        // with join_any_take_last_row=1
        val pick: String => org.apache.spark.sql.Column = c =>
          if (spec.ver.contains("last")) max_by(col(c), col("__graft_seq"))
          else min_by(col(c), col("__graft_seq"))
        val aggs = dataCols.map(c => pick(c).as(c)) :+
          min(col("__graft_seq")).as("__graft_seq")
        (if (keyAliases.isEmpty) withKeys.groupBy()
         else withKeys.groupBy(keyAliases.map(col): _*))
          .agg(aggs.head, aggs.tail: _*)
          .select(dataCols.head, dataCols.tail :+ "__graft_seq": _*)
      case _ =>
        // collapsing (ref CollapsingSortedAlgorithm::insertRows, with
        // only_positive_sign=false — the merge path): per key, when the
        // last row is positive or the counts differ, keep the FIRST
        // negative row if pos <= neg and the LAST positive row if
        // pos >= neg; equal counts ending negative cancel completely
        val sgn = spec.sign.getOrElse(return df)
        val wp = (if (keyAliases.isEmpty) Window.partitionBy(lit(1))
          else Window.partitionBy(keyAliases.map(col): _*))
        val w = wp.orderBy(col("__graft_seq"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val sg = col(sgn)
        val agg = withKeys
          .withColumn("__graft_pos",
            sum(when(sg > 0, 1).otherwise(0)).over(w))
          .withColumn("__graft_neg",
            sum(when(sg < 0, 1).otherwise(0)).over(w))
          .withColumn("__graft_last_sign", last(sg).over(w))
          .withColumn("__graft_fn",
            min(when(sg < 0, col("__graft_seq"))).over(w))
          .withColumn("__graft_lp",
            max(when(sg > 0, col("__graft_seq"))).over(w))
        val entered = col("__graft_last_sign") > 0 ||
          col("__graft_pos") =!= col("__graft_neg")
        val keep = entered && (
          (col("__graft_pos") <= col("__graft_neg") && sg < 0 &&
            col("__graft_seq") === col("__graft_fn")) ||
          (col("__graft_pos") >= col("__graft_neg") && sg > 0 &&
            col("__graft_seq") === col("__graft_lp")))
        agg.filter(keep)
          .select(dataCols.head, dataCols.tail :+ "__graft_seq": _*)
    }
  }

  /** Key columns of a StorageJoin(ANY,…) table, for joinGet probes. */
  def joinEngineKeys(name: String): Option[Seq[String]] =
    engines.get(name).filter(_.kind == "joinany").map(_.keys)

  /** Re-register the public view and the FINAL view from staged rows.
    * StorageJoin dedups at INSERT time, so its public view is already
    * the merged state. */
  private def publish(spark: SparkSession, name: String): Unit =
    staged.get(name).foreach { df =>
      val pub0 = df.drop("__graft_seq")
      val pub = engines.get(name).filter(_.kind == "joinany").flatMap {
        sp =>
          try Some(mergeTransform(df, sp, chTypes.getOrElse(name, Map.empty))
            .drop("__graft_seq"))
          catch { case _: Exception => None }
      }.getOrElse(pub0)
      withAliasCols(name, withDeclaredDt64(name, pub))
        .createOrReplaceTempView(name)
      engines.get(name).foreach { spec =>
        try withAliasCols(name, withDeclaredDt64(name,
          mergeTransform(df, spec, chTypes.getOrElse(name, Map.empty))
            .drop("__graft_seq")))
          .createOrReplaceTempView(s"__graft_final_$name")
        catch { case _: Exception => engines.remove(name) }
      }
    }

  /** `FROM t FINAL` → the merged view, for engine-typed staged tables
    * (called by the golden runner before dialect translation; ChSql
    * otherwise strips FINAL). */
  def rewriteFinal(stmt: String): String = {
    // string-literal-safe: a query_log filter like
    // query='… FROM t FINAL;' must keep its literal intact (01524)
    var s = stmt
    for (name <- engines.keys)
      s = graft.ChSql.replaceOutsideStrings(s,
        s"(?i)\\b(FROM|JOIN)\\s+`?$name`?\\s+FINAL\\b",
        s"$$1 __graft_final_$name")
    s
  }

  /** Declared DEFAULT/MATERIALIZED column expressions per table: INSERTs
    * that omit the column compute it from the inserted row (ref
    * src/Interpreters/addMissingDefaults.cpp) rather than taking the
    * type default. */
  private val defExprs =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]
  /** ALIAS columns per table, in declared order: NEVER stored — computed
    * from the row at READ time (ref src/Storages/ColumnDefault.h:
    * ColumnDefaultKind::Alias), so they live on the registered view, not
    * in the staged data, and star expansion excludes them. */
  private val aliasExprs =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String)]]
  /** MATERIALIZED column names per table: stored (computed at INSERT)
    * but, like ALIAS, excluded from `SELECT *` (ref
    * src/Interpreters/TranslateQualifiedNamesVisitor.cpp — asterisks
    * expand to ordinary columns only). */
  private val matCols =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]
  /** Distributed(…) tables registered as live views over their local
    * table: INSERTs forward to the underlying storage (ref
    * src/Storages/StorageDistributed.cpp write path). */
  private val distributedAlias =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** zookeeper path → first replica's table name (Replicated*MergeTree
    * replicas share storage — see the createRe replica branch). */
  private val replicaPrimary =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** (name, expr, declaredType?) when the def declares an ALIAS column —
    * the type is optional (`c ALIAS a + b`). */
  private def aliasSplit(cd: String): Option[(String, String, Option[String])] = {
    val t = cd.trim
    val sp = t.indexWhere(_.isWhitespace)
    if (sp <= 0) return None
    val name = t.take(sp).stripPrefix("`").stripSuffix("`")
    val rest = t.drop(sp).trim
    "(?is)^(.*?)\\bALIAS\\b\\s+(.*)$".r.findFirstMatchIn(rest).flatMap { mm =>
      val pre = mm.group(1).trim
      if (pre.matches("(?is).*\\b(DEFAULT|MATERIALIZED)\\b.*")) None
      else {
        var e = mm.group(2).trim
        for (kw <- Seq("CODEC", "COMMENT", "TTL")) {
          val i = e.toUpperCase.indexOf(" " + kw)
          if (i >= 0) e = e.take(i).trim
        }
        Some((name, e, if (pre.isEmpty) None else Some(pre)))
      }
    }
  }
  private def recordAliases(table: String, colDefs: String): Unit = {
    val as = splitTop(colDefs).flatMap(aliasSplit).map(a => a._1 -> a._2)
    if (as.nonEmpty) aliasExprs(table) = as else aliasExprs.remove(table)
  }

  /** DESCRIBE TABLE rows (ref src/Interpreters/InterpreterDescribeQuery
    * .cpp): one row per DECLARED column — stored, MATERIALIZED and ALIAS
    * alike, in declaration order — with the CH type text and the default
    * kind/expression. Maintained through CREATE and ALTER so DESC after
    * ALTER reflects the live structure (unlike SHOW CREATE, which renders
    * the recorded CREATE). */
  final case class DescCol(name: String, typ: String, kind: String,
      expr: String)
  private val descColsMap =
    scala.collection.concurrent.TrieMap.empty[String, Seq[DescCol]]
  def describeTable(name: String): Option[Seq[DescCol]] =
    descColsMap.get(name.stripPrefix("__graft_final_"))
  private def parseDescCol(cd: String): Option[DescCol] = {
    val t = cd.trim
    val sp = t.indexWhere(_.isWhitespace)
    if (sp <= 0) {
      // bare name, no type (illegal in CH) — skip
      return None
    }
    val name = t.take(sp).stripPrefix("`").stripSuffix("`")
    var rest = t.drop(sp).trim
    // strip declaration tails that DESC reports in their own columns
    for (kw <- Seq("CODEC", "COMMENT", "TTL")) {
      val i = rest.toUpperCase.indexOf(" " + kw)
      if (i >= 0) rest = rest.take(i).trim
    }
    val m = "(?is)^(.*?)\\b(DEFAULT|MATERIALIZED|ALIAS|EPHEMERAL)\\b\\s*(.*)$"
      .r.findFirstMatchIn(rest)
    m match {
      case Some(mm) =>
        Some(DescCol(name,
          canonTypeText(mm.group(1).trim.replaceAll("\\s+", " ")),
          mm.group(2).toUpperCase, mm.group(3).trim))
      case None =>
        Some(DescCol(name,
          canonTypeText(rest.replaceAll("\\s+", " ")), "", ""))
    }
  }
  /** A type-less `c ALIAS expr` / `c DEFAULT expr` declaration reports
    * the INFERRED type in DESC/SHOW CREATE (ref InterpreterCreateQuery
    * column default processing) — infer from siblings' declared types. */
  private def inferDescTypes(ds: Seq[DescCol]): Seq[DescCol] = {
    import graft.functions.ChTypes
    val env: Map[String, ChTypes.T] = ds.flatMap(c =>
      if (c.typ.nonEmpty) ChTypes.parseTypeText(c.typ).map(c.name -> _)
      else None).toMap
    ds.map(c =>
      if (c.typ.nonEmpty || c.expr.isEmpty) c
      else ChTypes.parse(c.expr).flatMap(ChTypes.infer(_, env))
        .map(t => c.copy(typ = t.name)).getOrElse(c))
  }
  private def recordDescCols(table: String, colDefs: String): Unit = {
    val ds = inferDescTypes(splitTop(colDefs).filterNot(isNonColumnDef)
      .flatMap(parseDescCol))
    if (ds.nonEmpty) descColsMap(table) = ds else descColsMap.remove(table)
  }
  private def descInsert(table: String, dc: DescCol,
      after: Option[String], first: Boolean): Unit = {
    val cur = descColsMap.getOrElse(table, Nil)
    // ADD COLUMN IF NOT EXISTS of an existing column is a no-op — it
    // must not move or retype the original declaration
    if (cur.exists(_.name == dc.name)) return
    val pos =
      if (first) 0
      else after.map(a => cur.indexWhere(_.name == a) + 1)
        .filter(_ > 0).getOrElse(cur.length)
    descColsMap(table) =
      inferDescTypes((cur.take(pos) :+ dc) ++ cur.drop(pos))
  }

  /** Re-render the canonical CREATE's column block from the live
    * descCols registry, so SHOW CREATE reflects ALTERs (ref
    * InterpreterShowCreateQuery renders the CURRENT metadata). */
  private def regenDdl(name: String): Unit =
    for (ds <- descColsMap.get(name); old <- createdDdl.get(name)) {
      val open = old.indexOf("(\n")
      val close = old.indexOf("\n)\n")
      if (open >= 0 && close > open) {
        val cols = ds.map { c =>
          val kind =
            if (c.kind.isEmpty) ""
            else s" ${c.kind}" + (if (c.expr.isEmpty) "" else s" ${c.expr}")
          val typ = if (c.typ.isEmpty) "" else s" ${c.typ}"
          s"    `${c.name}`$typ$kind"
        } ++ extraDefs.getOrElse(name, Nil).map("    " + _)
        createdDdl(name) =
          old.substring(0, open + 2) + cols.mkString(",\n") +
            old.substring(close)
      }
    }
  /** Substitute ALIAS column references in an expression with their
    * definitions (INSERT defaults and ALTER ADDs may reference them,
    * but only the view carries them). */
  private def expandAliases(table: String, e0: String): String = {
    val as = aliasExprs.getOrElse(table, Nil)
    var e = e0
    var rounds = 0
    var changed = true
    while (changed && rounds < 4) {
      changed = false; rounds += 1
      for ((n, ae) <- as) {
        val re = s"(?i)(?<![\\w.`])${java.util.regex.Pattern.quote(n)}(?![\\w`])"
        val e2 = e.replaceAll(re,
          java.util.regex.Matcher.quoteReplacement(s"($ae)"))
        if (e2 != e) { e = e2; changed = true }
      }
    }
    e
  }
  private def recordDefaults(table: String, colDefs: String,
      merge: Boolean = false): Unit = {
    val defs = splitTop(colDefs).filterNot(isNonColumnDef)
      .filter(cd => aliasSplit(cd).isEmpty)
    val m0 = defs.flatMap { cd =>
      val t = cd.trim
      val sp = t.indexWhere(_.isWhitespace)
      if (sp <= 0) None
      else {
        val cn = t.take(sp).stripPrefix("`").stripSuffix("`")
        "(?is)\\b(?:DEFAULT|MATERIALIZED)\\s+(.*)$".r
          .findFirstMatchIn(t.drop(sp)).map { mm =>
            var e = mm.group(1).trim
            for (kw <- Seq("CODEC", "COMMENT", "TTL")) {
              val i = e.toUpperCase.indexOf(" " + kw)
              if (i >= 0) e = e.take(i).trim
            }
            cn -> e
          }
      }
    }.toMap
    // ALTER ADD/MODIFY passes ONE column def: merge it into the table's
    // map instead of clobbering the other columns' defaults
    val m = if (merge) defExprs.getOrElse(table, Map.empty) ++ m0 else m0
    if (m.nonEmpty) defExprs(table) = m else defExprs.remove(table)
    val mats0 = defs.flatMap { cd =>
      val t = cd.trim
      val sp = t.indexWhere(_.isWhitespace)
      if (sp > 0 && t.drop(sp).matches("(?is).*\\bMATERIALIZED\\b.*"))
        Some(t.take(sp).stripPrefix("`").stripSuffix("`"))
      else None
    }.toSet
    val mats = if (merge) matCols.getOrElse(table, Set.empty) ++ mats0
      else mats0
    if (mats.nonEmpty) matCols(table) = mats else matCols.remove(table)
  }
  /** Declared CH type text per column (summing-merge width wrap and
    * toTypeName folding over staged tables). */
  private val chTypes =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]
  // surface declared types to the dialect's toTypeName folding
  graft.ChSql.declaredColumnType = (c: String) =>
    chTypes.values.flatMap(_.get(c)).headOption
  // table-scoped variant: only the tables the caller's plan actually
  // reads are consulted (empty scope = global, the legacy behavior)
  graft.ChSql.declaredColumnTypeIn = (c: String, tables: Set[String]) => {
    val maps =
      if (tables.isEmpty) chTypes.values
      else chTypes.collect {
        case (t, m) if tables.contains(t.toLowerCase) => m
      }
    maps.flatMap(_.get(c)).headOption
  }
  // cheap gate for the Bool display rewrite — Bool inside ANY wrapper
  // (Nullable, LowCardinality, Array, Tuple) counts (advice r10)
  graft.ChSql.anyDeclaredBool = () => chTypes.values.exists(_.values
    .exists(t =>
      "(?i)(?<![A-Za-z])Bool(?![A-Za-z])".r.findFirstIn(t).isDefined))
  /** Canonical CREATE text per table, for SHOW CREATE TABLE (ref
    * src/Interpreters/InterpreterShowCreateQuery.cpp renders the stored
    * AST: one backquoted column per line, ENGINE tail as declared,
    * MergeTree-family tables get the default index_granularity appended
    * when the statement declared no SETTINGS). Best-effort textual
    * canonicalization — tests declare canonical type names. */
  private val createdDdl =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def showCreate(name: String): Option[String] = createdDdl.get(name)
  /** ENGINE and SETTINGS lines of the canonical CREATE (the explain
    * prewhere display needs the storage kind and wide-part settings). */
  def engineTextOf(name: String): Option[String] =
    createdDdl.get(name).flatMap(
      _.linesIterator.find(_.startsWith("ENGINE = ")))
  def settingsTextOf(name: String): Option[String] =
    createdDdl.get(name).flatMap(
      _.linesIterator.find(_.startsWith("SETTINGS ")))
  def knownTables: Set[String] = createdDdl.keySet.toSet
  /** ALTER TABLE … MODIFY SETTING overrides (part-type thresholds). */
  val settingOverrides = scala.collection.concurrent.TrieMap
    .empty[String, Map[String, Long]]
  /** Estimated in-memory width of a CH type (part-type estimation). */
  def chTypeWidth(t: String): Int = {
    val b = t.trim.replaceAll("(?i)^(Nullable|LowCardinality)\\(", "")
    if (b.matches("(?i)(UInt8|Int8|Enum8|Bool).*")) 1
    else if (b.matches("(?i)(UInt16|Int16|Date|Enum16).*")) 2
    else if (b.matches("(?i)(UInt32|Int32|Float32|DateTime|IPv4).*")) 4
    else if (b.matches("(?i)(UInt64|Int64|Float64|DateTime64|Decimal).*")) 8
    else 100
  }
  /** Part type at creation time (ref MergeTreeDataWriter choosePartType:
    * Wide iff rows >= min_rows_for_wide_part AND bytes >=
    * min_bytes_for_wide_part, with bytes estimated from declared
    * widths; 01606/01824). */
  def partTypeFor(table: String, rows: Long): String = {
    val minRows = mtSettingNum(table, "min_rows_for_wide_part", 0L)
    val minBytes =
      mtSettingNum(table, "min_bytes_for_wide_part", 10485760L)
    val rowW = rowWidthOf(table)
    if (rows >= minRows && rows * rowW >= minBytes) "Wide" else "Compact"
  }

  /** Effective MergeTree setting for a table: ALTER MODIFY SETTING
    * override, then the CREATE's SETTINGS text, then the default. */
  private[golden] def mtSettingNum(table: String, k: String,
      d: Long): Long = {
    val over = settingOverrides.getOrElse(table, Map.empty)
    over.getOrElse(k, (k + "\\s*=\\s*(\\d+)").r
      .findFirstMatchIn(settingsTextOf(table).getOrElse(""))
      .map(_.group(1).toLong).getOrElse(d))
  }

  /** Estimated uncompressed byte width of one row. */
  private[golden] def rowWidthOf(table: String): Long =
    chTypes.get(table)
      .map(_.values.map(chTypeWidth).sum.max(1)).getOrElse(16).toLong

  /** Deterministic per-table UUID (system.tables ↔ part_log joins in
    * 02491; Atomic-database tables always carry one). */
  private[golden] def uuidOf(table: String): String =
    java.util.UUID.nameUUIDFromBytes(
      ("graft:" + table).getBytes("UTF-8")).toString
  /** Tables with ENGINE = Null: direct reads are empty, but a
    * MATERIALIZED VIEW over one still sees every inserted block (ref
    * src/Storages/StorageNull.h) — inserts land in a shadow store the
    * MV selects read. */
  private[golden] val nullEngines =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private[golden] def nullShadow(t: String) = s"__graft_nullsrc_$t"

  /** CH prints CANONICAL type names in SHOW CREATE / DESC (ref
    * src/DataTypes/DataTypeFactory.cpp alias registration): SQL-standard
    * aliases resolve to the native name, and a plain Enum takes the
    * width its values fit (Enum8 for -128..127, else Enum16; ref
    * src/DataTypes/DataTypeEnum.cpp). Only the leading type token is
    * rewritten — DEFAULT/CODEC expressions after it are left alone. */
  private[golden] def canonTypeText(t0: String): String = {
    var t = t0
    val aliases = Map(
      "tinyint" -> "Int8", "int1" -> "Int8", "byte" -> "Int8",
      "smallint" -> "Int16", "int2" -> "Int16",
      "int" -> "Int32", "int4" -> "Int32", "integer" -> "Int32",
      "mediumint" -> "Int32",
      "bigint" -> "Int64", "int8" -> "Int64",
      "float" -> "Float32", "real" -> "Float32", "single" -> "Float32",
      "double" -> "Float64",
      "varchar" -> "String", "text" -> "String", "char" -> "String",
      "blob" -> "String", "clob" -> "String",
      "boolean" -> "Bool", "binary" -> "String")
    // leading alias token (possibly wrapped in Nullable/Array/
    // LowCardinality) — rewrite word-wise, case-insensitively, but only
    // LOWER/UPPER-cased alias spellings: `Int8`-style canonical names
    // must not match the `int8` alias
    t = "(?<![\\w])([A-Za-z]+)(?![\\w(])".r.replaceAllIn(t, m => {
      val w = m.group(1)
      aliases.get(w.toLowerCase) match {
        case Some(c) if w == w.toLowerCase || w == w.toUpperCase => c
        case _ => m.group(1)
      }
    })
    // Enum → Enum8/Enum16 by value range
    val enumRe = "(?i)(?<![\\w])Enum\\(".r
    enumRe.findFirstMatchIn(t).foreach { m =>
      val vals = "=\\s*(-?\\d+)".r.findAllMatchIn(t.drop(m.end))
        .map(_.group(1).toLong).toSeq
      val w = if (vals.forall(v => v >= -128 && v <= 127)) "Enum8"
        else "Enum16"
      t = t.substring(0, m.start) + w + "(" + t.substring(m.end)
    }
    t
  }

  /** INDEX / PROJECTION / CONSTRAINT table-level definitions rendered
    * the way InterpreterShowCreateQuery prints them: the index
    * expression loses its call-style parens and gains the default
    * GRANULARITY 1; a projection renders as an indented SELECT block
    * with uppercased keywords. */
  private def renderNonColumnDef(cd0: String): String = {
    val cd = cd0.trim.replaceAll("\\s+", " ")
    val idx = ("(?is)^INDEX\\s+`?([\\w]+)`?\\s*(.*?)\\s+TYPE\\s+(.+?)" +
      "(?:\\s+GRANULARITY\\s+(\\d+))?$").r
    val proj = "(?is)^PROJECTION\\s+`?([\\w]+)`?\\s*\\((.*)\\)$".r
    cd match {
      case idx(name, expr0, typ, gran) =>
        var expr = expr0.trim
        // `bf_idx(name)` parses as name + parenthesized expression —
        // a single bare identifier renders without the parens
        if (expr.matches("\\(\\s*`?[\\w]+`?\\s*\\)"))
          expr = expr.stripPrefix("(").stripSuffix(")").trim
        val g = Option(gran).getOrElse("1")
        s"INDEX $name $expr TYPE $typ GRANULARITY $g"
      case proj(name, body) =>
        s"PROJECTION $name\n    (\n        ${renderProjectionSelect(body)}\n    )"
      case other => other
    }
  }

  private def renderProjectionSelect(body0: String): String = {
    var b = body0.trim.replaceAll("\\s+", " ")
    // uppercase the clause keywords (outside strings; projection bodies
    // in the tests carry no string literals with keywords)
    for (kw <- Seq("select", "apply", "order by", "group by", "with"))
      b = ("(?i)(?<![\\w])" + kw.replace(" ", "\\s+") + "(?![\\w])").r
        .replaceAllIn(b, kw.toUpperCase)
    // ORDER BY / GROUP BY start a new line inside the block
    b.replaceAll("\\s+(ORDER BY|GROUP BY)\\b", "\n        $1")
  }

  /** Table-level INDEX/PROJECTION/CONSTRAINT lines (already rendered),
    * kept so regenDdl and ALTER ADD/DROP PROJECTION preserve them. */
  private val extraDefs =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]
  /** Simple one-column ASSUME constraints per table, for the
    * constraints-based WHERE simplification display (ref
    * src/Interpreters/WhereConstraintsOptimizer.cpp; 01622):
    * (column, op, bound) with op in <, <=, >, >=, =. */
  val assumeConstraints = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(String, String, BigDecimal)]]
  private def recordConstraints(table: String,
      extraRaw: Seq[String]): Unit = {
    val re = ("(?is)^CONSTRAINT\\s+`?\\w+`?\\s+ASSUME\\s+" +
      "`?(\\w+)`?\\s*(<=|>=|<|>|==?)\\s*(-?\\d+(?:\\.\\d+)?)$").r
    // splitTop's angle-bracket tracking miscounts the `>` of `>=`, so
    // several constraints can arrive glued in one item — re-split flat
    val cs = extraRaw.flatMap(x => splitTop(x, angled = false))
      .map(_.trim.replaceAll("\\s+", " ")).flatMap { cd =>
        re.findFirstMatchIn(cd).map(m =>
          (m.group(1), if (m.group(2) == "==") "=" else m.group(2),
            BigDecimal(m.group(3))))
      }
    if (cs.nonEmpty) assumeConstraints(table) = cs
    else assumeConstraints.remove(table)
  }
  private[golden] def addProjection(table: String, name: String,
      body: String): Unit = {
    val line =
      s"PROJECTION $name\n    (\n        ${renderProjectionSelect(body)}\n    )"
    extraDefs(table) = extraDefs.getOrElse(table, Nil) :+ line
    regenDdl(table)
  }
  private[golden] def dropProjection(table: String, name: String): Unit = {
    extraDefs.get(table).foreach { ds =>
      extraDefs(table) = ds.filterNot(_.startsWith(s"PROJECTION $name\n"))
    }
    regenDdl(table)
  }

  private def recordDdl(table: String, colDefs: String,
      engTail: String): Unit = {
    nullEngines(table) = Option(engTail).exists(_.matches(
      "(?is)\\s*(ENGINE\\s*=?\\s*)?Null\\b(?!\\w).*"))
    val (extraRaw, colRaw) = splitTop(colDefs).map(_.trim)
      .filter(_.nonEmpty).partition(isNonColumnDef)
    val extras = extraRaw.map(renderNonColumnDef)
    if (extras.nonEmpty) extraDefs(table) = extras
    else extraDefs.remove(table)
    recordConstraints(table, extraRaw)
    val cols = colRaw.map { cd =>
      val sp = cd.indexWhere(_.isWhitespace)
      if (sp <= 0) cd
      else {
        val n = cd.take(sp).stripPrefix("`").stripSuffix("`")
        var rest = cd.drop(sp).trim.replaceAll("\\s+", " ")
        // a type-less `c ALIAS/DEFAULT expr` renders with its INFERRED
        // type (recordDescCols ran just before and inferred it)
        if (rest.matches("(?is)^(ALIAS|DEFAULT|MATERIALIZED)\\b.*"))
          descColsMap.get(table).flatMap(_.find(_.name == n))
            .filter(_.typ.nonEmpty)
            .foreach(c => rest = s"${c.typ} $rest")
        else {
          // canonicalize only the TYPE prefix, not default expressions
          val stop = "(?i)\\s+(DEFAULT|MATERIALIZED|ALIAS|CODEC|COMMENT|TTL|EPHEMERAL)\\b"
            .r.findFirstMatchIn(rest).map(_.start).getOrElse(rest.length)
          rest = canonTypeText(rest.take(stop)) + rest.drop(stop)
        }
        s"`$n` $rest"
      }
    }
    var eng = Option(engTail).map(_.trim.stripSuffix(";").trim)
      .filter(_.nonEmpty)
      .map(_.replaceAll("(?is)^ENGINE\\s*=?\\s*", "ENGINE = ")
        .replaceAll("\\s+", " "))
      .getOrElse("ENGINE = Memory")
    // CH prints MergeTree() as MergeTree and appends default SETTINGS
    eng = eng.replaceAll("(?i)^(ENGINE = \\w*MergeTree)\\(\\)", "$1")
    // server-side macro expansion in Replicated zookeeper paths (ref
    // src/Common/Macros.cpp; 01135 pins {database} -> default)
    val curDb = Option(graft.ChSql.currentDb).filter(_.nonEmpty)
      .getOrElse("default")
    eng = eng.replace("{database}", curDb).replace("{table}", table)
    // ODBC-style federation engines quote their identifier args (ref
    // src/Storages/StorageODBC.cpp getCreateQuery; 01033)
    val odbcRe = "(?i)^(ENGINE = (?:ODBC|JDBC)\\()([^)]*)(\\).*)$".r
    eng = eng match {
      case odbcRe(pre, args, post) =>
        pre + splitTop(args).map(_.trim).map(a =>
          if (a.matches("[A-Za-z_][\\w.]*")) s"'$a'" else a)
          .mkString(", ") + post
      case e => e
    }
    if (eng.matches("(?is).*MergeTree\\b.*") &&
        !eng.matches("(?is).*\\bSETTINGS\\b.*"))
      eng += "\nSETTINGS index_granularity = 8192"
    // an explicit SETTINGS list still gets the default appended (CH
    // always prints index_granularity for MergeTree; 01278)
    else if (eng.matches("(?is).*MergeTree\\b.*") &&
        !eng.matches("(?is).*\\bindex_granularity\\b.*"))
      eng += ", index_granularity = 8192"
    // ORDER BY/PARTITION BY/etc. clauses each on their own line,
    // keywords uppercased (CH renders the AST, not the input casing)
    eng =
      ("(?i)\\s+(ORDER BY|PARTITION BY|PRIMARY KEY|SAMPLE BY|TTL|" +
        "SETTINGS|COMMENT)\\b").r.replaceAllIn(eng,
        m => "\n" + m.group(1).toUpperCase)
    createdDdl(table) = "CREATE TABLE default." + table + "\n(\n" +
      (cols ++ extraDefs.getOrElse(table, Nil))
        .map("    " + _).mkString(",\n") + "\n)\n" + eng
  }

  private def recordChTypes(table: String, colDefs: String): Unit = {
    val m = splitTop(colDefs).flatMap { cd =>
      val t = cd.trim
      val sp = t.indexWhere(_.isWhitespace)
      if (sp <= 0) None
      else {
        var ty = t.drop(sp).trim
        val stop = "(?is)\\s+(DEFAULT|MATERIALIZED|ALIAS|CODEC|TTL|COMMENT|EPHEMERAL)\\b".r
        stop.findFirstMatchIn(ty).foreach(mm => ty = ty.take(mm.start).trim)
        if (ty.isEmpty) None
        else Some(t.take(sp).stripPrefix("`").stripSuffix("`") -> ty)
      }
    }.toMap
    if (m.nonEmpty) chTypes(table) = m else chTypes.remove(table)
  }

  private def recordNullables(table: String, colDefs: String): Unit = {
    val cols = splitTop(colDefs).flatMap { cd =>
      val t = cd.trim
      val sp = t.indexWhere(_.isWhitespace)
      if (sp > 0 && t.drop(sp).trim.toLowerCase.startsWith("nullable"))
        Some(t.take(sp).stripPrefix("`").stripSuffix("`").toLowerCase)
      else None
    }.toSet
    if (cols.nonEmpty) nullableDeclared(table) = cols
    else nullableDeclared.remove(table)
  }

  /** Dictionary introspection registry (ref
    * src/Storages/System/StorageSystemDictionaries.cpp,
    * InterpreterShowCreateQuery.cpp dictionary branch): one entry per
    * CREATE DICTIONARY, carrying the pieces SHOW CREATE / SHOW
    * DICTIONARIES / EXISTS DICTIONARY / system.dictionaries render.
    * `loaded` models CH's lazy load: NOT_LOADED until first read. */
  final case class DictDef(folded: String, database: String,
    bareName: String, keys: Seq[(String, String)],
    attrs: Seq[(String, String)], colDefs: String, tail: String,
    var attached: Boolean, var loaded: Boolean, var queryCount: Long)
  val dictDefs =
    scala.collection.concurrent.TrieMap.empty[String, DictDef]

  private def recordDictDef(folded: String, colDefs: String,
      tail: String): Unit = {
    val (db, bare) = graft.ChDatabases.known
      .find(d => folded.startsWith(d + "__"))
      .map(d => (d, folded.stripPrefix(d + "__")))
      .getOrElse(("default", folded))
    val pk = "(?is)PRIMARY\\s+KEY\\s+(.*?)\\s*(?:SOURCE|LAYOUT|LIFETIME|RANGE)\\b"
      .r.findFirstMatchIn(tail).map(_.group(1).trim).getOrElse("")
    val keyNames = pk.split(",").map(
      _.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
    val cols = splitTop(colDefs).map(_.trim).filter(_.nonEmpty).map { cd =>
      val sp = cd.indexWhere(_.isWhitespace)
      val n = cd.take(sp).stripPrefix("`").stripSuffix("`")
      (n, cd.drop(sp).trim.split("\\s+").head)
    }
    val keys = keyNames.map(k =>
      k -> cols.find(_._1 == k).map(_._2).getOrElse("UInt64"))
    val attrs = cols.filterNot(c => keyNames.contains(c._1))
    dictDefs(folded) = DictDef(folded, db, bare, keys, attrs,
      colDefs, tail, attached = true, loaded = false, queryCount = 0)
  }

  /** Canonical SHOW CREATE DICTIONARY rendering (ref
    * src/Parsers/ASTCreateQuery.cpp + ASTDictionary.cpp formatImpl):
    * backticked 4-space-indented attributes, clauses in PRIMARY KEY /
    * SOURCE / LIFETIME / LAYOUT / RANGE order, tcpPort() folded to
    * 9000, passwords hidden. */
  def showCreateDictionary(folded: String): Option[String] =
    dictDefs.get(folded).map { d =>
      val cols = splitTop(d.colDefs).map(_.trim).filter(_.nonEmpty)
        .map { cd =>
          val sp = cd.indexWhere(_.isWhitespace)
          val n = cd.take(sp).stripPrefix("`").stripSuffix("`")
          val rest = cd.drop(sp).trim.replaceAll("\\s+", " ")
          s"    `$n` $rest"
        }
      def balanced(kw: String): Option[String] = {
        val m = s"(?is)\\b$kw\\s*\\(".r.findFirstMatchIn(d.tail)
          .getOrElse(return None)
        var i = m.end; var depth = 1
        while (i < d.tail.length && depth > 0) {
          val c = d.tail.charAt(i)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          i += 1
        }
        Some(d.tail.substring(m.start, i).replaceAll("\\s+", " "))
      }
      val pk = "PRIMARY KEY " + d.keys.map(_._1).mkString(", ")
      val source = balanced("SOURCE").map(_
        .replaceAll("(?i)PORT\\s+tcpPort\\(\\s*\\)", "PORT 9000")
        .replaceAll("(?i)PASSWORD\\s+'[^']*'", "PASSWORD '[HIDDEN]'"))
      val lifetime = balanced("LIFETIME").map { lt =>
        val inner = lt.drop(lt.indexOf('(') + 1).stripSuffix(")").trim
        if (inner.matches("\\d+")) s"LIFETIME(MIN 0 MAX $inner)"
        else "LIFETIME(" + inner.replaceAll("(?i)\\bMIN\\b", "MIN")
          .replaceAll("(?i)\\bMAX\\b", "MAX") + ")"
      }
      val layout = balanced("LAYOUT").map { l =>
        // the argument-less form stays argument-less (01110: the
        // reference echoes LAYOUT(HASHED) without appending "()")
        val inner = l.drop(l.indexOf('(') + 1).stripSuffix(")").trim
        val nm = inner.takeWhile(c => c.isLetterOrDigit || c == '_')
        val rest = inner.drop(nm.length).trim
        s"LAYOUT(${nm.toUpperCase}$rest)"
      }
      val range = balanced("RANGE")
      val clauses = Seq(Some(pk), source, lifetime, layout, range)
        .flatten
      s"CREATE DICTIONARY ${d.database}.${d.bareName}\n(\n" +
        cols.mkString(",\n") + "\n)\n" + clauses.mkString("\n")
    }

  /** `system.dictionaries` stand-in (ref
    * src/Storages/System/StorageSystemDictionaries.cpp): one row per
    * attached dictionary; status reflects CH's lazy load. */
  def registerSystemDictionaries(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("uuid", StringType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("origin", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("key.names", ArrayType(StringType, false),
        nullable = false),
      StructField("key.types", ArrayType(StringType, false),
        nullable = false),
      StructField("attribute.names", ArrayType(StringType, false),
        nullable = false),
      StructField("attribute.types", ArrayType(StringType, false),
        nullable = false),
      StructField("element_count", LongType, nullable = false),
      StructField("query_count", LongType, nullable = false),
      StructField("found_rate", DoubleType, nullable = true),
      StructField("source", StringType, nullable = false),
      StructField("last_exception", StringType, nullable = false)))
    val rows = dictDefs.values.toSeq.filter(_.attached)
      .sortBy(d => (d.database, d.bareName)).map { d =>
        val layout = "(?is)LAYOUT\\s*\\(\\s*(\\w+)".r
          .findFirstMatchIn(d.tail).map(_.group(1)).getOrElse("Flat")
        val cnt =
          if (d.loaded)
            scala.util.Try(spark.table(d.folded).count()).getOrElse(0L)
          else 0L
        org.apache.spark.sql.Row(d.database, d.bareName, "",
          if (d.loaded) "LOADED" else "NOT_LOADED", "", layout,
          d.keys.map(_._1), d.keys.map(_._2),
          d.attrs.map(_._1), d.attrs.map(_._2),
          cnt, d.queryCount, null, "ClickHouse: " + d.database, "")
      }
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_dictionaries")
  }

  /** Mark lazy-load/query-count transitions for dictionaries the
    * statement touches (SELECT FROM the dict view loads it; dictGet
    * loads AND counts — 01254, 01760). */
  def touchDictionaries(chQuery: String): Unit = {
    if (dictDefs.isEmpty) return
    val hasDictGet = chQuery.matches("(?is).*\\bdictGet\\w*\\s*\\(.*") ||
      chQuery.matches("(?is).*\\bdict(Has|IsIn|GetHierarchy)\\s*\\(.*")
    dictDefs.values.foreach { d =>
      val dotted = d.database + "." + d.bareName
      val referenced = chQuery.contains(d.folded) ||
        chQuery.contains(dotted) ||
        (d.database == "default" && chQuery.contains(d.bareName))
      if (referenced && d.attached &&
          !chQuery.toLowerCase.contains("system.dictionaries")) {
        d.loaded = true
        if (hasDictGet) d.queryCount += 1
      }
    }
  }

  /** `system.tables` stand-in (ref
    * src/Storages/System/StorageSystemTables.cpp): one row per live
    * declared table/view. Row counts are live; byte sizes follow the
    * parts heuristic. */
  def registerSystemTables(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      // `table` is an alias column of `name` (StorageSystemTables)
      StructField("table", StringType, nullable = false),
      StructField("uuid", StringType, nullable = false),
      StructField("engine", StringType, nullable = false),
      StructField("is_temporary", IntegerType, nullable = false),
      StructField("create_table_query", StringType, nullable = false),
      StructField("comment", StringType, nullable = false),
      StructField("total_rows", LongType, nullable = true),
      StructField("total_bytes", LongType, nullable = true),
      StructField("lifetime_rows", LongType, nullable = true),
      StructField("lifetime_bytes", LongType, nullable = true),
      StructField("parts", LongType, nullable = true),
      StructField("active_parts", LongType, nullable = true),
      StructField("total_marks", LongType, nullable = true)))
    def unfoldDb(t: String): (String, String) =
      graft.ChDatabases.known.find(d => t.startsWith(d + "__"))
        .map(d => (d, t.stripPrefix(d + "__"))).getOrElse(("default", t))
    val rows = decls.keys.toSeq.sorted
      .filterNot(_.startsWith("__graft")).map { t =>
        val (db, bare) = unfoldDb(t)
        val eng = createdDdl.get(t).flatMap(d =>
          "(?is)ENGINE\\s*=?\\s*(\\w+)".r.findFirstMatchIn(d)
            .map(_.group(1)))
          .getOrElse(if (viewDefs.containsKey(t)) "View" else "Memory")
        val comment = createdDdl.get(t).flatMap(d =>
          "(?is)\\bCOMMENT\\s+'((?:[^'\\\\]|\\\\.)*)'".r
            .findFirstMatchIn(d).map(_.group(1))).getOrElse("")
        val n = scala.util.Try(spark.table(t).count()).toOption
        org.apache.spark.sql.Row(db, bare, bare, uuidOf(t), eng,
          if (tempTables.contains(t)) 1 else 0,
          showCreate(t).getOrElse(""), comment,
          n.map(Long.box).orNull,
          n.map(v => Long.box(v * 16 + 64)).orNull,
          n.map(Long.box).orNull,
          n.map(v => Long.box(v * 16 + 64)).orNull,
          null, null, null)
      }
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_tables")
  }

  /** `system.columns` stand-in (ref
    * src/Storages/System/StorageSystemColumns.cpp): one row per
    * declared column of every live table, in declaration order. A
    * static block for the built-in system tables keeps the view
    * non-empty with no session tables (00696 probes LIMIT n). */
  def registerSystemColumns(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("position", LongType, nullable = false),
      StructField("default_kind", StringType, nullable = false),
      StructField("default_expression", StringType, nullable = false),
      StructField("comment", StringType, nullable = false),
      StructField("compression_codec", StringType, nullable = false),
      StructField("data_compressed_bytes", LongType, nullable = false),
      StructField("data_uncompressed_bytes", LongType, nullable = false)))
    def unfoldDb(t: String): (String, String) =
      graft.ChDatabases.known.find(d => t.startsWith(d + "__"))
        .map(d => (d, t.stripPrefix(d + "__"))).getOrElse(("default", t))
    val builtin = Seq(
      ("system", "one", "dummy", "UInt8"),
      ("system", "numbers", "number", "UInt64"),
      ("system", "tables", "database", "String"),
      ("system", "tables", "name", "String"),
      ("system", "tables", "engine", "String"),
      ("system", "columns", "database", "String"),
      ("system", "columns", "table", "String"),
      ("system", "columns", "name", "String"),
      ("system", "columns", "type", "String"),
      ("system", "databases", "name", "String"),
      ("system", "settings", "name", "String"),
      ("system", "settings", "value", "String"))
      .map { case (db, t, c, ty) =>
        org.apache.spark.sql.Row(db, t, c, ty, 1L, "", "", "", "",
          0L, 0L)
      }
    val rows = decls.keys.toSeq.sorted
      .filterNot(t => t.startsWith("__graft") || t.startsWith("graft_"))
      .flatMap { t =>
        val (db, bare) = unfoldDb(t)
        val descs = descColsMap.getOrElse(t, Nil)
        chTypesOf(t).zipWithIndex.map { case ((c, ty), i) =>
          val d = descs.find(_.name == c)
          org.apache.spark.sql.Row(db, bare, c, ty, (i + 1).toLong,
            d.map(_.kind).getOrElse(""), d.map(_.expr).getOrElse(""),
            "", "", 0L, 0L)
        }
      }
    spark.createDataFrame((rows ++ builtin).asJava, sch)
      .createOrReplaceTempView("graft_system_columns")
  }

  /** `system.mutations` stand-in: synchronous mutations, all done. */
  def registerSystemMutations(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("mutation_id", StringType, nullable = false),
      StructField("command", StringType, nullable = false),
      StructField("parts_to_do", LongType, nullable = false),
      StructField("is_done", IntegerType, nullable = false),
      StructField("latest_failed_part", StringType, nullable = false),
      StructField("latest_fail_reason", StringType, nullable = false)))
    def unfoldDb(t: String): (String, String) =
      graft.ChDatabases.known.find(d => t.startsWith(d + "__"))
        .map(d => (d, t.stripPrefix(d + "__"))).getOrElse(("default", t))
    val rows = mutationsLog.asScala.toSeq.zipWithIndex.map {
      case ((t, cmd), i) =>
        val (db, bare) = unfoldDb(t)
        org.apache.spark.sql.Row(db, bare, s"mutation_${i + 2}.txt",
          cmd, 0L, 1, "", "")
    }
    spark.createDataFrame(rows.asJava, sch)
      .createOrReplaceTempView("graft_system_mutations")
  }

  /** CH declared type text per column of `table` (parts_columns). */
  def chTypesOf(table: String): Seq[(String, String)] =
    decls.get(table).map(_.cols.map { case (n, _) =>
      n -> chTypes.get(table).flatMap(_.get(n)).getOrElse("String")
    }).getOrElse(Seq.empty)

  // CREATE DICTIONARY (ref src/Interpreters/InterpreterCreateQuery.cpp
  // dictionary branch): attributes + PRIMARY KEY + SOURCE table →
  // materialize from the staged source view into the in-process
  // dictionary registry. Range/IP-trie layouts fall through (ERR).
  private val createDictRe =
    ("(?is)^CREATE\\s+DICTIONARY\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "`?([\\w.]+)`?\\s*\\((.*)\\)\\s*(PRIMARY\\s+KEY\\b.*)$").r
  private val dropDictRe =
    "(?is)^DROP\\s+DICTIONARY\\s+(?:IF\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*(?:SYNC)?\\s*$".r

  private def handleCreateDictionary(spark: SparkSession, sfDir: String,
      name: String, colDefs: String, tail: String): Boolean = {
    val layout = "(?is)LAYOUT\\s*\\(\\s*(\\w+)".r.findFirstMatchIn(tail)
      .map(_.group(1).toLowerCase).getOrElse("flat")
    if (layout.contains("ip_trie")) return false
    val isRange = layout.contains("range")
    val rangeSpec = ("(?is)RANGE\\s*\\(\\s*MIN\\s+`?(\\w+)`?\\s+MAX\\s+" +
      "`?(\\w+)`?\\s*\\)").r.findFirstMatchIn(tail)
    if (isRange && rangeSpec.isEmpty) return false
    val pk = "(?is)PRIMARY\\s+KEY\\s+(.*?)\\s*(?:SOURCE|LAYOUT|LIFETIME|RANGE)\\b".r
      .findFirstMatchIn(tail).map(_.group(1).trim)
      .getOrElse(return false)
    val keyCols = pk.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
    val srcTblOpt = "(?is)\\bTABLE\\s+'?([\\w.]+)'?".r
      .findFirstMatchIn(tail).map(_.group(1))
    if (srcTblOpt.isEmpty) {
      // non-table sources (HTTP/FILE/EXECUTABLE): no data to load in
      // this environment, but the dictionary EXISTS for introspection
      // (01048) — register an empty table view with the declared schema
      val cols = splitTop(colDefs).map(_.trim).filter(_.nonEmpty)
        .map { cd =>
          val sp = cd.indexWhere(_.isWhitespace)
          (cd.take(sp).stripPrefix("`").stripSuffix("`"),
            graft.ChSql.chTypeToSpark(
              cd.drop(sp).trim.split("\\s+").head))
        }
      register(spark, name, emptyDf(spark, Decl(cols)))
      recordDictDef(name, colDefs, tail)
      return true
    }
    val srcTbl = srcTblOpt.get
    val srcDb = "(?is)\\b(?:DB|DATABASE)\\s+'([\\w.]+)'".r
      .findFirstMatchIn(tail).map(_.group(1))
    val qualified = srcDb.filter(_ => !srcTbl.contains("."))
      .map(db => graft.ChDatabases.fold(db, srcTbl)).getOrElse(
        graft.ChDatabases.foldQualified(srcTbl,
          graft.ChSql.replaceOutsideStrings))
    // a source TABLE without a DB clause resolves in the dictionary's
    // own database first (ref ExternalDictionariesLoader resolve)
    val ownDb = graft.ChDatabases.known
      .find(d => name.startsWith(d + "__"))
    val candidates = Seq(qualified) ++
      ownDb.map(d => graft.ChDatabases.fold(d, srcTbl)) ++ Seq(srcTbl)
    val src = candidates.view
      .flatMap(c => scala.util.Try(spark.table(c)).toOption)
      .headOption.getOrElse(return false)
    // attribute defs: name Type [DEFAULT lit] [HIERARCHICAL] [INJECTIVE]
    case class Attr(name: String, typ: String, default: Option[String],
      hierarchical: Boolean)
    val attrs = splitTop(colDefs).map { cd =>
      val t = cd.trim
      val sp = t.indexWhere(_.isWhitespace)
      val an = t.take(sp).stripPrefix("`").stripSuffix("`")
      val rest = t.drop(sp).trim
      val hier = rest.matches("(?is).*\\bHIERARCHICAL\\b.*")
      val dflt = "(?is)\\bDEFAULT\\s+('(?:[^'\\\\]|\\\\.)*'|[-\\d.eE]+)".r
        .findFirstMatchIn(rest).map(_.group(1))
      val typ = rest.split("\\s+").head
      Attr(an, typ, dflt, hier)
    }
    // a dictionary keys-dedups its source (FLAT/HASHED layouts hold one
    // element per key — 01785 element_count); RANGE_HASHED keeps one
    // element per (key, interval), so no dedup there
    val dict0 = src.select(attrs.map(a => col(a.name)).toSeq: _*)
    val dict = if (isRange) dict0 else dict0.dropDuplicates(keyCols.toSeq)
    // a dictionary is also queryable as a table (SELECT * FROM db.dict)
    dict.createOrReplaceTempView(name)
    recordDictDef(name, colDefs, tail)
    // miss values: declared DEFAULT, else the CH type default
    def typeDefault(t: String): Option[org.apache.spark.sql.Column] = {
      val lt = t.toLowerCase
      if (lt.startsWith("string") || lt.startsWith("fixedstring") ||
        lt.startsWith("uuid")) Some(lit(""))
      else if (lt.startsWith("uint") || lt.startsWith("int")) Some(lit(0L))
      else if (lt.startsWith("float") || lt.startsWith("decimal"))
        Some(lit(0.0))
      else if (lt.startsWith("datetime")) Some(lit(0).cast("timestamp"))
      else if (lt.startsWith("date")) Some(lit("1970-01-01").cast("date"))
      else if (lt.startsWith("nullable")) None
      else None
    }
    val defaults = attrs.filter(a => !keyCols.contains(a.name)).flatMap {
      a =>
        val d = a.default.map { raw =>
          if (raw.startsWith("'"))
            lit(graft.formats.DescFormat.decodeChLiteral(
              raw.stripPrefix("'").stripSuffix("'")))
          else lit(raw.toDouble).cast(
            if (raw.matches("-?\\d+")) "bigint" else "double")
        }.orElse(typeDefault(a.typ))
        d.map(a.name -> _)
    }.toMap
    if (keyCols.length != 1) {
      // complex keys probe a positional-struct map (dictGet with a
      // tuple key)
      graft.operators.Dictionaries.createComplexDictionary(name, dict,
        keyCols.toSeq)
      graft.operators.Dictionaries.setAttrDefaults(name, defaults)
      registerDictAliases(name)
      return true
    }
    if (isRange)
      graft.operators.Dictionaries.createRangeDictionary(name, dict,
        keyCols(0), rangeSpec.get.group(1), rangeSpec.get.group(2))
    else {
      val hierAttr = attrs.find(_.hierarchical)
      hierAttr match {
        case Some(h) => graft.operators.Dictionaries
          .createHierarchicalDictionary(name, dict, keyCols(0), h.name,
            nullableParent =
              h.typ.toLowerCase.startsWith("nullable"),
            reverseChildren = layout == "hashed" ||
              layout == "sparse_hashed")
        case None => graft.operators.Dictionaries
          .createDictionary(name, dict, keyCols(0))
      }
    }
    graft.operators.Dictionaries.setAttrDefaults(name, defaults)
    // dictGet addresses the dictionary by its STRING name, which the
    // db-qualifier folding never touches — alias the dotted spelling
    registerDictAliases(name)
    true
  }

  private def registerDictAliases(name: String): Unit = {
    graft.ChDatabases.known.foreach { db =>
      if (name.startsWith(db + "__"))
        graft.operators.Dictionaries.aliasDictionary(name,
          db + "." + name.stripPrefix(db + "__"))
    }
    // under USE db the bare spelling resolves too
    val cd = graft.ChSql.currentDb
    if (cd.nonEmpty && name.startsWith(cd + "__"))
      graft.operators.Dictionaries.aliasDictionary(name,
        name.stripPrefix(cd + "__"))
  }

  /** Returns true when `stmt` was a DDL/INSERT statement handled here.
    * The whole handler runs as an engine-internal statement: helper
    * SELECTs it builds (INSERT default padding, MV refresh, CREATE AS
    * SELECT staging) must not receive the session limit/offset window —
    * that setting caps only rows returned to the client (advice r12). */
  def handle(spark: SparkSession, sfDir: String, stmt0: String): Boolean =
    graft.ChSql.internalStatement.withValue(true)(
      handleImpl(spark, sfDir, stmt0))

  /** CH's client terminates an INSERT's inline VALUES data at the end
    * of line — a following statement needs no `;` (01825 files rely on
    * it). Find the depth-0, outside-string newline that starts a new
    * INSERT after this statement's VALUES payload. */
  private def valuesSplitPoint(s: String): Option[Int] = {
    if (!s.matches("(?is)^\\s*INSERT\\s+INTO\\b.*\\bVALUES\\b.*\\n.*"))
      return None
    var depth = 0; var inStr = false; var i = 0
    var seenValues = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\\') i += 1 else if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'V' | 'v' if !seenValues &&
            s.regionMatches(true, i, "VALUES", 0, 6) => seenValues = true
        case '\n' if depth == 0 && seenValues =>
          val rest = s.substring(i + 1)
          if (rest.matches("(?is)^\\s*INSERT\\s+INTO\\b.*"))
            return Some(i + 1)
        case _ =>
      }
      i += 1
    }
    None
  }

  private def handleImpl(spark: SparkSession, sfDir: String,
      stmt0: String): Boolean = {
    // window-view DDL works on the UNfolded text (db.name intact)
    if (WindowView.maybeHandle(stmt0)) return true
    // type alias (ref DataTypeLowCardinality registerAlias)
    val stmt0n = stmt0.replaceAll("(?i)\\bStringWithDictionary\\b",
      "LowCardinality(String)")
    // `DROP/DETACH … NO DELAY|SYNC` suffixes and trailing QUERY-level
    // SETTINGS on maintenance statements are execution hints
    locally {
      val t = stmt0.trim.stripSuffix(";")
      if (t.matches("(?is)^(DROP|DETACH|TRUNCATE)\\b.*\\s(NO\\s+DELAY|SYNC)\\s*$") &&
          !t.matches("(?is).*system\\s*\\.\\s*query_log.*"))
        return handle(spark, sfDir,
          t.replaceAll("(?is)\\s+(NO\\s+DELAY|SYNC)\\s*$", ""))
      if (t.matches("(?is)^(ALTER|CHECK|KILL|OPTIMIZE|TRUNCATE|RENAME|" +
          "EXCHANGE)\\b.*\\bSETTINGS\\s+\\w+\\s*=[^;]*$") &&
          !t.matches("(?is).*\\bMODIFY\\s+SETTING\\b.*"))
        return handle(spark, sfDir,
          t.replaceAll("(?is)\\s+SETTINGS\\s+\\w+\\s*=[^;]*$", ""))
    }
    valuesSplitPoint(stmt0).foreach { i =>
      val a = handle(spark, sfDir, stmt0.substring(0, i).trim)
      val b = handle(spark, sfDir, stmt0.substring(i).trim)
      return a && b
    }
    // CREATE DATABASE registers the qualifier BEFORE folding so its own
    // tables fold; every other statement folds known `db.tbl` names
    val stmt = stmt0n match {
      case createDbRe(db) =>
        graft.ChDatabases.register(db)
        // also create the real Spark schema so a later `USE db` works
        // (files that never qualify table names rely on it)
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
        return true
      case dropDbRe(db) =>
        val prefix = graft.ChDatabases.fold(db, "")
        decls.keys.filter(_.startsWith(prefix)).foreach { t =>
          spark.catalog.dropTempView(t); decls.remove(t)
        }
        dictDefs.keys.filter(_.startsWith(prefix)).foreach { d =>
          dictDefs.remove(d); spark.catalog.dropTempView(d)
        }
        graft.ChDatabases.unregister(db)
        if (graft.ChSql.currentDb == db.toLowerCase)
          graft.ChSql.currentDb = ""
        if (spark.catalog.currentDatabase == db) spark.sql("USE default")
        spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
        return true
      case useRe(db) =>
        // USE db (ref src/Interpreters/InterpreterUseQuery.cpp): bare
        // names in LATER statements resolve against db
        graft.ChSql.currentDb =
          if (db.equalsIgnoreCase("default") ||
            db.equalsIgnoreCase("system")) ""
          else db.toLowerCase
        return true
      case _ =>
        graft.ChDatabases.foldQualified(
          graft.ChSql.qualifyBareTables(stmt0n, graft.ChSql.currentDb),
          graft.ChSql.replaceOutsideStrings)
    }
    stmt match {
      // storage-maintenance statements are no-ops over lazy views
      // (OPTIMIZE [FINAL] rewrites parts; SYSTEM STOP/START MERGES
      // throttles background merges — both irrelevant here)
      case st if st.matches("(?is)^OPTIMIZE\\s+TABLE\\b.*") =>
        val tn = "(?is)^OPTIMIZE\\s+TABLE\\s+`?([\\w.]+)`?.*$".r
          .findFirstMatchIn(st).map(_.group(1))
        tn.foreach { n =>
          val pspec = ("(?is)\\bPARTITION\\s+(?!BY\\b)(ID\\s+)?(.+?)" +
            "\\s*(?:\\bFINAL\\b|\\bDEDUPLICATE\\b|$)").r
            .findFirstMatchIn(st)
          PartsLog.onOptimize(n, pspec.map(_.group(2).trim),
            byId = pspec.exists(_.group(1) != null),
            isFinal = st.matches("(?is).*\\bFINAL\\b.*"))
          // the profile counter moves on every attempted merge (01014)
          EventsLog.onMerge(0L)
        }
        // OPTIMIZE … DEDUPLICATE drops fully-identical rows (ref
        // src/Interpreters/InterpreterOptimizeQuery.cpp; 01412)
        if (st.matches("(?is).*\\bDEDUPLICATE\\b.*")) tn.foreach { n =>
          staged.get(n) match {
            case Some(stg) =>
              val dataCols = stg.columns.filterNot(_ == "__graft_seq")
              import org.apache.spark.sql.expressions.Window
              val w = Window.partitionBy(dataCols.map(c =>
                col(s"`$c`")): _*)
              staged(n) = stg.withColumn("__graft_min_seq",
                org.apache.spark.sql.functions.min(col("__graft_seq"))
                  .over(w))
                .filter(col("__graft_seq") === col("__graft_min_seq"))
                .drop("__graft_min_seq")
              publish(spark, n)
            case None => scala.util.Try(
              register(spark, n, storedDf(spark, n).distinct()))
          }
          refreshViews(spark, sfDir)
        }
        tn.foreach { n =>
          for (spec <- engines.get(n); df <- staged.get(n)) {
            // materialize: OPTIMIZE makes the merge the new storage state
            val merged = mergeTransform(df, spec,
              chTypes.getOrElse(n, Map.empty)).localCheckpoint(true)
            staged(n) = merged
            publish(spark, n)
          }
        }
        true
      case createDictRe(name, colDefs, tail) =>
        handleCreateDictionary(spark, sfDir, name, colDefs, tail)
      case dropDictRe(nm) =>
        dictDefs.remove(nm); spark.catalog.dropTempView(nm); true
      // SYSTEM RELOAD DICTIONARY loads it without counting a query
      // (01254: status flips NOT_LOADED -> LOADED, query_count stays 0)
      case s if s.matches(
          "(?is)^SYSTEM\\s+RELOAD\\s+DICTIONAR(Y|IES)\\b.*") =>
        val nm = "(?is)DICTIONARY\\s+`?([\\w.]+)`?\\s*$".r
          .findFirstMatchIn(s).map(_.group(1))
        dictDefs.values.foreach { d =>
          if (nm.isEmpty || nm.contains(d.folded) ||
              nm.contains(d.database + "." + d.bareName))
            d.loaded = true
        }
        true
      // SYSTEM server-management statements (ref
      // src/Parsers/ASTSystemQuery.h): flush logs, drop caches,
      // stop/start background activity, reload config/dictionaries —
      // all no-output maintenance over state this engine either keeps
      // implicitly fresh (lazy views re-read their sources, so RELOAD
      // DICTIONARY is a no-op) or does not carry (query/mark caches)
      case s if s.matches("(?is)^SYSTEM\\s+DROP\\s+QUERY\\s+CACHE\\b.*") =>
        QueryCache.clear(); true
      case s if s.matches("(?is)^SYSTEM\\s+FLUSH\\s+LOGS\\b.*") =>
        QueryLog.markFlushed(); true
      // KILL QUERY/MUTATION with no matching target prints nothing
      // (ref src/Interpreters/InterpreterKillQueryQuery.cpp)
      case s if s.matches("(?is)^KILL\\s+(QUERY|MUTATION)\\b.*") =>
        true
      case s if s.matches("(?is)^SYSTEM\\s+\\w+\\b.*") =>
        true
      // the 02494 tests reset the query log by dropping the system
      // table — clear the stand-in's entries
      case s if s.matches(
          "(?is)^DROP\\s+TABLE\\s+system\\s*\\.\\s*query_log\\b.*") =>
        QueryLog.dropFlushed(); true
      // access-control DDL (ref src/Parsers/Access): this single-user
      // engine has no RBAC state — the statements are no-output no-ops,
      // which lets the tests around them run (users/roles/policies/
      // quotas/profiles, GRANT/REVOKE, SET ROLE)
      case s if s.matches("(?is)^(CREATE|DROP|ALTER)\\s+" +
          "(USER|ROLE|ROW\\s+POLICY|POLICY|QUOTA|" +
          "(SETTINGS\\s+)?PROFILE|NAMED\\s+COLLECTION)\\b.*") =>
        true
      case s if s.matches("(?is)^(GRANT|REVOKE|SET\\s+(DEFAULT\\s+)?" +
          "ROLE)\\b.*") =>
        true
      case renameRe(pairs) if pairs.matches(
          "(?is)[\\w.`]+\\s+TO\\s+[\\w.`]+(\\s*,\\s*[\\w.`]+\\s+TO\\s+[\\w.`]+)*") =>
        splitTop(pairs).foreach { pr =>
          val m = "(?is)`?([\\w.]+)`?\\s+TO\\s+`?([\\w.]+)`?".r
            .findFirstMatchIn(pr.trim).getOrElse(
              sys.error(s"RENAME: cannot parse '$pr'"))
          val (a, b) = (m.group(1), m.group(2))
          // renaming ONTO an existing (even detached) table is
          // TABLE_ALREADY_EXISTS (ref InterpreterRenameQuery; 01603)
          if (scala.util.Try(spark.table(b)).isSuccess ||
              detachedDf.contains(b))
            sys.error(s"TABLE_ALREADY_EXISTS: $b")
          val df = spark.table(a)
          df.createOrReplaceTempView(b)
          spark.catalog.dropTempView(a)
          decls.remove(a).foreach(decls(b) = _)
          aliasExprs.remove(a).foreach(aliasExprs(b) = _)
          matCols.remove(a).foreach(matCols(b) = _)
          descColsMap.remove(a).foreach(descColsMap(b) = _)
          chTypes.remove(a).foreach(chTypes(b) = _)
          nullableDeclared.remove(a).foreach(nullableDeclared(b) = _)
          defExprs.remove(a).foreach(defExprs(b) = _)
          engines.remove(a).foreach(engines(b) = _)
          staged.remove(a).foreach { st =>
            staged(b) = st; publish(spark, b)
            spark.catalog.dropTempView(s"__graft_final_$a")
          }
          Option(viewDefs.remove(a)).foreach(viewDefs.put(b, _))
        }
        true
      case createAsTableRe2(name, src)
          if scala.util.Try(spark.table(src)).isSuccess =>
        val srcDf = spark.table(src)
        decls(name) = decls.getOrElse(src,
          Decl(srcDf.schema.fields.map(f => f.name -> f.dataType.sql).toSeq))
        // AS an Object('JSON') table: the new table carries the same
        // dynamic columns, starting from an EMPTY evolving schema
        JsonObject.objCols.get(src).foreach(cs =>
          JsonObject.onCreate(name, cs))
        // a Distributed(…) table over a local table READS it live (the
        // single-process model resolves every shard to the local data,
        // ref src/Storages/StorageDistributed.cpp) — register it as a
        // view so mutations of the underlying table stay visible
        if (stmt.matches("(?is).*\\bENGINE\\s*=?\\s*Distributed\\s*\\(.*")) {
          distributedAlias(name) = src
          // system.tables reports the DECLARED engine (00763)
          "(?is)\\bENGINE\\s*=?\\s*(Distributed\\s*\\([^)]*\\))".r
            .findFirstMatchIn(stmt)
            .foreach(m => recordDdl(name, "", "ENGINE = " + m.group(1)))
          viewDefs.put(name, (null, s"SELECT * FROM `$src`"))
          registerView(spark, sfDir, name, null, s"SELECT * FROM `$src`")
        } else register(spark, name, srcDf.limit(0))
        true
      case createViewRe(mat, name, colDefs, toTarget, select0) =>
        // a MATERIALIZED view over a Null table reads the shadow store
        // (plain views read the table itself: always empty)
        val select =
          if (Option(mat).exists(_.toUpperCase.contains("MATERIALIZED")))
            nullEngines.collect { case (t, true) => t }
              .foldLeft(select0)((q, t) => q.replaceAll(
                "(?i)\\b(FROM|JOIN)\\s+`?" +
                  java.util.regex.Pattern.quote(t) + "`?(?![\\w`])",
                "$1 " + nullShadow(t)))
          else select0
        registerView(spark, sfDir, name, colDefs, select)
        viewDefs.put(name, (colDefs, select))
        // LIVE VIEW: track the refresh version (each INSERT into a
        // source table bumps it; `_version` selects read the counter)
        if (Option(mat).exists(_.toUpperCase.contains("LIVE"))) {
          val srcs = "(?i)\\b(?:FROM|JOIN)\\s+`?([A-Za-z_]\\w*)`?".r
            .findAllMatchIn(select).map(_.group(1)).toSet
          liveViewVer(name) = (srcs, 0L)
        }
        // TO-form: reads usually target the destination table; point it
        // at the same deferred select. Columns the TARGET declares that
        // the select does not produce take their declared DEFAULT (or
        // the type default) — the reference's insert pipeline pads them
        // (ref src/Interpreters/addMissingDefaults.cpp; 02459).
        Option(toTarget).foreach { dst =>
          val sel2 = (for {
            d <- decls.get(dst)
            df <- scala.util.Try(
              graft.ChSql.sql(spark, select, sfDir)).toOption
            outCols = df.columns.toSeq
            if d.cols.exists(c => !outCols.contains(c._1))
          } yield {
            def typeDefault(sparkT: String): String =
              sparkT.trim.toUpperCase match {
                case "STRING" => "''"
                case "DATE" => "toDate(0)"
                case "TIMESTAMP" => "toDateTime(0)"
                case t if t.startsWith("ARRAY") => "[]"
                case _ => "0"
              }
            val items = d.cols.map { case (n, t) =>
              if (outCols.contains(n)) s"`$n`"
              else defExprs.getOrElse(dst, Map.empty).get(n)
                .map(e => s"($e) AS `$n`")
                .getOrElse(s"${typeDefault(t)} AS `$n`")
            }
            s"SELECT ${items.mkString(", ")} FROM ($select)"
          }).getOrElse(select)
          viewDefs.put(dst, (colDefs, sel2))
          try registerView(spark, sfDir, dst, colDefs, sel2)
          catch { case _: Exception => }
        }
        true
      // ATTACH TABLE t FROM 'path' (cols) ENGINE=… (ref
      // src/Interpreters/InterpreterCreateQuery.cpp attach-from-path;
      // 01188): File engines read path/data.<Format> under user_files;
      // MergeTree attaches empty (no parts in a foreign dir); Memory is
      // NOT_IMPLEMENTED in the reference. Paths may not escape the
      // user_files root.
      case attachFromRe(name, path, colDefs, engTail) =>
        graft.ChSql.userFilesPath(path)
        val defs = parseCols(colDefs)
        decls(name) = Decl(defs)
        val fileFmt = "(?is)\\bFile\\s*\\(\\s*(\\w+)\\s*\\)".r
          .findFirstMatchIn(engTail).map(_.group(1))
        if (engTail.matches("(?is).*\\bMemory\\b.*"))
          sys.error("NOT_IMPLEMENTED: ATTACH FROM for Memory")
        fileFmt match {
          case Some(fm) =>
            fileBacked(name) = (path + "/data." + fm, fm)
            register(spark, name, readFileBackedDf(spark, name))
          case None =>
            register(spark, name, emptyDf(spark, Decl(defs)))
        }
        true
      // DETACH/ATTACH round-trip (ref src/Interpreters/
      // InterpreterDropQuery.cpp detach path + ATTACH TABLE): DETACH
      // hides the table from name resolution but keeps its data; ATTACH
      // restores it. Data survives here because the staged/declared
      // state maps are keyed by name and never dropped on DETACH.
      case s if s.matches("(?is)^DETACH\\s+(TABLE|VIEW|DICTIONARY)\\b.*") =>
        val nm = ("(?is)^DETACH\\s+(?:TABLE|VIEW|DICTIONARY)\\s+" +
          "(?:IF\\s+EXISTS\\s+)?`?([\\w.]+)`?.*$").r
          .findFirstMatchIn(s).map(_.group(1)).getOrElse(return false)
        // Set/Join engines with persistent=0 hold data in RAM only —
        // a DETACH loses it (01493/01494); ATTACH restores empty
        val volatileSet = createdDdl.get(nm).exists(_.matches(
          "(?is).*\\b(Set|Join)\\s*\\(.*persistent\\s*=\\s*0.*")) ||
          createdDdl.get(nm).exists(d =>
            d.matches("(?is).*ENGINE\\s*=?\\s*(Set|Join)\\b.*") &&
              d.matches("(?is).*\\bpersistent\\s*=\\s*0\\b.*")) ||
          // the Memory engine holds rows in RAM only — DETACH loses
          // them (01603: attach after detach finds an empty table)
          createdDdl.get(nm).exists(_.matches(
            "(?is).*ENGINE\\s*=?\\s*Memory\\b.*")) ||
          ctasEngines.get(nm).exists(_.matches(
            "(?is)^(ENGINE\\s*=?\\s*)?Memory\\b.*"))
        scala.util.Try(storedDf(spark, nm)).foreach(df =>
          detachedDf(nm) = if (volatileSet) df.limit(0) else df)
        spark.catalog.dropTempView(nm)
        dictDefs.get(nm).foreach(_.attached = false)
        true
      case s if s.matches("(?is)^ATTACH\\s+(TABLE|VIEW|DICTIONARY)" +
          "\\s+`?[\\w.]+`?\\s*$") =>
        val nm = ("(?is)^ATTACH\\s+(?:TABLE|VIEW|DICTIONARY)\\s+" +
          "`?([\\w.]+)`?\\s*$").r.findFirstMatchIn(s).get.group(1)
        if (engines.contains(nm) && staged.contains(nm)) {
          publish(spark, nm); detachedDf.remove(nm)
        } else detachedDf.remove(nm) match {
          case Some(df) => df.createOrReplaceTempView(nm)
          case None => Option(viewDefs.get(nm)).foreach { case (c, q) =>
            registerView(spark, sfDir, nm, c, q) }
        }
        dictDefs.get(nm).foreach(_.attached = true)
        refreshViews(spark, sfDir)
        true
      case dropViewRe(name) =>
        spark.catalog.dropTempView(name); viewDefs.remove(name)
        liveViewVer.remove(name); true
      case dropRe(name) =>
        PartsLog.onDrop(name); JsonObject.onDrop(name)
        viewDefs.remove(name)
        spark.catalog.dropTempView(name); decls.remove(name)
        nullableDeclared.remove(name); createdDdl.remove(name)
        aliasExprs.remove(name); matCols.remove(name)
        descColsMap.remove(name); distributedAlias.remove(name)
        engines.remove(name); staged.remove(name)
        ttlExprs.remove(name); colTtlExprs.remove(name)
        replicaPrimary.filterInPlace((_, v) => v != name)
        insertedBlocks.removeIf(k => k._1 == name)
        liveViewVer.remove(name); fileBacked.remove(name)
        tempTables.remove(name)
        // DROP of a detached table removes its staged snapshot too —
        // else a later re-CREATE + RENAME trips TABLE_ALREADY_EXISTS
        detachedDf.remove(name)
        extraDefs.remove(name); assumeConstraints.remove(name)
        settingOverrides.remove(name)
        detachedParts.filterInPlace((k, _) => k._1 != name)
        spark.catalog.dropTempView(s"__graft_final_$name"); true
      case truncateRe(name) =>
        PartsLog.onTruncate(name)
        if (JsonObject.objCols.contains(name)) {
          JsonObject.onTruncate(name)
          import org.apache.spark.sql.types._
          val objs = JsonObject.objCols(name).toSet
          val schema = StructType(decls(name).cols.map { case (n, t) =>
            if (objs(n)) StructField(n, StructType(Nil), nullable = false)
            else StructField(n, DataType.fromDDL(t), nullable = true)
          })
          import scala.jdk.CollectionConverters._
          spark.createDataFrame(
            Seq.empty[org.apache.spark.sql.Row].asJava, schema)
            .createOrReplaceTempView(name)
          chTypes(name) = chTypes.getOrElse(name, Map.empty) ++
            JsonObject.objCols(name).map(c =>
              c -> JsonObject.typeText(name, c)).toMap
          refreshViews(spark, sfDir)
          return true
        }
        decls.get(name).foreach { d =>
          register(spark, name, emptyDf(spark, d))
          if (engines.contains(name)) {
            staged(name) = emptyDf(spark, d).withColumn("__graft_seq", lit(0L))
            publish(spark, name)
          }
        }
        refreshViews(spark, sfDir)
        true
      case s0 if s0.matches("(?is)^CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+" +
          "EXISTS\\s+)?`?[\\w.]+`?\\s+AS\\s+system\\.numbers(_mt)?\\b.*") =>
        // CREATE TABLE t AS system.numbers ENGINE=…: empty table with the
        // generator's schema (UInt64 `number`)
        val nm = "(?is)^CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
          "`?([\\w.]+)`?\\s+AS\\b"
        val n0 = nm.r.findFirstMatchIn(s0).get.group(1)
        val d = Decl(Seq("number" -> "BIGINT"))
        decls(n0) = d
        recordDdl(n0, "number UInt64",
          "(?is).*\\bENGINE\\s*=?\\s*(.*)$".r.findFirstMatchIn(s0)
            .map(_.group(1)).getOrElse("Memory"))
        register(spark, n0, emptyDf(spark, d))
        true
      case createAsNumbersRe(name, n) =>
        spark.range(n.toLong).toDF("number").createOrReplaceTempView(name)
        decls(name) = Decl(Seq("number" -> "BIGINT"))
        true
      // Object('JSON') tables (ref src/DataTypes/DataTypeObject.h:16,
      // 01825 family): object columns store real structs whose schema
      // evolves with the inserted paths — see JsonObject.scala
      case createRe(name, colDefs, engTail) if splitTop(colDefs)
          .exists(_.trim.matches(objColRe)) =>
        val cols = splitTop(colDefs).map(_.trim).filter(_.nonEmpty)
          .map { cd =>
            val sp = cd.indexWhere(_.isWhitespace)
            (cd.take(sp).stripPrefix("`").stripSuffix("`"),
              cd.drop(sp).trim)
          }
        val objDefs = cols.filter(_._2.matches(objTypeRe))
        val objs = objDefs.map(_._1)
        JsonObject.onCreate(name, objs,
          objDefs.filter(_._2.toLowerCase.contains("nullable"))
            .map(_._1).toSet)
        PartsLog.onCreate(name, Option(engTail).getOrElse(""))
        recordDescCols(name, colDefs)
        import org.apache.spark.sql.types._
        val schema = StructType(cols.map { case (n, t) =>
          if (objs.contains(n))
            StructField(n, StructType(Nil), nullable = false)
          else StructField(n,
            DataType.fromDDL(graft.ChSql.chTypeToSpark(t)),
            nullable = true)
        })
        decls(name) = Decl(cols.map { case (n, t) =>
          n -> (if (objs.contains(n)) "STRING"
            else graft.ChSql.chTypeToSpark(t))
        })
        recordDdl(name, colDefs, engTail)
        chTypes(name) = cols.map { case (n, t) =>
          n -> (if (objs.contains(n)) JsonObject.typeText(name, n)
            else t)
        }.toMap
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(
          Seq.empty[org.apache.spark.sql.Row].asJava, schema)
          .createOrReplaceTempView(name)
        true
      // VALUES inserts into Object tables ride the same machinery: the
      // tuple's object fields are json strings — rebuild a JSONEachRow
      // payload and reuse the stateful path
      case s0 if ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?" +
          "\\s*VALUES\\s*(\\(.*)$").r.findFirstMatchIn(s0)
          .exists(m => JsonObject.objCols.contains(m.group(1))) =>
        val m = ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?" +
          "\\s*VALUES\\s*(\\(.*)$").r.findFirstMatchIn(s0).get
        val name = m.group(1)
        val cols = decls(name).cols.map(_._1)
        val objs = JsonObject.objCols(name).toSet
        // rows evaluate ONE AT A TIME: two VALUES rows may cast their
        // object field to DIFFERENT tuple types (01825_type_json_field)
        // and would not union
        val rowTexts = graft.ChSql
          .splitTopLevelCommas(m.group(2).trim.stripSuffix(";"))
          .map(_.trim).filter(_.nonEmpty)
        val rows =
          if (rowTexts.length <= 1)
            valuesDf(spark, sfDir, m.group(2), cols.length).collect()
          else rowTexts.flatMap(rt =>
            valuesDf(spark, sfDir, rt, cols.length).collect()).toArray
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        // a TYPED tuple/map VALUE feeds the object column directly
        // (01825_type_json_field) — its integers came through CH
        // UNSIGNED types, which the type ladder must preserve
        var typedSource = false
        def toNode(v: Any): com.fasterxml.jackson.databind.JsonNode =
          v match {
            case null => om.readTree("{}")
            case r: org.apache.spark.sql.Row =>
              typedSource = true
              val o = om.createObjectNode()
              val names = Option(r.schema).map(_.fieldNames)
                .getOrElse(Array.empty[String])
              if (names.isEmpty ||
                  names.forall(_.matches("(col|_)\\d+")))
                sys.error("TYPE_MISMATCH: unnamed tuple into Object")
              names.zipWithIndex.foreach { case (fn, fi) =>
                o.set[com.fasterxml.jackson.databind.JsonNode](fn,
                  scalarNode(r.get(fi)))
              }
              o
            case mp: scala.collection.Map[_, _] =>
              typedSource = true
              val o = om.createObjectNode()
              mp.foreach { case (k, mv) =>
                if (!k.isInstanceOf[String])
                  sys.error("TYPE_MISMATCH: non-String map key " +
                    "into Object")
                o.set[com.fasterxml.jackson.databind.JsonNode](
                  k.asInstanceOf[String], scalarNode(mv))
              }
              o
            case s: String =>
              om.readTree(if (s.trim.isEmpty) "{}" else s)
            case other => om.readTree(String.valueOf(other))
          }
        def scalarNode(v: Any): com.fasterxml.jackson.databind.JsonNode =
          v match {
            case null => om.getNodeFactory.nullNode()
            case i: java.lang.Long => om.getNodeFactory.numberNode(i)
            case i: java.lang.Integer =>
              om.getNodeFactory.numberNode(i.longValue())
            case i: java.lang.Short =>
              om.getNodeFactory.numberNode(i.longValue())
            case i: java.lang.Byte =>
              om.getNodeFactory.numberNode(i.longValue())
            case d: java.lang.Double => om.getNodeFactory.numberNode(d)
            case f: java.lang.Float =>
              om.getNodeFactory.numberNode(f.doubleValue())
            case s: String => om.getNodeFactory.textNode(s)
            case a: scala.collection.Seq[_] =>
              val arr = om.createArrayNode()
              a.foreach(e => arr.add(scalarNode(e)))
              arr
            case r: org.apache.spark.sql.Row => toNode(r)
            case other => om.getNodeFactory.textNode(String.valueOf(other))
          }
        val payload = rows.map { r =>
          val node = om.createObjectNode()
          cols.zipWithIndex.foreach { case (c, i) =>
            if (objs(c))
              node.set[com.fasterxml.jackson.databind.JsonNode](c,
                toNode(if (r.isNullAt(i)) null else r.get(i)))
            else {
              val v = if (r.isNullAt(i)) "" else String.valueOf(r.get(i))
              val t = decls(name).cols(i)._2.toLowerCase
              if (t.contains("int") || t.contains("long"))
                node.put(c, scala.util.Try(v.trim.toLong).getOrElse(0L))
              else if (t.contains("double") || t.contains("float") ||
                t.contains("decimal"))
                node.put(c, scala.util.Try(v.trim.toDouble)
                  .getOrElse(0.0))
              else node.put(c, v)
            }
          }
          node.toString
        }.mkString(" ")
        JsonObject.unsignedHint.set(typedSource)
        try commitObjectInsert(spark, sfDir, name,
          JsonObject.insertJsonEachRow(spark, name, decls(name).cols,
            spark.table(name), payload))
        finally JsonObject.unsignedHint.set(false)
      // JSONAsObject: each payload object IS the single Object
      // column's value (extra top-level keys become its subcolumns)
      case s0 if ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?" +
          "\\s+FORMAT\\s+JSONAsObject\\s+(.*)$").r.findFirstMatchIn(s0)
          .exists(m => JsonObject.objCols.contains(m.group(1))) =>
        val m = ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?" +
          "\\s+FORMAT\\s+JSONAsObject\\s+(.*)$").r
          .findFirstMatchIn(s0).get
        val name = m.group(1)
        commitObjectInsert(spark, sfDir, name,
          JsonObject.insertJsonAsObject(spark, name, spark.table(name),
            m.group(2)))
      case s0 if ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?" +
          "\\s+FORMAT\\s+JSONEachRow\\s+(.*)$").r.findFirstMatchIn(s0)
          .exists(m => JsonObject.objCols.contains(m.group(1))) =>
        val m = ("(?is)^INSERT\\s+INTO\\s+(?:TABLE\\s+)?`?([\\w.]+)`?" +
          "\\s+FORMAT\\s+JSONEachRow\\s+(.*)$").r
          .findFirstMatchIn(s0).get
        val name = m.group(1)
        val cur = spark.table(name)
        commitObjectInsert(spark, sfDir, name,
          JsonObject.insertJsonEachRow(spark, name,
            decls(name).cols, cur, m.group(2)))
      case createRe(name, colDefs, engTail) =>
        val d = Decl(parseCols(colDefs))
        decls(name) = d
        PartsLog.onCreate(name, Option(engTail).getOrElse(""))
        if (Option(engTail).exists(_.matches(
            "(?is)\\s*(ENGINE\\s*=?\\s*)?Null\\b(?!\\w).*"))) {
          decls(nullShadow(name)) = d
          register(spark, nullShadow(name), emptyDf(spark, d))
        }
        recordNullables(name, colDefs); recordDefaults(name, colDefs)
        recordAliases(name, colDefs); recordDescCols(name, colDefs)
        recordChTypes(name, colDefs); recordDdl(name, colDefs, engTail)
        // explicit-column Distributed(cluster, db, local[, key]) — same
        // live-view-over-the-local-table model as the AS-table form
        val distTarget = Option(engTail).flatMap(t =>
          ("(?is)Distributed\\s*\\(\\s*[^,]+,\\s*[^,]+,\\s*" +
            "['`]?([A-Za-z_]\\w*)['`]?\\s*[,)]").r
            .findFirstMatchIn(t).map(_.group(1)))
          .filter(t => scala.util.Try(spark.table(t)).isSuccess)
        if (distTarget.isDefined) {
          val src = distTarget.get
          distributedAlias(name) = src
          viewDefs.put(name, (null, s"SELECT * FROM `$src`"))
          registerView(spark, sfDir, name, null, s"SELECT * FROM `$src`")
          return true
        }
        // File(Format, 'path') engine with an explicit file under
        // user_files: reads re-parse the file (declared DEFAULTs pad
        // omitted fields), inserts write through
        val fileEng = Option(engTail).flatMap(t =>
          "(?is)\\bFile\\s*\\(\\s*(\\w+)\\s*,\\s*'([^']+)'\\s*\\)".r
            .findFirstMatchIn(t).map(m => (m.group(1), m.group(2))))
        fileEng.foreach { case (fm, pth) =>
          fileBacked(name) = (pth, fm)
          register(spark, name, readFileBackedDf(spark, name))
          refreshViews(spark, sfDir)
          return true
        }
        // Replicated*MergeTree replicas of the SAME zookeeper path are
        // one logical table (ref src/Storages/StorageReplicatedMergeTree
        // .cpp): the second CREATE registers a live view of the first,
        // and INSERTs route to it — the single-process analogue of
        // replication (00732 quorum tests)
        val zkPath = Option(engTail).flatMap(t =>
          "(?is)Replicated\\w*MergeTree\\s*\\(\\s*'([^']+)'\\s*,".r
            .findFirstMatchIn(t).map(_.group(1)))
        zkPath.foreach { p =>
          replicaPrimary.get(p) match {
            case Some(primary)
                if scala.util.Try(spark.table(primary)).isSuccess =>
              distributedAlias(name) = primary
              viewDefs.put(name, (null, s"SELECT * FROM `$primary`"))
              registerView(spark, sfDir, name, null,
                s"SELECT * FROM `$primary`")
              return true
            case _ => replicaPrimary(p) = name
          }
        }
        register(spark, name, emptyDf(spark, d))
        parseEngine(engTail) match {
          case Some(spec) =>
            engines(name) = spec
            staged(name) = emptyDf(spark, d)
              .withColumn("__graft_seq", lit(0L))
            publish(spark, name)
          case None =>
            engines.remove(name); staged.remove(name)
        }
        true
      case createTempRe(name, colDefs) =>
        val d = Decl(parseCols(colDefs))
        decls(name) = d
        tempTables.add(name)
        recordNullables(name, colDefs); recordDefaults(name, colDefs)
        recordAliases(name, colDefs); recordDescCols(name, colDefs)
        recordChTypes(name, colDefs); recordDdl(name, colDefs, null)
        register(spark, name, emptyDf(spark, d))
        true
      case alterColsRe(name, ops) =>
        handleAlterColumns(spark, sfDir, name, ops)
      case alterUpdateRe(name, assigns, cond) =>
        mutationsLog.add((name, s"UPDATE ${assigns.trim} WHERE ${cond.trim}"))
        PartsLog.onMutate(name, { d =>
          val assigned0 = splitTop(assigns).map { a =>
            val eq = a.indexOf('=')
            a.take(eq).trim.stripPrefix("`").stripSuffix("`") ->
              a.drop(eq + 1).trim
          }.toMap
          val cs = d.columns.map { n =>
            assigned0.get(n) match {
              case Some(e) =>
                val dt = d.schema(n).dataType
                expr(s"CASE WHEN (${graft.ChSql.translate(cond).trim}) " +
                  s"THEN (${graft.ChSql.translate(e).trim}) " +
                  s"ELSE `$n` END").cast(dt).as(n)
              case None => col(s"`$n`")
            }
          }
          d.select(cs.toSeq: _*)
        })
        val target = storedDf(spark, name)
        val assigned = splitTop(assigns).map { a =>
          val eq = a.indexOf('=')
          a.take(eq).trim.stripPrefix("`").stripSuffix("`") ->
            a.drop(eq + 1).trim
        }.toMap
        val items = target.schema.fieldNames.map { n =>
          assigned.get(n) match {
            case Some(e) =>
              // the branch value keeps the declared column type
              s"CAST(CASE WHEN ($cond) THEN ($e) ELSE `$n` END AS " +
                s"${target.schema(n).dataType.sql}) AS `$n`"
            case None => s"`$n`"
          }
        }
        // engine-typed tables mutate their STAGED rows (the view is
        // re-derived by publish); plain tables rebuild the view
        staged.get(name) match {
          case Some(st) =>
            val mutated = st.columns.map { n =>
              assigned.get(n) match {
                case Some(e) =>
                  val dt = st.schema(n).dataType
                  expr(s"CASE WHEN (${graft.ChSql.translate(cond).trim}) " +
                    s"THEN (${graft.ChSql.translate(e).trim}) " +
                    s"ELSE `$n` END").cast(dt).as(n)
                case None => col(s"`$n`")
              }
            }
            staged(name) = st.select(mutated.toSeq: _*)
            publish(spark, name)
          case None =>
            register(spark, name, graft.ChSql.sql(spark,
              s"SELECT ${items.mkString(", ")} FROM `$name`", sfDir))
        }
        refreshViews(spark, sfDir)
        true
      case alterDeleteRe(name, cond) =>
        mutationsLog.add((name, s"DELETE WHERE ${cond.trim}"))
        PartsLog.onMutate(name, { d =>
          val c = expr(graft.ChSql.translate(cond).trim)
          d.filter(!c || c.isNull)
        })
        // NULL condition = not deleted (CH treats it as 0)
        staged.get(name) match {
          case Some(st) =>
            val c = expr(graft.ChSql.translate(cond).trim)
            staged(name) = st.filter(!c || c.isNull)
            publish(spark, name)
          case None =>
            register(spark, name, graft.ChSql.sql(spark,
              s"SELECT * FROM `$name` WHERE NOT ($cond) OR ($cond) IS NULL",
              sfDir))
        }
        refreshViews(spark, sfDir)
        true
      // projections are a physical-layout optimization (ref
      // src/Storages/ProjectionsDescription.cpp) — reads stay correct
      // without them, so the DDL only updates SHOW CREATE metadata
      case s if s.matches("(?is)^ALTER\\s+TABLE\\s+`?[\\w.]+`?\\s+" +
          "(ADD|DROP|CLEAR|MATERIALIZE)\\s+PROJECTION\\b.*") =>
        val tm = "(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+(\\w+)\\s+PROJECTION\\s+(?:IF\\s+(?:NOT\\s+)?EXISTS\\s+)?`?([\\w]+)`?\\s*(.*)$"
          .r.findFirstMatchIn(s)
        tm.foreach { m =>
          val (t, op, pname, rest) =
            (m.group(1), m.group(2).toUpperCase, m.group(3),
              m.group(4).trim.stripSuffix(";").trim)
          op match {
            case "ADD" if rest.startsWith("(") && rest.endsWith(")") =>
              addProjection(t, pname, rest.drop(1).dropRight(1))
            case "DROP" => dropProjection(t, pname)
            case _ =>
          }
        }
        true
      // table-settings tweaks: track the wide-part thresholds (01606
      // freezes part types at creation against the CURRENT settings)
      case s if s.matches("(?is)^ALTER\\s+TABLE\\s+`?[\\w.]+`?\\s+" +
          "(MODIFY|RESET)\\s+SETTING\\b.*") =>
        val mm = ("(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+MODIFY\\s+" +
          "SETTING\\s+(.*)$").r.findFirstMatchIn(s)
        mm.foreach { m =>
          val kvs = "(\\w+)\\s*=\\s*(\\d+)".r.findAllMatchIn(m.group(2))
            .map(x => x.group(1) -> x.group(2).toLong).toMap
          if (kvs.nonEmpty)
            settingOverrides(m.group(1)) =
              settingOverrides.getOrElse(m.group(1), Map.empty) ++ kvs
        }
        true
      // ALTER … DETACH/DROP/ATTACH PARTITION <value> (ref
      // src/Storages/MergeTree/MergeTreeData.cpp partition ops): rows
      // whose PARTITION BY expression equals the value move out (DETACH
      // keeps them for re-ATTACH, DROP discards)
      // PART-level ops (ref src/Storages/MergeTree/MergeTreeData.cpp
      // DETACH/DROP/ATTACH PART 'name'): the rows of the named part
      // come from PartsLog's per-part provenance; removal is multiset
      // subtraction so duplicate rows in other parts survive
      case alterPartSingleRe(name, op0, partName) =>
        val op = op0.toUpperCase
        val want = if (op == "ATTACH") Some(true) else Some(false)
        PartsLog.partRowsByName(name, partName, want) match {
          case Some(df) =>
            val cur = storedDf(spark, name)
            val next =
              if (op == "ATTACH") cur.unionByName(df)
              else cur.exceptAll(df)
            register(spark, name, next)
            PartsLog.onPartOpSingle(name, op, partName)
            refreshViews(spark, sfDir)
            true
          case None =>
            // when per-part tracking was never enabled (a caller
            // outside the golden harness), a named-part op can't
            // resolve rows — degrade to a no-op rather than claiming a
            // part the reference does have is missing
            if (!PartsLog.enabled) true
            else sys.error(s"NO_SUCH_DATA_PART: $partName")
        }
      case alterPartRe(name, op0, valText0) =>
        val op = op0.toUpperCase
        val valText = valText0.trim.stripSuffix(";").trim
        PartsLog.onPartitionOp(name, op,
          valText.replaceFirst("(?i)^ID\\s+", ""),
          byId = valText.toUpperCase.startsWith("ID "))
        val pExpr = createdDdl.get(name).flatMap(d =>
          ("(?is)\\bPARTITION\\s+BY\\s+(.+?)\\s*(?:ORDER\\s+BY|" +
            "PRIMARY\\s+KEY|SAMPLE\\s+BY|SETTINGS|TTL|$).*").r
            .findFirstMatchIn(d).map(_.group(1).trim))
          // legacy MergeTree(dateCol, key, granularity) partitions by
          // month (ref MergeTreeData.cpp old-syntax path)
          .orElse(createdDdl.get(name).flatMap(d =>
            "(?is)MergeTree\\s*\\(\\s*`?(\\w+)`?\\s*,".r
              .findFirstMatchIn(d).map(m => s"toYYYYMM(${m.group(1)})")))
        val isIdForm = valText.toUpperCase.startsWith("ID ")
        val idVal = valText.replaceFirst("(?i)^ID\\s+", "")
          .trim.stripPrefix("'").stripSuffix("'")
        // predicate selecting the partition's rows: the VALUE form
        // compares the partition expression; the ID form maps the id
        // back through the tracked parts; an unpartitioned table's
        // only partition (`tuple()` / ID 'all') is the whole table
        val condOpt: Option[org.apache.spark.sql.Column] = {
          import org.apache.spark.sql.functions.{expr, lit}
          def tupleItems(s: String): Seq[String] = {
            val t = s.trim
            if (t.startsWith("(") && t.endsWith(")"))
              graft.ChSql.splitTopLevelCommas(t.drop(1).dropRight(1))
                .map(_.trim).filter(_.nonEmpty)
            else Seq(t)
          }
          // tuple partitions compare ELEMENT-WISE (a struct equality
          // would trip on field names/types)
          def eq(px: String, v: String): org.apache.spark.sql.Column = {
            val pxs = tupleItems(px); val vts = tupleItems(v)
            if (pxs.length > 1 && pxs.length == vts.length)
              pxs.zip(vts).map { case (e, x) =>
                expr(graft.ChSql.translate(s"($e) = ($x)").trim)
              }.reduce(_ && _)
            else expr(graft.ChSql.translate(s"($px) = ($v)").trim)
          }
          pExpr match {
            case Some(px) if !isIdForm => Some(eq(px, valText))
            case Some(px) =>
              val ds = PartsLog.displaysForId(name, idVal)
              if (ds.isEmpty) None
              else Some(ds.map(d => eq(px, d)).reduce(_ || _))
            case None
                if valText.replaceAll("\\s+", "") == "tuple()" ||
                  (isIdForm && idVal == "all") =>
              Some(lit(true))
            case None => None
          }
        }
        condOpt match {
          case Some(cond) =>
            def split(frame: DataFrame): (DataFrame, DataFrame) =
              (frame.filter(cond), frame.filter(!cond || cond.isNull))
            val cur = staged.getOrElse(name, storedDf(spark, name))
            // dropping/detaching a partition forgets its insert-block
            // dedup ids (00516: the same data inserts again after DROP)
            insertedBlocks.removeIf(k => k._1 == name)
            op match {
              case "DETACH" | "DROP" =>
                val (moved, kept) = split(cur)
                if (op == "DETACH")
                  detachedParts((name, valText)) = moved
                if (staged.contains(name)) {
                  staged(name) = kept; publish(spark, name)
                } else register(spark, name, kept)
              case "ATTACH" =>
                detachedParts.remove((name, valText)).foreach { m0 =>
                  // columns ADDed while the part was detached
                  // materialize their type default on re-attach
                  def pad(m: DataFrame, tgt: DataFrame): DataFrame = {
                    val added = tgt.schema.fields
                      .filterNot(f => m.columns.contains(f.name))
                      .foldLeft(m)((acc, f) => acc.withColumn(f.name,
                        defaultFor(f.dataType)))
                    // columns DROPped while detached disappear; order by
                    // the live schema
                    added.select(tgt.columns.map(c => col(s"`$c`")).toSeq: _*)
                  }
                  if (staged.contains(name)) {
                    val m = pad(m0, staged(name))
                    staged(name) = staged(name).unionByName(m)
                    publish(spark, name)
                  } else {
                    val cur0 = storedDf(spark, name)
                    register(spark, name, cur0.unionByName(pad(m0, cur0)))
                  }
                }
            }
            refreshViews(spark, sfDir)
            true
          case _ => false
        }
      case alterTtlRe(name, ttlExpr) =>
        // MODIFY/MATERIALIZE TTL (ref src/Storages/TTLDescription.cpp;
        // 01070_modify_ttl): with the golden harness's synchronous
        // mutations, rows whose TTL instant has passed are dropped when
        // the TTL materializes — on MODIFY (unless
        // materialize_ttl_after_modify = 0) and on MATERIALIZE TTL.
        val isModify = stmt.matches("(?is).*\\bMODIFY\\s+TTL\\b.*")
        val ex = ttlExpr.trim match {
          case "" => ttlExprs.get(name).getOrElse("")
          case e => ttlExprs(name) = e; e
        }
        val deferModify = isModify && scala.util.Try(
          spark.conf.getOption("graft.ch.materialize_ttl_after_modify"))
          .toOption.flatten.contains("0")
        if (!deferModify && (ex.nonEmpty ||
            colTtlExprs.get(name).exists(_.nonEmpty))) {
          import org.apache.spark.sql.functions.{current_timestamp, expr}
          import org.apache.spark.sql.types.DataType
          def materialize(frame: DataFrame): DataFrame = {
            var f = frame
            if (ex.nonEmpty) {
              val t = expr(graft.ChSql.translate(ex).trim).cast("timestamp")
              f = f.filter(t.isNull || t > current_timestamp())
            }
            // column TTLs: expired values reset to the type default
            colTtlExprs.getOrElse(name, Map.empty).foreach {
              case (cn, cex) =>
                val t = expr(graft.ChSql.translate(cex).trim)
                  .cast("timestamp")
                val dflt = decls.get(name)
                  .flatMap(_.cols.find(_._1 == cn)).map(c =>
                    defaultFor(DataType.fromDDL(c._2)))
                dflt.foreach { dv =>
                  f = f.select(f.columns.map { c =>
                    if (c == cn)
                      org.apache.spark.sql.functions.when(
                        t.isNull || t > current_timestamp(),
                        col(s"`$c`")).otherwise(dv).as(c)
                    else col(s"`$c`")
                  }.toSeq: _*)
                }
            }
            f
          }
          staged.get(name) match {
            case Some(st) =>
              staged(name) = materialize(st)
              publish(spark, name)
            case None =>
              register(spark, name, materialize(storedDf(spark, name)))
          }
          refreshViews(spark, sfDir)
        }
        true
      // INSERT INTO FUNCTION file('path','Format','schema') …: format
      // the rows and write under userFilesDir (append — CH's file
      // engine appends for row formats unless
      // engine_file_truncate_on_insert)
      case insertFileRe(path0, fmt, sch, body) =>
        val defs = splitTop(sch).map(_.trim).filter(_.nonEmpty).map { cd =>
          val sp = cd.indexWhere(_.isWhitespace)
          (cd.take(sp).stripPrefix("`").stripSuffix("`"),
            cd.drop(sp).trim)
        }
        val rows0 =
          if (body.trim.toUpperCase.startsWith("VALUES"))
            valuesDf(spark, sfDir, body.trim.drop(6).trim, defs.length)
          else graft.ChSql.sql(spark, body.trim, sfDir)
        val renamed = rows0.toDF(defs.map(_._1): _*)
        val casted = renamed.select(defs.map { case (n, t) =>
          col(s"`$n`").cast(org.apache.spark.sql.types.DataType
            .fromDDL(graft.ChSql.chTypeToSpark(t))).as(n) }.toSeq: _*)
        val lines = fmt.toLowerCase match {
          // plain TSV renders through the golden TSV cell formatter
          // (ChOutputFormats covers the named variants only)
          case "tsv" | "tabseparated" =>
            casted.collect().toSeq.map(r =>
              r.toSeq.map(Golden.fmt).mkString("\t"))
          case _ => graft.formats.ChOutputFormats.render(fmt,
            casted.schema, Seq(casted.collect().toSeq),
            graft.formats.ChOutputFormats.Ctx(_ => None))
        }
        val p = graft.ChSql.userFilesPath(path0)
        java.nio.file.Files.createDirectories(p.getParent)
        val truncate = scala.util.Try(spark.conf.getOption(
          "graft.ch.engine_file_truncate_on_insert")).toOption.flatten
          .contains("1")
        val payload = (lines.mkString("\n") + "\n").getBytes("UTF-8")
        if (truncate || !java.nio.file.Files.exists(p))
          java.nio.file.Files.write(p, payload)
        else java.nio.file.Files.write(p, payload,
          java.nio.file.StandardOpenOption.APPEND)
        true
      // INSERT SELECT into an Object('JSON') table: object values
      // arrive as JSON text (or structs from another object table) —
      // schema inference over the bounded DISTINCT payloads, the batch
      // itself materializes distributively (JsonObject.insertSelect)
      case insertRe(name0, colList, body)
          if JsonObject.objCols.contains(
            distributedAlias.getOrElse(name0, name0)) &&
            body.trim.matches("(?is)^(SELECT|WITH)\\b.*") =>
        val name = distributedAlias.getOrElse(name0, name0)
        val df0 = graft.ChSql.sql(spark, body.trim, sfDir)
        val declNames = decls(name).cols.map(_._1)
        val names = Option(colList)
          .map(_.stripPrefix("(").stripSuffix(")").split(",")
            .map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
          .getOrElse(declNames)
        if (df0.columns.length != names.length)
          sys.error("NUMBER_OF_COLUMNS_DOESNT_MATCH")
        val aligned = df0.toDF(names: _*)
        commitObjectInsert(spark, sfDir, name,
          JsonObject.insertSelect(spark, name, aligned,
            storedDf(spark, name)).map { r =>
            if (names == declNames) r
            else sys.error(
              "NOT_IMPLEMENTED: column-list object INSERT SELECT")
          })
      case insertRe(name0, colList, body) =>
        // an INSERT into a Distributed alias writes the local table
        val name = distributedAlias.getOrElse(name0, name0)
        // the Null engine discards everything written to it — but the
        // shadow store keeps the block for MATERIALIZED views over the
        // table (StorageNull.h; 00481 + 00508/00687 MV captures)
        if (nullEngines.getOrElse(name, false)) {
          if (!decls.contains(nullShadow(name))) {
            decls.get(name).foreach { d =>
              decls(nullShadow(name)) = d
              register(spark, nullShadow(name), emptyDf(spark, d))
            }
          }
          val diverted = stmt.replaceFirst(
            "(?is)^(INSERT\\s+INTO\\s+(?:TABLE\\s+)?)`?" +
              java.util.regex.Pattern.quote(name0) + "`?",
            "$1" + nullShadow(name))
          val r = handle(spark, sfDir, diverted)
          refreshViews(spark, sfDir)
          return r
        }
        if (fileBacked.contains(name)) {
          // write-through to the backing file, then re-read
          val (rel, fm) = fileBacked(name)
          val defs = decls(name).cols
          val rows0 =
            if (body.trim.toUpperCase.startsWith("VALUES"))
              valuesDf(spark, sfDir, body.trim.drop(6).trim, defs.length)
            else graft.ChSql.sql(spark, body.trim, sfDir)
          val casted = rows0.toDF(defs.map(_._1): _*)
            .select(defs.map { case (n, t) =>
              col(s"`$n`").cast(org.apache.spark.sql.types.DataType
                .fromDDL(t)).as(n) }.toSeq: _*)
          val lines = renderFileRows(fm, casted)
          val p = graft.ChSql.userFilesPath(rel)
          java.nio.file.Files.createDirectories(p.getParent)
          val truncate = scala.util.Try(spark.conf.getOption(
            "graft.ch.engine_file_truncate_on_insert")).toOption.flatten
            .contains("1")
          val payload = (lines.mkString("\n") + "\n").getBytes("UTF-8")
          if (truncate || !java.nio.file.Files.exists(p))
            java.nio.file.Files.write(p, payload)
          else java.nio.file.Files.write(p, payload,
            java.nio.file.StandardOpenOption.APPEND)
          register(spark, name, readFileBackedDf(spark, name))
          refreshViews(spark, sfDir)
          return true
        }
        // Replicated tables DEDUPLICATE identical insert blocks (ref
        // src/Storages/MergeTree/ReplicatedMergeTreeSink.cpp block-id
        // dedup; 00226): an exact repeat of a VALUES payload is a no-op
        if (body.trim.toUpperCase.startsWith("VALUES") &&
            createdDdl.get(name).exists(_.contains("Replicated"))) {
          val key = (name, colList, body.replaceAll("\\s+", " ").trim)
          if (!insertedBlocks.add(key)) return true
        }
        val target = storedDf(spark, name)
        val names0 = Option(colList)
          .map(_.stripPrefix("(").stripSuffix(")")
            .split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
          .getOrElse(target.schema.fieldNames.toSeq)
        val fmtBody =
          "(?is)^FORMAT\\s+(\\w+)\\s+(.*)$".r.findFirstMatchIn(body.trim)
        // input_format_null_as_default scopes to INPUT FORMATS (VALUES,
        // CSV, …; ref Settings.h) — an INSERT SELECT is not an input
        // format, and wrapping its projection would perturb its plan
        val isFormatInsert = body.trim.toUpperCase.startsWith("VALUES") ||
          fmtBody.isDefined
        val rows0 =
          if (body.trim.toUpperCase.startsWith("VALUES"))
            valuesDf(spark, sfDir, body.trim.drop(6).trim, names0.length)
          else if (fmtBody.isDefined) {
            // inline-data INSERT (`INSERT INTO t FORMAT CSV 1,2`): the
            // payload rides the DescFormat VALUES-subquery machinery;
            // backslashes are protected because the payload is raw text,
            // not a CH string literal
            val fmt = fmtBody.get.group(1)
            val payload = fmtBody.get.group(2)
            if (fmt.equalsIgnoreCase("Values"))
              valuesDf(spark, sfDir, payload.trim, names0.length)
            else if (fmt.equalsIgnoreCase("JSONAsString")) {
              // each top-level json value is ONE ROW of the single
              // String column (ref JSONAsStringRowInputFormat.cpp)
              val om = new com.fasterxml.jackson.databind.ObjectMapper()
              val it = om.readerFor(
                classOf[com.fasterxml.jackson.databind.JsonNode])
                .readValues[com.fasterxml.jackson.databind.JsonNode](
                  JsonObject.stripTopCommas(payload).trim)
              val b = Seq.newBuilder[String]
              while (it.hasNext) b += it.next().toString
              import spark.implicits._
              b.result().toDF(names0.head)
            }
            else {
              val sub = graft.formats.DescFormat.selectSql(fmt,
                payload.replace("\\", "\\\\"),
                Map.empty[String, String]).getOrElse(
                sys.error(s"INSERT FORMAT $fmt: unsupported inline format"))
              spark.sql(s"SELECT * FROM $sub __fmt_ins")
            }
          }
          else graft.ChSql.sql(spark, body.trim, sfDir)
        // cast by position to the declared column types, fill unnamed
        // columns with CH type defaults (0 / '' / zero-date); positional
        // rename first — a SELECT can emit duplicate names (n1.number,
        // n2.number, … in 02457) that col(name) cannot address
        val uniq0 = rows0.toDF(
          rows0.columns.indices.map(i => s"__ins$i"): _*)
        // a column-list-less INSERT into a table with Nested columns
        // supplies one flattened array per SUBCOLUMN (ref
        // DataTypeNested/NestedUtils::flatten) — expand the names so the
        // zip below reassembles them
        val names1 =
          if (colList != null) names0
          else {
            val declared = chTypes.getOrElse(name, Map.empty)
            val expanded = target.schema.fields.toSeq.flatMap { f =>
              f.dataType match {
                case org.apache.spark.sql.types.ArrayType(
                    st: org.apache.spark.sql.types.StructType, _)
                  if declared.get(f.name).exists(
                    _.matches("(?is)^Nested\\s*\\(.*")) =>
                  st.fields.toSeq.map(sf => s"${f.name}.${sf.name}")
                case _ => Seq(f.name)
              }
            }
            if (expanded.length == uniq0.columns.length) expanded else names0
          }
        // Nested subcolumn insert (`nest.x, nest.y` parallel arrays; ref
        // src/DataTypes/DataTypeNested — stored as an array of tuples
        // here): zip the provided arrays into the struct-array column
        val (names2, uniq) =
          if (!names1.exists(_.contains("."))) (names1, uniq0)
          else {
            import org.apache.spark.sql.functions.arrays_zip
            val groups = names1.zipWithIndex.filter(_._1.contains("."))
              .groupBy(_._1.split("\\.")(0))
            var outNames = Seq.empty[String]
            var outCols = Seq.empty[org.apache.spark.sql.Column]
            val done = scala.collection.mutable.Set.empty[String]
            names1.zipWithIndex.foreach { case (n, i) =>
              if (!n.contains(".")) {
                outNames :+= n; outCols :+= uniq0.col(uniq0.columns(i))
              } else {
                val pfx = n.split("\\.")(0)
                if (done.add(pfx)) {
                  val subs = groups(pfx)
                  outNames :+= pfx
                  outCols :+= arrays_zip(subs.map { case (_, j) =>
                    uniq0.col(uniq0.columns(j)) }: _*)
                }
              }
            }
            (outNames,
              uniq0.select(outCols.zipWithIndex.map { case (c, i) =>
                c.as(s"__insz$i") }: _*))
          }
        val names = names2
        val byPos = names.zip(uniq.columns).map { case (n, c) =>
          // DateTime columns accept digit strings as unix timestamps
          // (ref ReadHelpers.h readDateTimeTextImpl numeric path)
          val casted =
            if (target.schema(n).dataType ==
                org.apache.spark.sql.types.TimestampType &&
              uniq.schema(c).dataType ==
                org.apache.spark.sql.types.StringType)
              graft.functions.ch.toDateTime(uniq.col(c))
            // UUID columns accept the separator-less 32-hex form (01338)
            else if (chTypes.get(name).flatMap(_.get(n))
                .exists(_.equalsIgnoreCase("UUID")) &&
              uniq.schema(c).dataType ==
                org.apache.spark.sql.types.StringType) {
              import org.apache.spark.sql.functions.{concat_ws, lower,
                substring, trim, when}
              val t0 = lower(trim(uniq.col(s"`$c`")))
              when(t0.rlike("^[0-9a-f]{32}$"),
                concat_ws("-", substring(t0, 1, 8), substring(t0, 9, 4),
                  substring(t0, 13, 4), substring(t0, 17, 4),
                  substring(t0, 21, 12)))
                .otherwise(uniq.col(s"`$c`"))
            }
            // Bool text accepts the CH word set and the session's
            // bool_*_representation (SerializationBool)
            else if (target.schema(n).dataType ==
                org.apache.spark.sql.types.BooleanType &&
              uniq.schema(c).dataType ==
                org.apache.spark.sql.types.StringType)
              graft.functions.ch.parseBool(uniq.col(c))
            else graft.functions.ch.wrapCast(uniq.col(c),
              target.schema(n).dataType)
          // input_format_null_as_default (default 1, ref Settings.h):
          // a NULL inserted into a CH-non-Nullable column takes the
          // column's DEFAULT (or the type default) instead — only
          // Nullable columns store the NULL (01596)
          val nullAsDefault = scala.util.Try(spark.conf.get(
            "graft.ch.input_format_null_as_default", "1"))
            .getOrElse("1").trim != "0"
          // only fires when the column's DECLARED CH type is recorded
          // and provably non-Nullable (CTAS tables record no types —
          // their nullability is unknown, leave NULLs alone)
          val declaredNonNullable = chTypes.get(name)
            .flatMap(_.get(n)).exists(t =>
              !t.matches("(?is)\\s*(LowCardinality\\s*\\(\\s*)?Nullable\\b.*"))
          // only atomic targets: container/state columns (Map, Array,
          // stored AggregateFunction structs) have no castable zero here
          val atomicTarget = target.schema(n).dataType match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType => false
            case _ => true
          }
          // no wrap when the source can't produce NULL — keeps the
          // original plan (and its observed group output order) intact
          val casted2 =
            if (!nullAsDefault || !isFormatInsert || !declaredNonNullable ||
              !atomicTarget || !uniq.schema(c).nullable)
              casted
            else {
              // a literal default expression can be evaluated in this
              // select; column-referencing defaults fall back to the
              // type default (they cannot see sibling VALUES here)
              val dfltE = defExprs.getOrElse(name, Map.empty).get(n)
                .filter(e => !e.matches("(?is).*[A-Za-z_]\\w*.*") ||
                  e.matches("(?is)^\\s*'(?:[^'\\\\]|\\\\.)*'\\s*$") ||
                  e.matches("(?is)^\\s*[-+0-9.eE\\s]+$"))
                .flatMap(e => scala.util.Try(
                  expr(graft.ChSql.translate(e).trim)
                    .cast(target.schema(n).dataType)).toOption)
              org.apache.spark.sql.functions.coalesce(casted,
                dfltE.getOrElse(defaultFor(target.schema(n).dataType)
                  .cast(target.schema(n).dataType)))
            }
          casted2.as(n) }
        val rows = uniq.select(byPos: _*)
        val defMap = defExprs.getOrElse(name, Map.empty)
        val computed = target.schema.fieldNames.toSeq
          .filter(n => !names.contains(n) && defMap.contains(n))
        val full = target.schema.fieldNames.toSeq.map { n =>
          if (names.contains(n)) col(n)
          else defaultFor(target.schema(n).dataType).as(n)
        }
        val filled0 = rows.select(full: _*)
        // declared DEFAULT/MATERIALIZED expressions compute from the
        // inserted row (they may reference the provided columns)
        val filled = if (computed.isEmpty) filled0 else {
          filled0.createOrReplaceTempView("__graft_ins_src")
          // declared integer types convert with CH WRAPPING semantics
          // (cityHash64 defaults overflow Long — ref
          // FunctionsConversion.h static_cast), so emit the CH
          // conversion function instead of an ANSI CAST where one exists
          def convFn(n: String): Option[String] =
            chTypes.get(name).flatMap(_.get(n)).map(_.trim).collect {
              case t @ ("UInt8" | "UInt16" | "UInt32" | "UInt64" |
                   "Int8" | "Int16" | "Int32" | "Int64" |
                   "Float32" | "Float64" | "String" | "Date" |
                   "DateTime") => "to" + t
            }
          val items = target.schema.fieldNames.toSeq.map { n =>
            if (computed.contains(n)) {
              // the default may reference ALIAS columns, which exist
              // only on the registered view — inline their definitions
              val e = expandAliases(name, defMap(n))
              convFn(n) match {
                case Some(f) => s"$f(($e)) AS `$n`"
                case None =>
                  s"CAST(($e) AS ${target.schema(n).dataType.sql}) AS `$n`"
              }
            } else s"`$n`"
          }
          graft.ChSql.sql(spark,
            s"SELECT ${items.mkString(", ")} FROM __graft_ins_src", sfDir)
        }
        PartsLog.onInsert(spark, name, filled)
        if (engines.contains(name) && staged.contains(name)) {
          val batch = seqCounter.incrementAndGet()
          // monotonically_increasing_id is (partition, offset)-ordered,
          // which for a local VALUES scan follows row order — enough to
          // break ties within one INSERT batch
          val tagged = filled.withColumn("__graft_seq",
            lit(batch) * lit(1L << 40) +
              org.apache.spark.sql.functions.monotonically_increasing_id())
          staged(name) = staged(name).union(tagged)
          publish(spark, name)
        } else register(spark, name, target.union(filled))
        refreshViews(spark, sfDir)
        // LIVE VIEWs over this table advance their _version (ref
        // src/Storages/LiveView/StorageLiveView.cpp; 00973 family)
        liveViewVer.foreach { case (lv, (srcs, n)) =>
          if (srcs.contains(name)) liveViewVer(lv) = (srcs, n + 1)
        }
        true
      case createAsTableRe(name, src)
          if scala.util.Try(spark.table(src)).isSuccess =>
        val srcDf = spark.table(src)
        decls(name) = decls.getOrElse(src,
          Decl(srcDf.schema.fields.map(f => f.name -> f.dataType.sql).toSeq))
        // AS an Object('JSON') table: the new table carries the same
        // dynamic columns, starting from an EMPTY evolving schema
        JsonObject.objCols.get(src).foreach(cs =>
          JsonObject.onCreate(name, cs))
        if (stmt.matches("(?is).*\\bENGINE\\s*=?\\s*Distributed\\s*\\(.*")) {
          distributedAlias(name) = src
          // system.tables reports the DECLARED engine (00763)
          "(?is)\\bENGINE\\s*=?\\s*(Distributed\\s*\\([^)]*\\))".r
            .findFirstMatchIn(stmt)
            .foreach(m => recordDdl(name, "", "ENGINE = " + m.group(1)))
          viewDefs.put(name, (null, s"SELECT * FROM `$src`"))
          registerView(spark, sfDir, name, null, s"SELECT * FROM `$src`")
        } else register(spark, name, srcDf.limit(0))
        true
      case ctasRe(name, engTail, select) =>
        val df = graft.ChSql.sql(spark, select.trim, sfDir)
        decls(name) =
          Decl(df.schema.fields.map(f => f.name -> f.dataType.sql).toSeq)
        register(spark, name, df)
        // remember the engine so DETACH knows Memory volatility (01603)
        Option(engTail).foreach(t => ctasEngines(name) = t.trim)
        Option(engTail).flatMap(parseEngine) match {
          case Some(spec) =>
            engines(name) = spec
            val batch = seqCounter.incrementAndGet()
            staged(name) = df.withColumn("__graft_seq",
              lit(batch) * lit(1L << 40) + org.apache.spark.sql.functions
                .monotonically_increasing_id())
            publish(spark, name)
          case None =>
        }
        true
      case _ => false
    }
  }

  /** Append the table's ALIAS columns (computed from the stored row —
    * always current, the CH read-time contract) to the frame that backs
    * its public view. */
  private def withAliasCols(name: String, df: DataFrame): DataFrame =
    aliasExprs.get(name.stripPrefix("__graft_final_")) match {
      case Some(as) if as.nonEmpty =>
        try as.foldLeft(df) { case (d, (n, e)) =>
          d.withColumn(n,
            org.apache.spark.sql.functions.expr(
              graft.ChSql.translate(e).trim))
        } catch { case _: Exception => df }
      case _ => df
    }

  /** Columns DECLARED DateTime64(p[, 'tz']) display with exactly p
    * fractional digits (ref src/DataTypes/DataTypeDateTime64.cpp) —
    * storage is a plain timestamp, so the public view re-tags them with
    * the scale-carrying DateTime64 UDT (same machinery the
    * toDateTime64() function results ride). */
  private def withDeclaredDt64(name: String, df: DataFrame): DataFrame = {
    val tmap = chTypes.getOrElse(name.stripPrefix("__graft_final_"),
      Map.empty)
    val Dt64Re =
      "(?is)^\\s*DateTime64\\s*\\(\\s*(\\d+)\\s*(?:,\\s*'([^']*)')?\\s*\\)\\s*$".r
    val hits = df.columns.flatMap { c =>
      tmap.get(c).flatMap(t => Dt64Re.findFirstMatchIn(t))
        .map(m => c -> ((m.group(1).toInt, Option(m.group(2)))))
    }.toMap
    if (hits.isEmpty) df
    else try df.select(df.columns.map { c =>
      hits.get(c) match {
        case Some((sc, tz))
            if df.schema(c).dataType ==
              org.apache.spark.sql.types.TimestampType =>
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.functions.ToDateTime64(
              org.apache.spark.sql.graftbridge.ColumnBridge
                .expression(df.col(s"`$c`")), sc, tz)).as(c)
        case _ => df.col(s"`$c`")
      }
    }.toSeq: _*)
    catch { case _: Exception => df }
  }

  private def register(spark: SparkSession, name: String, df: DataFrame): Unit =
    withAliasCols(name, withDeclaredDt64(name, df))
      .createOrReplaceTempView(name)

  /** The table's view WITHOUT its ALIAS columns (mutation/insert paths
    * must see only stored columns, or re-registration would duplicate
    * the computed ones). */
  private def storedDf(spark: SparkSession, name: String): DataFrame = {
    val d0 = spark.table(name)
    val as = aliasExprs.getOrElse(name, Nil).map(_._1)
    val d = if (as.isEmpty) d0 else d0.drop(as: _*)
    // untag DateTime64 display columns back to plain timestamps — the
    // mutation/insert paths work on storage types (the coercion rule
    // lowers the Cast over the UDT)
    if (!d.schema.exists(_.dataType
        .isInstanceOf[graft.functions.DateTime64UDT])) d
    else d.select(d.columns.map { c =>
      if (d.schema(c).dataType
          .isInstanceOf[graft.functions.DateTime64UDT])
        d.col(s"`$c`").cast("timestamp").as(c)
      else d.col(s"`$c`")
    }.toSeq: _*)
  }

  private def emptyDf(spark: SparkSession, d: Decl): DataFrame =
    spark.sql(d.cols
      .map { case (n, t) => s"CAST(NULL AS $t) AS `$n`" }
      .mkString("SELECT ", ", ", "")).limit(0)

  /** Split `a Decimal32(4), b UInt64 DEFAULT 0, …` into (name, SparkType)
    * pairs; DEFAULT/CODEC/COMMENT/TTL tails are dropped (storage-level
    * concerns). */
  /** Table-level declarations that are not columns: constraints,
    * secondary indexes, projections (ref ParserCreateQuery.h) — storage
    * concerns this engine drops. */
  private def isNonColumnDef(cd: String): Boolean =
    cd.trim.matches("(?is)^(CONSTRAINT|INDEX|PROJECTION|PRIMARY\\s+KEY)\\b.*")

  private def parseCols(defs: String): Seq[(String, String)] =
    splitTop(defs).filterNot(isNonColumnDef)
      .filter(cd => aliasSplit(cd).isEmpty).map { cd =>
      val trimmed = cd.trim
      val sp = trimmed.indexWhere(_.isWhitespace)
      val name = trimmed.take(sp).stripPrefix("`").stripSuffix("`")
      var typ = trimmed.drop(sp).trim
      // type-less `col DEFAULT expr` / `col MATERIALIZED expr` (ref
      // ParserCreateQuery.h columnDeclaration — the type is optional
      // when a default expression is given): infer the Spark type from
      // the expression via the CH type lattice; numeric fallback BIGINT
      val tlRe = "(?is)^(?:DEFAULT|MATERIALIZED)\\s+(.*)$".r
      tlRe.findFirstMatchIn(typ).foreach { mm =>
        var e = mm.group(1).trim
        for (kw <- Seq("CODEC", "COMMENT", "TTL")) {
          val i = e.toUpperCase.indexOf(" " + kw)
          if (i >= 0) e = e.take(i).trim
        }
        val inferred = graft.functions.ChTypes.parse(e)
          .flatMap(graft.functions.ChTypes.infer(_, Map.empty))
          .map(t => graft.ChSql.rewriteChTypes(t.name))
        typ = inferred.getOrElse(
          if (e.matches("(?s)^'.*")) "STRING" else "BIGINT")
      }
      for (kw <- Seq("DEFAULT", "MATERIALIZED", "ALIAS", "CODEC",
          "COMMENT", "TTL")) {
        val i = typ.toUpperCase.indexOf(" " + kw)
        if (i >= 0) typ = typ.take(i).trim
      }
      // Enum columns hold the NAME (CH renders the string); numeric
      // identities surface through the chEnum CAST path, not storage
      val aggFnRe = ("(?is)^\\s*(Simple)?AggregateFunction\\s*\\(\\s*" +
        "([A-Za-z_]\\w*)(\\s*\\([^)]*\\))?\\s*(?:,\\s*(.*?))?\\)\\s*$").r
      val typ2 =
        if (typ.matches("(?is)\\s*(Nullable\\s*\\(\\s*)?Enum(8|16)?\\s*\\(.*"))
          "STRING"
        else typ match {
          // AggregateFunction(f, T…) columns hold the engine's stored
          // state for f (ref ColumnAggregateFunction.h; representations
          // in ChRegistry's stored-state tier / CombinatorChain)
          case aggFnRe(simple, fn, _, argTypes) =>
            val t1 = Option(argTypes).map(a =>
              splitTop(a).headOption.map(_.trim).getOrElse("String"))
              .getOrElse("String")
            val sparkT1 = graft.ChSql.rewriteChTypes(t1)
            if (simple != null) sparkT1
            else fn.toLowerCase match {
              case "uniq" | "uniqexact" | "groupuniqarray" | "grouparray" =>
                s"ARRAY<$sparkT1>"
              case "avg" => "STRUCT<s: DOUBLE, c: BIGINT>"
              case "quantile" | "quantiles" | "median" => "ARRAY<DOUBLE>"
              case "count" => "BIGINT"
              case "sum" | "sumwithoverflow" =>
                if (sparkT1.matches("(?i)TINYINT|SMALLINT|INT|BIGINT"))
                  "BIGINT"
                else if (sparkT1.matches("(?i)FLOAT|DOUBLE")) "DOUBLE"
                else sparkT1
              case _ => sparkT1
            }
          case other => graft.ChSql.rewriteChTypes(other)
        }
      name -> typ2
    }

  /** Split on top-level commas. `angled` additionally treats <> as
    * nesting (type lists); VALUES items instead nest on [] (array
    * literals), where a bare `<` is a comparison operator. */
  private def splitTop(s: String, angled: Boolean = true): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case '<' if angled => depth += 1
        case '>' if angled => depth -= 1
        case ',' if depth == 0 => parts += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    parts += s.substring(start)
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** `(1,'a'),(2,'b')` → DataFrame via the CH dialect shim, so CH literal
    * forms (toDate('…'), arrays, ternaries) evaluate exactly as the
    * reference would. */
  private def valuesDf(spark: SparkSession, sfDir: String, tuples: String,
      width: Int): DataFrame = {
    val rows = splitTuples(tuples)
    val matrix = rows.map(r => splitTop(r, angled = false))
    // CH VALUES may mix bool and numeric literals in one column
    // ((false, …), (0, …) into a Bool column — 02114); Spark's UNION
    // refuses BOOLEAN vs INT, so normalize bools to 1/0 in positions
    // that mix kinds (the by-position cast restores the declared type)
    def kind(v: String): String = {
      val t = v.trim.toLowerCase
      if (t == "true" || t == "false") "bool"
      else if (t.matches("[+-]?\\d+(\\.\\d+)?")) "num" else "other"
    }
    val w = matrix.map(_.length).maxOption.getOrElse(0)
    val mixed = (0 until w).filter { i =>
      val ks = matrix.flatMap(_.lift(i)).map(kind).toSet
      ks("bool") && ks.size > 1
    }.toSet
    val selects = matrix.map { items =>
      items.zipWithIndex.map { case (v0, i) =>
        val v = if (mixed(i) && kind(v0) == "bool") {
          if (v0.trim.equalsIgnoreCase("true")) "1" else "0"
        } else v0
        s"$v AS __c$i"
      }.mkString("SELECT ", ", ", "")
    }
    graft.ChSql.sql(spark, selects.mkString(" UNION ALL "), sfDir)
  }

  private def splitTuples(s0: String): Seq[String] = {
    val s = s0.trim.stripSuffix(";").trim
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = -1
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\\') () else if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => if (depth == 0) start = i + 1; depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) { parts += s.substring(start, i); start = -1 }
        case _ =>
      }
    }
    parts.toSeq
  }

  private val alterColsRe =
    ("(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+" +
      "((?:ADD|DROP|RENAME|MODIFY|CLEAR|COMMENT)\\s+COLUMN\\b.*)$").r

  /** ALTER TABLE column operations over the staged/in-memory tables
    * (ref src/Storages/AlterCommands.cpp): ADD/DROP/RENAME/MODIFY/CLEAR
    * COLUMN, comma-chained. Existing rows materialize the new column's
    * DEFAULT (or the type default); CLEAR resets values; MODIFY recasts
    * in place. */
  private def handleAlterColumns(spark: SparkSession, sfDir: String,
      name: String, opsText: String): Boolean = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    import org.apache.spark.sql.types.DataType
    var df = storedDf(spark, name)
    var stagedDf = staged.get(name)
    var cols = decls.get(name).map(_.cols).getOrElse(
      df.schema.fields.map(f => f.name -> f.dataType.sql).toSeq)
    def chExpr(e: String) = expr(graft.ChSql.translate(e).trim)
    val addRe = "(?is)^ADD\\s+COLUMN\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(.*)$".r
    val dropColRe = "(?is)^DROP\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?`?(\\w+)`?\\s*$".r
    val renColRe = ("(?is)^RENAME\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?" +
      "`?(\\w+)`?\\s+TO\\s+`?(\\w+)`?\\s*$").r
    val modRe = "(?is)^MODIFY\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?(.*)$".r
    val clearRe = ("(?is)^CLEAR\\s+COLUMN\\s+(?:IF\\s+EXISTS\\s+)?" +
      "`?(\\w+)`?\\s*(?:IN\\s+PARTITION\\s+(\\S+))?\\s*$").r
    splitTop(opsText).foreach { op0 =>
      val op = op0.trim
      op match {
        case addRe(defn0) =>
          var d = defn0.trim
          var pos = cols.length
          var descAfter: Option[String] = None
          var descFirst = false
          val afterM = "(?is)\\s+AFTER\\s+`?(\\w+)`?\\s*$".r.findFirstMatchIn(d)
          if (afterM.isDefined) {
            d = d.substring(0, afterM.get.start)
            descAfter = Some(afterM.get.group(1))
            pos = cols.indexWhere(_._1 == afterM.get.group(1)) + 1
            if (pos == 0) pos = cols.length
          } else if (d.matches("(?is).*\\s+FIRST\\s*$")) {
            d = d.replaceAll("(?is)\\s+FIRST\\s*$", ""); pos = 0
            descFirst = true
          }
          parseDescCol(d).foreach(dc =>
            descInsert(name, dc, descAfter, descFirst))
          aliasSplit(d) match {
            case Some((an, ae, _)) =>
              // ALIAS columns are never stored: record the definition
              // and rebuild the views so reads compute it
              if (!aliasExprs.getOrElse(name, Nil).exists(_._1 == an))
                aliasExprs(name) =
                  aliasExprs.getOrElse(name, Nil) :+ (an -> ae)
              recordChTypes(name, d)
            case None =>
          val (cn, ct) = parseCols(d).head
          if (!cols.exists(_._1 == cn)) {
            val dt = DataType.fromDDL(ct)
            val defE = "(?is)\\b(?:DEFAULT|MATERIALIZED)\\s+(.*)$".r
              .findFirstMatchIn(d).map(_.group(1).trim)
              // strip declaration tails the expression must not carry
              .map { e0 =>
                var e = e0
                for (kw <- Seq("CODEC", "COMMENT", "TTL")) {
                  val i = e.toUpperCase.indexOf(" " + kw)
                  if (i >= 0) e = e.take(i).trim
                }
                // the default may reference ALIAS columns, which exist
                // only on the view — inline their definitions
                expandAliases(name, e)
              }
            recordDefaults(name, d, merge = true); recordChTypes(name, d)
            if (d.matches("(?is)^`?\\w+`?\\s+Nullable\\s*\\(.*"))
              nullableDeclared(name) = nullableDeclared
                .getOrElse(name, Set.empty) + cn.toLowerCase
            // a column declared Nullable backfills NULL, not the type
            // default (ref src/DataTypes/DataTypeNullable.cpp
            // getDefault = Null; 00571)
            val declaredNullable =
              d.matches("(?is)^`?\\w+`?\\s+Nullable\\s*\\(.*")
            val v = defE.map(e => chExpr(e).cast(dt))
              .getOrElse(if (declaredNullable) lit(null).cast(dt)
                else defaultFor(dt)).as(cn)
            def insert(frame: DataFrame): DataFrame = {
              val keep = frame.columns.filterNot(_ == "__graft_seq")
              val before = keep.take(pos).map(c => col(s"`$c`"))
              val after = keep.drop(pos).map(c => col(s"`$c`")) ++
                (if (frame.columns.contains("__graft_seq"))
                  Seq(col("__graft_seq")) else Nil)
              frame.select((before :+ v) ++ after: _*)
            }
            df = insert(df); stagedDf = stagedDf.map(insert)
            cols = (cols.take(pos) :+ (cn -> ct)) ++ cols.drop(pos)
          }
          }
        case dropColRe(cn) =>
          df = df.drop(cn); stagedDf = stagedDf.map(_.drop(cn))
          cols = cols.filterNot(_._1 == cn)
          descColsMap.get(name).foreach(ds =>
            descColsMap(name) = ds.filterNot(_.name == cn))
          aliasExprs.get(name).foreach(as =>
            aliasExprs(name) = as.filterNot(_._1 == cn))
        case renColRe(a, b) =>
          df = df.withColumnRenamed(a, b)
          stagedDf = stagedDf.map(_.withColumnRenamed(a, b))
          cols = cols.map { case (n, t) => (if (n == a) b else n) -> t }
          chTypes.get(name).foreach { m =>
            m.get(a).foreach(t => chTypes(name) = m - a + (b -> t)) }
          defExprs.get(name).foreach { m =>
            m.get(a).foreach(e => defExprs(name) = m - a + (b -> e)) }
          descColsMap.get(name).foreach(ds => descColsMap(name) =
            ds.map(c => if (c.name == a) c.copy(name = b) else c))
        case modRe(defn0) =>
          var d = defn0.trim
          // column-level TTL (ref TTLDescription.cpp column_ttl;
          // 01070_materialize_ttl): record the expression — expired
          // values reset to the column default when the TTL
          // materializes — and strip it from the type declaration
          val ttlM = ("(?is)^(`?\\w+`?\\s+\\w+(?:\\([^)]*\\))?)" +
            "\\s+TTL\\s+(.+)$").r.findFirstMatchIn(d)
          ttlM.foreach { m =>
            val cn = m.group(1).trim.split("\\s+").head
              .stripPrefix("`").stripSuffix("`")
            colTtlExprs(name) = colTtlExprs.getOrElse(name,
              Map.empty[String, String]) + (cn -> m.group(2).trim)
            d = m.group(1).trim
          }
          // type-less MODIFY (DEFAULT/TTL/REMOVE …) only updates metadata
          if (!d.matches("(?is)^`?\\w+`?\\s+(DEFAULT|MATERIALIZED|ALIAS|TTL|REMOVE|COMMENT)\\b.*") &&
            d.matches("(?is)^`?\\w+`?\\s+\\S.*")) {
            val (cn, ct) = parseCols(d).head
            if (cols.exists(_._1 == cn)) {
              val dt = DataType.fromDDL(ct)
              // MODIFY updates ONE column — the other columns' declared
              // CH types must survive (00714: two MODIFYs in a row)
              val keep = chTypes.getOrElse(name, Map.empty)
              recordChTypes(name, d)
              chTypes(name) = keep ++ chTypes.getOrElse(name, Map.empty)
              PartsLog.onModifyColumn(name, cn,
                keep.getOrElse(cn, ct),
                chTypes.getOrElse(name, Map.empty).getOrElse(cn, ct))
              def recast(frame: DataFrame): DataFrame =
                frame.select(frame.columns.map { c =>
                  if (c == cn)
                    graft.functions.ch.wrapCast(col(s"`$c`"), dt).as(c)
                  else col(s"`$c`") }.toSeq: _*)
              df = recast(df); stagedDf = stagedDf.map(recast)
              cols = cols.map { case (n, t) => n -> (if (n == cn) ct else t) }
              parseDescCol(d).foreach { dc =>
                descColsMap.get(name).foreach(ds => descColsMap(name) =
                  ds.map(c => if (c.name == dc.name) dc else c))
              }
            }
          } else {
            recordDefaults(name, d, merge = true)
            // DESCRIBE reflects a type-less MODIFY COLUMN … DEFAULT/
            // MATERIALIZED/ALIAS (01267: default kind+expr change, the
            // declared type stays)
            val dm = ("(?is)^`?(\\w+)`?\\s+" +
              "(DEFAULT|MATERIALIZED|ALIAS)\\s+(.+)$").r
              .findFirstMatchIn(d)
            dm.foreach { m =>
              descColsMap.get(name).foreach(ds => descColsMap(name) =
                ds.map(c =>
                  if (c.name == m.group(1))
                    c.copy(kind = m.group(2).toUpperCase,
                      expr = m.group(3).trim)
                  else c))
            }
          }
        case clearRe(cn, partVal) =>
          if (cols.exists(_._1 == cn)) {
            val dt = DataType.fromDDL(cols.find(_._1 == cn).get._2)
            // IN PARTITION p limits the reset to that partition's rows
            // (ref AlterCommands CLEAR_COLUMN; 01114)
            val cond = Option(partVal).flatMap { v =>
              createdDdl.get(name).flatMap(d =>
                ("(?is)\\bPARTITION\\s+BY\\s+(.+?)\\s*(?:ORDER\\s+BY|" +
                  "PRIMARY\\s+KEY|SAMPLE\\s+BY|SETTINGS|TTL|$).*").r
                  .findFirstMatchIn(d).map(_.group(1).trim))
                .map(px => expr(graft.ChSql.translate(
                  s"($px) = ($v)").trim))
            }
            def clear(frame: DataFrame): DataFrame =
              frame.select(frame.columns.map { c =>
                if (c == cn) cond match {
                  case Some(p) =>
                    org.apache.spark.sql.functions
                      .when(p, defaultFor(dt)).otherwise(col(s"`$c`"))
                      .cast(dt).as(c)
                  case None => defaultFor(dt).as(c)
                } else col(s"`$c`")
              }.toSeq: _*)
            df = clear(df); stagedDf = stagedDf.map(clear)
          }
        case _ => // COMMENT COLUMN and unknown tails: metadata no-ops
      }
    }
    decls(name) = Decl(cols)
    regenDdl(name)
    register(spark, name, df)
    stagedDf.foreach { st => staged(name) = st; publish(spark, name) }
    refreshViews(spark, sfDir)
    true
  }

  private def defaultFor(dt: org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => lit("")
      case DateType => expr("DATE '1970-01-01'")
      case TimestampType => expr("TIMESTAMP '1970-01-01 00:00:00'")
      case _: ArrayType => expr("array()").cast(dt)
      case BooleanType => lit(false)
      case other => lit(0).cast(other)
    }
  }
}
