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
    "(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?`?([\\w.]+)`?\\s*\\((.*)\\)\\s*ENGINE\\s*=?.*$".r
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
  private val alterDeleteRe =
    "(?is)^ALTER\\s+TABLE\\s+`?([\\w.]+)`?\\s+DELETE\\s+WHERE\\s+(.*?)\\s*(?:SETTINGS\\s+.*)?$".r
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
      "`?([\\w.]+)`?\\s*(?:(?:ENGINE|ORDER|PARTITION|PRIMARY|SETTINGS)\\b" +
      "[^;]*?)?\\bAS\\s+((?:SELECT|WITH)\\b.*)$").r

  /** Declared (CH-translated) column types per created table, so INSERT
    * can cast to them and TRUNCATE can rebuild the empty frame. */
  private case class Decl(cols: Seq[(String, String)])
  private val decls = scala.collection.concurrent.TrieMap.empty[String, Decl]

  /** Column names DECLARED Nullable(...) per LIVE table: the join-gap
    * default fill (join_use_nulls=0) must leave those NULL while
    * non-Nullable columns take the type default. Keyed by table so DROP
    * forgets a section's declarations. */
  private val nullableDeclared = scala.collection.concurrent.TrieMap
    .empty[String, Set[String]]
  def isDeclaredNullable(col: String): Boolean =
    nullableDeclared.values.exists(_.contains(col.toLowerCase))
  /** Per-file reset (the map is session-global; one test's declarations
    * must not leak into the next file's fill decisions). */
  def resetNullables(): Unit = { nullableDeclared.clear(); defExprs.clear() }

  /** Declared DEFAULT/MATERIALIZED column expressions per table: INSERTs
    * that omit the column compute it from the inserted row (ref
    * src/Interpreters/addMissingDefaults.cpp) rather than taking the
    * type default. */
  private val defExprs =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]
  private def recordDefaults(table: String, colDefs: String): Unit = {
    val m = splitTop(colDefs).flatMap { cd =>
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
    if (m.nonEmpty) defExprs(table) = m else defExprs.remove(table)
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
    if (layout.startsWith("range") || layout.contains("ip_trie")) return false
    val pk = "(?is)PRIMARY\\s+KEY\\s+(.*?)\\s*(?:SOURCE|LAYOUT|LIFETIME|RANGE)\\b".r
      .findFirstMatchIn(tail).map(_.group(1).trim)
      .getOrElse(return false)
    val keyCols = pk.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
    if (keyCols.length != 1) return false
    val srcTbl = "(?is)\\bTABLE\\s+'?([\\w.]+)'?".r.findFirstMatchIn(tail)
      .map(_.group(1)).getOrElse(return false)
    val srcDb = "(?is)\\bDB\\s+'([\\w.]+)'".r.findFirstMatchIn(tail)
      .map(_.group(1))
    val qualified = srcDb.filter(_ => !srcTbl.contains("."))
      .map(db => graft.ChDatabases.fold(db, srcTbl)).getOrElse(
        graft.ChDatabases.foldQualified(srcTbl,
          graft.ChSql.replaceOutsideStrings))
    val src = try spark.table(qualified)
      catch { case _: Exception => return false }
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
    val dict = src.select(attrs.map(a => col(a.name)).toSeq: _*)
    // a dictionary is also queryable as a table (SELECT * FROM db.dict)
    dict.createOrReplaceTempView(name)
    val hierCol = attrs.find(_.hierarchical).map(_.name)
    hierCol match {
      case Some(h) => graft.operators.Dictionaries
        .createHierarchicalDictionary(name, dict, keyCols(0), h)
      case None => graft.operators.Dictionaries
        .createDictionary(name, dict, keyCols(0))
    }
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
    graft.operators.Dictionaries.setAttrDefaults(name, defaults)
    // dictGet addresses the dictionary by its STRING name, which the
    // db-qualifier folding never touches — alias the dotted spelling
    graft.ChDatabases.known.foreach { db =>
      if (name.startsWith(db + "__"))
        graft.operators.Dictionaries.aliasDictionary(name,
          db + "." + name.stripPrefix(db + "__"))
    }
    true
  }

  /** Returns true when `stmt` was a DDL/INSERT statement handled here. */
  def handle(spark: SparkSession, sfDir: String, stmt0: String): Boolean = {
    // CREATE DATABASE registers the qualifier BEFORE folding so its own
    // tables fold; every other statement folds known `db.tbl` names
    val stmt = stmt0 match {
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
        graft.ChDatabases.unregister(db)
        if (spark.catalog.currentDatabase == db) spark.sql("USE default")
        spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
        return true
      case _ =>
        graft.ChDatabases.foldQualified(stmt0,
          graft.ChSql.replaceOutsideStrings)
    }
    stmt match {
      // storage-maintenance statements are no-ops over lazy views
      // (OPTIMIZE [FINAL] rewrites parts; SYSTEM STOP/START MERGES
      // throttles background merges — both irrelevant here)
      case s if s.matches("(?is)^OPTIMIZE\\s+TABLE\\b.*") => true
      case createDictRe(name, colDefs, tail) =>
        handleCreateDictionary(spark, sfDir, name, colDefs, tail)
      case dropDictRe(_) => true
      case s if s.matches(
        "(?is)^SYSTEM\\s+(STOP|START)\\s+(MERGES|TTL\\s+MERGES)\\b.*") =>
        true
      case dropRe(name) =>
        spark.catalog.dropTempView(name); decls.remove(name)
        nullableDeclared.remove(name); true
      case truncateRe(name) =>
        decls.get(name).foreach(d => register(spark, name, emptyDf(spark, d)))
        true
      case createAsNumbersRe(name, n) =>
        spark.range(n.toLong).toDF("number").createOrReplaceTempView(name)
        decls(name) = Decl(Seq("number" -> "BIGINT"))
        true
      case createRe(name, colDefs) =>
        val d = Decl(parseCols(colDefs))
        decls(name) = d
        recordNullables(name, colDefs); recordDefaults(name, colDefs)
        register(spark, name, emptyDf(spark, d))
        true
      case createTempRe(name, colDefs) =>
        val d = Decl(parseCols(colDefs))
        decls(name) = d
        recordNullables(name, colDefs); recordDefaults(name, colDefs)
        register(spark, name, emptyDf(spark, d))
        true
      case alterUpdateRe(name, assigns, cond) =>
        val target = spark.table(name)
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
        register(spark, name, graft.ChSql.sql(spark,
          s"SELECT ${items.mkString(", ")} FROM `$name`", sfDir))
        true
      case alterDeleteRe(name, cond) =>
        // NULL condition = not deleted (CH treats it as 0)
        register(spark, name, graft.ChSql.sql(spark,
          s"SELECT * FROM `$name` WHERE NOT ($cond) OR ($cond) IS NULL",
          sfDir))
        true
      case insertRe(name, colList, body) =>
        val target = spark.table(name)
        val names = Option(colList)
          .map(_.stripPrefix("(").stripSuffix(")")
            .split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
          .getOrElse(target.schema.fieldNames.toSeq)
        val fmtBody =
          "(?is)^FORMAT\\s+(\\w+)\\s+(.*)$".r.findFirstMatchIn(body.trim)
        val rows0 =
          if (body.trim.toUpperCase.startsWith("VALUES"))
            valuesDf(spark, sfDir, body.trim.drop(6).trim, names.length)
          else if (fmtBody.isDefined) {
            // inline-data INSERT (`INSERT INTO t FORMAT CSV 1,2`): the
            // payload rides the DescFormat VALUES-subquery machinery;
            // backslashes are protected because the payload is raw text,
            // not a CH string literal
            val fmt = fmtBody.get.group(1)
            val payload = fmtBody.get.group(2)
            if (fmt.equalsIgnoreCase("Values"))
              valuesDf(spark, sfDir, payload.trim, names.length)
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
        val uniq = rows0.toDF(
          rows0.columns.indices.map(i => s"__ins$i"): _*)
        val byPos = names.zip(uniq.columns).map { case (n, c) =>
          // DateTime columns accept digit strings as unix timestamps
          // (ref ReadHelpers.h readDateTimeTextImpl numeric path)
          val casted =
            if (target.schema(n).dataType ==
                org.apache.spark.sql.types.TimestampType &&
              uniq.schema(c).dataType ==
                org.apache.spark.sql.types.StringType)
              graft.functions.ch.toDateTime(uniq.col(c))
            else col(c).cast(target.schema(n).dataType)
          casted.as(n) }
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
          val items = target.schema.fieldNames.toSeq.map { n =>
            if (computed.contains(n))
              s"CAST((${defMap(n)}) AS ${target.schema(n).dataType.sql})" +
                s" AS `$n`"
            else s"`$n`"
          }
          graft.ChSql.sql(spark,
            s"SELECT ${items.mkString(", ")} FROM __graft_ins_src", sfDir)
        }
        register(spark, name, target.union(filled))
        true
      case createAsTableRe(name, src)
          if scala.util.Try(spark.table(src)).isSuccess =>
        val srcDf = spark.table(src)
        decls(name) = decls.getOrElse(src,
          Decl(srcDf.schema.fields.map(f => f.name -> f.dataType.sql).toSeq))
        register(spark, name, srcDf.limit(0))
        true
      case ctasRe(name, select) =>
        val df = graft.ChSql.sql(spark, select.trim, sfDir)
        decls(name) =
          Decl(df.schema.fields.map(f => f.name -> f.dataType.sql).toSeq)
        register(spark, name, df)
        true
      case _ => false
    }
  }

  private def register(spark: SparkSession, name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  private def emptyDf(spark: SparkSession, d: Decl): DataFrame =
    spark.sql(d.cols
      .map { case (n, t) => s"CAST(NULL AS $t) AS `$n`" }
      .mkString("SELECT ", ", ", "")).limit(0)

  /** Split `a Decimal32(4), b UInt64 DEFAULT 0, …` into (name, SparkType)
    * pairs; DEFAULT/CODEC/COMMENT/TTL tails are dropped (storage-level
    * concerns). */
  private def parseCols(defs: String): Seq[(String, String)] =
    splitTop(defs).map { cd =>
      val trimmed = cd.trim
      val sp = trimmed.indexWhere(_.isWhitespace)
      val name = trimmed.take(sp).stripPrefix("`").stripSuffix("`")
      var typ = trimmed.drop(sp).trim
      for (kw <- Seq("DEFAULT", "MATERIALIZED", "ALIAS", "CODEC",
          "COMMENT", "TTL")) {
        val i = typ.toUpperCase.indexOf(" " + kw)
        if (i >= 0) typ = typ.take(i).trim
      }
      // Enum columns hold the NAME (CH renders the string); numeric
      // identities surface through the chEnum CAST path, not storage
      val typ2 =
        if (typ.matches("(?is)\\s*(Nullable\\s*\\(\\s*)?Enum(8|16)?\\s*\\(.*"))
          "STRING"
        else graft.ChSql.rewriteChTypes(typ)
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
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
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
    val selects = rows.map { r =>
      val items = splitTop(r, angled = false)
      items.zipWithIndex.map { case (v, i) => s"$v AS __c$i" }
        .mkString("SELECT ", ", ", "")
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
