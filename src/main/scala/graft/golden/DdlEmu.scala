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
      case dropRe(name) =>
        spark.catalog.dropTempView(name); decls.remove(name); true
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
        register(spark, name, emptyDf(spark, d))
        true
      case createTempRe(name, colDefs) =>
        val d = Decl(parseCols(colDefs))
        decls(name) = d
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
          col(c).cast(target.schema(n).dataType).as(n) }
        val rows = uniq.select(byPos: _*)
        val full = target.schema.fieldNames.toSeq.map { n =>
          if (names.contains(n)) col(n)
          else defaultFor(target.schema(n).dataType).as(n)
        }
        register(spark, name, target.union(rows.select(full: _*)))
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
