package graft.golden

import org.apache.spark.sql.SparkSession

/** WINDOW VIEW DDL surface (ref src/Storages/WindowView/
  * StorageWindowView.h:39-95, tests 01047/01048/01050/01051/01085/
  * 02342): CREATE WINDOW VIEW registers the view plus its `.inner.wv`
  * aggregation-state table and `.inner.target.wv` output table in the
  * catalog listing, and SHOW CREATE of the inner table renders the
  * derived AggregatingMergeTree definition — group-by keys (the
  * tumble/hop key as a `windowID(...)` UInt32 column) followed by
  * `AggregateFunction(fn, argTypes)` columns. The streaming semantics
  * themselves live in streaming/Streams.scala (tumble/hop operators);
  * this is the DDL/catalog emulation the parser tests pin. */
object WindowView {

  final case class Wv(db: String, bare: String,
    innerOrderBy: Option[String], innerPrimaryKey: Option[String],
    innerPartitionBy: Option[String],
    selectItems: Seq[String], groupBy: Seq[String],
    srcTable: String, var detached: Boolean = false)

  /** folded view name (db__wv or wv) → definition. */
  val views = scala.collection.concurrent.TrieMap.empty[String, Wv]

  def reset(): Unit = views.clear()

  private def fold(db: String, bare: String): String =
    if (db.isEmpty) bare else s"${db}__$bare"

  /** SHOW TABLES names contributed for one database. DETACH hides the
    * view itself; its inner tables stay listed (01085). */
  def names(db: String): Seq[String] =
    views.values.toSeq.filter(_.db == db).flatMap { v =>
      val inner = Seq(s".inner.${v.bare}", s".inner.target.${v.bare}")
      if (v.detached) inner else v.bare +: inner
    }

  private val CreateRe =
    ("(?is)^CREATE\\s+WINDOW\\s+VIEW\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "`?([\\w.]+)`?\\s+(.*?)\\bAS\\s+((?:WITH|SELECT)\\b.*)$").r
  private val DropRe =
    ("(?is)^(DROP|DETACH|ATTACH)\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?" +
      "(?:`?(\\w+)`?\\.)?(`\\.inner\\.(\\w+)`|`?(\\w+)`?)" +
      "(?:\\s+NO\\s+DELAY|\\s+SYNC)?\\s*$").r

  /** Handle a statement if it concerns a window view. */
  def maybeHandle(stmt: String): Boolean = stmt.trim.stripSuffix(";")
    .trim match {
    case CreateRe(name0, head, sel) =>
      val (db, bare) = name0.split("\\.", 2) match {
        case Array(d, b) => (d, b)
        case _ => ("", name0)
      }
      def clause(kw: String): Option[String] =
        (s"(?is)\\b$kw\\s+(.*?)(?=\\s+PRIMARY\\s+KEY\\b|" +
          "\\s+PARTITION\\s+BY\\b|\\s+ENGINE\\b|\\s+WATERMARK\\b|" +
          "\\s+ORDER\\s+BY\\b|\\s+POPULATE\\b|\\s+TO\\b|$)").r
          .findFirstMatchIn(head).map(_.group(1).trim)
          .filter(_.nonEmpty)
      val inner = "(?is)\\bINNER\\s+ENGINE\\b".r
        .findFirstMatchIn(head).isDefined
      val items = topCommaSplit(
        ("(?is)^(?:WITH\\b.*?\\bSELECT|SELECT)\\s+(.*?)\\s+FROM\\b.*$").r
          .findFirstMatchIn(sel).map(_.group(1)).getOrElse(""))
      val gb = topCommaSplit(
        "(?is)\\bGROUP\\s+BY\\s+(.*?)(?:\\s+ORDER\\s+BY\\b|$)".r
          .findFirstMatchIn(sel).map(_.group(1)).getOrElse(""))
      val src = "(?is)\\bFROM\\s+`?([\\w.]+)`?".r
        .findFirstMatchIn(sel).map(_.group(1)).getOrElse("")
      views(fold(db, bare)) = Wv(db, bare,
        if (inner) clause("ORDER\\s+BY") else None,
        if (inner) clause("PRIMARY\\s+KEY") else None,
        if (inner) clause("PARTITION\\s+BY") else None,
        items, gb, src)
      true
    case DropRe(op, db0, _, innerName, plainName) =>
      val db = Option(db0).getOrElse("")
      val bare = Option(innerName).getOrElse(plainName)
      if (bare == null) return false
      val key = fold(db, bare)
      views.get(key) match {
        case Some(v) => op.toUpperCase match {
          case "DROP" => views.remove(key); true
          case "DETACH" => v.detached = true; true
          case "ATTACH" => v.detached = false; true
        }
        case None =>
          // dropping just the .inner name of a live view is a no-op
          // the tests use to reset state
          innerName != null
      }
    case _ => false
  }

  private def topCommaSplit(s: String): Seq[String] =
    if (s.trim.isEmpty) Seq.empty
    else graft.ChSql.splitTopLevelCommas(s).map(_.trim)
      .filter(_.nonEmpty)

  // ---- SHOW CREATE TABLE `.inner.wv` rendering ----

  private val aggFns = Set("count", "sum", "min", "max", "avg", "any",
    "anylast", "uniq", "uniqexact", "sumif", "countif", "argmin",
    "argmax")

  /** Strip `db.` and the PRIMARY table's qualifier from identifiers;
    * other tables keep their bare table qualifier (JOIN cases pin
    * `count(mt_2.b)`). */
  private def dequalify(e: String, db: String, primary: String): String = {
    var s = e
    if (db.nonEmpty) s = s.replace(db + ".", "")
    val pb = primary.split("\\.").last
    s.replaceAll("(?<![\\w.])" + java.util.regex.Pattern.quote(pb) +
      "\\.", "")
  }

  private def windowText(raw0: String, db: String,
      primary: String): String = {
    var s = dequalify(raw0.trim, db, primary)
    s = s.replaceAll("(?is)^\\s*(tumble|hop)\\s*\\(", "windowID(")
    // INTERVAL '1' SECOND → toIntervalSecond('1'); unquoted stays bare
    s = s.replaceAll("(?i)\\bINTERVAL\\s+('?-?\\d+'?)\\s+(\\w)(\\w*?)S?\\b",
      "toIntervalMAGIC_U$2MAGIC_L$3($1)")
    // capitalization of the unit
    s = "MAGIC_U(\\w)".r.replaceAllIn(s, m => m.group(1).toUpperCase)
    s = "MAGIC_L(\\w*)".r.replaceAllIn(s, m => m.group(1).toLowerCase)
    // now()-keyed windows aggregate over the processing clock column
    s = s.replaceAll("(?i)\\bnow\\s*\\(\\s*\\)", "____timestamp")
    s.replaceAll("\\s*,\\s*", ", ")
  }

  private def isWindowExpr(e: String): Boolean =
    e.trim.matches("(?is)^(tumble|hop)\\s*\\(.*")

  private def typesOf(name: String): Map[String, String] =
    DdlEmu.chTypesOf(name.replace(".", "__")).toMap

  /** CH type text of a scalar key expression over the source table
    * (src may be db-qualified). */
  private def keyType(e: String, src: String): String = {
    val t = e.trim
    if (t.matches("[A-Za-z_]\\w*"))
      typesOf(src).getOrElse(t, "Int32")
    else if (t.matches("(?is)^(plus|minus|multiply)\\s*\\(.*")) "Int64"
    else "Int64"
  }

  private def argType(arg0: String, db: String, src: String): String = {
    val arg = dequalify(arg0.trim, db, src)
    arg.split("\\.", 2) match {
      case Array(t, c) =>
        typesOf(if (db.isEmpty) t else s"$db.$t").getOrElse(c, "Int32")
      case _ => typesOf(src).getOrElse(arg, "Int32")
    }
  }

  def innerShowCreate(db: String, bare: String): Option[String] = {
    val v = views.get(fold(db, bare)).getOrElse(return None)
    // alias → underlying expression (SELECT `e AS a` and GROUP BY
    // `e AS a` both bind)
    val aliasRe = "(?is)^(.*?)\\s+as\\s+(\\w+)$".r
    val aliases = (v.selectItems ++ v.groupBy).flatMap {
      case aliasRe(e, a) => Some(a -> e.trim)
      case _ => None
    }.toMap
    def dealias(e: String): String = {
      val t = e.trim
      aliasRe.findFirstMatchIn(t).map(_.group(1).trim)
        .orElse(aliases.get(t)).getOrElse(t)
    }
    val keys = v.groupBy.map(dealias)
    case class Col(name: String, typ: String)
    val nowBased = keys.filter(isWindowExpr).exists(
      _.matches("(?is).*\\bnow\\s*\\(\\s*\\).*"))
    // keyed columns keep GROUP BY order (window key in place) — except
    // a processing-time (now) window key, which lands AFTER the
    // aggregates
    val keyCols = keys.map { k =>
      if (isWindowExpr(k)) Col(windowText(k, v.db, v.srcTable), "UInt32")
      else {
        val e = dequalify(k, v.db, v.srcTable)
        Col(e, keyType(e, v.srcTable))
      }
    }
    val aggCols = v.selectItems.map(dealias).flatMap { it =>
      val m = "(?is)^(\\w+)\\s*\\((.*)\\)$".r.findFirstMatchIn(it.trim)
      m.filter(mm => aggFns.contains(mm.group(1).toLowerCase)).map { mm =>
        val fn = mm.group(1)
        val args = topCommaSplit(mm.group(2))
        val argTexts = args.map(a => dequalify(a, v.db, v.srcTable))
        val types = args.map(a => argType(a, v.db, v.srcTable))
        Col(s"$fn(${argTexts.mkString(", ")})",
          s"AggregateFunction($fn, ${types.mkString(", ")})")
      }
    }
    val cols =
      if (nowBased) aggCols ++ keyCols.filter(_.typ == "UInt32")
      else keyCols ++ aggCols
    def renderKey(e0: String): String = {
      val e = dealias(e0)
      val t =
        if (isWindowExpr(e)) windowText(e, v.db, v.srcTable)
        else dequalify(e, v.db, v.srcTable)
      if (t.matches("[A-Za-z_]\\w*")) t else s"`$t`"
    }
    def renderKeyList(s: String): String = {
      val t = s.trim
      val items =
        if (t.startsWith("(") && t.endsWith(")"))
          topCommaSplit(t.drop(1).dropRight(1))
        else Seq(t)
      val rendered = items.map(renderKey)
      if (rendered.length == 1) rendered.head
      else rendered.mkString("(", ", ", ")")
    }
    val orderBy = v.innerOrderBy.map(renderKeyList).getOrElse {
      val rendered = keys.map(renderKey)
      if (rendered.length == 1) rendered.head
      else rendered.mkString("(", ", ", ")")
    }
    val sb = new StringBuilder
    sb.append("CREATE TABLE ")
    if (v.db.nonEmpty) sb.append(v.db).append('.')
    sb.append("`.inner.").append(v.bare).append("`\n(\n")
    sb.append(cols.map(c => s"    `${c.name}` ${c.typ}")
      .mkString(",\n"))
    sb.append("\n)\nENGINE = AggregatingMergeTree\n")
    v.innerPartitionBy.foreach(p =>
      sb.append("PARTITION BY ").append(renderKeyList(p)).append('\n'))
    v.innerPrimaryKey.foreach(p =>
      sb.append("PRIMARY KEY ").append(renderKeyList(p)).append('\n'))
    sb.append("ORDER BY ").append(orderBy)
    sb.append("\nSETTINGS index_granularity = 8192")
    Some(sb.toString)
  }
}
