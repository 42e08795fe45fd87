package graft.golden

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.nio.file.{Files, Paths}

/** Golden-test harness: run reference `.sql` files through the ChSql
  * dialect shim and diff CH-style TSV output against the paired
  * `.reference` file — the reference's own test strategy
  * (`/root/reference/tests/queries/0_stateless/`, SURVEY §5).
  */
object Golden {

  /** bool_true_representation / bool_false_representation (ref
    * SerializationBool.cpp — governs Bool TEXT formats: TSV, CSV,
    * Pretty, Vertical; JSON and nested Values keep raw true/false). */
  def boolRep(b: Boolean): String = {
    val key = if (b) "graft.ch.bool_true_representation"
      else "graft.ch.bool_false_representation"
    val dflt = if (b) "true" else "false"
    try org.apache.spark.sql.internal.SQLConf.get.getConfString(key, dflt)
    catch { case _: Throwable => dflt }
  }

  /** CH TabSeparated formatting of one value (top level). */
  def fmt(v: Any): String = v match {
    case null => "\\N"
    case ip: graft.functions.ChIPv4 => ip.toString
    case ip: graft.functions.ChIPv6 => ip.toString
    case b: graft.functions.ChBool => escapeTsv(boolRep(b.b))
    case t: graft.functions.ChDT64 => t.toString
    case s: String => escapeTsv(s)
    case b: Boolean => if (b) "1" else "0"
    case d: java.lang.Double => chDouble(d)
    case f: java.lang.Float => chFloat(f)
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case b: Array[Byte] => escapeTsv(decodeBytes(b))
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toString.takeWhile(_ != '.')
    case a: scala.collection.Seq[_] =>
      a.map(fmtNested).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => fmtNested(k) + ":" + fmtNested(v) }
        .mkString("{", ",", "}")
    case r: Row => r.toSeq.map(fmtNested).mkString("(", ",", ")")
    case other => other.toString
  }

  /** Nested (inside arrays/tuples) formatting: strings get quoted. */
  private def fmtNested(v: Any): String = v match {
    case null => "NULL"
    case b: graft.functions.ChBool => if (b.b) "true" else "false"
    case ip: graft.functions.ChIPv4 => "'" + ip.toString + "'"
    case ip: graft.functions.ChIPv6 => "'" + ip.toString + "'"
    case t: graft.functions.ChDT64 => "'" + t.toString + "'"
    case d: java.sql.Date => "'" + d.toString + "'"
    case t: java.sql.Timestamp => "'" + fmt(t) + "'"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'")
      .replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
      .replace("\u0000", "\\0").replace("\b", "\\b")
      .replace("\f", "\\f") + "'"
    case other => fmt(other)
  }

  /** Binary values print as raw bytes in CH's TSV. Valid UTF-8 decodes
    * normally; malformed bytes (e.g. IPv6StringToNum's 0xff pairs) fall
    * back to Latin-1 so each byte maps to one char — mirroring how
    * [[readRef]] reads a .reference file that carries raw bytes. */
  private def decodeBytes(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException =>
      new String(b, java.nio.charset.StandardCharsets.ISO_8859_1) }
  }

  /** Read a text file as UTF-8, Latin-1 on malformed content. */
  def readRef(p: java.nio.file.Path): String = {
    val bytes = Files.readAllBytes(p)
    decodeBytes(bytes)
  }

  private def escapeTsv(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
      .replace("\r", "\\r").replace("\u0000", "\\0")
      .replace("\b", "\\b").replace("\f", "\\f")
      .replace("'", "\\'") // CH TSV escapes single quotes (TabSeparated)

  /** CH float formatting: shortest round-trip digits, plain decimal for
    * moderate exponents, `e` notation beyond — matches the reference's
    * output for the integer-valued and short-fraction cases the curated
    * tests exercise. */
  def chDouble(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    if (d == 0.0) return if (1 / d < 0) "-0" else "0"
    chReal(d < 0, java.lang.Double.toString(math.abs(d)))
  }

  /** Float32 gets FLOAT shortest-round-trip digits (CH renders Float32
    * with float precision — 1.72999e-40, not the double re-expansion). */
  def chFloat(f: Float): String = {
    if (f.isNaN) return "nan"
    if (f.isPosInfinity) return "inf"
    if (f.isNegInfinity) return "-inf"
    if (f == 0.0f) return if (1 / f < 0) "-0" else "0"
    chReal(f < 0, java.lang.Float.toString(math.abs(f)))
  }

  private def chReal(neg: Boolean, repr: String): String = {
    val (mantStr, e10) = repr.split("E") match {
      case Array(m) => (m, 0)
      case Array(m, e) => (m, e.toInt)
    }
    val dot = mantStr.indexOf('.')
    val digits0 = mantStr.replace(".", "")
    val digits = digits0.reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case x => x
    }
    // exponent of the first digit (value = 0.digits * 10^(exp))
    val exp = e10 + dot
    val sb = new StringBuilder(if (neg) "-" else "")
    if (exp > 21 || exp < -5) {
      // 1 digit, then fraction, then e±exp (CH style: 1.5e16)
      sb.append(digits.head)
      if (digits.length > 1) sb.append('.').append(digits.tail)
      sb.append('e').append(if (exp - 1 >= 0) "" else "").append(exp - 1)
    } else if (exp >= digits.length) {
      sb.append(digits).append("0" * (exp - digits.length))
    } else if (exp > 0) {
      sb.append(digits.take(exp)).append('.').append(digits.drop(exp))
    } else {
      sb.append("0.").append("0" * -exp).append(digits)
    }
    sb.toString
  }

  /** Per-column extremes of a result (ref
    * src/QueryPipeline/..ExtremesTransform: min/max per column; NaNs are
    * skipped unless the column is all-NaN — pinned by 00402). */
  def extremesOf(rows: Seq[Row], width: Int): (Row, Row) = {
    def isNan(v: Any) = v match {
      case d: java.lang.Double => d.isNaN
      case f: java.lang.Float => f.isNaN
      case _ => false
    }
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Number, y: Number) => x.doubleValue < y.doubleValue
      case (x: String, y: String) => x < y
      case (x: java.sql.Date, y: java.sql.Date) => x.before(y)
      case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.before(y)
      case (x: Row, y: Row) =>
        x.toSeq.zip(y.toSeq).find { case (a1, b1) => a1 != b1 }
          .exists { case (a1, b1) => lt(a1, b1) }
      case _ => true // incomparable: keep first
    }
    def pick(i: Int, wantMin: Boolean): Any = {
      val vals = rows.map(_(i)).filter(_ != null)
      val pool0 = vals.filterNot(isNan)
      val pool = if (pool0.nonEmpty) pool0 else vals
      if (pool.isEmpty) null
      else pool.reduce((a, b) => if (lt(a, b) == wantMin) a else b)
    }
    (Row.fromSeq((0 until width).map(pick(_, wantMin = true))),
      Row.fromSeq((0 until width).map(pick(_, wantMin = false))))
  }

  def formatDf(df: DataFrame): Seq[String] = {
    // CH prints a bare Interval as its COUNT in the column's unit —
    // recover the unit from the schema (a Duration alone is ambiguous:
    // toIntervalMinute(5) and toIntervalSecond(300) carry the same value)
    import org.apache.spark.sql.types.{DayTimeIntervalType => DT,
      YearMonthIntervalType => YM}
    val units = df.schema.fields.map(_.dataType).toIndexedSeq
    // Week/Quarter tags (ChIntervalTag): CH units Spark's interval types
    // can't encode — recover the display divisor from the analyzed plan
    val divisors: IndexedSeq[Int] = try {
      import org.apache.spark.sql.catalyst.expressions.Alias
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
      val analyzed = df.queryExecution.analyzed
      // alias exprId → divisor, anywhere in the plan (ChSql wraps the
      // user Project in resort/blanket layers, so walk the whole tree
      // and resolve output attributes by exprId)
      import org.apache.spark.sql.catalyst.expressions.{Expression,
        SubqueryExpression}
      def findTag(e: Expression): Option[Int] =
        e.collectFirst { case t: graft.functions.ChIntervalTag =>
          t.divisor }.orElse {
          // `(SELECT toIntervalQuarter(5)) AS x`: the tag lives in the
          // subquery's own plan
          e.collectFirst { case ss: SubqueryExpression => ss }.flatMap {
            ss => ss.plan.collect {
              case p: Project => p.projectList
            }.flatten.flatMap(findTag).headOption
          }
        }
      val byId: Map[Long, Int] = analyzed.collect {
        case p: Project => p.projectList
        case a: Aggregate => a.aggregateExpressions
      }.flatten.flatMap {
        case al: Alias => findTag(al).map(al.exprId.id -> _)
        case _ => None
      }.toMap
      analyzed.output.map(a => byId.getOrElse(a.exprId.id, 1)).toIndexedSeq
    } catch { case _: Throwable => df.schema.fields.toIndexedSeq.map(_ => 1) }
    def one(v: Any, dt: org.apache.spark.sql.types.DataType,
        divisor: Int): String =
      (v, dt) match {
        case (d: java.time.Duration, t: DT) =>
          val s = d.getSeconds
          ((t.endField match {
            case DT.DAY => s / 86400
            case DT.HOUR => s / 3600
            case DT.MINUTE => s / 60
            case _ => s
          }) / divisor).toString
        case (p: java.time.Period, t: YM) =>
          ((t.endField match {
            case YM.YEAR => p.toTotalMonths / 12
            case _ => p.toTotalMonths
          }) / divisor).toString
        case _ => fmt(v)
      }
    df.collect().toSeq.map(r =>
      r.toSeq.zip(units).zipWithIndex.map { case ((v, dt), i) =>
        one(v, dt, if (i < divisors.size) divisors(i) else 1)
      }.mkString("\t"))
  }

  /** Split on top-level `UNION ALL` (outside parens/strings): each
    * branch is a separate block for the Pretty output formats. */
  private[golden] def splitTopLevelUnionAll(q: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    val ua = "(?is)^UNION\\s+ALL\\b".r
    while (i < q.length) {
      val c = q.charAt(i)
      if (inStr) { if (c == '\\') i += 1 else if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'u' || c == 'U')) {
        ua.findPrefixMatchOf(q.substring(i)) match {
          case Some(m) =>
            parts += q.substring(start, i)
            i += m.end - 1
            start = i + 1
          case None =>
        }
      }
      i += 1
    }
    parts += q.substring(start)
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def stripComments(text: String): String = {
    val lineStripped = text.linesIterator
      .map { line =>
        var i = 0; var inStr = false; var cut = -1
        while (cut < 0 && i < line.length - 1) {
          val c = line.charAt(i)
          if (c == '\'') inStr = !inStr
          else if (!inStr && c == '-' && line.charAt(i + 1) == '-') cut = i
          i += 1
        }
        if (cut >= 0) line.substring(0, cut) else line
      }
      .mkString("\n")
    // block comments /* … */ (string-aware; CH's Lexer treats them as
    // whitespace, so identifier rewrites must not see them)
    val sb = new StringBuilder
    var i = 0; var inStr = false
    while (i < lineStripped.length) {
      val c = lineStripped.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\\' && i + 1 < lineStripped.length) {
          sb.append(lineStripped.charAt(i + 1)); i += 1
        } else if (c == '\'') inStr = false
      } else if (c == '\'') { sb.append(c); inStr = true }
      else if (c == '/' && i + 1 < lineStripped.length &&
        lineStripped.charAt(i + 1) == '*') {
        // CH's Lexer nests block comments: /*a/*b*/c*/ is ONE comment
        var depth = 1
        var j = i + 2
        while (depth > 0 && j + 1 < lineStripped.length) {
          if (lineStripped.charAt(j) == '/' &&
            lineStripped.charAt(j + 1) == '*') { depth += 1; j += 2 }
          else if (lineStripped.charAt(j) == '*' &&
            lineStripped.charAt(j + 1) == '/') { depth -= 1; j += 2 }
          else j += 1
        }
        sb.append(' ')
        i = if (depth > 0) lineStripped.length - 1 else j - 1
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Split a .sql file into (statement, expectsError): splits on `;`
    * outside single-quoted strings; a statement annotated with CH's
    * `-- { serverError N }` / `-- { clientError N }` test marker is
    * expected to FAIL in the reference and contributes no output lines
    * (the same contract the reference's clickhouse-test runner applies).
    * Comments are stripped after annotation detection. */
  def splitAnnotated(text: String): Seq[(String, Boolean)] = {
    val raw = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var inComment = false // a quote inside `-- …` must not open a string
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\n') inComment = false
      else if (!inStr && !inComment && c == '-' && i + 1 < text.length &&
        text.charAt(i + 1) == '-') inComment = true
      if (c == '\'' && !inComment &&
        (i == 0 || text.charAt(i - 1) != '\\')) inStr = !inStr
      if (c == ';' && !inStr) { raw += sb.toString; sb.clear() }
      else sb.append(c)
      i += 1
    }
    raw += sb.toString
    raw.toSeq.flatMap { stmt =>
      val expectsError =
        stmt.matches("(?s).*--\\s*\\{\\s*(server|client)Error.*")
      val clean = stripComments(stmt).trim
      if (clean.isEmpty) None else Some((clean, expectsError))
    }
  }

  def splitStatements(text: String): Seq[String] =
    splitAnnotated(text).map(_._1)

  /** Raw `;`-separated chunks (comments kept — echo mode needs them). */
  private def splitRaw(text: String): Seq[String] = {
    val raw = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var inComment = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\n') inComment = false
      else if (!inStr && !inComment && c == '-' && i + 1 < text.length &&
        text.charAt(i + 1) == '-') inComment = true
      if (c == '\'' && !inComment &&
        (i == 0 || text.charAt(i - 1) != '\\')) inStr = !inStr
      if (c == ';' && !inStr) { raw += sb.toString; sb.clear() }
      else sb.append(c)
      i += 1
    }
    raw += sb.toString
    // INSERT … FORMAT <fmt> inline data carries no terminating ';'
    // (clickhouse-client contract): data starting on the SAME line as
    // the FORMAT keyword is that one line; data starting on the next
    // line runs until the first EMPTY line. Either way the chunk may
    // have swallowed following statements — split them back out.
    // Values data still ends at ';' (the parser reads it as SQL).
    def splitFmtData(chunk: String): Seq[String] =
      "(?is)^(\\s*INSERT\\s+INTO\\b.*?\\bFORMAT\\s+(?!Values\\b)\\w+)([^\\S\\n]*)(.*)$".r
        .findFirstMatchIn(chunk) match {
        case Some(m) =>
          val payload = m.group(3)
          val sameLine = payload.takeWhile(_ != '\n')
          if (sameLine.trim.nonEmpty) {
            val rest = payload.drop(sameLine.length)
            if (rest.trim.nonEmpty)
              (m.group(1) + m.group(2) + sameLine) +: splitFmtData(rest)
            else Seq(chunk)
          } else "\\n[ \\t]*\\n".r.findFirstMatchIn(payload) match {
            case Some(blank) if payload.substring(blank.end).trim.nonEmpty =>
              (m.group(1) + m.group(2) + payload.substring(0, blank.start)) +:
                splitFmtData(payload.substring(blank.end))
            case _ => Seq(chunk)
          }
        case None => Seq(chunk)
      }
    // a mid-chunk `-- { serverError/clientError }` annotation ends its
    // statement at that LINE even without a ';' (clickhouse-client
    // newline rule) — split the swallowed follow-up statements back out
    // (02165: `… VALUES (1) -- { clientError } \n EXPLAIN …;`)
    def splitErrAnnotated(chunk: String): Seq[String] =
      ("(?s)^(.*?--\\s*\\{\\s*(?:server|client)Error[^}\\n]*\\}[^\\S\\n]*)\\n" +
        "(\\s*\\S.*)$").r.findFirstMatchIn(chunk) match {
        case Some(m) if m.group(2).trim.nonEmpty =>
          m.group(1) +: splitErrAnnotated(m.group(2))
        case _ => Seq(chunk)
      }
    raw.toSeq.flatMap(splitErrAnnotated).flatMap(splitFmtData)
  }

  private val EchoMarker = "\\s*--\\s*\\{\\s*(echo|echoOn|echoOff)\\s*\\}\\s*".r

  /** Run one golden file; returns (actual, expected) output lines.
    * Honors the reference runner's `-- { echo }` / `{ echoOn }` /
    * `{ echoOff }` markers: while echoing, each statement's original
    * text (with its attached comment lines) precedes its result rows,
    * and the on-turning marker line itself is emitted — the exact
    * contract of clickhouse-test's echo mode. */
  def runFile(spark: SparkSession, sqlPath: String,
      sfDir: String): (Seq[String], Seq[String]) = {
    val text = Files.readString(Paths.get(sqlPath))
    val refPath = sqlPath.stripSuffix(".sql") + ".reference"
    val expected = readRef(Paths.get(refPath))
      .linesIterator.toSeq.reverse.dropWhile(_.isEmpty).reverse
    val settings = scala.collection.mutable.Map.empty[String, String]
    // query_log recording is pay-for-use: only files that read the log
    // tables carry the per-statement bookkeeping (table counts etc.)
    QueryLog.enabled = text.toLowerCase.contains("query_log") ||
      text.toLowerCase.contains("query_thread_log")
    QueryCache.enabled = text.toLowerCase.contains("query_cache")
    EventsLog.enabled = text.toLowerCase.contains("system.events") ||
      text.toLowerCase.contains("system.metrics")
    PartsLog.enabled = text.toLowerCase.contains("system.parts") ||
      text.toLowerCase.contains("detached_parts") ||
      // part_log events ride on the same per-part provenance
      text.toLowerCase.contains("part_log") ||
      // PART-level ALTERs need per-part provenance even when the file
      // never reads system.parts
      "(?i)\\b(detach|drop|attach)\\s+part\\b".r
        .findFirstIn(text).isDefined
    DdlEmu.resetSession(spark)
    val chunks = splitRaw(text)
    // `stmt; -- { serverError N }` splits the annotation into the NEXT
    // chunk's leading line — it still marks the statement BEFORE the `;`
    // (clickhouse-test reads the whole line). Detect a chunk whose first
    // line is only the annotation comment and credit its predecessor.
    val annotatesPrev = chunks.map { chunk =>
      chunk.linesIterator.nextOption().exists(
        _.matches("\\s*--\\s*\\{\\s*(server|client)Error.*"))
    }
    // the whole golden file is CH statements — DDL emulation analyzes
    // CH-translated expressions outside ChSql.sql, so scope CH-only
    // analysis behavior (wrapping int arithmetic) over the full run
    val actual = try graft.plans.ChAnalysisScope.active.withValue(true) {
      runChunks(spark, sfDir, chunks, annotatesPrev, settings)
    } finally settings.keys.foreach(k => spark.conf.unset("graft.ch." + k))
    // CH's runner compares whole files; trailing empty lines (e.g. an
    // empty-string result at EOF) are normalized away on BOTH sides the
    // same way `expected` is above
    (actual.reverse.dropWhile(_.isEmpty).reverse, expected)
  }

  /** Sentinel marking a line emitted WITHOUT a trailing newline
    * (FORMAT Values) — merged with the following line in a final pass. */
  private val ValuesNoNl = " __graft_values_no_nl__"

  private def runChunks(spark: SparkSession, sfDir: String,
      chunks: Seq[String], annotatesPrev: Seq[Boolean],
      settings: scala.collection.mutable.Map[String, String]): Seq[String] = {
    var echo = false
    val all = chunks.zipWithIndex.flatMap { case (chunk, ci) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      // peel marker/comment lines, toggling echo state in order; a
      // leading line that only annotates the PREVIOUS statement is
      // dropped so it doesn't read as this statement's own marker
      val kept = scala.collection.mutable.ArrayBuffer.empty[String]
      var first = true
      var afterMarker = false
      chunk.linesIterator.foreach { line =>
        line match {
          case l @ EchoMarker(kind) =>
            echo = kind != "echoOff"
            if (echo) { out += l.trim; afterMarker = true }
          case l =>
            // blank lines directly after an { echo } marker are echoed
            // (clickhouse-test prints the marker chunk's text verbatim)
            if (afterMarker && l.isBlank && kept.forall(_.isBlank))
              out += ""
            else afterMarker = false
            if (!(first && annotatesPrev(ci))) kept += l
        }
        first = false
      }
      val stmtText = kept.mkString("\n")
        .dropWhile(_ == '\n').reverse.dropWhile(_ == '\n').reverse
      val expectsError =
        stmtText.matches("(?s).*--\\s*\\{\\s*(server|client)Error.*") ||
          (ci + 1 < chunks.length && annotatesPrev(ci + 1))
      val clean0 = DdlEmu.rewriteFinal(stripComments(stmtText).trim)
      // `… FORMAT X SETTINGS …` is valid CH (settings after the format
      // clause); normalize to the trailing-FORMAT shape the branches
      // below expect
      val clean = "(?is)^(.*)\\bFORMAT\\s+(`?\\w+`?)\\s+(SETTINGS\\b[^;]*)$".r
        .replaceAllIn(clean0, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1).trim + " " + m.group(3).trim + " FORMAT " +
            m.group(2)))
      if (clean.nonEmpty && echo) {
        // a `stmt; -- { serverError N }` annotation was split into the
        // next chunk's first line — clickhouse-test echoes the whole
        // source line, so splice it back after the semicolon
        val trailer =
          if (ci + 1 < chunks.length && annotatesPrev(ci + 1))
            chunks(ci + 1).linesIterator.nextOption().getOrElse("")
          else ""
        out ++= (stmtText + ";" + trailer).linesIterator
      }
      // query_log element boundaries: output produced past this mark is
      // the statement's own result (echo lines excluded)
      val qlOutMark = out.length
      val qlStartMs = System.currentTimeMillis()
      // part_log events created while this statement runs carry its id
      PartsLog.currentQid = s"graft-stmt-$ci"
      // CH session `SET name = value` statements configure the server and
      // print nothing; Spark's own SET command would echo a key/value row,
      // so swallow them here (clickhouse-test contract: no output) —
      // result-shaping ones (join_use_nulls) are tracked in `settings`.
      val isSessionSet = clean.matches("(?is)^SET\\s+\\w+\\s*=.*")
      if (isSessionSet) {
        // `SET a = 1, b = 'x'` assigns several settings in one
        // statement (ref ParserSetQuery) — split on commas outside
        // quotes
        val body = clean.replaceFirst("(?is)^SET\\s+", "").stripSuffix(";")
        graft.ChSql.splitTopLevelCommas(body).map(_.trim).foreach { asn =>
          asn.split("=", 2) match {
            case Array(k0, v0) if k0.trim.matches("\\w+") =>
              val k = k0.trim.toLowerCase
              val v = v0.trim
              settings(k) = v
              // surface the CH setting to function builders (they read
              // graft.ch.<name> from SQLConf); cleared in the finally
              spark.conf.set("graft.ch." + k,
                v.stripPrefix("'").stripSuffix("'"))
            case _ =>
          }
        }
      }
      // DDL / INSERT statements stage Memory-table state and print
      // nothing (DdlEmu); a failing INSERT must surface, not silently
      // leave the table empty
      val handledDdl = clean.nonEmpty && !expectsError && !isSessionSet &&
        DdlEmu.handle(spark, sfDir, clean)
      // FORMAT Null: the statement runs but its result is discarded
      // (clickhouse-test uses it for error-only statements)
      val formatNull = clean.matches("(?is).*\\bFORMAT\\s+`?Null`?\\s*;?\\s*$")
      val fmtRe = "(?is)\\bFORMAT\\s+`?([A-Za-z0-9]+)`?\\s*;?\\s*$".r
      val fmtName = fmtRe.findFirstMatchIn(clean).map(_.group(1))
        .filter(graft.formats.ChOutputFormats.supports)
      // DESC format(Fmt, 'data') — schema inference over inline data
      val descFormat =
        if (clean.nonEmpty && !expectsError && !isSessionSet && !handledDdl)
          graft.formats.DescFormat.tryHandle(clean, settings)
        else None
      if (descFormat.isDefined) out ++= descFormat.get
      else if (clean.nonEmpty && !expectsError && !isSessionSet && !formatNull &&
          !handledDdl && fmtName.isDefined) {
        // CH text output format: emulate the block structure (one table
        // per block in the Pretty family) — top-level UNION ALL branches
        // and max_block_size chunks each produce a block
        val fmt = fmtName.get
        val inlineBs = "(?is)\\bSETTINGS\\b[^;]*\\bmax_block_size\\s*=\\s*(\\d+)".r
          .findFirstMatchIn(clean).map(_.group(1).toLong)
        val blockSize = inlineBs
          .orElse(settings.get("max_block_size").flatMap(v =>
            scala.util.Try(v.trim.toLong).toOption))
          .getOrElse(Long.MaxValue)
        val bare = clean
          .replaceAll("(?is)\\s+FORMAT\\s+`?[A-Za-z0-9]+`?\\s*;?\\s*$", "")
        val mono = graft.formats.ChOutputFormats.isMonoBlock(fmt)
        val branches =
          if (mono) Seq(bare)
          else {
            val parts = splitTopLevelUnionAll(bare)
            // ORDER BY / LIMIT after the last branch applies to the whole
            // union — don't split those
            if (parts.length > 1 && parts.forall(p =>
              p.matches("(?is)\\s*SELECT\\b(?s).*") &&
                !p.matches("(?is).*\\b(ORDER\\s+BY|LIMIT)\\b.*"))) parts
            else if (parts.length > 1 &&
              parts.last.matches("(?is).*\\b(ORDER\\s+BY|LIMIT)\\b.*"))
              Seq(bare)
            else parts
          }
        var schema: org.apache.spark.sql.types.StructType = null
        var bodyDf: org.apache.spark.sql.DataFrame = null
        var totalsRows: Option[Seq[Row]] = None
        val jsonDoc = Set("json", "jsoncompact", "jsonstrings",
          "jsoncompactstrings", "xml")(fmt.toLowerCase)
        // JSON/XML document formats report rows_before_limit_at_least:
        // when the statement ends in LIMIT n, execute the PRE-limit plan
        // ONCE and slice the first n rows locally — one job serves both
        // the body and the counter instead of a second full execution.
        // collect() preserves partition order (and sort order when the
        // statement has ORDER BY), so take(n) is exactly the rows a
        // CollectLimit would emit.
        val preLimit: Option[(String, Int)] =
          if (jsonDoc && branches.length == 1)
            "(?is)^(.*)\\bLIMIT\\s+(\\d+)\\s*$".r.findFirstMatchIn(bare)
              .map(m => (m.group(1), m.group(2).toInt))
          else None
        var preLimitCount: Option[Long] = None
        val blocks = branches.flatMap { b =>
          val bExec = preLimit.map(_._1).getOrElse(b)
          val (df0, tot) = graft.ChSql.sqlSplit(spark, bExec, sfDir)
          val outerJoin = b.matches(
            "(?is).*\\b(LEFT|RIGHT|FULL)\\s+(OUTER\\s+)?(ARRAY\\s+)?JOIN\\b.*") &&
            !b.matches("(?is).*(\\bNULL\\b|Nullable|OrNull|nullIf|toNullable).*") &&
            !b.matches("(?is).*\\bjoin_use_nulls\\s*=\\s*1\\b.*") &&
            !settings.get("join_use_nulls").exists(_ == "1")
          val df = if (outerJoin) graft.ChSql.fillJoinDefaults(df0,
            DdlEmu.isDeclaredNullable) else df0
          schema = df.schema
          bodyDf = df
          tot.foreach(t => totalsRows = Some(t.collect().toSeq))
          val rows = preLimit match {
            case Some((_, n)) =>
              // collect a CAPPED prefix in the single job; only an
              // overflow (a huge pre-LIMIT source, e.g. the 10M-row
              // numbers stand-in) pays a second distributed count for
              // the rows_before_limit counter (advice r11: the
              // unbounded pre-LIMIT collect OOMs the driver)
              val cap = math.max(n, 100000)
              val head = df.limit(cap + 1).collect().toSeq
              preLimitCount = Some(
                if (head.length <= cap) head.length.toLong else df.count())
              head.take(n)
            case None => df.collect().toSeq
          }
          if (blockSize == Long.MaxValue || rows.isEmpty) Seq(rows)
          else rows.grouped(blockSize.toInt).toSeq
        }
        // per-statement `SETTINGS k=v, ...` tail (normalized to sit
        // before FORMAT above) overrides session SET for format options
        // (ref InterpreterSetQuery::applySettingsFromQuery; 02423)
        val inlineSettings: Map[String, String] =
          "(?is)\\bSETTINGS\\s+((?:\\w+\\s*=\\s*[^,;]+)(?:\\s*,\\s*\\w+\\s*=\\s*[^,;]+)*)\\s*$".r
            .findFirstMatchIn(bare).map { m =>
              graft.ChSql.splitTopLevelCommas(m.group(1)).flatMap { asn =>
                asn.split("=", 2) match {
                  case Array(k0, v0) if k0.trim.matches("\\w+") =>
                    Some(k0.trim.toLowerCase -> v0.trim)
                  case _ => None
                }
              }.toMap
            }.getOrElse(Map.empty)
        val ctx = graft.formats.ChOutputFormats.Ctx(colType =
          n => graft.ChSql.declaredColumnType(n), get = k =>
          inlineSettings.get(k).orElse(settings.get(k))
            .map(_.stripPrefix("'").stripSuffix("'")))
        if (jsonDoc) {
          // the JSON document formats carry meta (CH names + types),
          // totals/extremes sections, and rows_before_limit_at_least
          val names = graft.ChSql.selectItemDisplayNames(bare)
            .getOrElse(sys.error("FORMAT JSON: names not inferable"))
          val types = graft.ChSql.selectItemTypeNames(bare)
            .getOrElse(sys.error("FORMAT JSON: types not inferable"))
          val rows = blocks.flatten
          val extremes =
            if (settings.get("extremes").exists(_ == "1") && rows.nonEmpty)
              Some(extremesOf(rows, schema.length))
            else None
          val rowsBeforeLimit =
            if (preLimit.isDefined) preLimitCount
            else {
              // a LIMIT inside the FROM subquery still reports
              // rows_before_limit_at_least = rows the limit emitted —
              // unless the optimizer proved the source empty (a
              // constant-false WHERE folds to an empty LocalRelation
              // and the pipeline never reads; 00006 vs 00017)
              val subLimit =
                "(?is)\\(\\s*(SELECT[^()]*?\\bLIMIT\\s+(\\d+))\\s*\\)".r
                  .findFirstMatchIn(bare)
              subLimit.flatMap { sm =>
                val sub = sm.group(1)
                // the body execution above already analyzed+ran `bare` —
                // reuse its optimized plan for the proved-empty check
                // instead of rebuilding the statement (r11 verdict #4)
                val provedEmpty = branches.length == 1 && bodyDf != null &&
                  bodyDf.queryExecution.optimizedPlan.collectFirst {
                    case l: org.apache.spark.sql.catalyst.plans.logical
                        .LocalRelation if l.data.isEmpty => l
                  }.isDefined
                if (provedEmpty) Some(0L)
                // when the outer statement visibly neither filters nor
                // aggregates the subquery's rows, the body row count IS
                // the rows the inner limit emitted — zero extra jobs
                else if (branches.length == 1 &&
                  bare.matches("(?is)\\s*SELECT\\s+[^()]*\\sFROM\\s*\\(.*\\)\\s*") &&
                  !bare.matches("(?is).*\\bSELECT\\s+DISTINCT\\b.*") &&
                  !bare.matches("(?is).*\\)\\s*(WHERE|GROUP|HAVING|LIMIT|" +
                    "OFFSET|JOIN|ARRAY|,)(\\b|\\s).*"))
                  Some(blocks.map(_.length.toLong).sum)
                // otherwise one bounded job remains: Spark 4.1's limit
                // operators expose no numOutputRows SQLMetric (checked
                // r12), so the emitted-row count is re-derived by
                // counting `sub` — itself capped by its own LIMIT, so
                // the job reads at most LIMIT-many rows from the source
                else scala.util.Try(
                  graft.ChSql.sqlSplit(spark, sub, sfDir)._1.count())
                  .toOption
              }
            }
          if (fmt.equalsIgnoreCase("xml"))
            out ++= graft.formats.ChOutputFormats.renderXmlDoc(
              schema, rows, names, types,
              totalsRows.flatMap(_.headOption), extremes, rowsBeforeLimit)
          else out ++= graft.formats.ChOutputFormats.renderJsonDoc(
            fmt, schema, rows, ctx, names, types,
            totalsRows.flatMap(_.headOption), extremes, rowsBeforeLimit)
        } else if (fmt.equalsIgnoreCase("CSVWithNamesAndTypes")) {
          // names row, CH type-name row, then the CSV body (ref
          // CSVRowOutputFormat::writePrefix with_names/with_types)
          val types = graft.ChSql.selectItemTypeNames(bare)
            .filter(_.length == schema.length)
            .getOrElse(sys.error(
              "CSVWithNamesAndTypes: select-item types not inferable"))
          val rendered = graft.formats.ChOutputFormats.render(
            "csvwithnames", schema, blocks.filter(_.nonEmpty), ctx)
          out ++= rendered.take(1)
          out += types.map(t =>
            "\"" + t.replace("\"", "\"\"") + "\"").mkString(",")
          out ++= rendered.drop(1)
        } else {
          out ++= graft.formats.ChOutputFormats.render(
            fmt, schema, blocks.filter(_.nonEmpty), ctx)
          // Values writes NO trailing row delimiter (ref
          // ValuesRowOutputFormat) — the next statement's first output
          // line lands on the same line; mark it for the merge pass
          if (fmt.equalsIgnoreCase("values") && out.nonEmpty)
            out(out.length - 1) = out.last + ValuesNoNl
          // JSONEachRow silently DROPS the totals stream (ref
          // JSONEachRowRowOutputFormat: no writeTotals)
          if (!fmt.equalsIgnoreCase("jsoneachrow"))
            totalsRows.foreach { t =>
              out += ""
              out += "Totals:"
              out ++= graft.formats.ChOutputFormats.render(
                fmt, schema, Seq(t), ctx)
            }
        }
      }
      else if (clean.nonEmpty && !expectsError && !isSessionSet &&
          !formatNull && !handledDdl) {
        // FORMAT TSVWithNames: the output carries a header row of column
        // names (ref src/Processors/Formats/Impl/TabSeparatedRowOutputFormat)
        val withNames = clean.matches(
          "(?is).*\\bFORMAT\\s+(TSVWithNames|TabSeparatedWithNames)\\s*;?\\s*$")
        // …AndTypes additionally carries a CH-type-name row, inferred
        // statically from the select items (ChSql.selectItemTypeNames);
        // non-inferable items fail the statement rather than emit a
        // wrong types row
        val withNamesAndTypes = clean.matches(
          "(?is).*\\bFORMAT\\s+(TSVWithNamesAndTypes|" +
            "TabSeparatedWithNamesAndTypes)\\s*;?\\s*$")
        val (base0, totals) = graft.ChSql.sqlSplit(spark, clean, sfDir)
        // CH outer joins fill non-matched columns with type DEFAULTS
        // (join_use_nulls=0 default). The curated tests' columns are
        // non-Nullable, so in a statement with an outer join and no
        // NULL-producing constructs, every NULL is a join gap.
        val outerJoin = clean.matches(
          "(?is).*\\b(LEFT|RIGHT|FULL)\\s+(OUTER\\s+)?(ARRAY\\s+)?JOIN\\b.*") &&
          !clean.matches("(?is).*(\\bNULL\\b|Nullable|OrNull|nullIf|toNullable).*") &&
          !clean.matches("(?is).*\\bjoin_use_nulls\\s*=\\s*1\\b.*") &&
          !settings.get("join_use_nulls").exists(_ == "1")
        val base = if (outerJoin) graft.ChSql.fillJoinDefaults(base0,
            DdlEmu.isDeclaredNullable)
          else base0
        if (withNames) out += base.columns.mkString("\t")
        if (withNamesAndTypes) {
          out += base.columns.mkString("\t")
          val bare2 = clean.replaceAll(
            "(?is)\\s+FORMAT\\s+\\w+\\s*;?\\s*$", "")
          val tn = graft.ChSql.selectItemTypeNames(bare2)
            .filter(_.length == base.columns.length)
            .getOrElse(sys.error(
              "WithNamesAndTypes: select-item types not inferable"))
          out += tn.mkString("\t")
        }
        out ++= formatDf(base)
        totals.foreach { t => out += ""; out ++= formatDf(t) } // CH prints
        // the totals row after an empty separator line (TSV contract)
        val wantExtremes = settings.get("extremes").exists(_ == "1") ||
          clean.matches("(?is).*\\bSETTINGS\\b[^;]*\\bextremes\\s*=\\s*1\\b.*")
        if (wantExtremes) {
          val rws = base.collect().toSeq
          if (rws.nonEmpty) {
            val (mn, mx) = extremesOf(rws, base.schema.length)
            val two = spark.createDataFrame(
              java.util.Arrays.asList(mn, mx), base.schema)
            out += ""
            out ++= formatDf(two)
          }
        }
      }
      // record the statement in the query_log stand-in (QueryLog.scala;
      // ref src/Interpreters/QueryLog.h). Error-annotated statements are
      // not executed, so their element carries the ANNOTATED code — the
      // reference behavior the test itself asserts.
      if (clean.nonEmpty && !isSessionSet) {
        val rawQ = stmtText.replaceAll(
          "(?s)\\s*--\\s*\\{\\s*(server|client)Error[\\s\\S]*$", "").trim
        if (expectsError) {
          val trailer2 =
            if (ci + 1 < chunks.length && annotatesPrev(ci + 1))
              chunks(ci + 1).linesIterator.nextOption().getOrElse("")
            else ""
          val codeTxt = "(?s)\\{\\s*(?:server|client)Error\\s+(\\w+)".r
            .findFirstMatchIn(stmtText + trailer2).map(_.group(1))
          val code = codeTxt.flatMap(t =>
            scala.util.Try(t.toInt).toOption.orElse(
              graft.functions.ChErrorCodes.names.collectFirst {
                case (c, n) if n == t => c }))
            .getOrElse(1)
          QueryLog.recordError(rawQ, clean, code, settings)
          EventsLog.onError(clean, code)
        } else {
          EventsLog.onSuccess(clean)
          EventsLog.onLimits(clean, settings)
          val produced = (out.length - qlOutMark).toLong
          val bytes = out.drop(qlOutMark).map(_.length + 1L).sum
          val written =
            if (clean.matches("(?is)^INSERT\\b.*\\bVALUES\\b.*"))
              ("\\)\\s*,\\s*\\(".r.findAllIn(clean).size + 1).toLong
            else 0L
          // query-cache participation (02494 family): the hit/miss
          // profile counters land on this statement's log element
          val qcProf = QueryCache.onStatement(clean, settings,
            System.currentTimeMillis() - qlStartMs)
            .map { case (h, m) =>
              Map("QueryCacheHits" -> h, "QueryCacheMisses" -> m) }
            .getOrElse(Map.empty[String, Long])
          QueryLog.recordSuccess(spark, rawQ, clean, produced, bytes,
            written, System.currentTimeMillis() - qlStartMs, settings,
            qcProf)
        }
      }
      out.toSeq
    }
    // merge Values' no-trailing-newline lines with the following line
    if (!all.exists(_.endsWith(ValuesNoNl))) all
    else {
      val res = scala.collection.mutable.ArrayBuffer.empty[String]
      var pend: Option[String] = None
      all.foreach { l =>
        val joined = pend match {
          case Some(p) => p + l
          case None => l
        }
        pend = None
        if (joined.endsWith(ValuesNoNl))
          pend = Some(joined.stripSuffix(ValuesNoNl))
        else res += joined
      }
      pend.foreach(res += _)
      res.toSeq
    }
  }
}
