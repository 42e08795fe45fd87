package graft.formats

import graft.formats.{SchemaInference => SI}

/** `DESC format(Fmt, 'data')` — schema inference over an inline data
  * sample (ref src/TableFunctions/TableFunctionFormat.cpp +
  * SchemaInferenceUtils.cpp). Supports JSONEachRow, CSV, TSV
  * (TabSeparated), and Values samples; DESCRIBE output is the 7-column
  * TSV the reference prints (name, type, 5 empty default/comment/codec
  * columns).
  */
object DescFormat {

  private val descRe =
    "(?is)^\\s*desc(?:ribe)?\\s+(?:table\\s+)?format\\s*\\(\\s*'?([A-Za-z]+)'?\\s*,\\s*'(.*)'\\s*\\)\\s*(settings\\s+.*)?;?\\s*$".r
  // heredoc $$…$$ data (raw, no escape decoding)
  private val descHereRe =
    "(?is)^\\s*desc(?:ribe)?\\s+(?:table\\s+)?format\\s*\\(\\s*'?([A-Za-z]+)'?\\s*,\\s*\\$\\$(.*)\\$\\$\\s*\\)\\s*(settings\\s+.*)?;?\\s*$".r

  /** CH string-literal escape decode (ref ReadHelpers.h
    * parseComplexEscapeSequence — subset the format tests use). */
  def decodeChLiteral(raw: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '0' => sb.append('\u0000'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"' => sb.append('"'); i += 2
          case 'x' if i + 3 < raw.length =>
            sb.append(Integer.parseInt(raw.substring(i + 2, i + 4), 16)
              .toChar)
            i += 4
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse `settings k=v, k2='v with, commas'` (quote-aware splitting). */
  private def parseInlineSettings(inline: String): Map[String, String] = {
    val body = inline.trim.replaceFirst("(?i)^settings\\s+", "")
      .stripSuffix(";").trim
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStr = false; var last = 0
    body.indices.foreach { i =>
      val c = body.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (c == ',' && !inStr) { parts += body.substring(last, i); last = i + 1 }
    }
    parts += body.substring(last)
    parts.toSeq.flatMap { p =>
      p.split("=", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase ->
          v.trim.stripPrefix("'").stripSuffix("'"))
        case _ => None
      }
    }.toMap
  }

  /** `'x UInt8, z IPv4'` → name → CH type (paren-aware comma split). */
  private def parseHints(spec: String): Map[String, String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var last = 0
    spec.indices.foreach { i =>
      spec.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += spec.substring(last, i); last = i + 1
        case _ =>
      }
    }
    parts += spec.substring(last)
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
      val sp = e.indexOf(' ')
      (e.substring(0, sp).trim, e.substring(sp + 1).trim)
    }.toMap
  }

  def tryHandle(clean: String,
      sessionSettings: collection.Map[String, String]): Option[Seq[String]] =
    clean match {
      case descHereRe(fmt, rawData, inline) =>
        tryHandle(
          s"desc format($fmt, '${rawData.replace("\\", "\\\\")
            .replace("'", "\\'")}')" +
            Option(inline).map(" " + _).getOrElse(""), sessionSettings)
      case descRe(fmt, rawData, inline) =>
        val all = scala.collection.mutable.Map.empty[String, String]
        sessionSettings.foreach { case (k, v) =>
          all(k) = v.stripPrefix("'").stripSuffix("'") }
        if (inline != null) parseInlineSettings(inline).foreach {
          case (k, v) => all(k) = v }
        val st = SI.Settings.from(k => all.get(k.toLowerCase))
        val hints = all.get("schema_inference_hints")
          .map(parseHints).getOrElse(Map.empty)
        val names = all.get("column_names_for_schema_inference")
          .map(_.split(",").toSeq.map(_.trim)).getOrElse(Seq.empty)
        val data = decodeChLiteral(rawData)
        val cols = inferFor(fmt, data, st, hints, names)
        Some(cols.map { case (n, t) =>
          n + "\t" + t.replace("\\", "\\\\").replace("'", "\\'") +
            "\t\t\t\t\t"
        })
      case _ => None
    }

  def inferFor(fmt: String, data: String, st: SI.Settings,
      hints: Map[String, String] = Map.empty,
      names: Seq[String] = Seq.empty): Seq[(String, String)] =
    fmt.toLowerCase match {
      case "jsoneachrow" | "ndjson" | "jsonlines" =>
        SI.inferJsonEachRow(data, st, hints)
      case "jsoncompacteachrow" => inferJsonCompact(data, st, hints)
      case "csv" => inferDelimited(data, st, csv = true, hints, names)
      case "tsv" | "tabseparated" =>
        inferDelimited(data, st, csv = false, hints, names)
      case "values" => inferValues(data, st)
      case other =>
        throw new SI.InferenceError(s"desc format: unsupported format $other")
    }

  /** `SELECT … FROM format(Fmt, 'data')` — rewrite target: an inline
    * VALUES subquery with per-value casts carrying the inferred types
    * (the CH table function reads the sample THROUGH the inferred
    * schema, so a numeric string column yields numbers). */
  def selectSql(fmt: String, rawData: String,
      sessionSettings: collection.Map[String, String]): Option[String] = {
    val all = scala.collection.mutable.Map.empty[String, String]
    sessionSettings.foreach { case (k, v) =>
      all(k) = v.stripPrefix("'").stripSuffix("'") }
    val st = SI.Settings.from(k => all.get(k.toLowerCase))
    val data = decodeChLiteral(rawData)
    try fmt.toLowerCase match {
      case "jsoneachrow" | "ndjson" =>
        val (cols, types, rows) = SI.inferJsonColumns(data, st)
        val rendered = rows.map(r =>
          r.zip(types).map { case (v, t) => renderLit(v, t) }
            .mkString("(", ", ", ")"))
        Some(s"(SELECT * FROM VALUES ${rendered.mkString(", ")} " +
          s"AS __fmt(${cols.mkString(", ")}))")
      case "csv" | "tsv" | "tabseparated" =>
        val lines = data.split("\n").toSeq.filter(_.nonEmpty)
        val rows =
          if (fmt.equalsIgnoreCase("csv")) lines.map(splitCsvLine)
          else lines.map(_.split("\t", -1).toSeq.map(f => (false, f)))
        val n = rows.map(_.size).max
        val types = (0 until n).map { c =>
          var acc: SI.T = { val t = SI.TNothing(); t.nullable = false; t }
          rows.foreach { r =>
            if (c < r.size)
              acc = SI.tryMerge(acc,
                fieldType(r(c)._2, r(c)._1, st), st).getOrElse(SI.TString())
          }
          SI.finalize(acc, st) match {
            case _: SI.TNothing => SI.TString()
            case t => t
          }
        }
        val rendered = rows.map(r => (0 until n).map { c =>
          val f = r.lift(c)
          (types(c), f) match {
            case (_, None) => s"CAST(NULL AS ${sparkType(types(c))})"
            case (_: SI.TInt, Some((_, v))) => s"CAST(${v.trim} AS BIGINT)"
            case (_: SI.TFloat, Some((_, v))) =>
              s"CAST('${v.trim}' AS DOUBLE)"
            case (t, Some((_, v))) if v.trim.nonEmpty &&
                "[({".contains(v.trim.head) =>
              renderLit(Some(ChLit.parse(v.trim)), t)
            case (_, Some((_, v))) => sqlStr(v)
          }
        }.mkString("(", ", ", ")"))
        Some(s"(SELECT * FROM VALUES ${rendered.mkString(", ")} " +
          s"AS __fmt(${(1 to n).map("c" + _).mkString(", ")}))")
      case _ => None
    } catch { case _: SI.InferenceError => None }
  }

  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def sparkType(t: SI.T): String = t match {
    // UInt64 values may exceed Long; DECIMAL(20,0) holds the full range
    case i: SI.TInt if i.unsigned => "DECIMAL(20,0)"
    case _: SI.TInt => "BIGINT"
    case _: SI.TFloat => "DOUBLE"
    case _: SI.TBool => "BOOLEAN"
    case _: SI.TDate => "DATE"
    case _: SI.TDateTime => "TIMESTAMP"
    case a: SI.TArray => s"ARRAY<${sparkType(a.elem)}>"
    case m: SI.TMap => s"MAP<STRING, ${sparkType(m.value)}>"
    case tt: SI.TTuple =>
      "STRUCT<" + tt.elems.zipWithIndex.map { case (e, i) =>
        s"`${i + 1}`: ${sparkType(e)}" }.mkString(", ") + ">"
    case _ => "STRING"
  }

  private def renderLit(v: Option[SI.J], t: SI.T): String = v match {
    case None | Some(SI.JNull) => s"CAST(NULL AS ${sparkType(t)})"
    case Some(j) => t match {
      case it: SI.TInt =>
        val ty = sparkType(it)
        j match {
          case SI.JInt(n) => s"CAST($n AS $ty)"
          case SI.JStr(s) => s"CAST(${s.trim} AS $ty)"
          // bools merged into a numeric column read as 1/0
          // (input_format_json_read_bools_as_numbers)
          case SI.JBool(b) => s"CAST(${if (b) 1 else 0} AS $ty)"
          case other => s"CAST(NULL AS $ty)"
        }
      case _: SI.TFloat => j match {
        case SI.JInt(n) => s"CAST('$n' AS DOUBLE)"
        case SI.JFloat(d) => s"CAST('$d' AS DOUBLE)"
        case SI.JStr(s) => s"CAST('${s.trim}' AS DOUBLE)"
        case SI.JBool(b) => s"CAST(${if (b) 1 else 0} AS DOUBLE)"
        case other => s"CAST(NULL AS DOUBLE)"
      }
      case _: SI.TString => j match {
        case SI.JStr(s) => sqlStr(s)
        case SI.JObj(_, raw) => sqlStr(raw) // object-as-string keeps text
        case SI.JInt(n) => sqlStr(n.toString) // numbers-as-strings
        case SI.JFloat(d) => sqlStr(d.toString)
        case SI.JBool(b) => sqlStr(if (b) "true" else "false")
        case other => sqlStr(other.toString)
      }
      case _: SI.TDate => j match {
        case SI.JStr(s) => s"DATE '$s'"
        case _ => "CAST(NULL AS DATE)"
      }
      case _: SI.TDateTime => j match {
        case SI.JStr(s) => s"TIMESTAMP '$s'"
        case _ => "CAST(NULL AS TIMESTAMP)"
      }
      case a: SI.TArray => j match {
        case SI.JArr(vs) =>
          if (vs.isEmpty) s"CAST(array() AS ${sparkType(a)})"
          else "array(" + vs.map(e => renderLit(Some(e), a.elem))
            .mkString(", ") + ")"
        case _ => s"CAST(NULL AS ${sparkType(a)})"
      }
      case _: SI.TBool => j match {
        case SI.JBool(b) => b.toString
        case _ => "CAST(NULL AS BOOLEAN)"
      }
      case m: SI.TMap => j match {
        case SI.JObj(vs, _) =>
          if (vs.isEmpty) s"CAST(map() AS ${sparkType(m)})"
          else "map(" + vs.map { case (k, v) =>
            sqlStr(k) + ", " + renderLit(Some(v), m.value)
          }.mkString(", ") + ")"
        case _ => s"CAST(NULL AS ${sparkType(m)})"
      }
      case tt: SI.TTuple => j match {
        case SI.JArr(vs) =>
          "struct(" + vs.zip(tt.elems).map { case (v, e) =>
            renderLit(Some(v), e) }.mkString(", ") + ")"
        case _ => s"CAST(NULL AS ${sparkType(tt)})"
      }
      case _ => sqlStr(j.toString)
    }
  }

  // ---- CSV / TSV row parsing into (quoted?, content) fields
  private def splitCsvLine(line: String): Seq[(Boolean, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var i = 0
    while (i <= line.length) {
      if (i == line.length) { out += ((false, "")); i += 1 }
      else if (line.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < line.length) {
          val c = line.charAt(i)
          if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
            sb.append('"'); i += 2
          } else if (c == '"') { done = true; i += 1 }
          else { sb.append(c); i += 1 }
        }
        out += ((true, sb.toString))
        if (i < line.length && line.charAt(i) == ',') i += 1
        else i = line.length + 1
      } else {
        val j = line.indexOf(',', i)
        if (j < 0) { out += ((false, line.substring(i))); i = line.length + 1 }
        else { out += ((false, line.substring(i, j))); i = j + 1 }
      }
    }
    // the loop emits a trailing empty only when the line ends with ','
    if (!line.endsWith(",") && out.nonEmpty && out.last == ((false, "")) &&
      !line.isEmpty && line.last != ',') out.dropRight(1).toSeq
    else out.toSeq
  }

  private def inferDelimited(data: String, st: SI.Settings, csv: Boolean,
      hints: Map[String, String] = Map.empty,
      names: Seq[String] = Seq.empty): Seq[(String, String)] = {
    val lines = data.split("\n").toSeq.filter(_.nonEmpty)
    if (lines.isEmpty)
      throw new SI.InferenceError("Cannot extract table structure: no data")
    val rows: Seq[Seq[SI.T]] = lines.map { line =>
      val fields: Seq[(Boolean, String)] =
        if (csv) splitCsvLine(line)
        else line.split("\t", -1).toSeq.map(f => (false, f))
      fields.map { case (quoted, v) => fieldType(v, quoted, st) }
    }
    val n = rows.map(_.size).max
    (0 until n).map { c =>
      val name = names.lift(c).getOrElse(s"c${c + 1}")
      if (hints.contains(name)) (name, hints(name))
      else {
        var acc: SI.T = { val t = SI.TNothing(); t.nullable = false; t }
        rows.foreach { r =>
          if (c < r.size)
            acc = SI.tryMerge(acc, r(c), st).getOrElse(SI.TString())
        }
        val fin = SI.finalize(acc, st) match {
          case _: SI.TNothing => SI.TString() // empty fields read as String
          case t => t
        }
        (name, SI.render(fin, st))
      }
    }
  }

  private def fieldType(v: String, quoted: Boolean, st: SI.Settings): SI.T = {
    val t = v.trim
    if (!quoted && (t.isEmpty || t == "\\N" || t.equalsIgnoreCase("null")))
      SI.TNothing()
    else if (t.nonEmpty && "[({".contains(t.head))
      SI.infer(ChLit.parse(t), st)
    else if (!quoted && "^[+-]?\\d+$".r.matches(t))
      (if (st.inferIntegers && fitsLong(t)) SI.TInt() else SI.TFloat())
    else if (!quoted &&
      "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r.matches(t) &&
      t.exists(_.isDigit)) SI.TFloat()
    else if (!quoted && (t == "true" || t == "false")) SI.TBool()
    else SI.inferString(v, st, jsonContext = false)
  }
  private def fitsLong(v: String): Boolean =
    try { v.toLong; true } catch { case _: Exception => false }

  /** JSONCompactEachRow: rows are positional JSON arrays. */
  private def inferJsonCompact(data: String, st: SI.Settings,
      hints: Map[String, String]): Seq[(String, String)] = {
    val p = new JsonRowsP(data)
    val rows = p.arrays()
    if (rows.isEmpty)
      throw new SI.InferenceError("Cannot extract table structure: no data")
    val n = rows.map(_.vs.size).max
    (0 until n).map { c =>
      val name = s"c${c + 1}"
      if (hints.contains(name)) (name, hints(name))
      else {
        var acc: SI.T = { val t = SI.TNothing(); t.nullable = false; t }
        rows.foreach { r =>
          r.vs.lift(c).foreach { v =>
            val t = SI.infer(v, st)
            acc = SI.tryMerge(acc, t, st).getOrElse(
              throw new SI.InferenceError("TYPE_MISMATCH"))
          }
        }
        val fin = SI.finalize(acc, st)
        fin match {
          case _: SI.TNothing => throw new SI.InferenceError(
            s"Cannot determine type of column '$name': only nulls")
          case _ => ()
        }
        (name, SI.render(fin, st))
      }
    }
  }
  private class JsonRowsP(data: String) {
    def arrays(): Seq[SI.JArr] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SI.JArr]
      // reuse the JSON row splitter by wrapping rows: parse values one
      // by one with the same parser used for objects
      var rest = data.trim
      while (rest.nonEmpty) {
        val (v, used) = SI.parseOneValue(rest)
        v match {
          case a: SI.JArr => out += a
          case other => throw new SI.InferenceError(s"expected array row")
        }
        rest = rest.substring(used).trim
        if (rest.startsWith(",") || rest.startsWith(";"))
          rest = rest.substring(1).trim
      }
      out.toSeq
    }
  }

  private def inferValues(data: String, st: SI.Settings): Seq[(String, String)] = {
    val rows = ChLit.parseTupleRows(data)
    if (rows.isEmpty)
      throw new SI.InferenceError("Cannot extract table structure: no data")
    val n = rows.map(_.size).max
    (0 until n).map { c =>
      var acc: SI.T = { val t = SI.TNothing(); t.nullable = false; t }
      rows.foreach { r =>
        if (c < r.size) {
          val t = SI.infer(r(c), st)
          acc = SI.tryMerge(acc, t, st).getOrElse(SI.TString())
        }
      }
      val fin = SI.finalize(acc, st) match {
        case _: SI.TNothing => SI.TString()
        case t => t
      }
      (s"c${c + 1}", SI.render(fin, st))
    }
  }
}

/** CH literal values appearing inside CSV/TSV fields and Values rows:
  * numbers, 'strings' (backslash escapes), NULL, [arrays], (tuples),
  * {'k' : v} maps (ref src/Parsers/ParserLiteral + the text formats'
  * field readers). Parsed into the same J tree the JSON path uses. */
object ChLit {
  import SchemaInference._

  def parse(s: String): J = {
    val p = new P(s)
    val v = p.value()
    v
  }

  /** Values-format data: `(a, b), (c, d)` → rows of column values. */
  def parseTupleRows(s: String): Seq[Seq[J]] = {
    val p = new P(s)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[J]]
    p.ws()
    while (!p.eof) {
      p.value() match {
        case JArr(vs) => rows += vs // tuples parse as JArr here
        case single => rows += Seq(single)
      }
      p.ws()
      if (!p.eof && p.peek == ',') { p.next(); p.ws() }
    }
    rows.toSeq
  }

  private class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def next(): Char = { val c = s.charAt(i); i += 1; c }
    def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    def value(): J = {
      ws()
      peek match {
        case '[' => seq(']')
        case '(' => seq(')')
        case '{' => map()
        case '\'' => JStr(str())
        case 'N' if s.startsWith("NULL", i) => i += 4; JNull
        case 'n' if s.startsWith("null", i) => i += 4; JNull
        case 't' if s.startsWith("true", i) => i += 4; JBool(true)
        case 'f' if s.startsWith("false", i) => i += 5; JBool(false)
        case _ => num()
      }
    }
    private def seq(close: Char): J = {
      next()
      val vs = scala.collection.mutable.ArrayBuffer.empty[J]
      ws()
      if (!eof && peek == close) { next(); return JArr(Seq.empty) }
      var go = true
      while (go) {
        vs += value()
        ws()
        val c = next()
        if (c == close) go = false
        else require(c == ',', s"bad literal at $i")
      }
      JArr(vs.toSeq)
    }
    private def map(): J = {
      val start = i
      next()
      val fields = scala.collection.mutable.ArrayBuffer.empty[(String, J)]
      ws()
      if (!eof && peek == '}') { next(); return JObj(Seq.empty, s.substring(start, i)) }
      var go = true
      while (go) {
        ws()
        val k = value() match {
          case JStr(v) => v
          case JInt(v) => v.toString
          case other => other.toString
        }
        ws(); require(next() == ':', s"expected : at $i")
        fields += ((k, value()))
        ws()
        val c = next()
        if (c == '}') go = false
        else require(c == ',', s"bad map literal at $i")
      }
      JObj(fields.toSeq, s.substring(start, i))
    }
    private def str(): String = {
      next()
      val sb = new StringBuilder
      while (peek != '\'') {
        val c = next()
        if (c == '\\' && !eof) sb.append(next())
        else sb.append(c)
      }
      next()
      sb.toString
    }
    private def num(): J = {
      val st = i
      if (!eof && (peek == '-' || peek == '+')) next()
      var isFloat = false
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' ||
        peek == 'E' ||
        ((peek == '+' || peek == '-') && i > st &&
          (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) {
        if (peek == '.' || peek == 'e' || peek == 'E') isFloat = true
        next()
      }
      val txt = s.substring(st, i)
      require(txt.nonEmpty && txt.exists(_.isDigit), s"bad literal at $st")
      if (isFloat) JFloat(txt.toDouble) else JInt(BigInt(txt))
    }
  }
}
