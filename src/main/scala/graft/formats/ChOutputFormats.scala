package graft.formats

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** CH text output formats (ref src/Processors/Formats/Impl/
  * PrettyBlockOutputFormat.cpp, PrettyCompactBlockOutputFormat.cpp,
  * PrettySpaceBlockOutputFormat.cpp, VerticalRowOutputFormat.cpp,
  * CSVRowOutputFormat.cpp, ValuesRowOutputFormat.cpp,
  * JSONEachRowRowOutputFormat.cpp).
  *
  * The engine's results are DataFrames; these renderers reproduce the
  * reference's terminal/wire text so clients (and the reference's own
  * golden tests) see byte-identical output. Each renderer takes the
  * result pre-chunked into blocks — CH's Pretty family draws one table
  * per block (ref IOutputFormat::write is per-Chunk).
  */
object ChOutputFormats {

  /** Pretty-format settings (ref Core/Settings.h defaults in 23.3). */
  final case class Ctx(get: String => Option[String],
      colType: String => Option[String] = _ => None) {
    def int(name: String, default: Long): Long =
      get(name).flatMap(v => scala.util.Try(v.trim.stripPrefix("'")
        .stripSuffix("'").toLong).toOption).getOrElse(default)
    def maxRows: Long = int("output_format_pretty_max_rows", 10000L)
    def maxValueWidth: Long =
      int("output_format_pretty_max_value_width", 10000L)
    def rowNumbers: Boolean =
      int("output_format_pretty_row_numbers", 0L) != 0L
    def ascii: Boolean = get("output_format_pretty_grid_charset")
      .exists(_.toUpperCase.contains("ASCII"))
    def color: Boolean = int("output_format_pretty_color", 1L) != 0L
  }

  private val prettyFamilies = Set(
    "pretty", "prettynoescapes", "prettymonoblock",
    "prettynoescapesmonoblock", "prettycompact",
    "prettycompactnoescapes", "prettycompactmonoblock",
    "prettycompactnoescapesmonoblock", "prettyspace",
    "prettyspacenoescapes", "prettyspacemonoblock",
    "prettyspacenoescapesmonoblock")

  private val others = Set("vertical", "values", "csv", "csvwithnames",
    "csvwithnamesandtypes",
    "tsvraw", "tabseparatedraw", "jsoneachrow", "lineasstring",
    "json", "jsoncompact", "jsonstrings", "jsoncompactstrings",
    "xml", "markdown", "jsoncompacteachrow", "jsoncompactstringseachrow")

  def supports(fmt: String): Boolean = {
    val f = fmt.toLowerCase
    prettyFamilies.contains(f) || others.contains(f)
  }

  /** MonoBlock (and every non-Pretty row format) collapses blocks. */
  def isMonoBlock(fmt: String): Boolean = {
    val f = fmt.toLowerCase
    f.endsWith("monoblock") || !prettyFamilies.contains(f)
  }

  def render(fmt: String, schema: StructType, blocks: Seq[Seq[Row]],
      ctx: Ctx): Seq[String] = {
    val f = fmt.toLowerCase
    val bs = if (isMonoBlock(fmt)) Seq(blocks.flatten).filter(_.nonEmpty)
      else blocks
    f match {
      case _ if f.startsWith("prettyspace") => prettySpace(schema, bs, ctx,
        color = ctx.color && !f.contains("noescapes"))
      case _ if f.startsWith("prettycompact") => prettyCompact(schema, bs,
        ctx, color = ctx.color && !f.contains("noescapes"))
      case _ if f.startsWith("pretty") => prettyFull(schema, bs, ctx,
        color = ctx.color && !f.contains("noescapes"))
      case "vertical" => vertical(schema, bs.flatten, ctx)
      case "values" => values(bs.flatten)
      case "csv" | "csvwithnames" =>
        csv(schema, bs.flatten, withNames = f.endsWith("withnames"))
      case "tsvraw" | "tabseparatedraw" =>
        bs.flatten.map(r => r.toSeq.map {
          case null => "\\N"
          case v => cell(v)
        }.mkString("\t"))
      // raw row text, no escaping (ref LineAsStringRowOutputFormat)
      case "lineasstring" =>
        bs.flatten.map(r => r.toSeq.map(cell).mkString("\t"))
      case "jsoneachrow" =>
        // ref Core/Settings.h output_format_json_escape_forward_slashes
        // default true
        val esc = ctx.int("output_format_json_escape_forward_slashes", 1L) != 0L
        val q64 = ctx.int("output_format_json_quote_64bit_integers", 1L) != 0L
        namedTuplesAsObjects.set(ctx.int(
          "output_format_json_named_tuples_as_objects", 0L) != 0L)
        quoteFloats.set(ctx.int(
          "output_format_json_quote_64bit_floats", 0L) != 0L)
        try bs.flatten.map(jsonEachRow(schema, _, esc, q64, ctx.colType))
        finally { namedTuplesAsObjects.set(false); quoteFloats.set(false) }
      // row as a JSON array, fields joined with ", " (ref
      // JSONCompactEachRowRowOutputFormat.cpp writeFieldDelimiter)
      case "jsoncompacteachrow" | "jsoncompactstringseachrow" =>
        val esc = ctx.int("output_format_json_escape_forward_slashes", 1L) != 0L
        val q64 = ctx.int("output_format_json_quote_64bit_integers", 1L) != 0L
        val strings = f.contains("strings")
        bs.flatten.map { r =>
          schema.fields.zipWithIndex.map { case (fd, i) =>
            r(i) match {
              // dialect-shim booleans come from comparisons, which are
              // UInt8 in CH and print 1/0
              case b: java.lang.Boolean if !strings => if (b) "1" else "0"
              case v if strings && v != null => jsonStr(cell(v), esc)
              case v => jsonVal(v, fd.dataType, esc, q64)
            }
          }.mkString("[", ", ", "]")
        }
      // ref Processors/Formats/Impl/MarkdownRowOutputFormat.cpp: header,
      // alignment row (numbers right), then TSV-style cells
      case "markdown" =>
        val header = "| " + schema.fieldNames.mkString(" | ") + " |"
        val align = "|" + schema.fields.map(f =>
          if (alignRight(f.dataType)) "-:" else ":-").mkString("|") + "|"
        header +: align +: bs.flatten.map(r => "| " + r.toSeq.map {
          case null => "\\N"
          case v => cell(v)
        }.mkString(" | ") + " |")
      case other => sys.error(s"unsupported format $other")
    }
  }

  // ---------------------------------------------------------------- values

  private val NullMarker = "ᴺᵁᴸᴸ" // ᴺᵁᴸᴸ

  private def cell(v: Any): String = v match {
    case null => NullMarker
    case s: String => s
    case b: Array[Byte] => new String(b,
      java.nio.charset.StandardCharsets.UTF_8)
    case other => graft.golden.Golden.fmt(other)
  }

  /** Visible width ≈ code points, with zero width for combining marks
    * (ref Common/UTF8Helpers computeWidth approximation). */
  private def displayWidth(s: String): Int = {
    var w = 0; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK
        && t != Character.FORMAT && cp != 0x200B)
        w += (if (isWide(cp)) 2 else 1)
      i += Character.charCount(cp)
    }
    w
  }

  private def isWide(cp: Int): Boolean = {
    // East-Asian wide/fullwidth principal blocks
    (cp >= 0x1100 && cp <= 0x115F) || (cp >= 0x2E80 && cp <= 0xA4CF) ||
    (cp >= 0xAC00 && cp <= 0xD7A3) || (cp >= 0xF900 && cp <= 0xFAFF) ||
    (cp >= 0xFE30 && cp <= 0xFE4F) || (cp >= 0xFF00 && cp <= 0xFF60) ||
    (cp >= 0xFFE0 && cp <= 0xFFE6) || (cp >= 0x20000 && cp <= 0x3FFFD)
  }

  private def alignRight(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false // String/Date/Timestamp/Bool/IP/UUID/Enum: custom
    // serializations align left (ref DataTypeNumberBase.h:39)
  }

  private case class Grid(
    boldLT: String, boldRT: String, lb: String, rb: String,
    boldLS: String, ls: String, boldRS: String, rs: String,
    boldTS: String, boldMS: String, ms: String, bot: String,
    boldDash: String, dash: String, boldBar: String, bar: String)

  private val utf8Grid = Grid("┏", "┓", "└", "┘", "┡", "├", "┩", "┤",
    "┳", "╇", "┼", "┴", "━", "─", "┃", "│")
  private val asciiGrid = Grid("+", "+", "+", "+", "+", "+", "+", "+",
    "+", "+", "+", "+", "-", "-", "|", "|")

  private case class Widths(max: Array[Int], name: Array[Int],
    cells: Array[Array[String]], rowNumWidth: Int)

  private def widthsOf(schema: StructType, rows: Seq[Row], ctx: Ctx,
      totalRows: Long): Widths = {
    val n = schema.fields.length
    val shown = rows.take(
      math.max(0, (ctx.maxRows - totalRows).min(rows.size)).toInt)
    val cells = Array.tabulate(shown.size, n)((r, c) => cell(shown(r)(c)))
    val max = new Array[Int](n); val name = new Array[Int](n)
    var c = 0
    while (c < n) {
      name(c) = displayWidth(schema.fields(c).name)
      max(c) = name(c)
      var r = 0
      while (r < shown.size) {
        val w = displayWidth(cells(r)(c)).min(ctx.maxValueWidth.toInt)
        if (w > max(c)) max(c) = w
        r += 1
      }
      c += 1
    }
    // len(num_rows + total_rows) + len(". ")
    val rnw = (math.floor(math.log10(
      math.max(1, shown.size + totalRows).toDouble)) + 3).toInt
    Widths(max, name, cells, rnw)
  }

  private def bold(s: String, color: Boolean): String =
    if (color) "[1m" + s + "[0m" else s

  /** " value " padded to width; mirrors writeValueWithPadding. */
  private def padded(value: String, width: Int, right: Boolean,
      ctx: Ctx): String = {
    val vw = displayWidth(value)
    if (vw > ctx.maxValueWidth) {
      // truncate to max width + ellipsis
      val sb = new StringBuilder(" ")
      var w = 0; var i = 0
      while (i < value.length && w < ctx.maxValueWidth) {
        val cp = value.codePointAt(i)
        sb.appendAll(Character.toChars(cp))
        w += (if (isWide(cp)) 2 else 1)
        i += Character.charCount(cp)
      }
      val ell = if (ctx.ascii) "~" else "⋯"
      sb.append(if (ctx.color) "[31;1m" + ell + "[0m" else ell)
      sb.toString
    } else {
      val pad = " " * (width - vw)
      if (right) pad + " " + value + " " else " " + value + " " + pad
    }
  }

  private def prettyFull(schema: StructType, blocks: Seq[Seq[Row]],
      ctx: Ctx, color: Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0L
    blocks.foreach { rows =>
      if (total < ctx.maxRows) {
        val g = if (ctx.ascii) asciiGrid else utf8Grid
        val w = widthsOf(schema, rows, ctx, total)
        val blank = if (ctx.rowNumbers) " " * w.rowNumWidth else ""
        def sep(l: String, m: String, r: String, d: String): String =
          blank + l + w.max.map(x => d * (x + 2)).mkString(m) + r
        out += sep(g.boldLT, g.boldTS, g.boldRT, g.boldDash)
        val hdr = new StringBuilder(blank + g.boldBar + " ")
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (i != 0) hdr.append(" ").append(g.boldBar).append(" ")
          val pad = " " * (w.max(i) - w.name(i))
          // color wraps name AND padding here (ref
          // PrettyBlockOutputFormat.cpp:246 — escapes around the whole
          // aligned cell), unlike Compact/Space where only the name is
          if (alignRight(f.dataType))
            hdr.append(bold(pad + f.name, color))
          else hdr.append(bold(f.name + pad, color))
        }
        hdr.append(" ").append(g.boldBar)
        out += hdr.toString
        out += sep(g.boldLS, g.boldMS, g.boldRS, g.boldDash)
        var r = 0
        while (r < w.cells.length) {
          if (r != 0) out += sep(g.ls, g.ms, g.rs, g.dash)
          val sb = new StringBuilder
          if (ctx.rowNumbers) {
            val rn = (r + 1 + total).toString + ". "
            sb.append(" " * (w.rowNumWidth - rn.length)).append(rn)
          }
          sb.append(g.bar)
          var c = 0
          while (c < w.max.length) {
            if (c != 0) sb.append(g.bar)
            sb.append(padded(w.cells(r)(c), w.max(c),
              alignRight(schema.fields(c).dataType), ctx))
            c += 1
          }
          sb.append(g.bar)
          out += sb.toString
          r += 1
        }
        out += sep(g.lb, g.bot, g.rb, g.dash)
      }
      total += rows.size
    }
    if (total >= ctx.maxRows) out += s"  Showed first ${ctx.maxRows}."
    out.toSeq
  }

  private def prettyCompact(schema: StructType, blocks: Seq[Seq[Row]],
      ctx: Ctx, color: Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0L
    blocks.foreach { rows =>
      if (total < ctx.maxRows) {
        val g = if (ctx.ascii) asciiGrid else utf8Grid
        val w = widthsOf(schema, rows, ctx, total)
        val blank = if (ctx.rowNumbers) " " * w.rowNumWidth else ""
        // header row: names embedded in the top border (ref
        // PrettyCompactBlockOutputFormat::writeHeader)
        val (lt, rt, ts) = if (ctx.ascii) ("+", "+", "+")
          else ("┌", "┐", "┬")
        val hdr = new StringBuilder(blank + lt + g.dash)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (i != 0) hdr.append(g.dash).append(ts).append(g.dash)
          val pad = g.dash * (w.max(i) - w.name(i))
          if (alignRight(f.dataType)) hdr.append(pad).append(bold(f.name, color))
          else hdr.append(bold(f.name, color)).append(pad)
        }
        hdr.append(g.dash).append(rt)
        out += hdr.toString
        var r = 0
        while (r < w.cells.length) {
          val sb = new StringBuilder
          if (ctx.rowNumbers) {
            val rn = (r + 1 + total).toString + ". "
            sb.append(" " * (w.rowNumWidth - rn.length)).append(rn)
          }
          sb.append(g.bar)
          var c = 0
          while (c < w.max.length) {
            if (c != 0) sb.append(g.bar)
            sb.append(padded(w.cells(r)(c), w.max(c),
              alignRight(schema.fields(c).dataType), ctx))
            c += 1
          }
          sb.append(g.bar)
          out += sb.toString
          r += 1
        }
        out += blank + g.lb + w.max.map(x => g.dash * (x + 2))
          .mkString(g.bot) + g.rb
      }
      total += rows.size
    }
    if (total >= ctx.maxRows) out += s"  Showed first ${ctx.maxRows}."
    out.toSeq
  }

  private def prettySpace(schema: StructType, blocks: Seq[Seq[Row]],
      ctx: Ctx, color: Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0L
    blocks.foreach { rows =>
      if (total < ctx.maxRows) {
        val w = widthsOf(schema, rows, ctx, total)
        val hdr = new StringBuilder(
          if (ctx.rowNumbers) " " * w.rowNumWidth else "")
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          hdr.append(if (i != 0) "   " else " ")
          val pad = " " * (w.max(i) - w.name(i))
          if (alignRight(f.dataType)) hdr.append(pad).append(bold(f.name, color))
          else hdr.append(bold(f.name, color)).append(pad)
        }
        out += hdr.toString
        out += ""
        var r = 0
        while (r < w.cells.length) {
          val sb = new StringBuilder
          if (ctx.rowNumbers) {
            val rn = (r + 1 + total).toString + ". "
            sb.append(" " * (w.rowNumWidth - rn.length)).append(rn)
          }
          var c = 0
          while (c < w.max.length) {
            if (c != 0) sb.append(" ")
            sb.append(padded(w.cells(r)(c), w.max(c),
              alignRight(schema.fields(c).dataType), ctx))
            c += 1
          }
          out += sb.toString
          r += 1
        }
      }
      total += rows.size
    }
    if (total >= ctx.maxRows) { out += ""; out += s"Showed first ${ctx.maxRows}." }
    out.toSeq
  }

  private def vertical(schema: StructType, rows: Seq[Row],
      ctx: Ctx): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val nameW = schema.fields.map(f => displayWidth(f.name))
    val maxW = if (nameW.isEmpty) 0 else nameW.max
    val labels = schema.fields.zipWithIndex.map { case (f, i) =>
      f.name + ": " + (" " * (maxW - nameW(i)))
    }
    var rn = 0L
    rows.foreach { row =>
      rn += 1
      if (rn <= ctx.maxRows) {
        if (rn > 1) out += ""
        out += s"Row $rn:"
        val width = math.log10((rn + 1).toDouble).toInt + 1 + 5
        out += (if (ctx.ascii) "-" else "─") * width
        var c = 0
        while (c < labels.length) {
          // serializeText raw: embedded newlines flow onto new lines
          (labels(c) + cell(row(c))).split("\n", -1).foreach(out += _)
          c += 1
        }
      }
    }
    if (rn > ctx.maxRows) out += s"Showed first ${ctx.maxRows}."
    out.toSeq
  }

  /** Values: one line, rows as (v1,v2) joined by commas, quoted
    * strings (ref ValuesRowOutputFormat: serializeTextQuoted). */
  private def values(rows: Seq[Row]): Seq[String] =
    if (rows.isEmpty) Seq.empty
    else Seq(rows.map(r => r.toSeq.map(quoted)
      .mkString("(", ",", ")")).mkString(","))

  private def quoted(v: Any): String = v match {
    case null => "NULL"
    // Values keeps raw true/false regardless of bool_*_representation
    // (SerializationBool::serializeTextQuoted)
    case b: graft.functions.ChBool => if (b.b) "true" else "false"
    case s: String => "'" + s.replace("\\", "\\\\")
      .replace("'", "\\'") + "'"
    case d: java.sql.Date => "'" + d.toString + "'"
    case t: java.sql.Timestamp => "'" + graft.golden.Golden.fmt(t) + "'"
    case other => graft.golden.Golden.fmt(other)
  }

  /** CSV: strings/dates quoted with double-quote doubling (raw newlines
    * survive inside the quotes), numbers bare, NULL as \N unless
    * output_format_csv_null_representation overrides, tuples flattened
    * into one cell per element (ref SerializationString/
    * SerializationTuple::serializeTextCSV). */
  private def csv(schema: StructType, rows: Seq[Row],
      withNames: Boolean): Seq[String] = {
    val nullRep =
      try {
        val c = org.apache.spark.sql.internal.SQLConf.get
        c.getConfString("graft.ch.format_csv_null_representation",
          c.getConfString(
            "graft.ch.output_format_csv_null_representation", "\\N"))
      } catch { case _: Throwable => "\\N" }
    def csvCell(v: Any): String = v match {
      case null => nullRep
      case s: String => "\"" + s.replace("\"", "\"\"") + "\""
      case b: Array[Byte] => csvCell(new String(b,
        java.nio.charset.StandardCharsets.UTF_8))
      case d: java.sql.Date => "\"" + d.toString + "\""
      case t: java.sql.Timestamp =>
        "\"" + graft.golden.Golden.fmt(t) + "\""
      // comparison results are UInt8 in CH: 1/0, not true/false
      // (SerializationNumber<UInt8>::serializeTextCSV)
      case b: Boolean => if (b) "1" else "0"
      // the Bool display type prints its representation, UNQUOTED
      // (SerializationBool::serializeTextCSV)
      case b: graft.functions.ChBool => graft.golden.Golden.boolRep(b.b)
      case a: scala.collection.Seq[_] =>
        "\"" + graft.golden.Golden.fmt(a).replace("\"", "\"\"") + "\""
      // tuple: one CSV cell per element (SerializationTuple writes the
      // elements comma-separated, each CSV-escaped on its own)
      case r: Row => r.toSeq.map(csvCell).mkString(",")
      case other => graft.golden.Golden.fmt(other)
    }
    val hdr = if (withNames)
      Seq(schema.fields.map(f => "\"" + f.name.replace("\"", "\"\"") +
        "\"").mkString(",")) else Seq.empty
    // cells may carry raw newlines (kept inside quotes) — assemble the
    // full text, then split so each physical line is one output line
    val body = rows.map(r => r.toSeq.map(csvCell).mkString(","))
    (hdr ++ body).mkString("\n").split("\n", -1).toSeq match {
      case Seq("") => Seq.empty
      case lines => lines
    }
  }

  // ------------------------------------------------------------ JSON rows

  private def jsonStr(s: String, escSlash: Boolean = false): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '/' if escSlash => sb.append("\\/")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  /** 64-bit integers are emitted as JSON strings (ref Core/Settings.h
    * output_format_json_quote_64bit_integers default true). */
  private def jsonVal(v: Any, dt: DataType,
      escSlash: Boolean = false, quote64: Boolean = true): String = (v, dt) match {
    case (null, _) => "null"
    // a dynamic Object('json') value IS json — embed it unquoted
    case (j: graft.functions.ChJsonText, _) => j.s
    case (s: String, _) => jsonStr(s, escSlash)
    case (b: Boolean, _) => if (b) "true" else "false"
    // JSON keeps raw booleans regardless of bool_*_representation
    case (b: graft.functions.ChBool, _) => if (b.b) "true" else "false"
    case (l: java.lang.Long, _) =>
      if (quote64) "\"" + l + "\"" else l.toString
    case (i: java.lang.Integer, _) => i.toString
    case (i: java.lang.Short, _) => i.toString
    case (i: java.lang.Byte, _) => i.toString
    case (d: java.math.BigDecimal, t: DecimalType) if t.scale == 0 =>
      if (quote64) "\"" + d.stripTrailingZeros.toPlainString + "\""
      else d.stripTrailingZeros.toPlainString
    // scaled decimals print as plain numbers, trailing zeros stripped
    // (output_format_json_quote_decimals defaults to 0 — 00700 rows)
    case (d: java.math.BigDecimal, _: DecimalType) =>
      d.stripTrailingZeros.toPlainString
    case (d: java.lang.Double, _) =>
      val t =
        if (d.isNaN) "nan"
        else if (d.isInfinite) (if (d > 0) "inf" else "-inf")
        else graft.golden.Golden.chDouble(d)
      if (quoteFloats.get()) "\"" + t + "\"" else t
    case (f: java.lang.Float, _) =>
      val t =
        if (f.isNaN) "nan"
        else if (f.isInfinite) (if (f > 0) "inf" else "-inf")
        else graft.golden.Golden.chFloat(f)
      if (quoteFloats.get()) "\"" + t + "\"" else t
    case (a: scala.collection.Seq[_], ArrayType(et, _)) =>
      a.map(jsonVal(_, et, escSlash, quote64)).mkString("[", ",", "]")
    case (r: Row, StructType(fs)) =>
      // named tuples render as JSON objects when
      // output_format_json_named_tuples_as_objects is set (ref
      // Settings.h; the Object('JSON') tests rely on it)
      if (namedTuplesAsObjects.get())
        r.toSeq.zip(fs.toSeq)
          .map { case (x, f) => jsonStr(f.name) + ":" +
            jsonVal(x, f.dataType, escSlash, quote64) }
          .mkString("{", ",", "}")
      else r.toSeq.zip(fs.toSeq)
        .map { case (x, f) => jsonVal(x, f.dataType, escSlash, quote64) }
        .mkString("[", ",", "]")
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      m.map { case (k, x) =>
        jsonStr(cell(k), escSlash) + ":" + jsonVal(x, vt, escSlash)
      }.mkString("{", ",", "}")
    case (other, _) => jsonStr(cell(other), escSlash)
  }

  /** render-scope flag for struct-as-object (threaded via ThreadLocal
    * to keep jsonVal's recursive signature stable). */
  private val namedTuplesAsObjects = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** output_format_json_quote_64bit_floats (default 0; 02423). */
  private val quoteFloats = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  private def jsonEachRow(schema: StructType, row: Row,
      escSlash: Boolean, quote64: Boolean = true,
      colType: String => Option[String] = _ => None): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      // only genuinely 64-bit CH columns quote under
      // output_format_json_quote_64bit_integers (UInt32 stays bare
      // even though it is stored as a Spark BIGINT)
      val q = quote64 && (colType(f.name) match {
        case Some(t) =>
          t.matches("(?is)\\s*(Nullable\\s*\\(\\s*)?U?Int64\\b.*")
        case None => true
      })
      jsonStr(f.name) + ":" + jsonVal(row(i), f.dataType, escSlash, q)
    }.mkString("{", ",", "}")

  /** The JSON/JSONCompact/JSONStrings document formats (ref
    * src/Processors/Formats/Impl/JSONRowOutputFormat.cpp): meta with CH
    * type names, data as objects (or arrays for Compact), optional
    * totals/extremes sections, rows, rows_before_limit_at_least.
    * Statistics are emitted only when output_format_write_statistics=1 —
    * the golden tests disable it. The *Strings variants render every
    * value in its text form. */
  /** FORMAT XML (ref Processors/Formats/Impl/XMLRowOutputFormat.cpp):
    * tab-indented document — meta columns with CH type names, `<row>`
    * fields named by the column when it is a valid XML name (else
    * `<field>`), arrays/tuples as `<array>/<tuple>` with `<elem>`
    * children, only `&` and `<` escaped, extremes/totals sections, and
    * the rows counters. Statistics are omitted (the pinned tests set
    * output_format_write_statistics = 0). */
  def renderXmlDoc(schema: StructType, rows: Seq[Row],
      names: Seq[String], types: Seq[String], totals: Option[Row],
      extremes: Option[(Row, Row)],
      rowsBeforeLimit: Option[Long]): Seq[String] = {
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
    def tagOf(name: String): String =
      if (name.matches("[A-Za-z_][A-Za-z0-9_.-]*")) name else "field"
    def xmlVal(v: Any, dt: DataType): String = (v, dt) match {
      case (null, _) => ""
      case (a: scala.collection.Seq[_], ArrayType(et, _)) =>
        "<array>" + a.map(e => "<elem>" + xmlVal(e, et) + "</elem>")
          .mkString + "</array>"
      case (r: Row, StructType(fs)) =>
        "<tuple>" + r.toSeq.zip(fs.toSeq).map { case (e, fl) =>
          "<elem>" + xmlVal(e, fl.dataType) + "</elem>" }
          .mkString + "</tuple>"
      case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
        "<map>" + m.map { case (k, x) =>
          "<elem><key>" + esc(cell(k)) + "</key><value>" +
            xmlVal(x, vt) + "</value></elem>" }.mkString + "</map>"
      case (other, _) => esc(cell(other))
    }
    val sb = new StringBuilder
    sb.append("<?xml version='1.0' encoding='UTF-8' ?>\n")
    sb.append("<result>\n\t<meta>\n\t\t<columns>\n")
    names.zip(types).foreach { case (n, t) =>
      sb.append("\t\t\t<column>\n")
      sb.append("\t\t\t\t<name>").append(esc(n)).append("</name>\n")
      sb.append("\t\t\t\t<type>").append(esc(t)).append("</type>\n")
      sb.append("\t\t\t</column>\n")
    }
    sb.append("\t\t</columns>\n\t</meta>\n")
    def section(tag: String, rs: Seq[Row], indent: String): Unit = {
      rs.foreach { r =>
        sb.append(indent).append("<").append(tag).append(">\n")
        r.toSeq.zip(schema.fields.toSeq).zip(names).foreach {
          case ((v, f), n) =>
            val tg = tagOf(n)
            sb.append(indent).append("\t<").append(tg).append(">")
              .append(xmlVal(v, f.dataType))
              .append("</").append(tg).append(">\n")
        }
        sb.append(indent).append("</").append(tag).append(">\n")
      }
    }
    sb.append("\t<data>\n")
    section("row", rows, "\t\t")
    sb.append("\t</data>\n")
    totals.foreach { t =>
      sb.append("\t<totals>\n")
      t.toSeq.zip(schema.fields.toSeq).zip(names).foreach {
        case ((v, f), n) =>
          val tg = tagOf(n)
          sb.append("\t\t<").append(tg).append(">")
            .append(xmlVal(v, f.dataType)).append("</").append(tg)
            .append(">\n")
      }
      sb.append("\t</totals>\n")
    }
    extremes.foreach { case (mn, mx) =>
      sb.append("\t<extremes>\n")
      section("min", Seq(mn), "\t\t")
      section("max", Seq(mx), "\t\t")
      sb.append("\t</extremes>\n")
    }
    sb.append("\t<rows>").append(rows.size).append("</rows>\n")
    rowsBeforeLimit.foreach(n =>
      sb.append("\t<rows_before_limit_at_least>").append(n)
        .append("</rows_before_limit_at_least>\n"))
    sb.append("</result>")
    sb.toString.split("\n", -1).toSeq
  }

  def renderJsonDoc(fmt: String, schema: StructType, rows: Seq[Row],
      ctx: Ctx, names: Seq[String], types: Seq[String],
      totals: Option[Row], extremes: Option[(Row, Row)],
      rowsBeforeLimit: Option[Long]): Seq[String] = {
    val f = fmt.toLowerCase
    val compact = f.contains("compact")
    val strings = f.contains("strings")
    val escSlash =
      ctx.int("output_format_json_escape_forward_slashes", 1L) != 0L
    val quote64 =
      ctx.int("output_format_json_quote_64bit_integers", 1L) != 0L
    def value(v: Any, i: Int): String =
      if (strings) jsonStr(cell(v), escSlash)
      else jsonVal(v, schema.fields(i).dataType, escSlash, quote64)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out += "{"
    out += "\t\"meta\":"
    out += "\t["
    names.zip(types).zipWithIndex.foreach { case ((n, t), i) =>
      out += "\t\t{"
      out += "\t\t\t\"name\": " + jsonStr(n) + ","
      out += "\t\t\t\"type\": " + jsonStr(t)
      out += "\t\t}" + (if (i < names.size - 1) "," else "")
    }
    out += "\t],"
    out += ""
    out += "\t\"data\":"
    out += "\t["
    if (rows.isEmpty) out += "" // CH prints an empty line inside []
    rows.zipWithIndex.foreach { case (r, ri) =>
      val sep = if (ri < rows.size - 1) "," else ""
      if (compact)
        out += "\t\t[" + r.toSeq.zipWithIndex.map { case (v, i) =>
          value(v, i) }.mkString(", ") + "]" + sep
      else {
        out += "\t\t{"
        r.toSeq.zipWithIndex.foreach { case (v, i) =>
          out += "\t\t\t" + jsonStr(names(i)) + ": " + value(v, i) +
            (if (i < names.size - 1) "," else "")
        }
        out += "\t\t}" + sep
      }
    }
    out += "\t],"
    def objSection(r: Row, indent: String): Seq[String] =
      if (compact)
        Seq(indent + "[" + r.toSeq.zipWithIndex.map { case (v, i) =>
          value(v, i) }.mkString(", ") + "]")
      else {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        b += indent + "{"
        r.toSeq.zipWithIndex.foreach { case (v, i) =>
          b += indent + "\t" + jsonStr(names(i)) + ": " + value(v, i) +
            (if (i < names.size - 1) "," else "")
        }
        b += indent + "}"
        b.toSeq
      }
    totals.foreach { t =>
      out += ""
      if (compact) {
        out += "\t\"totals\": " + objSection(t, "").mkString.trim + ","
      } else {
        out += "\t\"totals\":"
        val sec = objSection(t, "\t")
        out ++= sec.dropRight(1)
        out += sec.last + ","
      }
    }
    extremes.foreach { case (mn, mx) =>
      out += ""
      out += "\t\"extremes\":"
      out += "\t{"
      if (compact) {
        out += "\t\t\"min\": " + objSection(mn, "").mkString.trim + ","
        out += "\t\t\"max\": " + objSection(mx, "").mkString.trim
      } else {
        out += "\t\t\"min\":"
        val mnSec = objSection(mn, "\t\t")
        out ++= mnSec.dropRight(1)
        out += mnSec.last + ","
        out += "\t\t\"max\":"
        out ++= objSection(mx, "\t\t")
      }
      out += "\t},"
    }
    out += ""
    rowsBeforeLimit match {
      case Some(n) =>
        out += "\t\"rows\": " + rows.size + ","
        out += ""
        out += "\t\"rows_before_limit_at_least\": " + n
      case None =>
        out += "\t\"rows\": " + rows.size
    }
    out += "}"
    out.toSeq
  }
}
