package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics: (lang_guess, n_tokens, bpe_tokens, fp).
  *
  * Semantics are EXACTLY TextAnalysis.{languageId, tokenCount,
  * bpeTokenEstimate, fingerprint} (TextStatsSpec pins the equivalence);
  * this expression exists because the composed-builtin forms cost four
  * interpreted passes with intermediate arrays per row, which dominated
  * the text-pipeline benchmark.
  */
case class TextStats(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lang_guess", StringType),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("fp", StringType)))

  override def nullIntolerant: Boolean = true

  // r16: real codegen (a CodegenFallback expression excludes its host
  // operator from WholeStageCodegen entirely, so the text-pipeline
  // projection ran as an interpreted Project outside the codegen span);
  // the generated code is one direct call into the same JIT-compiled
  // kernel the interpreted path runs.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStats", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(input: UTF8String): InternalRow = {
    val s = input.toString
    // whitespace tokens: count + bpe estimate + distinct lowered set
    var nTokens = 0
    var bpe = 0L
    val distinct = new java.util.TreeSet[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        nTokens += 1
        val len = i - start
        bpe += (len + 3) / 4
        distinct.add(s.substring(start, i).toLowerCase)
      }
    }
    // fingerprint: md5 hex of the space-joined sorted distinct tokens
    val joined = String.join(" ", distinct)
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(joined.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

    // language id — same decision procedure as TextAnalysis.languageId
    // script detection in languageId's order: kana, hangul, han
    var lang: String = null
    var hasKana = false; var hasHangul = false; var hasHan = false
    var j = 0
    while (j < n) {
      val c = s.charAt(j).toInt
      if (c >= 0x3040 && c <= 0x30ff) hasKana = true
      else if (c >= 0xac00 && c <= 0xd7af) hasHangul = true
      else if (c >= 0x4e00 && c <= 0x9fff) hasHan = true
      j += 1
    }
    if (hasKana) lang = "ja"
    else if (hasHangul) lang = "ko"
    else if (hasHan) lang = "zh" 
    if (lang == null) {
      // punct+space tokens, scored against each language's marker set;
      // max by (score, lang) like array_max over (score, lang) structs
      val toks = s.toLowerCase.split("[\\s\\p{Punct}]+")
      var bestScore = 0
      var bestLang = ""
      TextStats.langSets.foreach { case (l, set) =>
        val hit = new java.util.HashSet[String]()
        toks.foreach(t => if (set.contains(t)) hit.add(t))
        val score = hit.size
        if (score > bestScore || (score == bestScore && l > bestLang)) {
          bestScore = score; bestLang = l
        }
      }
      lang = if (bestScore > 0) bestLang else "und"
    }

    InternalRow(UTF8String.fromString(lang), nTokens, bpe,
      UTF8String.fromString(fp))
  }

  override protected def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
}

object TextStats {
  private[functions] val langSets: Seq[(String, Set[String])] =
    TextAnalysis.stopwordLists.toSeq.sortBy(_._1)
      .map { case (l, ws) => l -> ws.toSet }

  def apply(text: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text)))
}

/** Single-pass quality score (UNROUNDED — callers apply Spark's own
  * `round(_, 6)` so the final rounding is literally the same expression
  * the composed form evaluated).
  *
  * Semantics are EXACTLY `TextAnalysis.qualityScoreComposed` without the
  * outer round (TextAnalysisSpec pins bit-equality): the composed form
  * re-evaluates `split(text, "\\s+")` and walks several interpreted
  * passes (regexp_replace, transform(lower), array_intersect) per row —
  * r15 VERDICT next-round item 5. Every sub-step below reproduces the
  * exact builtin it replaces:
  *  - token count n = `split(text, "\\s+", -1)` length (Java regex split,
  *    limit -1, as StringSplit evaluates it);
  *  - text length in CODE POINTS (Spark `length` = UTF8String.numChars);
  *  - alpha count = code points in [A-Za-z ] — precisely the code points
  *    `regexp_replace(text, "[^A-Za-z ]", "")` keeps;
  *  - stop hits = DISTINCT lowered tokens in the EN stopword set
  *    (array_intersect's distinct semantics), with UTF8String.toLowerCase
  *    applied per token exactly as `lower()` does;
  *  - greatest/least/between/arithmetic in the same IEEE order.
  */
case class QualityScoreRaw(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // r16: real codegen — same rationale as TextStats above
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityScoreRaw", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(u: UTF8String): Double = {
    val s = u.toString
    val toks = QualityScoreRaw.WS.split(s, -1)
    val n = toks.length.toDouble
    // Spark length() = number of Unicode code points
    val lenChars = s.codePointCount(0, s.length).toDouble
    var alpha = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || cp == ' ')
        alpha += 1
      i += Character.charCount(cp)
    }
    // array_intersect(transform(toks, lower), enStop) counts DISTINCT hits
    val hits = new java.util.HashSet[String]()
    var t = 0
    while (t < toks.length) {
      // lower() = UTF8String.toLowerCase (ASCII fast path / locale slow
      // path) — call the engine's own implementation, no re-derivation
      val lowered = UTF8String.fromString(toks(t)).toLowerCase.toString
      if (QualityScoreRaw.enStop.contains(lowered)) hits.add(lowered)
      t += 1
    }
    val nClamped = if (n > 1.0) n else 1.0 // greatest(n, 1.0)
    val lenClamped = if (lenChars > 1.0) lenChars else 1.0
    val meanLen = lenChars / nClamped
    val alphaRatio = alpha.toDouble / lenClamped
    val stopRatio = hits.size.toDouble / nClamped
    val lengthOk = if (n >= 5.0 && n <= 1000.0) 1.0 else 0.5
    val meanOk = if (meanLen >= 3.0 && meanLen <= 10.0) 1.0 else 0.4
    val sum = 0.25 * lengthOk +
      0.25 * math.min(alphaRatio * 1.2, 1.0) +
      0.25 * math.min(stopRatio * 5.0, 1.0) +
      0.25 * meanOk
    math.min(1.0, sum)
  }

  override protected def withNewChildInternal(c: Expression): QualityScoreRaw =
    copy(child = c)
}

object QualityScoreRaw {
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val enStop: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    TextAnalysis.stopwordLists("en").foreach(s.add)
    s
  }

  def apply(text: Column): Column =
    ColumnBridge.column(QualityScoreRaw(ColumnBridge.expression(text)))
}
