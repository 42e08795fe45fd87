package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("lang_guess", StringType),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("fp", StringType)))

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
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
