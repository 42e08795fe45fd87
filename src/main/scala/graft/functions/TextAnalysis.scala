package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data pipelines (SURVEY §2.8
  * "ML/NLP extras"; ref `src/Functions/FunctionsLanguageClassification.cpp`
  * detectLanguage, `src/Functions/{stem,lemmatize}.cpp`).
  *
  * All composed from codegen'd built-ins — no UDFs — so they stay inside
  * whole-stage codegen on a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token estimate: count of word/number/punctuation chunks
    * (ref tokenizer behavior: a word of length L is ~ceil(L/4) subwords). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      transform(split(text, "\\s+"), w => ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L), (a, x) => a + x)

  private[functions] val stopwordLists: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
    "it" -> Seq("il", "di", "che", "la", "per", "una", "sono", "con", "non", "del"))

  /** Stopword hits for one language's marker list. */
  def stopwordHits(tokens: Column, lang: String): Column =
    size(array_intersect(tokens,
      array(stopwordLists(lang).map(lit(_)): _*)))

  /** n-gram-heuristic language ID: the language whose marker stopwords hit
    * the tokenized text most; CJK short-circuits on script detection.
    * Returns ISO code or 'und' when nothing matches. */
  def languageId(text: Column): Column = {
    val toks = split(ch.lowerUTF8(text), "[\\s\\p{Punct}]+")
    val scores = stopwordLists.keys.toSeq.sorted.map(l =>
      struct(stopwordHits(toks, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scores: _*))
    // kana before han: Japanese text mixes kanji with kana, so a han hit
    // alone must not claim zh
    when(text.rlike("[\\u3040-\\u30ff]"), lit("ja"))
      .when(text.rlike("[\\uac00-\\ud7af]"), lit("ko"))
      .when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length band, alpha ratio, stopword
    * ratio and mean word length — the standard cheap pre-filter for web
    * text. Deterministic, SQL-expressible (oracle-able).
    *
    * r16: fused single-pass expression (graft.functions.QualityScoreRaw)
    * with Spark's own `round` on top — bit-identical to
    * [[qualityScoreComposed]] (TextAnalysisSpec pins it), one pass per row
    * instead of several interpreted split/regexp/intersect passes
    * (guide §4). */
  def qualityScore(text: Column): Column =
    round(graft.functions.QualityScoreRaw(text), 6)

  /** The original composed-builtin quality formula — kept as the
    * equivalence oracle for the fused expression, not used on any query
    * path. */
  private[graft] def qualityScoreComposed(text: Column): Column = {
    val toks = split(text, "\\s+")
    val n = size(toks).cast("double")
    val meanLen = length(text).cast("double") / greatest(n, lit(1.0))
    val alphaRatio = (length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0)))
    val stopRatio = stopwordHits(transform(toks, lower _), "en").cast("double") /
      greatest(n, lit(1.0))
    val lengthOk = when(n.between(5, 1000), lit(1.0)).otherwise(lit(0.5))
    round(least(lit(1.0),
      lit(0.25) * lengthOk +
        lit(0.25) * least(alphaRatio * lit(1.2), lit(1.0)) +
        lit(0.25) * least(stopRatio * lit(5.0), lit(1.0)) +
        lit(0.25) * when(meanLen.between(3.0, 10.0), 1.0).otherwise(0.4)), 6)
  }

  /** Canonical document fingerprint: hash of the sorted distinct token
    * set — robust to word order and duplication (bag-of-words identity). */
  def fingerprint(text: Column): Column =
    md5(to_binary(
      array_join(array_sort(array_distinct(split(ch.lowerUTF8(text), "\\s+"))), " "),
      lit("utf-8")))

  /** 64-bit rolling hash over the token sequence — order-sensitive
    * counterpart of [[fingerprint]]: h_i = xxhash64(h_{i-1}, tok_i),
    * folded left-to-right (chained hashing avoids ANSI-mode overflow that
    * a polynomial accumulator would hit). */
  def rollingHash(text: Column): Column =
    aggregate(split(text, "\\s+"), lit(0L),
      (acc, t) => ch.sparkXxhash64(acc, t))
}
