package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style corpus cleaning for LLM training-data curation — the
  * standard public pipeline shape (language filter → length gates →
  * token blocklist → exact dedup → survival stats), re-expressed as one
  * declarative Spark plan.
  *
  * Scale story (the point of the exercise):
  *  - every gate is a codegen'd row-local filter fused into the scan
  *    stage (no UDFs, no shuffles);
  *  - dedup is ONE hash shuffle on md5(text) via a window rank — never
  *    an all-pairs comparison;
  *  - the survival summary is a map-side-combined aggregation on the
  *    (tiny) source key.
  * At 100 TB the plan is: scan → fused filters → exchange(md5) →
  * rank/filter → partial agg → exchange(source) → final agg. Two
  * shuffles total, the second over ~|sources| rows per partition.
  */
object CorpusClean {

  /** Clean `docs` (doc_id, text, lang, source, …) and return the
    * per-source survival summary:
    * (source, kept_docs, total_words, avg_words).
    *
    * @param keepLang  language to keep (langID gate)
    * @param minWords  inclusive lower word-count gate
    * @param maxWords  inclusive upper word-count gate
    * @param blocked   tokens whose presence drops the document
    */
  def clean(docs: DataFrame, keepLang: String, minWords: Int,
      maxWords: Int, blocked: Seq[String]): DataFrame = {
    val toks = split(col("text"), " ")
    val base0 = docs
      .filter(col("lang") === keepLang)
      .withColumn("__wc", size(toks))
      .filter(col("__wc").between(minWords, maxWords))
      // mean word length gate (C4 drops gibberish / run-on tokens):
      // chars excluding the wc-1 separators, averaged per word
      .withColumn("__mwl",
        (length(col("text")) - (col("__wc") - 1)).cast("double") /
          col("__wc"))
      .filter(col("__mwl").between(3.0, 10.0))
    val unblocked = blocked.foldLeft(base0) { (d, b) =>
      d.filter(!array_contains(split(col("text"), " "), b))
    }
    // exact dedup: keep the smallest doc_id per text hash (one shuffle)
    val w = Window.partitionBy(col("__h")).orderBy(col("doc_id"))
    val deduped = unblocked
      .withColumn("__h", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    deduped.groupBy(col("source"))
      .agg(count("*").as("kept_docs"),
        sum(col("__wc")).as("total_words"),
        round(avg(col("__wc")), 2).as("avg_words"))
      .orderBy(col("source"))
  }
}
