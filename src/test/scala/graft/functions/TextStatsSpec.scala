package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** TextStats (single-pass expression) must agree exactly with the
  * composed TextAnalysis builtins it replaces. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("TextStats == composed TextAnalysis on the documents fixture") {
    val docs = Tables.load(spark, SparkSpec.tiny, "documents")
    val both = docs.select(
      TextStats(col("text")).as("fast"),
      struct(
        TextAnalysis.languageId(col("text")).as("lang_guess"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenEstimate(col("text")).as("bpe_tokens"),
        TextAnalysis.fingerprint(col("text")).as("fp")).as("slow"))
    assert(both.filter($"fast" =!= $"slow").count() == 0)
  }

  test("TextStats == composed on multilingual/edge strings") {
    val samples = Seq(
      "the cat sat on the mat and it is warm",
      "el perro corre por la calle y es un dia bonito",
      "这是一个中文句子", "これは日本語の文です", "한국어 문장입니다",
      "zxqw qwfp vbnm", "single")
    val df = samples.toDF("text")
    val diff = df.select(
      TextStats(col("text")).getField("lang_guess").as("fast"),
      TextAnalysis.languageId(col("text")).as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(diff == 0)
    val counts = df.select(
      TextStats(col("text")).getField("n_tokens").as("fast"),
      TextAnalysis.tokenCount(col("text")).as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(counts == 0)
  }
}
