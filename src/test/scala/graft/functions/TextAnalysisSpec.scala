package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("languageId recognizes stopword profiles and CJK scripts") {
    val samples = Seq(
      ("the cat sat on the mat and it is warm", "en"),
      ("el perro corre por la calle y es un dia bonito", "es"),
      ("le chat est dans la maison et les enfants jouent", "fr"),
      ("der hund ist nicht mit den kindern und das haus", "de"),
      ("这是一个中文句子", "zh"),
      ("これは日本語の文です", "ja"),
      ("한국어 문장입니다", "ko"),
      ("zxqw qwfp vbnm", "und"))
    val got = samples.map(_._1).toDF("text")
      .select(TextAnalysis.languageId(col("text"))).as[String].collect()
    assert(got.toSeq == samples.map(_._2))
  }

  test("tokenCount and bpe estimate") {
    val r = Seq("hello world wide web").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")),
        TextAnalysis.bpeTokenEstimate(col("text")))
      .as[(Int, Long)].head()
    assert(r._1 == 4)
    assert(r._2 == 2 + 2 + 1 + 1) // ceil(5/4)+ceil(5/4)+ceil(4/4)+ceil(3/4)
  }

  test("fingerprint is order- and duplication-insensitive; rollingHash is not") {
    val df = Seq(("a b c", "c b a a", "a b d")).toDF("x", "y", "z")
    val (fx, fy, fz) = df.select(
      TextAnalysis.fingerprint(col("x")), TextAnalysis.fingerprint(col("y")),
      TextAnalysis.fingerprint(col("z"))).as[(String, String, String)].head()
    assert(fx == fy && fx != fz)
    val (rx, ry) = df.select(
      TextAnalysis.rollingHash(col("x")), TextAnalysis.rollingHash(col("y")))
      .as[(Long, Long)].head()
    assert(rx != ry)
  }

  test("fused qualityScore equals the composed form bit-for-bit") {
    // r16 fusion guard: round(QualityScoreRaw, 6) must reproduce the
    // composed split/regexp_replace/array_intersect formula exactly —
    // fixture docs plus adversarial strings (empty, whitespace runs and
    // tabs/newlines, unicode incl. non-BMP, Kelvin-sign lowering, token
    // count boundaries 4/5/1000/1001, mean-word-length boundaries)
    val crafted = Seq(
      "",
      " ",
      "   \t\n  ",
      "the cat is on the mat and it is a fine day for all of us",
      "a  b   c", // consecutive separators -> empty first-split behavior
      " leading and trailing ",
      "@@@@ #### $$$$ %%%% ^^^^ &&&&",
      "THE THE THE the tHe", // distinct-hit semantics of array_intersect
      "KIT KIT the", // Kelvin sign lowers into ASCII 'kit'
      "日本語 テキスト と English words mixed",
      "𝒜𝒷𝒸 𝔞𝔟𝔠 non-bmp codepoints here", // surrogate pairs: length() = code points
      "one two three four", // n = 4 (below 5-token band)
      "one two three four five", // n = 5 (boundary)
      Seq.fill(1000)("word").mkString(" "), // n = 1000 (boundary)
      Seq.fill(1001)("word").mkString(" "), // n = 1001
      "ab ab ab ab ab ab", // meanLen below 3.0 band
      "abcdefghij " * 5, // meanLen near 10 band edge + trailing space
      "supercalifragilisticexpialidocious antidisestablishmentarianism")
      .toDF("text")
    val both = crafted.select(
      TextAnalysis.qualityScore(col("text")),
      TextAnalysis.qualityScoreComposed(col("text"))).as[(Double, Double)]
      .collect()
    both.zip(crafted.as[String].collect()).foreach { case ((f, c), txt) =>
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(c),
        s"fused $f != composed $c for '${txt.take(40)}'")
    }
    val docs = graft.Tables.load(spark, graft.SparkSpec.tiny, "documents")
    val fixture = docs.select(
      TextAnalysis.qualityScore(col("text")),
      TextAnalysis.qualityScoreComposed(col("text"))).as[(Double, Double)]
      .collect()
    assert(fixture.nonEmpty && fixture.forall(p =>
      java.lang.Double.doubleToRawLongBits(p._1) ==
        java.lang.Double.doubleToRawLongBits(p._2)))
  }

  test("qualityScore ranks clean text above junk") {
    val r = Seq(("the cat is on the mat and it is a fine day for all of us",
      "@@@@ #### $$$$ %%%% ^^^^ &&&&"))
      .toDF("good", "bad")
      .select(TextAnalysis.qualityScore(col("good")),
        TextAnalysis.qualityScore(col("bad")))
      .as[(Double, Double)].head()
    assert(r._1 > r._2)
    assert(r._1 >= 0.0 && r._1 <= 1.0 && r._2 >= 0.0)
  }
}
