package graft.functions

import graft.{ChSql, SparkSpec}

/** lemmatize/synonyms against registered dictionaries (ref
  * src/Functions/lemmatize.cpp, synonyms.cpp — reference behavior with
  * configured dicts: lemma or identity; synonym group or empty). */
class NlpDictsSpec extends SparkSpec {

  test("lemmatize resolves registered forms, identity otherwise") {
    NlpDicts.registerLemmaDict("en", Map(
      "wolves" -> "wolf", "ran" -> "run", "better" -> "good"))
    val r = ChSql.sql(spark,
      "SELECT lemmatize('en', 'wolves') AS a, lemmatize('en', 'ran') AS b, " +
        "lemmatize('en', 'table') AS c", SparkSpec.tiny).collect()(0)
    assert(r.getString(0) == "wolf")
    assert(r.getString(1) == "run")
    assert(r.getString(2) == "table") // no entry → unchanged (lemmagen)
  }

  test("unregistered language throws like the reference's missing config") {
    val e = intercept[Exception] {
      ChSql.sql(spark, "SELECT lemmatize('xx', 'w')", SparkSpec.tiny).collect()
    }
    assert(e.getMessage != null)
  }

  test("synonyms expands to the full group, empty when unknown") {
    NlpDicts.registerSynonymSets("ext_en", Seq(
      Seq("important", "big", "critical"), Seq("happy", "glad")))
    val r = ChSql.sql(spark,
      "SELECT synonyms('ext_en', 'big') AS s, " +
        "synonyms('ext_en', 'zzz') AS e", SparkSpec.tiny).collect()(0)
    assert(r.getSeq[String](0) == Seq("important", "big", "critical"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("distributed evaluation: lemmatize over a column") {
    NlpDicts.registerLemmaDict("en", Map(
      "wolves" -> "wolf", "ran" -> "run", "better" -> "good"))
    val df = spark.createDataFrame(Seq(
      Tuple1("wolves"), Tuple1("ran"), Tuple1("chairs"))).toDF("w")
      .repartition(3)
    df.createOrReplaceTempView("nlp_words")
    val rows = ChSql.sql(spark,
      "SELECT lemmatize('en', w) AS l FROM nlp_words ORDER BY l",
      SparkSpec.tiny).collect().map(_.getString(0)).toSeq
    assert(rows == Seq("chairs", "run", "wolf"))
  }
}
