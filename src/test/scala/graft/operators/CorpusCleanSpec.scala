package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4-style corpus cleaning: every gate applies, dedup keeps the
  * smallest doc_id, and the plan stays all-equi (no cartesian). */
class CorpusCleanSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      // survives: en, 5 words in range, mean word len ok
      (1L, "alpha beta gamma delta epsilon", "en", "s1"),
      // duplicate text, higher id — dropped by dedup
      (2L, "alpha beta gamma delta epsilon", "en", "s1"),
      // wrong language
      (3L, "alpha beta gamma delta epsilon", "fr", "s1"),
      // blocklisted token
      (4L, "alpha crash gamma delta epsilon", "en", "s2"),
      // too short (word count gate)
      (5L, "alpha beta", "en", "s2"),
      // gibberish (mean word length gate)
      (6L, "aaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb cccccccccccccccc dddddddddddddddd eeeeeeeeeeeeeee", "en", "s2"),
      // survives in s2
      (7L, "zeta eta theta iota kappa", "en", "s2")
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("gates, blocklist, and dedup-by-min-id") {
    val out = CorpusClean.clean(docs, keepLang = "en", minWords = 3,
      maxWords = 10, blocked = Seq("crash")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    val s1 = out.find(_.getString(0) == "s1").get
    assert(s1.getLong(1) == 1L) // the id=2 duplicate collapsed
    assert(s1.getLong(2) == 5L) // 5 words kept
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s2.getLong(1) == 1L) // only doc 7 survives the gates
  }

  test("plan is equi-only: no cartesian or nested-loop join") {
    val plan = CorpusClean.clean(docs, "en", 3, 10, Seq("crash"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
