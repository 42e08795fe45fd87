package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 15L, "l4"), ("c", 5L, "l5")
  ).toDF("k", "t", "lv")

  private def right = Seq(
    ("a", 10L, "r10"), ("a", 25L, "r25"),
    ("b", 10L, "r10b"), ("b", 20L, "r20b")
  ).toDF("k", "rt", "rv")

  test(">= matches latest right at-or-before, null when none") {
    val got = AsofJoin.join(left, right, Seq("k"), "t", "rt", ">=")
      .select("k", "t", "rv").as[(String, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      ("a", 10L, Some("r10")),   // equal ts matches on >=
      ("a", 20L, Some("r10")),
      ("a", 30L, Some("r25")),
      ("b", 15L, Some("r10b")),
      ("c", 5L, None)))          // no right rows for key c
  }

  test("> excludes equal timestamps") {
    val got = AsofJoin.join(left, right, Seq("k"), "t", "rt", ">")
      .select("k", "t", "rv").as[(String, Long, Option[String])]
      .collect().toSet
    assert(got.contains(("a", 10L, None))) // r10 at ts=10 not visible
    assert(got.contains(("a", 20L, Some("r10"))))
  }

  test("<= matches earliest right at-or-after") {
    val got = AsofJoin.join(left, right, Seq("k"), "t", "rt", "<=")
      .select("k", "t", "rv").as[(String, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      ("a", 10L, Some("r10")),
      ("a", 20L, Some("r25")),
      ("a", 30L, None),
      ("b", 15L, Some("r20b")),
      ("c", 5L, None)))
  }

  test("inner drops unmatched left rows") {
    val got = AsofJoin.join(left, right, Seq("k"), "t", "rt", ">=", "inner")
    assert(got.count() == 4) // c@5 dropped
  }

  test("plan shuffles once on the key, no cartesian") {
    val plan = AsofJoin.join(left, right, Seq("k"), "t", "rt", ">=")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
