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

  // selfJoin (r15 single-scan variant): must return row-for-row what
  // join() returns on the equivalent filtered sides, for every
  // inequality, including the all-null unmatched shape
  private def events = Seq(
    ("p", "a", 10L, 1, "x1"), ("p", "a", 20L, 2, "x2"),
    ("p", "b", 15L, 3, "x3"), ("p", "c", 5L, 4, "x4"),
    ("v", "a", 10L, 0, "y1"), ("v", "a", 25L, 0, "y2"),
    ("v", "b", 10L, 0, "y3"), ("v", "b", 20L, 0, "y4")
  ).toDF("typ", "k", "t", "eid", "pay")

  test("selfJoin equals join on disjoint filters of one source") {
    import org.apache.spark.sql.functions._
    for (ineq <- Seq(">=", ">", "<=", "<"); jt <- Seq("left", "inner")) {
      val l = events.filter(col("typ") === "p")
        .select(col("k"), col("eid"), col("t"), col("pay").as("lp"))
      val r = events.filter(col("typ") === "v")
        .select(col("k"), col("t").as("vt"), col("pay").as("vp"))
      val viaJoin = AsofJoin.join(l, r, Seq("k"), "t", "vt", ineq, jt)
        .collect().map(_.toString).sorted.toSeq
      val viaSelf = AsofJoin.selfJoin(events,
          leftFilter = col("typ") === "p",
          rightFilter = col("typ") === "v",
          leftSelect = Seq("k" -> col("k"), "eid" -> col("eid"),
            "t" -> col("t"), "lp" -> col("pay")),
          rightSelect = Seq("k" -> col("k"), "vt" -> col("t"),
            "vp" -> col("pay")),
          on = Seq("k"), leftTime = "t", rightTime = "vt", ineq, jt)
        .collect().map(_.toString).sorted.toSeq
      assert(viaSelf == viaJoin, s"mismatch for inequality=$ineq type=$jt")
    }
  }

  test("selfJoin scans the source once (no Union in the plan)") {
    import org.apache.spark.sql.functions._
    val plan = AsofJoin.selfJoin(events,
        col("typ") === "p", col("typ") === "v",
        Seq("k" -> col("k"), "t" -> col("t")),
        Seq("k" -> col("k"), "vt" -> col("t")),
        Seq("k"), "t", "vt").queryExecution.executedPlan.toString
    assert(!plan.contains("Union"))
    assert(!plan.contains("CartesianProduct"))
  }
}
