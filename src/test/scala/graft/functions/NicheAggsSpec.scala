package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the long-tail aggregates (ref
  * src/AggregateFunctions/AggregateFunction{SumCount,IntervalLengthSum,
  * MaxIntersections,BoundingRatio}.h, AggregateFunctionMinMaxAny.h).
  */
class NicheAggsSpec extends SparkSpec {
  import spark.implicits._

  test("sumCount returns (sum, count) skipping nulls in count") {
    val df = Seq[(Int, Option[Double])](
      (1, Some(2.0)), (1, Some(3.5)), (1, None), (2, None))
      .toDF("g", "x")
    val out = df.groupBy("g").agg(NicheAggs.sumCount($"x").as("sc"))
      .select($"g", $"sc.sum", $"sc.count").orderBy("g")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getLong(2)))
    assert(out.toSeq === Seq((1, Some(5.5), 2L), (2, None, 0L)))
  }

  test("singleValueOrNull: one distinct value → value, else NULL") {
    val df = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "z"))
      .toDF("g", "x")
    val out = df.groupBy("g")
      .agg(NicheAggs.singleValueOrNull($"x").as("v")).orderBy("g")
      .collect().map(r => (r.getInt(0), Option(r.getString(1))))
    assert(out.toSeq === Seq((1, Some("a")), (2, None), (3, Some("z"))))
  }

  test("anyHeavy finds the majority element") {
    val df = (Seq.fill(7)("hot") ++ Seq("a", "b", "c")).toDF("x")
    assert(df.agg(NicheAggs.anyHeavy($"x")).head.getString(0) === "hot")
  }

  test("intervalLengthSum merges overlaps, swaps reversed, skips empty") {
    // (8,8) skipped; (7,5) swaps to [5,7]; [1,4]∪[2,6]∪[5,7] = [1,7] = 6
    // and [10,11] adds 1 → 7
    val df = Seq((1, 4), (2, 6), (10, 11), (8, 8), (7, 5)).toDF("b", "e")
    val n = df.agg(NicheAggs.intervalLengthSum($"b", $"e").cast("long"))
      .head.getLong(0)
    assert(n === 7L)
  }

  test("maxIntersections: overlap peak; touching intervals do not stack") {
    // [1,3],[2,5],[4,6]: peak 2 (at 2 and again at 4); [6,7] touches [4,6]
    val df = Seq((1, 3), (2, 5), (4, 6), (6, 7)).toDF("b", "e")
    assert(df.agg(NicheAggs.maxIntersections($"b", $"e"))
      .head.getLong(0) === 2L)
    // first position attaining the peak
    assert(df.agg(NicheAggs.maxIntersectionsPosition($"b", $"e"))
      .head.getDouble(0) === 2.0)
    // disjoint: peak 1
    val dj = Seq((1, 2), (3, 4)).toDF("b", "e")
    assert(dj.agg(NicheAggs.maxIntersections($"b", $"e"))
      .head.getLong(0) === 1L)
  }

  test("boundingRatio is the first-to-last slope") {
    // points (x=0,y=1) .. (x=4,y=9): slope (9-1)/(4-0) = 2
    val df = Seq((0, 1.0), (1, 5.0), (2, 2.0), (4, 9.0)).toDF("x", "y")
    assert(df.agg(NicheAggs.boundingRatio($"x", $"y")).head.getDouble(0)
      === 2.0)
  }

  test("groupArrayLast keeps the raw ring slot order") {
    // 1..10 into a ring of 3: [10, 8, 9] (ref 02520_group_array_last)
    val df = (1 to 10).toDF("x").coalesce(1)
    assert(df.agg(NicheAggs.groupArrayLast($"x", lit(3)))
      .head.getSeq[Int](0) === Seq(10, 8, 9))
    // fewer rows than the ring: chronological
    val small = (1 to 2).toDF("x").coalesce(1)
    assert(small.agg(NicheAggs.groupArrayLast($"x", lit(3)))
      .head.getSeq[Int](0) === Seq(1, 2))
  }

  test("groupArrayInsertAt fills gaps with defaults and honors length") {
    val df = Seq((0, "a"), (2, "c")).toDF("p", "v").coalesce(1)
    assert(df.agg(NicheAggs.groupArrayInsertAt($"v", $"p", None, None))
      .head.getSeq[String](0) === Seq("a", "", "c"))
    assert(df.agg(NicheAggs.groupArrayInsertAt($"v", $"p",
        Some(lit("-")), Some(lit(5))))
      .head.getSeq[String](0) === Seq("a", "-", "c", "-", "-"))
  }

  test("anova computes the one-way F statistic and p-value") {
    // groups with clearly different means → large F, small p
    val rows = Seq.tabulate(30)(i => (i % 3 * 10.0 + (i % 5) * 0.1, (i % 3).toLong))
    val df = rows.toDF("v", "g")
    val an = udaf(new AnovaAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    val r = df.agg(an($"v", $"g")).head.getStruct(0)
    assert(r.getDouble(0) > 100.0) // F
    assert(r.getDouble(1) < 1e-6) // p
  }

  test("minIfOrDefault / maxIfOrDefault fill the type default on empty") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val row = df.agg(
      CombinatorChain.build("minIfOrDefault", Seq($"x", $"x" > 100)),
      CombinatorChain.build("maxIfOrDefault", Seq($"x", $"x" > 100)),
      CombinatorChain.build("minIfOrNull", Seq($"x", $"x" > 100)),
      CombinatorChain.build("minIf", Seq($"x", $"x" > 2))).head
    assert(row.getDouble(0) === 0.0) // default-filled
    assert(row.getDouble(1) === 0.0)
    assert(row.isNullAt(2)) // -OrNull stays NULL
    assert(row.getDouble(3) === 3.0) // plain -If unaffected
  }
}
