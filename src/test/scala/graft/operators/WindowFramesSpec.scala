package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowFramesSpec extends SparkSpec {
  import spark.implicits._

  test("GROUPS frame includes whole peer groups, not rows") {
    // keys 1,1,2,3 — the two k=1 rows are ONE group
    val df = Seq((1, 1, 10.0), (1, 1, 20.0), (1, 2, 30.0), (1, 3, 40.0))
      .toDF("p", "k", "v")
    val got = WindowFrames.withGroupsFrame(df,
        Seq($"p"), Seq($"k"), sum($"v"), "s",
        precedingGroups = 1, followingGroups = 1)
      .select($"k", $"v", $"s").as[(Int, Double, Double)].collect()
      .map { case (k, v, s) => (k, v) -> s }.toMap
    assert(got((1, 10.0)) == 60.0) // groups {1},{2}
    assert(got((1, 20.0)) == 60.0) // both peers see the same frame
    assert(got((2, 30.0)) == 100.0) // all three groups
    assert(got((3, 40.0)) == 70.0) // groups {2},{3}
  }

  test("GROUPS 0 PRECEDING AND 0 FOLLOWING = peer-group total") {
    val df = Seq((1, 1, 1.0), (1, 1, 2.0), (1, 2, 4.0)).toDF("p", "k", "v")
    val got = WindowFrames.withGroupsFrame(df,
        Seq($"p"), Seq($"k"), sum($"v"), "s", 0, 0)
      .select($"k", $"s").as[(Int, Double)].collect().toSet
    assert(got == Set((1, 3.0), (2, 4.0)))
  }
}
