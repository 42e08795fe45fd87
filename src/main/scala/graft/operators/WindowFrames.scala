package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GROUPS window frames (ref `/root/reference/src/Interpreters/
  * WindowDescription.h:29-46` FrameType::GROUPS).
  *
  * Spark has ROWS and RANGE but not GROUPS. The exact emulation: a GROUPS
  * frame of [a PRECEDING, b FOLLOWING] contains every row whose peer-group
  * index is within [cur−a, cur+b] — and `dense_rank()` over the same
  * ordering IS the peer-group index, so a RANGE frame over the dense rank
  * reproduces GROUPS semantics row-for-row. Two windows over the same
  * partition keys → one shuffle + one sort, reused by both.
  */
object WindowFrames {

  /** Attach `out` = `agg` over a GROUPS frame
    * [precedingGroups PRECEDING, followingGroups FOLLOWING] ordered by
    * `orderBy` within `partitionBy`. `agg` receives no argument changes —
    * pass e.g. `sum(col("x"))`. */
  def withGroupsFrame(
      df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
      agg: Column, out: String,
      precedingGroups: Int, followingGroups: Int): DataFrame = {
    val wRank = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val wGroups = Window.partitionBy(partitionBy: _*)
      .orderBy(col("__peer_group"))
      .rangeBetween(-precedingGroups.toLong, followingGroups.toLong)
    df.withColumn("__peer_group", dense_rank().over(wRank))
      .withColumn(out, agg.over(wGroups))
      .drop("__peer_group")
  }
}
