package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF JOIN — for each left row, the single right row with the nearest
  * ordering-key value satisfying the inequality, per equi-key group.
  *
  * Reference semantics: `JoinStrictness::Asof` with `ASOFJoinInequality`
  * {<, <=, >, >=} (`/root/reference/src/Core/Joins.h:39-63`), matched via a
  * per-key sorted lookup (`src/Interpreters/RowRefs.h:167`).
  *
  * Spark has no ASOF primitive. This implements it with the union+window
  * technique, which scales to any data size with exactly ONE shuffle
  * (hash-partition by the equi-key) and a per-partition sort — no range
  * explosion, no broadcast requirement, no skew beyond what the key itself
  * has. At 100 TB this is the plan you want: it is the same shuffle a
  * shuffled-hash join would do, plus a sort Spark spills lazily.
  *
  * Mechanics: tag rows (right=0, left=1), union on (key, t, tag, payload),
  * then `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY t, tag
  * ROWS UNBOUNDED PRECEDING..CURRENT)` — each left row picks up the most
  * recent right payload at or before it. Strict (<, >) flips the tag order
  * so an equal-timestamp right row is not visible; forward directions flip
  * the sort direction.
  */
object AsofJoin {

  /** @param inequality one of ">=", ">", "<=", "<" — the condition
    *   `left.time (ineq) right.time` that a matched right row satisfies;
    *   among satisfying rows the one closest to left.time wins.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      inequality: String = ">=",
      joinType: String = "left"): DataFrame = {
    require(Seq(">=", ">", "<=", "<").contains(inequality), s"bad inequality $inequality")
    val backward = inequality == ">=" || inequality == ">"   // match right at/before left
    val strict = inequality == ">" || inequality == "<"

    val rightPayload = right.columns.filterNot(c => on.contains(c))
    // Right rows carry payload; left rows carry their full row + null payload.
    val payload = struct(rightPayload.map(col): _*)
    val leftCols = left.columns.filterNot(on.contains)

    // Left/right time columns must be union-compatible (both timestamps or
    // both of one numeric type); the natural type is kept so timestamp
    // precision is not degraded.
    val rTagged = right.select(
      on.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__tag"),
        payload.as("__rv")) ++ leftCols.map(c => lit(null).as(s"__l_$c")): _*)
    val lTagged = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__tag"),
        lit(null).cast(rTagged.schema("__rv").dataType).as("__rv")) ++
        leftCols.map(c => col(c).as(s"__l_$c")): _*)

    resolve(rTagged.unionByName(lTagged), on, leftCols.toSeq,
      rightPayload.toSeq, backward, strict, joinType)
  }

  /** ASOF self-join: both sides are DISJOINT filters over the same source.
    * `join(source.filter(l)…, source.filter(r)…)` cannot share the scan —
    * Spark plans are trees, so the Union's two branches each re-read the
    * source — whereas here each row projects straight to its side's tagged
    * shape in ONE pass (left shape if `leftFilter`, right if
    * `rightFilter`), halving the scan. Same window mechanics, identical
    * row multiset, identical results.
    *
    * `leftSelect` / `rightSelect` are the (name -> expr) projections you
    * would have applied per side before `join()`; both must contain every
    * `on` name. The caller guarantees the filters are disjoint (a row
    * matching both would contribute one row per side in `join()`, but only
    * a left-shaped row here).
    */
  def selfJoin(
      source: DataFrame,
      leftFilter: Column,
      rightFilter: Column,
      leftSelect: Seq[(String, Column)],
      rightSelect: Seq[(String, Column)],
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      inequality: String = ">=",
      joinType: String = "left"): DataFrame = {
    require(Seq(">=", ">", "<=", "<").contains(inequality), s"bad inequality $inequality")
    val backward = inequality == ">=" || inequality == ">"
    val strict = inequality == ">" || inequality == "<"
    val lmap = leftSelect.toMap
    val rmap = rightSelect.toMap
    val rightPayload = rightSelect.map(_._1).filterNot(on.contains)
    val leftCols = leftSelect.map(_._1).filterNot(on.contains)

    val tagged = source.filter(leftFilter || rightFilter).select(
      on.map(n => when(leftFilter, lmap(n)).otherwise(rmap(n)).as(n)) ++ Seq(
        when(leftFilter, lmap(leftTime)).otherwise(rmap(rightTime)).as("__t"),
        when(leftFilter, lit(1)).otherwise(lit(0)).as("__tag"),
        when(rightFilter,
          struct(rightPayload.map(n => rmap(n).as(n)): _*)).as("__rv")) ++
        leftCols.map(c => when(leftFilter, lmap(c)).as(s"__l_$c")): _*)
    resolve(tagged, on, leftCols, rightPayload, backward, strict, joinType)
  }

  /** Shared core: tagged rows → per-key window carry-forward → left rows
    * with their matched right payload. */
  private def resolve(
      tagged: DataFrame,
      on: Seq[String],
      leftCols: Seq[String],
      rightPayload: Seq[String],
      backward: Boolean,
      strict: Boolean,
      joinType: String): DataFrame = {
    // Equal-time visibility: inclusive → right(0) sorts before left(1) so
    // last() sees it; strict → right sorts after left and is excluded.
    val tagOrder: Column = if (strict) col("__tag").desc else col("__tag").asc
    val tOrder: Column = if (backward) col("__t").asc else col("__t").desc
    val w = Window.partitionBy(on.map(col): _*).orderBy(tOrder, tagOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = tagged
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val filtered =
      if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    filtered.select(
      on.map(col) ++
        leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map(c => col("__m").getField(c).as(c)): _*)
  }
}
