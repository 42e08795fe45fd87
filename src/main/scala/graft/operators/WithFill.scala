package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ORDER BY … WITH FILL [FROM f] [TO t] [STEP s] + INTERPOLATE.
  *
  * Reference: `FillingTransform`
  * (`/root/reference/src/Processors/Transforms/FillingTransform.h:16`,
  * `src/Parsers/ASTSelectQuery.h:35`): after sorting, missing values of the
  * order-by column are materialized on a [from, to) grid with step, other
  * columns default/interpolated.
  *
  * Spark-first: generate the grid with `sequence()` (distributed via
  * explode of per-range chunks), LEFT JOIN the data onto it, and express
  * INTERPOLATE as a window `last(_, ignoreNulls)` carry-forward. The grid
  * side is tiny relative to data ((to-from)/step rows) and joins on the
  * fill key — broadcastable when small, shuffle-joinable when not.
  */
object WithFill {

  /** Fill a numeric (long) key column onto the grid [from, to] step `step`.
    * Data columns absent at a grid point become NULL (then optionally
    * carried forward). */
  def fillLong(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      from: Long,
      to: Long,
      step: Long = 1L,
      carryForward: Seq[String] = Nil): DataFrame = {
    val grid = spark.range(from, to + 1, step).toDF(keyCol)
    val joined = grid.join(df, Seq(keyCol), "left")
    interpolate(joined, keyCol, carryForward)
  }

  /** Fill a date/timestamp key onto a day-step grid [from, to]. */
  def fillDays(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      fromDate: String,
      toDate: String,
      carryForward: Seq[String] = Nil): DataFrame = {
    val grid = spark.sql(
      s"SELECT explode(sequence(DATE '$fromDate', DATE '$toDate', INTERVAL 1 DAY)) AS $keyCol")
      .select(col(keyCol).cast("timestamp").as(keyCol))
    val joined = grid.join(df, Seq(keyCol), "left")
    interpolate(joined, keyCol, carryForward)
  }

  /** INTERPOLATE (col AS last-seen): carry the previous non-null value
    * forward along the fill order. */
  private def interpolate(df: DataFrame, keyCol: String, cols: Seq[String]): DataFrame = {
    if (cols.isEmpty) df
    else {
      val w = Window.orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    }
  }
}
