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
    interpolate(joined, keyCol, carryForward, chunkSize = 8192L * step)
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
    // key is cast to epoch seconds for chunking; one chunk = 8192 days
    interpolate(joined, keyCol, carryForward, chunkSize = 8192L * 86400L)
  }

  /** INTERPOLATE (col AS last-seen): carry the previous non-null value
    * forward along the fill order.
    *
    * Scale-safe two-pass formulation (a single global `Window.orderBy`
    * would collapse the whole grid into one task):
    *  1. chunk the key range (`chunkSize` grid points per chunk) and
    *     carry-forward inside each chunk with a partitioned window;
    *  2. reduce each chunk to its last non-null value (one tiny row per
    *     chunk), prefix-scan those carry-outs across chunks — the scan is a
    *     window over the chunk-summary frame, which is grid/chunkSize rows,
    *     bounded and broadcast-size by construction — and broadcast-join
    *     each chunk's carry-in back; a row's value is
    *     coalesce(local carry, chunk carry-in).
    */
  private[operators] def interpolate(
      df: DataFrame, keyCol: String, cols: Seq[String],
      chunkSize: Long = 8192L): DataFrame = {
    if (cols.isEmpty) df
    else {
      val chunked = df.withColumn("__chunk",
        floor(col(keyCol).cast("long") / chunkSize))
      val wLocal = Window.partitionBy(col("__chunk")).orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val localized = cols.foldLeft(chunked)((d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(wLocal)))
      // Per-chunk carry-out: value at the max key where the column is
      // non-null (struct max orders by key first). Null if the chunk has
      // no non-null value — the prefix scan skips it with ignoreNulls.
      val summaryAggs = cols.map(c =>
        max(when(col(c).isNotNull, struct(col(keyCol).as("k"), col(c).as("v"))))
          .as(s"__out_$c"))
      val summaries = chunked.groupBy(col("__chunk"))
        .agg(summaryAggs.head, summaryAggs.tail: _*)
      val wPrev = Window.orderBy(col("__chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carryIns = cols.foldLeft(summaries)((d, c) =>
        d.withColumn(s"__in_$c",
          last(col(s"__out_$c"), ignoreNulls = true).over(wPrev)("v")))
        .select(col("__chunk") +: cols.map(c => col(s"__in_$c")): _*)
      val joined = localized.join(broadcast(carryIns), Seq("__chunk"), "left")
      cols.foldLeft(joined)((d, c) =>
          d.withColumn(c, coalesce(col(c), col(s"__in_$c"))))
        .select(df.columns.map(col): _*)
    }
  }
}
