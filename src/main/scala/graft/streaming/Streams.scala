package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming surface (SURVEY §2.9): WindowView tumble/hop windows with
  * watermarks, and materialized-view-style continuous pipelines.
  *
  * Reference: `StorageWindowView`
  * (`/root/reference/src/Storages/WindowView/StorageWindowView.h:39-95`) —
  * `tumble(t, INTERVAL)` / `hop(t, hop, win)` windowed aggregation with
  * STRICTLY_ASCENDING/ASCENDING/BOUNDED watermarks and ALLOWED_LATENESS;
  * `StorageMaterializedView` (`src/Storages/StorageMaterializedView.h:12`)
  * — insert-triggered pipelines into a target table.
  *
  * Spark mapping: `window()` windowed groupBy under Structured Streaming,
  * `withWatermark` (≈ BOUNDED lateness; delay 0 ≈ ASCENDING), and
  * `foreachBatch` for MV fan-out. The same helpers work on batch frames
  * (events replayed from parquet) which is how the oracle queries verify
  * window semantics.
  */
object Streams {

  /** tumble(time, interval): non-overlapping windows.
    * Adds window_start / window_end columns. */
  def tumble(df: DataFrame, timeCol: String, interval: String): DataFrame =
    df.withColumn("__w", window(col(timeCol), interval))
      .withColumn("window_start", col("__w.start"))
      .withColumn("window_end", col("__w.end"))
      .drop("__w")

  /** hop(time, hopInterval, windowInterval): sliding windows — each row
    * lands in windowInterval/hopInterval windows. */
  def hop(df: DataFrame, timeCol: String, hopInterval: String,
      windowInterval: String): DataFrame =
    df.withColumn("__w", window(col(timeCol), windowInterval, hopInterval))
      .withColumn("window_start", col("__w.start"))
      .withColumn("window_end", col("__w.end"))
      .drop("__w")

  /** Streaming tumbling aggregation with a BOUNDED watermark
    * (ref StorageWindowView.h:70-83 WATERMARK ... BOUNDED interval). */
  def tumbleAggregate(
      stream: DataFrame, timeCol: String, interval: String,
      watermarkDelay: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy((window(col(timeCol), interval) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Hopping-window streaming aggregation. */
  def hopAggregate(
      stream: DataFrame, timeCol: String, hopInterval: String,
      windowInterval: String, watermarkDelay: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy((window(col(timeCol), windowInterval, hopInterval) +:
        keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Materialized-view pipeline: transform each micro-batch and fan out to
    * one or more sinks — the Spark shape of CH's insert-trigger MVs
    * (one source insert feeding N materialized views). */
  def materializedView(
      stream: DataFrame,
      transform: DataFrame => DataFrame,
      sinks: Seq[DataFrame => Unit],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val t = transform(batch).persist()
        try sinks.foreach(_(t))
        finally { t.unpersist(); () }
      }
      .start()

  /** WATCH-style live sink: windowed results to an in-memory table
    * (ref StorageLiveView.h:47 / InterpreterWatchQuery.h:28). */
  def watch(df: DataFrame, queryName: String,
      outputMode: String = "update"): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()

  /** Streaming exact dedup for continuous ingest (the streaming twin of
    * the batch exact-dedup pipeline op): keep the first event per key
    * within the watermark horizon, so state is bounded by the lateness
    * window instead of growing forever. ≈ ReplacingMergeTree semantics
    * applied at ingest time (ref ReplacingSortedAlgorithm — here the
    * dedup happens before the sink instead of at merge time).
    *
    * Scale: state is a per-key store partitioned by the dedup columns
    * (one shuffle); the watermark evicts expired keys every microbatch,
    * so steady-state memory is rate × lateness, independent of stream
    * length.
    */
  def dedupStream(df: DataFrame, timeCol: String, lateness: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)
}
