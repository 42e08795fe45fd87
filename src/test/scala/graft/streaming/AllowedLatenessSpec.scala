package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** Pins the EXACT divergence boundary between Spark's update-mode
  * windowed aggregation (this engine's ALLOWED_LATENESS approximation)
  * and the reference's WindowView lateness contract (ref
  * src/Storages/WindowView/StorageWindowView.h:88-101):
  *
  *   reference: fires a window ONCE at its end (watermark crossing),
  *   then AGAIN immediately for each late event inside
  *   ALLOWED_LATENESS — "multiple outputs for the same window. Users
  *   need to take these duplicated results into account."
  *
  *   Spark update mode: emits the window's UPDATED cumulative value in
  *   every microbatch where it changed — including BEFORE the window
  *   ends (the reference is silent there), and does NOT emit an
  *   unchanged window at its end (the reference fires exactly there).
  *
  * Where the two AGREE: the late-event re-fire itself (same cumulative
  * value, same batch) and the drop of events later than the lateness
  * horizon. The divergence is therefore confined to fire TIMING on
  * in-horizon data, never to the values fired: every Spark fire carries
  * the correct cumulative aggregate at that point, and the FINAL value
  * per window equals the reference's last fire. */
class AllowedLatenessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("update-mode fires vs WindowView lateness contract: the " +
      "divergence is pre-close partial fires, not values") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    // tumble 10 min, lateness horizon 5 min (ALLOWED_LATENESS analog)
    val agg = input.toDF.toDF("ts", "k", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".cast("string").as("w"), $"k", $"n")
    val fires = ArrayBuffer.empty[(Long, String, Long)] // (batch, w, n)
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.collect().foreach(r =>
          fires.synchronized {
            fires += ((id, r.getString(0), r.getLong(2))) })
      }.start()
    try {
      // batch: two rows inside window W=[00:00,00:10)
      input.addData((ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:04:00"), "a", 2.0))
      q.processAllAvailable()
      // batch: one more row in W (watermark still below W's end)
      input.addData((ts("2024-01-01 00:07:00"), "a", 3.0))
      q.processAllAvailable()
      // batch: advance event time past W end but NOT past end+lateness
      // (watermark = 00:12 - 5min = 00:07 < 00:10: W still open to lates)
      input.addData((ts("2024-01-01 00:12:00"), "a", 4.0))
      q.processAllAvailable()
      // batch: LATE row for W, inside the lateness horizon → re-fire
      input.addData((ts("2024-01-01 00:06:00"), "a", 5.0))
      q.processAllAvailable()
      // batch: advance the watermark past W end + lateness, closing W
      // (watermark = 01:00 - 5min = 00:55 > 00:10)
      input.addData((ts("2024-01-01 01:00:00"), "a", 6.0))
      q.processAllAvailable()
      // batch: late row BEYOND the horizon → dropped by BOTH systems
      input.addData((ts("2024-01-01 00:08:00"), "a", 7.0))
      q.processAllAvailable()

      val w = "2024-01-01 00:00:00"
      val wFires = fires.synchronized {
        fires.filter(_._2 == w).map(f => (f._1, f._3)).toList }
      val values = wFires.map(_._2)
      // DIVERGENCE (documented): Spark fires W's partials BEFORE the
      // window end — n=2 then n=3 — where the reference is silent until
      // the end-of-window fire. Each fire still carries the correct
      // cumulative count at that moment.
      assert(values.take(2) == List(2L, 3L),
        s"expected pre-close partial fires 2,3; got $values")
      // AGREEMENT: the late in-horizon row re-fires W with the updated
      // cumulative value (n=4), exactly the reference's immediate
      // late-event fire (multiple outputs for the same window).
      assert(values.last == 4L,
        s"late in-horizon row must re-fire with cumulative 4; got $values")
      // AGREEMENT: the final fired value per window equals the
      // reference's last fire for W (3 on-time rows + 1 late = 4); the
      // beyond-horizon late row (7.0) produced NO fire in either system.
      assert(values.max == 4L && wFires.size == 3,
        s"beyond-horizon late row must be dropped; fires: $wFires")
    } finally q.stop()
  }
}
