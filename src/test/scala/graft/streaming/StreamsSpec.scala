package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumble aggregation with watermark drops late data") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.tumbleAggregate(
      input.toDF.toDF("ts", "k", "v"),
      "ts", "10 minutes", "5 minutes", Seq("k"),
      Seq(count(lit(1)).as("n"), sum($"v").as("total")))
    val q = agg.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:04:00"), "a", 2.0),
        (ts("2024-01-01 00:11:00"), "a", 5.0))
      q.processAllAvailable()
      // advance watermark far: closes earlier windows
      input.addData((ts("2024-01-01 01:00:00"), "a", 9.0))
      q.processAllAvailable()
      // late row for the already-closed 00:00 window — must be dropped
      input.addData((ts("2024-01-01 00:02:00"), "a", 100.0))
      input.addData((ts("2024-01-01 02:00:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumble_out")
        .select($"window_start".cast("string"), $"n", $"total")
        .as[(String, Long, Double)].collect().toMap2
      assert(rows(("2024-01-01 00:00:00")) == (2L, 3.0)) // late 100.0 dropped
      assert(rows(("2024-01-01 00:10:00")) == (1L, 5.0))
    } finally q.stop()
  }

  implicit class M(rows: Array[(String, Long, Double)]) {
    def toMap2: Map[String, (Long, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("streaming exact dedup keeps the first event per key within " +
      "the watermark horizon") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val deduped = Streams.dedupStream(
      input.toDF.toDF("ts", "k", "v"), "ts", "10 minutes", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:02:00"), "a", 2.0), // dup within horizon
        (ts("2024-01-01 00:03:00"), "b", 3.0))
      q.processAllAvailable()
      // push the watermark past the horizon, then re-emit key a: the
      // state for a expired, so this one is a NEW first occurrence
      input.addData((ts("2024-01-01 01:00:00"), "c", 4.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 01:01:00"), "a", 5.0))
      q.processAllAvailable()
      val vs = spark.table("dedup_out").select($"k", $"v")
        .as[(String, Double)].collect().toSeq.sorted
      assert(vs == Seq(("a", 1.0), ("a", 5.0), ("b", 3.0), ("c", 4.0)))
    } finally q.stop()
  }

  test("file-stream e2e: readStream → tumble agg → foreachBatch sink, " +
      "late rows watermark-dropped") {
    // Kafka-shaped pipeline with a real (non-Memory) source: files arrive
    // while the query runs (processAllAvailable between arrivals pins the
    // batch boundaries), the watermark advances between batches, and a
    // row landing in an already-closed window is dropped — the driver
    // contract of WATERMARK ... BOUNDED (ref StorageWindowView.h:70-83).
    val dir = java.nio.file.Files.createTempDirectory("graft_fstream").toFile
    val srcDir = new java.io.File(dir, "in"); srcDir.mkdirs()
    val outPath = new java.io.File(dir, "out").getAbsolutePath
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(new java.io.File(srcDir, name).toPath,
        lines.mkString("\n").getBytes)
    writeFile("batch0.json", Seq(
      """{"ts":"2024-01-01 00:01:00","k":"a","v":1.0}""",
      """{"ts":"2024-01-01 00:04:00","k":"a","v":2.0}""",
      """{"ts":"2024-01-01 00:11:00","k":"a","v":5.0}"""))
    val stream = spark.readStream
      .schema("ts timestamp, k string, v double")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .json(srcDir.getAbsolutePath)
    val agg = Streams.tumbleAggregate(stream, "ts", "10 minutes",
      "5 minutes", Seq("k"),
      Seq(count(lit(1)).as("n"), sum($"v").as("total")))
    val q = agg.writeStream
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outPath))
      .outputMode("append")
      .option("checkpointLocation", new java.io.File(dir, "ck").getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      // watermark-advancing arrival (01:00 → watermark 00:55 closes the
      // 00:00 and 00:10 windows)
      writeFile("batch1.json", Seq(
        """{"ts":"2024-01-01 01:00:00","k":"a","v":9.0}"""))
      q.processAllAvailable()
      // late arrival for the closed 00:00 window — must be dropped
      writeFile("batch2.json", Seq(
        """{"ts":"2024-01-01 00:02:00","k":"a","v":100.0}""",
        """{"ts":"2024-01-01 02:00:00","k":"a","v":1.0}"""))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(outPath)
      .select($"window_start".cast("string"), $"n", $"total")
      .as[(String, Long, Double)].collect().toMap2
    assert(rows("2024-01-01 00:00:00") == (2L, 3.0)) // late 100.0 absent
    assert(rows("2024-01-01 00:10:00") == (1L, 5.0))
  }

  test("hop windows assign each row to window/hop slots") {
    val df = Seq((ts("2024-01-01 00:07:00"), 1.0)).toDF("ts", "v")
    val hopped = Streams.hop(df, "ts", "5 minutes", "10 minutes")
      .select($"window_start".cast("string")).as[String].collect().sorted
    assert(hopped.toSeq == Seq("2024-01-01 00:00:00", "2024-01-01 00:05:00"))
  }

  test("batch tumble matches a DuckDB-style time_bucket") {
    val df = Seq(
      (ts("2024-01-01 00:01:00"), 1.0), (ts("2024-01-01 00:14:00"), 2.0),
      (ts("2024-01-01 00:16:00"), 4.0)).toDF("ts", "v")
    val got = Streams.tumble(df, "ts", "15 minutes")
      .groupBy("window_start").agg(sum($"v").as("s"))
      .select($"window_start".cast("string"), $"s")
      .as[(String, Double)].collect().toMap
    assert(got == Map("2024-01-01 00:00:00" -> 3.0, "2024-01-01 00:15:00" -> 4.0))
  }

  test("materializedView fans one batch out to multiple sinks") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    var sink1 = 0L; var sink2 = 0.0
    val q = Streams.materializedView(
      input.toDF.toDF("id", "v"),
      batch => batch.filter($"v" > 0),
      Seq(
        b => sink1 = b.count(),
        b => sink2 = b.agg(sum($"v")).collect()(0).getDouble(0)),
      checkpoint = dir)
    input.addData((1L, 1.5), (2L, -1.0), (3L, 2.5))
    try { q.processAllAvailable() } finally q.stop()
    assert(sink1 == 2L && sink2 == 4.0)
  }
}
