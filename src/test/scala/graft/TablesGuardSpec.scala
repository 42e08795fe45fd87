package graft

import org.apache.spark.sql.functions._

/** Fixture-schema guard (round-6 post-mortem): a driver-side parquet
  * regeneration must fail with a NAMED diff, not an analyzer backtrace.
  */
class TablesGuardSpec extends SparkSpec {

  test("validateSchema names the table and the drifted columns") {
    val df = Tables.load(spark, SparkSpec.tiny, "events")
      .withColumnRenamed("props", "properties")
    val e = intercept[IllegalStateException] {
      Tables.validateSchema("events", df)
    }
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("missing columns props"))
    assert(e.getMessage.contains("unexpected columns properties"))
  }

  test("conforming fixtures pass the guard") {
    for (n <- Seq("events", "documents", "embeddings"))
      Tables.validateSchema(n, Tables.load(spark, SparkSpec.tiny, n))
  }

  test("events.ts always lands on the session timestamp type") {
    // both fixture generations (nanos-as-long, timestamp[us]) normalize
    val dt = Tables.load(spark, SparkSpec.tiny, "events").schema("ts").dataType
    assert(dt === org.apache.spark.sql.types.TimestampType)
    // and unix_micros works — the exact analysis failure of round 6
    Tables.load(spark, SparkSpec.tiny, "events")
      .select(unix_micros(col("ts"))).limit(1).collect()
  }
}
