package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's table surface (`/root/reference/src/Storages/` —
  * `IStorage` implementations addressed by name) at the API level: a query
  * addresses named datasets; here each name is a parquet-backed temp view.
  * Scans stay fully declarative (`spark.read.parquet`) so Catalyst gets
  * predicate pushdown, column pruning and partition pruning for free — the
  * Spark analog of MergeTree granule skipping + PREWHERE
  * (`src/Storages/MergeTree/MergeTreeDataSelectExecutor.h:21`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS); Spark has no nanos timestamp —
    // read as long and truncate to µs (fixture sub-µs components are zero,
    // so this is lossless; cf. SURVEY §1.2 DateTime64 p>6 truncation note).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  // re-registering all ten views re-reads parquet footers; skip when the
  // same (session, dir) pair is already in place
  private val registeredDirs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all fixture tables as temp views (idempotent, lazy). */
  def register(spark: SparkSession, dir: String): Unit =
    if (registeredDirs.put(spark, dir) != dir)
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
