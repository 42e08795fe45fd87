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

  // Per-(session, dir, table) plan cache: a DataFrame is an immutable
  // logical plan, so reuse skips repeated footer/schema inference — load()
  // is called from every query builder, often several times per query.
  private val loadCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = loadCache.synchronized {
      var m = loadCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        loadCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, name), loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture generations have shipped events.ts both as parquet
    // TIMESTAMP(NANOS) (read as int64 under nanosAsLong; Spark has no nanos
    // timestamp) and as plain timestamp[us]. Branch on the type the read
    // actually yields instead of assuming one layout — a schema drift must
    // not take down every events-touching query (round-6 post-mortem).
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df =
      try spark.read.parquet(s"$dir/$name.parquet")
      finally prevNanos match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    if (name != "events") df
    else df.schema("ts").dataType match {
      // TIMESTAMP(NANOS) read as int64 under nanosAsLong: truncate to µs
      // (fixture sub-µs components are zero, so lossless)
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      // plain timestamp[us] arrives as TIMESTAMP_NTZ: normalize to the
      // session-LTZ timestamp type (UTC session ⇒ identical wall clock)
      // so unix_micros()/date_trunc() consumers see one type either way
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Expected column-name sets per table (TESTDATA.md). Used by the
    * registration guard to turn a silent fixture drift into a named error.
    */
  private val expectedCols: Map[String, Set[String]] = Map(
    "events" -> Set("event_id", "user_id", "event_type", "ts", "value", "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  /** Fail fast with a named diff if a fixture's schema drifted from the
    * TESTDATA.md contract — an analyzer backtrace 30 frames deep is not an
    * acceptable report for "the driver regenerated the parquet".
    */
  def validateSchema(name: String, df: DataFrame): Unit =
    expectedCols.get(name).foreach { want =>
      val got = df.schema.fieldNames.toSet
      if (got != want) {
        val missing = want -- got
        val extra = got -- want
        throw new IllegalStateException(
          s"fixture schema drift in table '$name': " +
            (if (missing.nonEmpty) s"missing columns ${missing.toSeq.sorted.mkString(", ")}; " else "") +
            (if (extra.nonEmpty) s"unexpected columns ${extra.toSeq.sorted.mkString(", ")}; " else "") +
            s"expected [${want.toSeq.sorted.mkString(", ")}]")
      }
    }

  // re-registering all ten views re-reads parquet footers; skip when the
  // same (session, dir) pair is already in place
  private val registeredDirs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all fixture tables as temp views (idempotent, lazy).
    *
    * Per-table fault isolation: one bad fixture must not block the other
    * nine views (round 6 lost 8 unrelated correctness rows to a single
    * failing table in this loop).
    */
  def register(spark: SparkSession, dir: String): Unit = {
    val fresh = registeredDirs.put(spark, dir) != dir
    names.foreach { n =>
      // re-create views a test dropped (golden files DROP TABLE names
      // that collide with fixtures, e.g. 02421 drops `customer`)
      if (fresh || !spark.catalog.tableExists(n))
        try {
          val df = load(spark, dir, n)
          validateSchema(n, df)
          df.createOrReplaceTempView(n)
        } catch {
          case e: Throwable =>
            System.err.println(s"[tables] failed to register '$n': ${e.getMessage}")
        }
    }
  }
}
