package graft.golden

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** `system.query_cache` stand-in (ref src/Interpreters/Cache/
  * QueryCache.h, tests 02494_query_cache_*): SELECT statements running
  * with `use_query_cache = 1` store one entry per normalized query
  * text; later identical queries hit it. The golden harness models the
  * eligibility rules the tests pin: SELECT-only, no system tables, no
  * nondeterministic functions (unless the store setting allows),
  * min_query_runs / min_query_duration gates, read/write enable
  * switches, TTL staleness (against a VIRTUAL clock advanced by the
  * no-op sleep() calls), and secret hiding in the stored text. */
object QueryCache {

  @volatile var enabled: Boolean = false

  final case class Entry(query: String, var expiresAtMs: Long)

  private val entries =
    new java.util.LinkedHashMap[String, Entry]()
  private val runCounts =
    scala.collection.mutable.Map.empty[String, Int]
  /** sleep() executes as a no-op — staleness advances on this. */
  private var virtualMs: Long = 0L

  def reset(): Unit = synchronized {
    entries.clear(); runCounts.clear(); virtualMs = 0L
  }

  def clear(): Unit = synchronized {
    // the reference's run counters live in the cache itself — DROP
    // resets them too (02494_query_cache_min_query_runs)
    entries.clear(); runCounts.clear()
  }

  private def now(): Long = System.currentTimeMillis() + virtualMs

  /** Trailing top-level SETTINGS assignments of a statement. */
  private def inlineSettings(q: String): Map[String, String] =
    "(?is)\\bSETTINGS\\s+(.*)$".r.findFirstMatchIn(
      q.trim.stripSuffix(";")).map { m =>
      graft.ChSql.splitTopLevelCommas(m.group(1)).flatMap { asn =>
        asn.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase ->
            v.trim.stripPrefix("'").stripSuffix("'"))
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)

  /** Cache key: statement minus its SETTINGS tail, lowercased outside
    * string literals, whitespace collapsed (the reference hashes the
    * normalized AST — keyword case and cache-control settings don't
    * participate). */
  private def keyOf(q0: String): String = {
    val q = q0.trim.stripSuffix(";")
      .replaceAll("(?is)\\bSETTINGS\\s+[^;]*$", "")
      .replaceAll("\\s+", " ").trim
    val sb = new java.lang.StringBuilder
    var inS = false; var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (inS) { sb.append(c)
        if (c == '\\' && i + 1 < q.length) { sb.append(q.charAt(i + 1)); i += 1 }
        else if (c == '\'') inS = false
      } else if (c == '\'') { sb.append(c); inS = true }
      else sb.append(c.toLower)
      i += 1
    }
    sb.toString
  }

  private val nondet = Seq("rand", "rand64", "randconstant",
    "randcanonical", "now", "now64", "today", "yesterday",
    "generateuuidv4", "uuid", "randomstring", "randomprintableascii")
  private def isNondeterministic(q: String): Boolean = {
    val l = q.toLowerCase
    nondet.exists(f => s"(?s).*\\b$f\\s*\\(.*".r.matches(l))
  }

  private val secretRe =
    "(?is)\\b(encrypt|decrypt|aes_encrypt_mysql|aes_decrypt_mysql|" +
      "tryDecrypt)\\s*\\(\\s*('[^']*')\\s*,[^)]*\\)"

  /** The stored query text — secret function arguments and any
    * settings hide (02494_query_cache_secrets pins the exact shape). */
  private def storedText(q0: String): String = {
    val q = q0.trim.stripSuffix(";")
    if (!q.matches("(?is).*" + secretRe + ".*")) q
    else q.replaceAll(secretRe, "$1($2, '[HIDDEN]')")
      .replaceAll("(?is)\\bSETTINGS\\s+[^;]*$", "SETTINGS ")
  }

  /** Observe one successfully executed statement. Returns the
    * (QueryCacheHits, QueryCacheMisses) profile counts when the query
    * participated in the cache. */
  def onStatement(clean: String,
      session: collection.Map[String, String],
      durationMs: Long): Option[(Long, Long)] = synchronized {
    if (!enabled) return None
    // the no-op sleep advances the staleness clock
    "(?i)^SELECT\\s+sleep\\s*\\(\\s*(\\d+(?:\\.\\d+)?)\\s*\\)".r
      .findFirstMatchIn(clean.trim).foreach { m =>
        virtualMs += (m.group(1).toDouble * 1000).toLong
      }
    val inline = inlineSettings(clean)
    def setting(name: String): Option[String] =
      inline.get(name).orElse(session.get(name)
        .map(_.trim.stripPrefix("'").stripSuffix("'")))
    def boolSetting(name: String, default: Boolean): Boolean =
      setting(name).map(v => v == "1" || v.equalsIgnoreCase("true"))
        .getOrElse(default)
    if (!boolSetting("use_query_cache", default = false)) return None
    if (!clean.trim.matches("(?is)^SELECT\\b.*")) return None
    // system-table reads are never cached (their results would lie)
    if (clean.matches("(?is).*\\bsystem\\s*\\.\\s*\\w+.*")) return None
    val key = keyOf(clean)
    val runs = runCounts.getOrElse(key, 0) + 1
    runCounts(key) = runs
    val e = Option(entries.get(key))
    val stale = e.exists(_.expiresAtMs <= now())
    val readsOn = boolSetting("enable_reads_from_query_cache",
      default = true)
    if (e.isDefined && !stale && readsOn) return Some((1L, 0L))
    // miss: maybe write
    val writesOn = boolSetting("enable_writes_to_query_cache",
      default = true)
    val minRuns = setting("query_cache_min_query_runs")
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(0L)
    val minDur = setting("query_cache_min_query_duration")
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(0L)
    val storeNondet = boolSetting(
      "query_cache_store_results_of_queries_with_nondeterministic_functions",
      default = false)
    val ttlSec = setting("query_cache_ttl")
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(60L)
    val write = writesOn && runs > minRuns && minDur <= 0 &&
      (storeNondet || !isNondeterministic(clean))
    if (write)
      entries.put(key, Entry(storedText(clean), now() + ttlSec * 1000))
    Some((0L, 1L))
  }

  private val schema = StructType(Seq(
    StructField("query", StringType, nullable = false),
    StructField("result_size", LongType, nullable = false),
    StructField("stale", IntegerType, nullable = false),
    StructField("shared", IntegerType, nullable = false),
    StructField("compressed", IntegerType, nullable = false),
    StructField("expires_at", TimestampType, nullable = false),
    StructField("key_hash", LongType, nullable = false)))

  def register(spark: SparkSession): Unit = synchronized {
    import scala.jdk.CollectionConverters._
    val t = now()
    val rows = entries.values().asScala.toSeq.map { e =>
      Row(e.query, 16L, if (e.expiresAtMs <= t) 1 else 0, 0, 1,
        new java.sql.Timestamp(e.expiresAtMs),
        e.query.hashCode.toLong & 0x7fffffffL)
    }
    spark.createDataFrame(rows.asJava, schema)
      .createOrReplaceTempView("graft_system_query_cache")
  }
}
