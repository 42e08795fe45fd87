package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** One verifiable query: a Spark runner plus (optionally) equivalent ANSI
  * SQL for the DuckDB oracle. Mirrors the reference's paired
  * `NNNNN_name.sql` / `.reference` golden tests
  * (`/root/reference/tests/queries/0_stateless/`) — here the "golden" side
  * is DuckDB executing the oracle SQL over the same parquet.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    // oracle text resolved at DUMP time (after the query ran) — for
    // oracles parameterized by bounded engine-computed state, e.g. the
    // PQ ADC shortlist whose deterministic refine DuckDB recomputes
    oracleDyn: Option[() => Option[String]] = None)

object Q {
  /** Query expressed in SQL that is valid in BOTH Spark SQL and DuckDB —
    * one string serves as implementation and oracle. */
  def sql(name: String, query: String): Q =
    Q(name, (s, dir) => { Tables.register(s, dir); s.sql(query) }, Some(query))

  /** Same query, but dialects differ: Spark SQL vs DuckDB SQL. */
  def sql2(name: String, sparkSql: String, duckSql: String): Q =
    Q(name, (s, dir) => { Tables.register(s, dir); s.sql(sparkSql) }, Some(duckSql))

  /** DataFrame-API implementation with a DuckDB oracle. */
  def df(name: String, duckSql: String)(f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, Some(duckSql))

  /** DataFrame-API implementation with no SQL-expressible oracle
    * (driver records a weaker rows-only check; a ScalaTest spec covers
    * semantics instead). */
  def dfOnly(name: String)(f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, None)

  /** DataFrame-API implementation whose oracle SQL is built AFTER the
    * query ran (Verify dumps oracle_sql.json last), from bounded state
    * the run recorded; None when the query did not run this session. */
  def dfDynOracle(name: String)(oracle: () => Option[String])(
      f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, None, Some(oracle))

  def toMaps(qs: Seq[Q]): (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val runs = qs.map(q => q.name -> q.run).toMap
    val oracles = qs.flatMap(q =>
      q.oracleDyn.flatMap(_()).orElse(q.oracle).map(q.name -> _)).toMap
    (runs, oracles)
  }
}
