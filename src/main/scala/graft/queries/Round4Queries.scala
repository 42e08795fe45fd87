package graft.queries

import org.apache.spark.sql.functions._
import graft.{ChSql, Tables}
import graft.operators.GraphiteRollup

/** Round-4 additions: moment aggregates (skew/kurt), the encryption
  * surface, GraphiteMergeTree-style retention rollup, vector norm family
  * over the embeddings table, and the SQL-registered sumMap shape.
  */
object Round4Queries {

  def all: Seq[Q] = Seq(

    // skewPop/skewSamp/kurtPop/kurtSamp (ref
    // AggregateFunctionsStatisticsSimple.h) — runs through ChSql so the
    // SQL-registered CH names are what's exercised; the oracle computes
    // the same statistics from raw power sums in DuckDB
    Q.df("q_skew_kurt",
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         avg(l_quantity) AS m1,
        |         avg(l_quantity * l_quantity) AS m2,
        |         avg(pow(l_quantity, 3)) AS m3,
        |         avg(pow(l_quantity, 4)) AS m4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((m3 - 3*m1*m2 + 2*pow(m1,3)) / pow(m2 - m1*m1, 1.5), 6)
        |    AS skew_pop,
        |  round(((m3 - 3*m1*m2 + 2*pow(m1,3)) * n/(n-1))
        |        / pow((m2 - m1*m1) * n/(n-1), 1.5), 6) AS skew_samp,
        |  round((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*pow(m1,4))
        |        / pow(m2 - m1*m1, 2), 6) AS kurt_pop,
        |  round(((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*pow(m1,4)) * n/(n-1))
        |        / pow((m2 - m1*m1) * n/(n-1), 2), 6) AS kurt_samp
        |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT l_returnflag,
          |       round(skewPop(l_quantity), 6) AS skew_pop,
          |       round(skewSamp(l_quantity), 6) AS skew_samp,
          |       round(kurtPop(l_quantity), 6) AS kurt_pop,
          |       round(kurtSamp(l_quantity), 6) AS kurt_samp
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin, dir)
    },

    // encrypt/decrypt round trip (ref FunctionsAES.h) — the oracle is the
    // plaintext identity, which is exactly what a correct
    // decrypt(encrypt(x)) must produce
    Q.df("q_encrypt_roundtrip",
      """SELECT c_custkey, c_name AS plain FROM customer
        |ORDER BY c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT c_custkey,
          |       CAST(decrypt('aes-128-ecb',
          |              encrypt('aes-128-ecb', c_name, '0123456789abcdef'),
          |              '0123456789abcdef') AS STRING) AS plain
          |FROM customer ORDER BY c_custkey LIMIT 20""".stripMargin, dir)
    },

    // GraphiteMergeTree retention rollup (ref
    // GraphiteRollupSortedAlgorithm.h): 1-minute buckets under a day old,
    // hourly to a week, daily beyond — one CASE projection + one hash agg
    Q.df("q_graphite_rollup",
      """WITH b AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
        |         CAST(floor(epoch(TIMESTAMP '2024-01-31 12:00:00'))
        |              AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS age,
        |         value
        |  FROM events)
        |SELECT event_type,
        |       CASE WHEN age >= 604800 THEN ep - ep % 86400
        |            WHEN age >= 86400  THEN ep - ep % 3600
        |            ELSE ep - ep % 60 END AS bucket,
        |       round(avg(value), 4) AS v
        |FROM b GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin) { (s, dir) =>
      val rolled = GraphiteRollup.rollup(
        Tables.load(s, dir, "events"),
        pathCol = "event_type", timeCol = "ts", valueCol = "value",
        retentions = Seq((0L, 60L), (86400L, 3600L), (604800L, 86400L)),
        aggFn = "avg", now = lit("2024-01-31 12:00:00").cast("timestamp"))
      rolled.select(col("event_type"), col("ts").as("bucket"),
          round(col("value"), 4).as("v"))
        .orderBy("event_type", "bucket")
    },

    // vector norm/distance family over embeddings (ref arrayNorm.cpp,
    // arrayDistance.cpp) — DuckDB's list lambdas are the oracle
    Q.df("q_vector_norms",
      """SELECT vec_id,
        |  round(list_aggregate(list_transform(embedding,
        |        x -> abs(CAST(x AS DOUBLE))), 'sum'), 4) AS l1,
        |  round(sqrt(list_aggregate(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4)
        |    AS l2,
        |  round(list_aggregate(list_transform(embedding,
        |        x -> abs(CAST(x AS DOUBLE))), 'max'), 4) AS linf,
        |  round(pow(list_aggregate(list_transform(embedding,
        |        x -> pow(abs(CAST(x AS DOUBLE)), 3)), 'sum'),
        |        1.0/3.0), 4) AS l3
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) {
      (s, dir) =>
      ChSql.sql(s,
        """SELECT vec_id,
          |       round(L1Norm(emb), 4) AS l1,
          |       round(L2Norm(emb), 4) AS l2,
          |       round(LinfNorm(emb), 4) AS linf,
          |       round(LpNorm(emb, 3.0), 4) AS l3
          |FROM (SELECT vec_id,
          |             transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          |      FROM embeddings)
          |WHERE vec_id < 50 ORDER BY vec_id""".stripMargin, dir)
    },

    // CH parameterized-aggregate call syntax through the dialect shim
    // (ref ASTFunction.h `parameters`): quantile(p)(x) and
    // quantileExactWeighted(p)(x, w); the weighted oracle replays the
    // reference's DISCRETE pick — first value whose cumulative weight
    // reaches ceil(level·W) (ref QuantileExactWeighted.h get)
    Q.df("q_quantile_param",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
        |       (SELECT round(v, 2) FROM (
        |          SELECT l_extendedprice AS v,
        |                 sum(l_linenumber) OVER (ORDER BY l_extendedprice) AS c,
        |                 ceil(0.5 * sum(l_linenumber) OVER ()) AS th
        |          FROM lineitem l WHERE l.l_returnflag = o.l_returnflag)
        |        WHERE c >= th ORDER BY v LIMIT 1) AS wmed
        |FROM lineitem o GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
      ChSql.sql(s,
        """SELECT l_returnflag,
          |       round(quantile(0.9)(l_extendedprice), 2) AS p90,
          |       round(quantileExactWeighted(0.5)(l_extendedprice,
          |             l_linenumber), 2) AS wmed
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin, dir)
    },

    // sumMap as a SQL-callable aggregate (ref AggregateFunctionSumMap.h):
    // the drop-in name collects the per-group pair list and fans keys out
    // in the finishing expression — the SCALABLE formulation for huge
    // groups stays explode+groupBy (q_sum_map); this pins the CH-shaped
    // (sorted keys, values) tuple surface
    Q.df("q_summap_sql",
      """SELECT l_returnflag,
        |       array_to_string(list(l_linestatus ORDER BY l_linestatus), ',')
        |         AS ks,
        |       array_to_string(list(CAST(round(s, 2) AS VARCHAR)
        |                            ORDER BY l_linestatus), ',') AS vs
        |FROM (SELECT l_returnflag, l_linestatus,
        |             sum(CAST(l_quantity AS DOUBLE)) AS s
        |      FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
      ChSql.sql(s,
        """SELECT l_returnflag,
          |       array_join(m.keys, ',') AS ks,
          |       array_join(transform(m.values,
          |                    x -> CAST(round(x, 2) AS STRING)), ',') AS vs
          |FROM (SELECT l_returnflag,
          |             sumMap(array(l_linestatus),
          |                    array(CAST(l_quantity AS DOUBLE))) AS m
          |      FROM lineitem GROUP BY l_returnflag)
          |ORDER BY l_returnflag""".stripMargin, dir)
    }
  )
}
