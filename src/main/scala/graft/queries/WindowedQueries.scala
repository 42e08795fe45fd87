package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Tumble/hop window semantics (SURVEY §2.9, ref StorageWindowView tumble/
  * hop) verified as batch queries over the events table, plus the
  * remaining aggregate-function families (topK, sumMap, entropy,
  * histogram, quantile arrays, two-phase partial/merge aggregation).
  */
object WindowedQueries {

  val all: Seq[Q] = Seq(

    // tumble(ts, 1h) (ref StorageWindowView.h:39-43)
    Q.df("q_tumble_agg",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, count(*) AS n, round(sum(value), 4) AS total
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      Streams.tumble(Tables.load(s, dir, "events"), "ts", "1 hour")
        .groupBy("window_start", "event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
        .orderBy("window_start", "event_type")
    },

    // hop(ts, 30m, 1h) (ref StorageWindowView.h:44-56): every row falls in
    // two windows; oracle materializes both starts per row
    Q.df("q_hop_agg",
      """SELECT ws AS window_start, count(*) AS n FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts)
        |                   - INTERVAL '30 minutes']) AS ws
        |  FROM events) t
        |GROUP BY ws ORDER BY ws""".stripMargin) { (s, dir) =>
      Streams.hop(Tables.load(s, dir, "events"), "ts", "30 minutes", "1 hour")
        .groupBy(col("window_start"))
        .agg(count(lit(1)).as("n"))
        .orderBy("window_start")
    },

    // topK(3) per group (ref SpaceSaving.h:73 — exact at this cardinality;
    // deterministic tiebreak by value)
    Q.sql("q_topk",
      """SELECT event_type, user_id, cnt FROM (
        |  SELECT event_type, user_id, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY event_type
        |             ORDER BY count(*) DESC, user_id) AS rk
        |  FROM events GROUP BY event_type, user_id) t
        |WHERE rk <= 3 ORDER BY event_type, cnt DESC, user_id""".stripMargin),

    // sumMap (ref AggregateFunctionSumMap): CH returns parallel key/value
    // arrays sorted by key
    // (parallel arrays projected to comma-joined strings for the driver's
    // comparator; DECIMAL casts pin double→string formatting in both dialects)
    Q.sql2("q_sum_map",
      """SELECT user_id,
        |       array_join(transform(sort_array(collect_list(struct(event_type, s))),
        |                 e -> e.event_type), ',') AS ks,
        |       array_join(transform(sort_array(collect_list(struct(event_type, s))),
        |                 e -> CAST(CAST(e.s AS DECIMAL(18,4)) AS STRING)), ',') AS vs
        |FROM (SELECT user_id, event_type, round(sum(value), 4) AS s
        |      FROM events GROUP BY user_id, event_type) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
      """SELECT user_id,
        |       array_to_string(list(event_type ORDER BY event_type), ',') AS ks,
        |       array_to_string(list(CAST(CAST(s AS DECIMAL(18,4)) AS VARCHAR)
        |                            ORDER BY event_type), ',') AS vs
        |FROM (SELECT user_id, event_type, round(sum(value), 4) AS s
        |      FROM events GROUP BY user_id, event_type) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    // entropy of the event-type distribution per user
    // (ref AggregateFunctionEntropy.cpp)
    Q.sql("q_entropy",
      """SELECT user_id,
        |       round(-sum((cnt / total) * ln(cnt / total)), 6) AS h
        |FROM (SELECT user_id, event_type,
        |             CAST(count(*) AS DOUBLE) AS cnt,
        |             CAST(sum(count(*)) OVER (PARTITION BY user_id) AS DOUBLE)
        |               AS total
        |      FROM events GROUP BY user_id, event_type) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    // histogram as fixed-width buckets (ref AggregateFunctionHistogram.h)
    Q.sql("q_histogram",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       round(min(o_totalprice), 2) AS lo,
        |       round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin),

    // quantiles(...) array form (ref AggregateFunctionQuantile.cpp
    // quantiles combinator)
    Q.sql2("q_quantiles_array",
      """SELECT l_returnflag,
        |       array_join(transform(
        |           percentile(l_extendedprice, array(0.25, 0.5, 0.75)),
        |           x -> CAST(CAST(round(x, 4) AS DECIMAL(18,4)) AS STRING)), ',')
        |         AS qs
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |       array_to_string(list_transform(
        |           quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]),
        |           x -> CAST(CAST(round(x, 4) AS DECIMAL(18,4)) AS VARCHAR)), ',')
        |         AS qs
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // -State/-Merge shape (ref AggregateFunction type §1.2 + SURVEY §2.4):
    // partial aggregates computed per (user, type) then merged — must equal
    // the direct aggregation (Spark's partial/final contract made explicit)
    Q.sql("q_state_merge",
      """SELECT event_type,
        |       CAST(sum(part_n) AS BIGINT) AS n,
        |       round(sum(part_sum), 4) AS total
        |FROM (SELECT user_id, event_type, count(*) AS part_n,
        |             sum(value) AS part_sum
        |      FROM events GROUP BY user_id, event_type) partial
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // uniq sketch family (ref AggregateFunctionUniq.h): exact vs approx —
    // approx must be within HLL++ error of exact (checked by rows-only +
    // relative assertion in the spec; here the EXACT variant is the oracle)
    Q.sql("q_uniq_exact",
      """SELECT event_type,
        |       count(DISTINCT user_id) AS uniq_users,
        |       count(DISTINCT user_id % 10) AS uniq_mod
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    Q.dfOnly("q_uniq_hll") { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("uniq_users_approx"))
        .orderBy("event_type")
    },

    // uniqState/uniqMerge: sketch COLUMNS re-aggregated across shards
    // (ref ColumnAggregateFunction.h:54) — estimates, so rows-only;
    // UniqStateSpec pins error bounds and the store/merge round trip
    Q.dfOnly("q_uniq_state_merge") { (s, dir) =>
      import graft.functions.UniqState
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"), (col("user_id") % 8).as("shard"))
        .agg(UniqState.uniqState(col("user_id")).as("st"))
        .groupBy("event_type")
        .agg(UniqState.uniqMerge(col("st")).as("uniq_users_merged"))
        .orderBy("event_type")
    },

    // ---- statistical-test aggregates (ref AggregateFunctionTTest.h,
    // AggregateFunctionMannWhitney.cpp, AggregateFunctionRankCorr.h,
    // AggregateFunctionSimpleLinearRegression.cpp). Oracles verify the
    // statistics closed-form; p-values (not SQL-expressible in DuckDB)
    // are pinned by StatsTestsSpec against textbook values. ----
    Q.df("q_stats_ttest",
      """WITH e AS (SELECT value, event_type = 'view' AS f FROM events
        |           WHERE event_type IN ('view','click')
        |             AND value IS NOT NULL),
        |m AS (SELECT avg(CASE WHEN f THEN value END) AS m1,
        |             avg(CASE WHEN NOT f THEN value END) AS m2,
        |             var_samp(CASE WHEN f THEN value END) AS s1,
        |             var_samp(CASE WHEN NOT f THEN value END) AS s2,
        |             CAST(count(CASE WHEN f THEN value END) AS DOUBLE) AS n1,
        |             CAST(count(CASE WHEN NOT f THEN value END) AS DOUBLE) AS n2
        |      FROM e)
        |SELECT round((m1-m2)/sqrt(s1/n1 + s2/n2), 4) AS welch_t,
        |       round(pow(s1/n1 + s2/n2, 2) /
        |             (pow(s1/n1, 2)/(n1-1) + pow(s2/n2, 2)/(n2-1)), 2) AS welch_df,
        |       round((m1-m2)/sqrt(((n1-1)*s1 + (n2-1)*s2)/(n1+n2-2)
        |             * (1/n1 + 1/n2)), 4) AS student_t,
        |       CAST(n1+n2-2 AS BIGINT) AS student_df
        |FROM m""".stripMargin) { (s, dir) =>
      import graft.functions.StatsTests
      val e = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("view", "click") &&
          col("value").isNotNull)
      val f = col("event_type") === "view"
      e.agg(StatsTests.welchTTest(col("value"), f).as("w"),
          StatsTests.studentTTest(col("value"), f).as("st"))
        .select(round(col("w.t"), 4).as("welch_t"),
          round(col("w.df"), 2).as("welch_df"),
          round(col("st.t"), 4).as("student_t"),
          col("st.df").cast("bigint").as("student_df"))
    },

    Q.df("q_simple_linreg",
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS k,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS b
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        import graft.functions.StatsTests
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(StatsTests.simpleLinearRegression(
            col("l_quantity"), col("l_extendedprice")).as("r"))
          .select(col("l_returnflag"),
            round(col("r.k"), 4).as("k"), round(col("r.b"), 4).as("b"))
          .orderBy("l_returnflag")
    },

    Q.df("q_rank_corr",
      """WITH r AS (SELECT
        |    rank() OVER (ORDER BY l_quantity)
        |      + (count(*) OVER (PARTITION BY l_quantity) - 1)/2.0 AS rx,
        |    rank() OVER (ORDER BY l_extendedprice)
        |      + (count(*) OVER (PARTITION BY l_extendedprice) - 1)/2.0 AS ry
        |  FROM lineitem)
        |SELECT round(corr(rx, ry), 4) AS rho FROM r""".stripMargin) {
      (s, dir) =>
        import graft.functions.StatsTests
        StatsTests.rankCorr(Tables.load(s, dir, "lineitem"),
            col("l_quantity"), col("l_extendedprice"))
          .select(round(col("rho"), 4).as("rho"))
    },

    Q.df("q_mannwhitney",
      """WITH e AS (SELECT value, event_type = 'view' AS f FROM events
        |           WHERE event_type IN ('view','click')
        |             AND value IS NOT NULL),
        |r AS (SELECT f,
        |        rank() OVER (ORDER BY value)
        |          + (count(*) OVER (PARTITION BY value) - 1)/2.0 AS rk,
        |        count(*) OVER (PARTITION BY value) AS cnt
        |      FROM e),
        |a AS (SELECT sum(CASE WHEN f THEN rk END) AS r1,
        |             CAST(count(CASE WHEN f THEN 1 END) AS DOUBLE) AS n1,
        |             CAST(count(CASE WHEN NOT f THEN 1 END) AS DOUBLE) AS n2,
        |             sum(cnt*cnt - 1.0) AS tie
        |      FROM r)
        |SELECT round(r1 - n1*(n1+1)/2, 2) AS u1,
        |       round(n1*n2 - (r1 - n1*(n1+1)/2), 2) AS u2,
        |       round((r1 - n1*(n1+1)/2 - n1*n2/2)
        |             / sqrt(n1*n2/12*((n1+n2+1)
        |                    - tie/((n1+n2)*(n1+n2-1)))), 4) AS z
        |FROM a""".stripMargin) { (s, dir) =>
      import graft.functions.StatsTests
      val e = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("view", "click") &&
          col("value").isNotNull)
      StatsTests.mannWhitneyUTest(e, col("value"),
          col("event_type") === "view")
        .select(round(col("u1"), 2).as("u1"), round(col("u2"), 2).as("u2"),
          round(col("z"), 4).as("z"))
    },

    // groupBitmap: distinct-count via compressed bitset UDAF (ref
    // AggregateFunctionGroupBitmap.cpp) — oracle = exact count(DISTINCT)
    Q.df("q_group_bitmap",
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS card
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        val gb = udaf(new graft.functions.Bitmap.GroupBitmap(),
          ExpressionEncoder[(Long, Boolean)]())
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(gb(col("user_id"), lit(true)).as("card"))
          .orderBy("event_type")
    },

    // bitmap scalar algebra (ref FunctionsBitmap.cpp): set ops between the
    // view-user and purchase-user bitmaps; oracle = INTERSECT/UNION/EXCEPT
    Q.df("q_bitmap_ops",
      """WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type='view'),
        |     p AS (SELECT DISTINCT user_id FROM events WHERE event_type='purchase'),
        |     vp_and AS (SELECT user_id FROM v INTERSECT SELECT user_id FROM p),
        |     vp_or  AS (SELECT user_id FROM v UNION SELECT user_id FROM p),
        |     vnp    AS (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)
        |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS v_card,
        |       CAST((SELECT count(*) FROM vp_and) AS BIGINT) AS and_card,
        |       CAST((SELECT count(*) FROM vp_or) AS BIGINT) AS or_card,
        |       CAST((SELECT count(*) FROM vnp) AS BIGINT) AS andnot_card,
        |       CAST((SELECT count(*) FROM vp_or) -
        |            (SELECT count(*) FROM vp_and) AS BIGINT) AS xor_card,
        |       CAST((SELECT min(user_id) FROM v) AS BIGINT) AS v_min,
        |       CAST((SELECT max(user_id) FROM v) AS BIGINT) AS v_max""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
        import graft.functions.BitmapExprs._
        val bs = udaf(new graft.functions.Bitmap.GroupBitmapState(),
          ExpressionEncoder[(Long, Boolean)]())
        Tables.load(s, dir, "events")
          .agg(bs(col("user_id"), col("event_type") === "view").as("v"),
            bs(col("user_id"), col("event_type") === "purchase").as("p"))
          .select(
            bitmapCardinality(col("v")).as("v_card"),
            bitmapAndCardinality(col("v"), col("p")).as("and_card"),
            bitmapOrCardinality(col("v"), col("p")).as("or_card"),
            bitmapAndnotCardinality(col("v"), col("p")).as("andnot_card"),
            bitmapXorCardinality(col("v"), col("p")).as("xor_card"),
            bitmapMin(col("v")).as("v_min"),
            bitmapMax(col("v")).as("v_max"))
    },

    // exponentialTimeDecayed{Sum,Count,Avg,Max} (ref WindowTransform.cpp:
    // 1597-1938) — oracle is the same prefix-scan closed form in DuckDB;
    // λ = 7 days, times in epoch seconds (ns→µs truncation in both engines)
    Q.df("q_exp_decay",
      """WITH e AS (SELECT user_id, event_id, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP))/1000000.0 AS tsec
        |           FROM events WHERE user_id < 20),
        |     b AS (SELECT *, min(tsec) OVER (PARTITION BY user_id) AS tmin
        |           FROM e)
        |SELECT user_id, event_id,
        |  round(sum(value * exp((tsec - tmin)/604800.0)) OVER w
        |        * exp(-(tsec - tmin)/604800.0), 4) AS dsum,
        |  round(sum(exp((tsec - tmin)/604800.0)) OVER w
        |        * exp(-(tsec - tmin)/604800.0), 4) AS dcnt,
        |  round((sum(value * exp((tsec - tmin)/604800.0)) OVER w)
        |        / (sum(exp((tsec - tmin)/604800.0)) OVER w), 4) AS davg,
        |  round(max(value * exp((tsec - tmin)/604800.0)) OVER w
        |        * exp(-(tsec - tmin)/604800.0), 4) AS dmax
        |FROM b
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import graft.functions.ExpDecay
      val ev = Tables.load(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"),
          (unix_micros(col("ts")) / 1e6).as("tsec"))
      val pb = Seq(col("user_id"))
      val ob = Seq(col("tsec"), col("event_id"))
      val d = 604800.0
      ev.select(col("user_id"), col("event_id"),
          round(ExpDecay.decayedSum(col("value"), col("tsec"), d, pb, ob), 4).as("dsum"),
          round(ExpDecay.decayedCount(col("tsec"), d, pb, ob), 4).as("dcnt"),
          round(ExpDecay.decayedAvg(col("value"), col("tsec"), d, pb, ob), 4).as("davg"),
          round(ExpDecay.decayedMax(col("value"), col("tsec"), d, pb, ob), 4).as("dmax"))
        .orderBy("user_id", "event_id")
    },

    // nonNegativeDerivative(value, ts, 1h) (ref WindowTransform.cpp:2509)
    Q.df("q_nonneg_derivative",
      """WITH e AS (SELECT user_id, event_id, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP))/1000000.0 AS tsec
        |           FROM events WHERE user_id < 20),
        |     l AS (SELECT user_id, event_id,
        |                  value - lag(value) OVER w AS dv,
        |                  tsec - lag(tsec) OVER w AS dt
        |           FROM e
        |           WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id))
        |SELECT user_id, event_id,
        |       round(CASE WHEN dv IS NULL OR dt IS NULL OR dt <= 0 THEN 0.0
        |                  ELSE greatest(dv/dt*3600.0, 0.0) END, 4) AS rate
        |FROM l ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import graft.functions.ExpDecay
      val ev = Tables.load(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"),
          (unix_micros(col("ts")) / 1e6).as("tsec"))
      ev.select(col("user_id"), col("event_id"),
          round(ExpDecay.nonNegativeDerivative(col("value"), col("tsec"),
            3600.0, Seq(col("user_id")), Seq(col("tsec"), col("event_id"))), 4)
            .as("rate"))
        .orderBy("user_id", "event_id")
    }
  )
}
