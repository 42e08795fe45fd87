package graft.queries

import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.2–§2.7): scan/filter/
  * project, join kinds & strictness, aggregation + GROUP BY modifiers,
  * window functions, sorts/limits/LIMIT BY/WITH TIES, set operations,
  * MergeTree-family semantics as queries.
  *
  * Where the SQL is valid in both Spark SQL and DuckDB one string serves as
  * both implementation and oracle (`Q.sql`); dialect splits use `Q.sql2`.
  * Float policy: raw column values are compared exactly; aggregated doubles
  * are rounded (2–4 dp) so summation-order differences between engines
  * cannot flip the hash.
  */
object CoreQueries {

  val all: Seq[Q] = Seq(

    // ---- scan / filter / project (ExpressionTransform + FilterTransform,
    // ref src/Processors/Transforms/{Expression,Filter}Transform.h) ----
    Q.sql("q_scan_project",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-03-31'
        |  AND l_quantity > 45""".stripMargin),

    // PREWHERE ≈ pushed-down cheap predicate (ref MergeTreeWhereOptimizer.h:34)
    Q.sql("q_prewhere",
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem
        |WHERE l_discount < 0.02 AND l_extendedprice > 50000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- aggregation (Aggregator, ref src/Interpreters/Aggregator.h:560) ----
    // TPC-H Q1 shape ≈ ref tests/queries/1_stateful/00006_agregates.sql
    Q.sql("q_agg_basic",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)        AS sum_qty,
        |       round(sum(l_extendedprice), 2)   AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4)        AS avg_qty,
        |       round(avg(l_discount), 4)        AS avg_disc,
        |       count(*)                         AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    Q.sql("q_having",
      """SELECT l_suppkey, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 500
        |ORDER BY l_suppkey""".stripMargin),

    Q.sql("q_count_distinct",
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS uniq_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    Q.sql("q_min_max",
      """SELECT l_linestatus, min(l_shipdate) AS first_ship,
        |       max(l_shipdate) AS last_ship,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    // avgWeighted (ref AggregateFunctionAvg*.cpp) = sum(x*w)/sum(w)
    Q.sql("q_avg_weighted",
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
        |         AS avg_weighted_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // sumIf / countIf combinators (ref registerAggregateFunctions.cpp:84-94)
    Q.sql("q_agg_if",
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS sum_if_disc,
        |       count(CASE WHEN l_quantity > 25 THEN 1 END) AS count_if_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // statistics aggregates (ref AggregateFunctionStatisticsSimple)
    Q.sql2("q_stats",
      """SELECT l_returnflag,
        |       round(stddev_pop(l_quantity), 6)  AS sd_pop,
        |       round(stddev_samp(l_quantity), 6) AS sd_samp,
        |       round(var_pop(l_quantity), 6)     AS v_pop,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |       round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |       round(stddev_pop(l_quantity), 6)  AS sd_pop,
        |       round(stddev_samp(l_quantity), 6) AS sd_samp,
        |       round(var_pop(l_quantity), 6)     AS v_pop,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |       round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // quantile family (ref AggregateFunctionQuantile.cpp) — exact interpolated
    Q.sql2("q_quantiles",
      """SELECT l_returnflag,
        |       round(percentile(l_extendedprice, 0.5), 4) AS p50,
        |       round(percentile(l_extendedprice, 0.9), 4) AS p90,
        |       round(percentile(l_quantity, 0.25), 4)     AS q25_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |       round(quantile_cont(l_quantity, 0.25), 4)     AS q25_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // argMin/argMax (ref AggregateFunctionArgMinMax)
    Q.sql2("q_argminmax",
      """SELECT o_orderstatus,
        |       max_by(o_orderkey, o_totalprice) AS top_order,
        |       min_by(o_orderkey, o_totalprice) AS bottom_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      """SELECT o_orderstatus,
        |       arg_max(o_orderkey, o_totalprice) AS top_order,
        |       arg_min(o_orderkey, o_totalprice) AS bottom_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // groupArray/groupUniqArray ≈ collect_list/collect_set (sorted for determinism)
    // (array output projected to a comma-joined string so the driver's
    // pandas comparator can hash it — semantics unchanged)
    Q.sql2("q_group_array",
      """SELECT n_regionkey, array_join(sort_array(collect_set(n_name)), ',')
        |         AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
      """SELECT n_regionkey,
        |       array_to_string(list_sort(list_distinct(list(n_name))), ',')
        |         AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),

    // ---- GROUP BY modifiers (ref RollupTransform/CubeTransform,
    // src/Processors/Transforms/{Rollup,Cube}Transform.h) ----
    Q.sql("q_rollup",
      """SELECT r_name, n_name, count(*) AS cnt,
        |       grouping(r_name) AS g_r, grouping(n_name) AS g_n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name, n_name""".stripMargin),

    Q.sql("q_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    Q.sql("q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // WITH TOTALS (ref TotalsHavingTransform.h:24) = grand-total grouping set
    Q.sql("q_with_totals",
      """SELECT o_orderstatus AS k, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT CAST(NULL AS STRING) AS k, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |ORDER BY k""".stripMargin),

    // ---- joins (ref src/Interpreters/HashJoin.h:147, Joins.h kinds) ----
    Q.sql("q_join_inner",
      """SELECT c_mktsegment, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    Q.sql("q_join_chain",
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),

    Q.sql("q_join_left",
      """SELECT o_orderstatus, count(l_orderkey) AS n_items, count(*) AS n_rows
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey AND l_quantity > 49
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    Q.sql("q_join_right",
      """SELECT n_name, count(c_custkey) AS n_cust
        |FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    Q.sql("q_join_full",
      """SELECT coalesce(a.k, b.k) AS k,
        |       coalesce(a.n_ord, 0) AS n_ord,
        |       coalesce(b.n_li, 0)  AS n_li
        |FROM (SELECT o_custkey AS k, count(*) AS n_ord FROM orders
        |      WHERE o_totalprice > 150000 GROUP BY o_custkey) a
        |FULL JOIN (SELECT l_suppkey AS k, count(*) AS n_li FROM lineitem
        |           WHERE l_quantity > 49 GROUP BY l_suppkey) b
        |  ON a.k = b.k
        |ORDER BY k""".stripMargin),

    Q.sql("q_join_cross",
      """SELECT r_name, t.o_orderstatus
        |FROM region CROSS JOIN
        |     (SELECT DISTINCT o_orderstatus FROM orders) t
        |ORDER BY r_name, o_orderstatus""".stripMargin),

    // SEMI: IN-subquery → left-semi join (ref Joins.h:39, Set.h:27)
    Q.sql("q_join_semi",
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin),

    // ANTI (ref Joins.h:40)
    Q.sql("q_join_anti",
      """SELECT count(*) AS n FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT l_partkey FROM lineitem
        |   WHERE l_shipdate > DATE '1997-01-01')""".stripMargin),

    // correlated EXISTS (TPC-H Q4 shape)
    Q.sql("q_exists",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ANY JOIN: first match only, no multiplication (ref Joins.h:35)
    Q.sql("q_join_any",
      """SELECT o_orderkey, o_totalprice, l.first_price
        |FROM orders
        |JOIN (SELECT l_orderkey, l_extendedprice AS first_price FROM
        |        (SELECT l_orderkey, l_extendedprice,
        |                row_number() OVER (PARTITION BY l_orderkey
        |                                   ORDER BY l_linenumber, l_extendedprice,
        |                                            l_partkey, l_suppkey) AS rn
        |         FROM lineitem) x WHERE rn = 1) l
        |  ON o_orderkey = l.l_orderkey
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin),

    // scalar / correlated-scalar subquery (TPC-H Q17 shape)
    Q.sql("q_scalar_subquery",
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size < 5
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin),

    // IN with tuple (ref Set.h tuple IN)
    Q.sql("q_tuple_in",
      """SELECT count(*) AS n FROM lineitem
        |WHERE (l_returnflag, l_linestatus) IN (('A','F'), ('R','F'))""".stripMargin),

    // ---- window functions (ref WindowTransform.cpp:2430-2537) ----
    Q.sql("q_window_rank",
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk, drnk, rn
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |             rank()       OVER (PARTITION BY c_mktsegment
        |                                ORDER BY c_acctbal DESC, c_custkey) AS rnk,
        |             dense_rank() OVER (PARTITION BY c_mktsegment
        |                                ORDER BY c_acctbal DESC, c_custkey) AS drnk,
        |             row_number() OVER (PARTITION BY c_mktsegment
        |                                ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer) t
        |WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin),

    Q.sql("q_window_running",
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_total,
        |       count(*) OVER (PARTITION BY o_custkey) AS n_orders
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),

    Q.sql("q_window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice)  OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |       lead(o_totalprice) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),

    Q.sql("q_window_frame_sliding",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       round(avg(l_quantity) OVER (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin),

    // Global ntile: a no-partition window collapses to one task, so the
    // Spark side uses GlobalRank.ntile (range-partitioned row numbers +
    // closed-form buckets); the oracle keeps the standard SQL form.
    Q.df("q_window_ntile_nth",
      """SELECT o_orderkey, o_totalprice,
        |       ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
        |       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_best
        |FROM orders WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.Tables.register(s, dir)
      val base = s.sql(
        """SELECT o_orderkey, o_totalprice,
          |       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
          |             ORDER BY o_totalprice DESC, o_orderkey
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_best
          |FROM orders WHERE o_totalprice > 400000""".stripMargin)
      graft.operators.GlobalRank
        .ntile(base, Seq(col("o_totalprice"), col("o_orderkey")), 4, "quartile")
        .select(col("o_orderkey"), col("o_totalprice"), col("quartile"),
          col("second_best"))
        .orderBy("o_orderkey")
    },

    // GROUPS frame (ref WindowDescription.h:29-46 FrameType::GROUPS):
    // Spark lacks the frame type; dense_rank + RANGE over the rank is an
    // exact emulation (operators/WindowFrames). DuckDB runs native GROUPS.
    Q.df("q_window_groups_frame",
      """WITH d AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |    dense_rank() OVER (PARTITION BY l_suppkey
        |                       ORDER BY l_shipdate) AS dr
        |  FROM lineitem WHERE l_suppkey <= 5)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |             ORDER BY dr
        |             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS g_sum
        |FROM d ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        graft.operators.WindowFrames.withGroupsFrame(
            graft.Tables.load(s, dir, "lineitem").filter(col("l_suppkey") <= 5),
            partitionBy = Seq(col("l_suppkey")),
            orderBy = Seq(col("l_shipdate")),
            agg = sum(col("l_quantity")), out = "__g",
            precedingGroups = 1, followingGroups = 1)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(col("__g"), 2).as("g_sum"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // RANGE frame (ref WindowDescription.h:29-46)
    Q.sql("q_window_range",
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
        |             RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS n_near
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin),

    // ---- sorts / limits (ref LimitTransform, LimitByTransform) ----
    Q.sql("q_topn",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),

    Q.sql("q_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""".stripMargin),

    // LIMIT n BY group (ref LimitByTransform.h:10)
    Q.sql("q_limit_by",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM
        |  (SELECT o_custkey, o_orderkey, o_totalprice,
        |          row_number() OVER (PARTITION BY o_custkey
        |                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |   FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin),

    // LIMIT WITH TIES (ref LimitTransform.h:17). The oracle keeps the
    // rank() form; the Spark side uses the scale-safe threshold rewrite
    // (parallel top-k to find the nth value, then a parallel filter)
    // instead of a global no-partition window.
    Q.df("q_with_ties",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM
        |  (SELECT l_orderkey, l_linenumber, l_quantity,
        |          rank() OVER (ORDER BY l_quantity DESC) AS rk
        |   FROM lineitem) t
        |WHERE rk <= 3 ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        graft.Tables.register(s, dir)
        graft.operators.GlobalRank
          .limitWithTies(
            s.table("lineitem")
              .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
            col("l_quantity"), descending = true, n = 3)
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- set operations (ref InterpreterSelectIntersectExceptQuery) ----
    Q.sql("q_union_all",
      """SELECT n_name AS name FROM nation
        |UNION ALL SELECT r_name AS name FROM region
        |ORDER BY name""".stripMargin),

    Q.sql("q_union_distinct",
      """SELECT c_nationkey AS k FROM customer
        |UNION SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    Q.sql("q_intersect",
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    Q.sql("q_except",
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    Q.sql("q_intersect_all",
      """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
        |INTERSECT ALL
        |SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
        |ORDER BY k""".stripMargin),

    Q.sql("q_except_all",
      """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
        |EXCEPT ALL
        |SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.09
        |ORDER BY k""".stripMargin),

    Q.sql("q_distinct",
      """SELECT DISTINCT o_orderstatus, o_orderpriority
        |FROM orders ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // ---- MergeTree engine-family semantics as queries (SURVEY §2.1) ----
    // ReplacingMergeTree FINAL: keep newest row per key
    // (ref src/Processors/Merges/Algorithms/ReplacingSortedAlgorithm.cpp)
    Q.sql("q_replacing_final",
      """SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM
        |  (SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
        |          row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |   FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),

    // SummingMergeTree: additive rollup by key
    // (ref SummingSortedAlgorithm.cpp)
    Q.sql("q_summing_final",
      """SELECT l_partkey, round(sum(l_quantity), 2) AS qty,
        |       round(sum(l_extendedprice), 2) AS amount
        |FROM lineitem GROUP BY l_partkey
        |HAVING sum(l_quantity) > 150 ORDER BY l_partkey""".stripMargin),

    // SAMPLE k — deterministic on the sampling key like the reference
    // (src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp:88-567
    // hashes the sampling key; here: modulo on the key for oracle parity)
    Q.sql("q_sample",
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin),

    // numbers(N) table function (ref src/TableFunctions/
    // TableFunctionNumbers.cpp; system.numbers StorageSystemNumbers.h:25)
    Q.df("q_numbers",
      """SELECT CAST(sum(n) AS BIGINT) AS s, count(*) AS cnt,
        |       CAST(sum(CASE WHEN n % 7 = 0 THEN n END) AS BIGINT) AS s7
        |FROM (SELECT unnest(range(0, 100000)) AS n) t""".stripMargin) {
      (s, _) =>
        s.range(0, 100000).toDF("n")
          .agg(sum("n").cast("bigint").as("s"),
            count(lit(1)).as("cnt"),
            sum(when(col("n") % 7 === 0, col("n"))).cast("bigint").as("s7"))
    },

    // CollapsingMergeTree: sign-cancellation
    // (ref CollapsingSortedAlgorithm.cpp) — sign derived from event parity
    Q.sql("q_collapsing_final",
      """SELECT user_id, CAST(sum(sign) AS BIGINT) AS net_rows,
        |       round(sum(value * sign), 4) AS net_value
        |FROM (SELECT user_id, value,
        |             CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS sign
        |      FROM events) t
        |GROUP BY user_id HAVING sum(sign) <> 0 ORDER BY user_id""".stripMargin)
  )
}
