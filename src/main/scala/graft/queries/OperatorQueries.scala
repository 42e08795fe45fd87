package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import graft.Tables
import graft.operators.{AsofJoin, WithFill}
import graft.functions.Funnel

/** Custom-operator coverage: ASOF JOIN, ORDER BY WITH FILL / INTERPOLATE,
  * windowFunnel / retention / sequenceMatch — the SURVEY §7.3 "hard items"
  * Spark lacks as primitives.
  */
object OperatorQueries {

  val all: Seq[Q] = Seq(

    // ASOF JOIN backward (>=): for each purchase, the user's latest view
    // at-or-before it (ref src/Core/Joins.h:56; DuckDB ASOF JOIN = same
    // semantics, used as the oracle).
    Q.df("q_asof_join",
      """SELECT p.user_id, p.event_id, p.value AS purchase_value,
        |       v.ts AS view_ts, v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin) { (s, dir) =>
      // single-scan ASOF self-join (r15): both sides filter the same
      // events table, so the tagged union is built in ONE pass instead of
      // two filtered scans (identical row multiset — see AsofJoin.selfJoin).
      // selfJoin REQUIRES disjoint side filters: here two equality tests
      // on the same column ('purchase' vs 'view'), disjoint by construction
      val ev = Tables.load(s, dir, "events")
      AsofJoin.selfJoin(ev,
          leftFilter = col("event_type") === "purchase",
          rightFilter = col("event_type") === "view",
          leftSelect = Seq("user_id" -> col("user_id"),
            "event_id" -> col("event_id"), "ts" -> col("ts"),
            "purchase_value" -> col("value")),
          rightSelect = Seq("user_id" -> col("user_id"),
            "view_ts" -> col("ts"), "view_value" -> col("value")),
          on = Seq("user_id"), leftTime = "ts", rightTime = "view_ts",
          inequality = ">=")
        .select(col("user_id"), col("event_id"), col("purchase_value"),
          col("view_ts"), col("view_value"))
        .orderBy("user_id", "event_id")
    },

    // ASOF strict backward (>) — equal timestamps must not match
    Q.df("q_asof_strict",
      """SELECT c.user_id, c.event_id, e.ts AS err_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts > e.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin) { (s, dir) =>
      // single-scan ASOF self-join (r15), same rewrite as q_asof_join;
      // disjointness invariant holds ('click' vs 'error' on one column)
      val ev = Tables.load(s, dir, "events")
      AsofJoin.selfJoin(ev,
          leftFilter = col("event_type") === "click",
          rightFilter = col("event_type") === "error",
          leftSelect = Seq("user_id" -> col("user_id"),
            "event_id" -> col("event_id"), "ts" -> col("ts")),
          rightSelect = Seq("user_id" -> col("user_id"),
            "err_ts" -> col("ts")),
          on = Seq("user_id"), leftTime = "ts", rightTime = "err_ts",
          inequality = ">")
        .select(col("user_id"), col("event_id"), col("err_ts"))
        .orderBy("user_id", "event_id")
    },

    // WITH FILL on a date axis: daily signup counts over January 2024 with
    // gaps materialized as 0 (ref FillingTransform.h:16)
    Q.df("q_with_fill",
      """SELECT g.d AS day, coalesce(a.cnt, 0) AS cnt
        |FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
        |              TIMESTAMP '2024-01-31', INTERVAL 1 DAY)) AS d) g
        |LEFT JOIN (SELECT date_trunc('day', ts) AS d, count(*) AS cnt
        |           FROM events WHERE event_type = 'signup'
        |             AND ts < TIMESTAMP '2024-02-01' GROUP BY 1) a
        |  ON g.d = a.d
        |ORDER BY day""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .filter(col("event_type") === "signup" &&
          col("ts") < lit("2024-02-01").cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      WithFill.fillDays(s, daily, "day", "2024-01-01", "2024-01-31")
        .na.fill(0, Seq("cnt"))
        .orderBy("day")
    },

    // WITH FILL + INTERPOLATE carry-forward (ref FillingTransform
    // interpolate expressions)
    Q.df("q_with_fill_interpolate",
      """WITH grid AS (SELECT unnest(generate_series(1, 200)) AS uid),
        |     agg AS (SELECT user_id AS uid,
        |                    round(sum(value), 4) AS user_value
        |             FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT g.uid,
        |       last_value(a.user_value IGNORE NULLS)
        |         OVER (ORDER BY g.uid ROWS BETWEEN UNBOUNDED PRECEDING AND
        |               CURRENT ROW) AS filled_value
        |FROM grid g LEFT JOIN agg a ON g.uid = a.uid
        |ORDER BY g.uid""".stripMargin) { (s, dir) =>
      val agg = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("uid"))
        .agg(round(sum(col("value")), 4).as("user_value"))
      WithFill.fillLong(s, agg, "uid", 1, 200,
          carryForward = Seq("user_value"))
        .select(col("uid"), col("user_value").as("filled_value"))
        .orderBy("uid")
    },

    // retention(view, click, purchase): per-user cohort flags
    // (ref AggregateFunctionRetention.cpp) — oracle = conditional aggs
    Q.df("q_retention",
      """SELECT user_id,
        |       CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS INT) AS r1,
        |       CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) *
        |            max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT) AS r2,
        |       CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) *
        |            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) AS r3
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ret = udaf(new Funnel.Retention(3), ExpressionEncoder[Int]())
      val mask = when(col("event_type") === "view", 1).otherwise(0) +
        when(col("event_type") === "click", 2).otherwise(0) +
        when(col("event_type") === "purchase", 4).otherwise(0)
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(ret(mask).as("r"))
        .select(col("user_id"), col("r").getItem(0).as("r1"),
          col("r").getItem(1).as("r2"), col("r").getItem(2).as("r3"))
        .orderBy("user_id")
    },

    // sequenceMatch('(?1).*(?2).*(?3)'): view → click → purchase as a
    // subsequence in time order (ref AggregateFunctionSequenceMatch.cpp).
    // Oracle: chained min-ts-after-ts subqueries.
    Q.df("q_sequence_match",
      """SELECT user_id, CAST(max(ok) AS INT) AS matched FROM (
        |  SELECT v.user_id, CASE WHEN EXISTS (
        |      SELECT 1 FROM events c WHERE c.user_id = v.user_id
        |        AND c.event_type = 'click' AND c.ts > v.ts
        |        AND EXISTS (SELECT 1 FROM events p
        |                    WHERE p.user_id = c.user_id
        |                      AND p.event_type = 'purchase' AND p.ts > c.ts))
        |    THEN 1 ELSE 0 END AS ok
        |  FROM events v WHERE v.event_type = 'view') t
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val sm = udaf(new Funnel.SequenceMatch(3), ExpressionEncoder[(Long, Int)]())
      val step = when(col("event_type") === "view", 1)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "purchase", 3).otherwise(0)
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(sm(unix_micros(col("ts")), step).as("m"))
        .select(col("user_id"), col("m").cast("int").as("matched"))
        .orderBy("user_id")
    },

    // sequenceCount('(?1).*(?2).*(?3)'): non-overlapping greedy chain count
    // (ref AggregateFunctionSequenceMatch.h:651) — oracle runs the same
    // automaton with DuckDB list_reduce (state = count*4 + wanted_step)
    Q.df("q_sequence_count",
      """WITH st AS (
        |  SELECT user_id, ts, event_id,
        |         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |              WHEN 'purchase' THEN 3 ELSE 0 END AS step
        |  FROM events),
        |agg AS (
        |  SELECT user_id,
        |         coalesce(list(step ORDER BY ts, event_id)
        |                  FILTER (WHERE step > 0), []) AS steps
        |  FROM st GROUP BY user_id)
        |SELECT user_id,
        |  CAST(list_reduce(list_prepend(1, steps),
        |    (acc, x) -> CASE WHEN x = acc % 4
        |                THEN CASE WHEN acc % 4 = 3 THEN acc + 2 ELSE acc + 1 END
        |                ELSE acc END) // 4 AS BIGINT) AS n_chains
        |FROM agg ORDER BY user_id""".stripMargin) { (s, dir) =>
      val sc = udaf(new Funnel.SequenceCount(3),
        ExpressionEncoder[(Long, Long, Int)]())
      val step = when(col("event_type") === "view", 1)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "purchase", 3).otherwise(0)
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(sc(unix_micros(col("ts")), col("event_id"), step).as("n_chains"))
        .orderBy("user_id")
    },

    // sequenceNextNode('forward', 'first_match')(ts, event, true,
    // type='view', type='click'): event name right after the first
    // CONSECUTIVE view→click pair (ref AggregateFunctionSequenceNextNode.cpp)
    Q.df("q_sequence_next_node",
      """WITH s AS (SELECT user_id, ts, event_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS n1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS n2
        |  FROM events),
        |m AS (SELECT user_id, n2,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS rk
        |      FROM s WHERE event_type = 'view' AND n1 = 'click'),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id, f.n2 AS next_node
        |FROM u LEFT JOIN (SELECT user_id, n2 FROM m WHERE rk = 1) f
        |  USING (user_id)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val nn = udaf(new Funnel.SequenceNextNode(true, "first_match", 2),
        ExpressionEncoder[(Long, Long, String, Int)]())
      val mask = lit(1) +
        when(col("event_type") === "view", 2).otherwise(0) +
        when(col("event_type") === "click", 4).otherwise(0)
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(nn(unix_micros(col("ts")), col("event_id"), col("event_type"),
          mask).as("next_node"))
        .orderBy("user_id")
    },

    // windowFunnel(1 hour, view→click→signup→purchase): deepest chain where
    // every step is within 1h of the chain's step-1 (ref
    // AggregateFunctionWindowFunnel.cpp). The sliding chain-start scan is
    // not pure SQL, so the oracle pins the engine's depths for the sf0.01
    // fixtures; FunnelSpec pins the semantics on crafted inputs.
    Q.df("q_window_funnel",
      """SELECT * FROM (VALUES
        |  (0, 1), (1, 2), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1), (7, 2),
        |  (8, 2), (9, 1), (10, 1), (11, 1), (12, 2), (13, 1), (14, 2),
        |  (15, 1), (16, 1), (17, 1), (18, 1), (19, 2), (20, 2), (21, 2),
        |  (22, 1), (23, 1), (24, 1), (25, 2), (26, 1), (27, 1), (28, 2),
        |  (29, 1)) v(user_id, funnel_depth)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val wf = udaf(new Funnel.WindowFunnel(3600L * 1000000L, 4),
        ExpressionEncoder[(Long, Long)]())
      val mask = when(col("event_type") === "view", 1L)
        .when(col("event_type") === "click", 2L)
        .when(col("event_type") === "signup", 4L)
        .when(col("event_type") === "purchase", 8L).otherwise(0L)
      Tables.load(s, dir, "events")
        .filter(col("user_id") < 30)
        .groupBy("user_id")
        .agg(wf(unix_micros(col("ts")), mask).as("funnel_depth"))
        .select(col("user_id").cast("int").as("user_id"), col("funnel_depth"))
        .orderBy("user_id")
    }
  )
}
