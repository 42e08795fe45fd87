package graft.queries

import org.apache.spark.sql.functions._
import graft.{ChSql, Tables}

/** Round-8 coverage: the weighted/variant quantile family, co-moment
  * matrices, sparkbar, stem, and Object('json')-style subcolumn access —
  * each against a DuckDB oracle that re-implements the reference
  * semantics cited in the function's Scaladoc.
  */
object Round8Queries {

  val all: Seq[Q] = Seq(

    // exact order-statistic variants (ref QuantileExact.h): Low/High at
    // the median (differ on even counts), the discrete quantileExact pick
    // at 0.77, each per group. The oracle replays sorted[n] by list index.
    Q.df("q_quantile_exact_variants",
      """WITH g AS (SELECT l_returnflag AS rf,
        |                  list(CAST(l_quantity AS DOUBLE) ORDER BY l_quantity) AS l,
        |                  count(*) AS n
        |           FROM lineitem GROUP BY 1)
        |SELECT rf,
        |       round(l[CAST(CASE WHEN n % 2 = 1 THEN n // 2
        |                         ELSE n // 2 - 1 END AS INT) + 1], 2) AS qlow,
        |       round(l[CAST(n // 2 AS INT) + 1], 2) AS qhigh,
        |       round(l[CAST(floor(CAST(0.77 AS DOUBLE) * n) AS INT) + 1], 2)
        |         AS qexact
        |FROM g ORDER BY rf""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT l_returnflag AS rf,
          |       round(toFloat64(quantileExactLow(0.5)(l_quantity)), 2) AS qlow,
          |       round(toFloat64(quantileExactHigh(0.5)(l_quantity)), 2) AS qhigh,
          |       round(toFloat64(quantileExact(0.77)(l_quantity)), 2) AS qexact
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin, dir)
    },

    // Inclusive (R-7, = quantile_cont) and Exclusive (R-6) interpolated
    // variants (ref QuantileExact.h QuantileExactInclusive/Exclusive):
    // the oracle restates the h = level·(n±1) arithmetic in Float64
    Q.df("q_quantile_interp_variants",
      """WITH g AS (SELECT l_returnflag AS rf,
        |                  list(CAST(l_quantity AS DOUBLE) ORDER BY l_quantity) AS l,
        |                  count(*) AS n,
        |                  quantile_cont(CAST(l_quantity AS DOUBLE), 0.77) AS qc
        |           FROM lineitem GROUP BY 1),
        |h AS (SELECT rf, l, n, qc,
        |             CAST(0.77 AS DOUBLE) * (n + 1) AS hh FROM g)
        |SELECT rf,
        |       round(qc, 4) AS qinc,
        |       round(CASE WHEN floor(hh) >= n THEN l[CAST(n AS INT)]
        |                  WHEN floor(hh) < 1 THEN l[1]
        |                  ELSE l[CAST(floor(hh) AS INT)] + (hh - floor(hh)) *
        |                       (l[CAST(floor(hh) AS INT) + 1] -
        |                        l[CAST(floor(hh) AS INT)])
        |             END, 4) AS qexc
        |FROM h ORDER BY rf""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT l_returnflag AS rf,
          |       round(quantileExactInclusive(0.77)(l_quantity), 4) AS qinc,
          |       round(quantileExactExclusive(0.77)(l_quantity), 4) AS qexc
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin, dir)
    },

    // weighted quantiles (ref QuantileExactWeighted.h discrete pick,
    // QuantileInterpolatedWeighted.h distribution interpolation): the
    // oracle rebuilds the cumulative-weight walk with window functions
    Q.df("q_quantile_weighted_variants",
      """WITH b AS (SELECT l_returnflag AS rf,
        |                  CAST(l_quantity AS DOUBLE) AS v,
        |                  CAST(l_linenumber AS DOUBLE) AS wt
        |           FROM lineitem),
        |c AS (SELECT rf, v,
        |             sum(wt) OVER (PARTITION BY rf ORDER BY v) AS cum,
        |             ceil(CAST(0.6 AS DOUBLE) *
        |                  sum(wt) OVER (PARTITION BY rf)) AS th
        |      FROM b),
        |disc AS (SELECT rf, round(min(CASE WHEN cum >= th THEN v END), 2)
        |                  AS qw
        |         FROM c GROUP BY rf),
        |d AS (SELECT rf, v, sum(wt) AS w FROM b GROUP BY rf, v),
        |x AS (SELECT rf, v, w,
        |             sum(w) OVER (PARTITION BY rf ORDER BY v) AS cum,
        |             sum(w) OVER (PARTITION BY rf) AS tot
        |      FROM d),
        |p AS (SELECT rf, v, (cum - 0.5 * w) / tot AS xx FROM x),
        |seg AS (SELECT rf, v AS yl, xx AS xl,
        |               lead(v) OVER (PARTITION BY rf ORDER BY xx) AS yr,
        |               lead(xx) OVER (PARTITION BY rf ORDER BY xx) AS xr
        |        FROM p),
        |lim AS (SELECT rf, min(xx) AS mn, arg_min(v, xx) AS firstv,
        |               arg_max(v, xx) AS lastv
        |        FROM p GROUP BY rf),
        |itp AS (SELECT rf,
        |               max(yl + (yr - yl) * (0.5 - xl) / (xr - xl)) AS iv
        |        FROM seg WHERE xl <= 0.5 AND xr >= 0.5 GROUP BY rf)
        |SELECT l.rf AS rf, disc.qw AS qw,
        |       round(coalesce(itp.iv,
        |             CASE WHEN 0.5 < l.mn THEN l.firstv ELSE l.lastv END), 4)
        |         AS qi
        |FROM lim l
        |LEFT JOIN itp ON l.rf = itp.rf
        |JOIN disc ON l.rf = disc.rf
        |ORDER BY rf""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT l_returnflag AS rf,
          |       round(toFloat64(quantileExactWeighted(0.6)(l_quantity,
          |             l_linenumber)), 2) AS qw,
          |       round(toFloat64(quantileInterpolatedWeighted(0.5)(
          |             l_quantity, l_linenumber)), 4) AS qi
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin, dir)
    },

    // quantileTimingWeighted (ref QuantileTiming.h): value discretization
    // (exact < 1024, 16-wide buckets to 30000) + element at rank
    // floor(level·N) of the weight-expanded multiset
    Q.df("q_quantile_timing_weighted",
      """WITH b AS (SELECT user_id % 4 AS g,
        |                  CASE WHEN event_id % 5000 > 30000 THEN 30000
        |                       WHEN event_id % 5000 < 1024 THEN event_id % 5000
        |                       ELSE 1024 + ((event_id % 5000 - 1024) // 16) * 16
        |                  END AS v,
        |                  CAST(event_id % 7 + 1 AS DOUBLE) AS wt
        |           FROM events),
        |c AS (SELECT g, v,
        |             sum(wt) OVER (PARTITION BY g ORDER BY v) AS cum,
        |             floor(CAST(0.9 AS DOUBLE) *
        |                   sum(wt) OVER (PARTITION BY g)) + 1 AS r
        |      FROM b)
        |SELECT g, CAST(min(CASE WHEN cum >= r THEN v END) AS DOUBLE) AS qt
        |FROM c GROUP BY g ORDER BY g""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT user_id % 4 AS g,
          |       quantileTimingWeighted(0.9)(event_id % 5000,
          |                                   event_id % 7 + 1) AS qt
          |FROM events GROUP BY user_id % 4
          |ORDER BY g""".stripMargin, dir)
    },

    // co-moment matrix family (ref AggregateFunctionVarianceMatrix.cpp):
    // the oracle assembles pairwise corr()/covar_pop() into the same
    // flattened upper-row form
    Q.df("q_corr_matrix",
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS c12,
        |       round(corr(l_quantity, l_discount), 6) AS c13,
        |       round(corr(l_extendedprice, l_discount), 6) AS c23,
        |       round(covar_pop(l_quantity, l_extendedprice), 4) AS p12,
        |       round(covar_samp(l_quantity, l_discount), 6) AS s13
        |FROM lineitem""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT round(corrMatrix(l_quantity, l_extendedprice,
          |                        l_discount)[1][2], 6) AS c12,
          |       round(corrMatrix(l_quantity, l_extendedprice,
          |                        l_discount)[1][3], 6) AS c13,
          |       round(corrMatrix(l_quantity, l_extendedprice,
          |                        l_discount)[2][3], 6) AS c23,
          |       round(covarPopMatrix(l_quantity,
          |                        l_extendedprice)[1][2], 4) AS p12,
          |       round(covarSampMatrix(l_quantity,
          |                        l_discount)[1][2], 6) AS s13
          |FROM lineitem""".stripMargin, dir)
    },

    // Object('json') subcolumn access over events.props (SURVEY §1.1 —
    // dynamic JSON paths map to get_json_object/JSONExtract*)
    Q.df("q_json_subcolumns",
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
        |            AS BIGINT) AS sk,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS INT))
        |            AS BIGINT) AS mk,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
      ChSql.sql(s,
        """SELECT event_type,
          |       sum(JSONExtractInt(props, 'k')) AS sk,
          |       CAST(max(JSONExtractInt(props, 'k')) AS BIGINT) AS mk,
          |       count() AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
        dir)
    },

    // sparkbar re-expressed in DuckDB SQL (bucket index, integer-division
    // bucket average, 7-level scaling — AggregateFunctionSparkbar.h
    // semantics hold in plain SQL because y here is always positive, so
    // the auto range equals min/max of the grouped points); stem's output
    // on a constant input is a constant
    Q.df("q_sparkbar_stem",
      """WITH pts AS (
        |  SELECT user_id % 50 AS x, SUM(event_id % 100 + 1) AS y
        |  FROM events GROUP BY 1
        |), rng AS (
        |  SELECT MIN(x) AS fromx, MAX(x) AS tox FROM pts
        |), hist AS (
        |  SELECT LEAST(CAST(trunc(10.0 / (tox - fromx + 1) * (x - fromx))
        |           AS BIGINT), 9) AS idx,
        |         SUM(y) // COUNT(*) AS v
        |  FROM pts, rng GROUP BY 1
        |), buckets AS (
        |  SELECT CAST(i AS BIGINT) AS i, COALESCE(v, 0) AS v
        |  FROM (SELECT unnest(range(0, 10)) AS i) ix
        |  LEFT JOIN hist ON idx = i
        |)
        |SELECT string_agg(CASE WHEN v <= 0 THEN ' '
        |    ELSE substring(' ▁▂▃▄▅▆▇█',
        |      CAST(v * 7 // (SELECT MAX(v) FROM buckets WHERE v > 0) + 1
        |        AS INT) + 1, 1) END, '' ORDER BY i) AS bar,
        |  'collect' AS st
        |FROM buckets""".stripMargin) { (s, dir) =>
      ChSql.sql(s,
        """SELECT sparkbar(10)(user_id % 50, event_id % 100 + 1) AS bar,
          |       stem('en', 'collection') AS st
          |FROM events""".stripMargin, dir)
    },

    // stochastic regression family (functions/MLRegression.scala): the
    // linear path is closed-form ridge — deterministic, so the exact
    // prediction on exact planar data is a pinnable constant (the value
    // the reference's SGD converges toward; no cross-engine SGD oracle
    // is possible). lineitem-derived planar target keeps it on fixtures.
    Q.df("q_ml_regression",
      "SELECT CAST(32.0 AS DOUBLE) AS p") { (s, dir) =>
      import org.apache.spark.sql.functions._
      graft.Tables.register(s, dir)
      s.range(400).select(
        (col("id") % 20).cast("double").as("x1"),
        (col("id") / 20).cast("double").as("x2"))
        .withColumn("y", col("x1") * 2 + col("x2") * 3 + 1)
        .createOrReplaceTempView("mlr_q")
      ChSql.sql(s,
        """WITH (SELECT stochasticLinearRegression(0.1, 0.0, 5, 'SGD')(y, x1, x2)
          |      FROM mlr_q) AS model
          |SELECT round(evalMLMethod(model, 5.0, 7.0), 4) AS p""".stripMargin,
        dir)
    },

    // H3 table-free family (functions/H3Ch.scala): the oracle pins the
    // reference's own outputs (00926/01040/01070/02155/02165 fixtures) as
    // literals — DuckDB has no H3, but the expected values are constants
    Q.df("q_h3_family",
      """SELECT * FROM (VALUES
        |  ('base_cell',   CAST(12 AS BIGINT)),
        |  ('center15',    CAST(644542512295313408 AS BIGINT)),
        |  ('is_pentagon', CAST(1 AS BIGINT)),
        |  ('is_valid',    CAST(1 AS BIGINT)),
        |  ('num_hex10',   CAST(33897029882 AS BIGINT)),
        |  ('parent0',     CAST(576918149140578303 AS BIGINT)),
        |  ('parent3',     CAST(590398848891879423 AS BIGINT)),
        |  ('res10',       CAST(10 AS BIGINT)),
        |  ('string_to',   CAST(617420388351344639 AS BIGINT))
        |) AS t(op, v) ORDER BY op""".stripMargin) { (s, dir) =>
      // outer subquery: CH binds a trailing ORDER BY to the LAST union
      // branch, so the global sort needs the wrap (same in both dialects)
      ChSql.sql(s,
        """SELECT op, v FROM (
        |SELECT 'base_cell' AS op,
        |       toInt64(h3GetBaseCell(612916788725809151)) AS v
        |UNION ALL SELECT 'center15',
        |       toInt64(h3ToCenterChild(577023702256844799, 15))
        |UNION ALL SELECT 'is_pentagon',
        |       toInt64(h3IsPentagon(stringToH3('821c07fffffffff')))
        |UNION ALL SELECT 'is_valid',
        |       toInt64(h3IsValid(581276613233082367))
        |UNION ALL SELECT 'num_hex10', toInt64(h3NumHexagons(10))
        |UNION ALL SELECT 'parent0',
        |       toInt64(h3ToParent(599405990164561919, 0))
        |UNION ALL SELECT 'parent3',
        |       toInt64(h3ToParent(599405990164561919, 3))
        |UNION ALL SELECT 'res10',
        |       toInt64(h3GetResolution(621807531097128959))
        |UNION ALL SELECT 'string_to',
        |       toInt64(stringToH3('89184926cc3ffff'))
        |) ORDER BY op""".stripMargin, dir)
    })
}
