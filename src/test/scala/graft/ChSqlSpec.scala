package graft

/** Dialect-shim translations added in round 4: WITH TOTALS → grouping
  * sets, ORDER BY ... WITH FILL → the WithFill operator, tuple access,
  * keyword-adjacent array literals, join strictness stripping. */
class ChSqlSpec extends SparkSpec {

  test("WITH TOTALS yields a separate totals stream with default keys") {
    val (base, totals) = ChSql.sqlSplit(spark,
      """SELECT n_regionkey, count() AS c FROM nation
        |GROUP BY n_regionkey WITH TOTALS ORDER BY n_regionkey NULLS LAST
        |""".stripMargin, SparkSpec.tiny)
    assert(base.collect().length === 5) // regular rows only
    val tot = totals.get.collect()
    assert(tot.length === 1)
    assert(tot(0).getInt(0) === 0) // CH fills keys with type defaults
    assert(tot(0).getLong(1) === 25L)
  }

  test("ORDER BY WITH FILL FROM/TO/STEP generates the missing rows") {
    val rows = ChSql.sql(spark,
      """SELECT n_regionkey * 2 AS k, count() AS c FROM nation
        |GROUP BY k ORDER BY k WITH FILL FROM 0 TO 12 STEP 2""".stripMargin,
      SparkSpec.tiny).collect()
    // TO is exclusive (ref FillingRow boundary): grid stops below 12
    assert(rows.map(_.getAs[Number](0).longValue).toSeq ===
      Seq(0L, 2L, 4L, 6L, 8L, 10L))
    // filled rows carry type defaults (join_use_nulls=0 contract):
    // k=10 is off the data grid and gets c=0
    assert(rows.count(r => r.getAs[Number](1).longValue == 0L) === 1)
  }

  test("ORDER BY WITH FILL without bounds spans min..max of the result") {
    val rows = ChSql.sql(spark,
      """SELECT n_regionkey * 3 AS k, count() AS c FROM nation
        |WHERE n_regionkey IN (0, 2) GROUP BY k ORDER BY k WITH FILL""".stripMargin,
      SparkSpec.tiny).collect()
    assert(rows.map(_.getAs[Number](0).longValue).toSeq === (0L to 6L).toSeq)
  }

  test("tuple access t.1 maps to Spark's col1 field") {
    val r = ChSql.sql(spark,
      "SELECT tuple(41, 'x').1 AS a, tuple(41, 'x').2 AS b",
      SparkSpec.tiny).collect()(0)
    assert(r.getInt(0) === 41)
    assert(r.getString(1) === "x")
  }

  test("array literal after a keyword is not a subscript; decimals survive") {
    val r = ChSql.sql(spark,
      "SELECT [1, 2, 3][2] AS x, 0.5 AS d", SparkSpec.tiny).collect()(0)
    assert(r.getInt(0) === 2)
    // Spark parses 0.5 as DECIMAL(1,1) — the point is the dot survived
    // the tuple-access rewrite
    assert(r.getDecimal(1).doubleValue === 0.5)
  }

  test("over-UInt64 integer literals are Float64: value and type agree") {
    // CH's parser reads integers beyond UInt64 max as Float64
    // (ParserNumber fallback): 2^64 prints in float form and toTypeName
    // must say Float64 — not an exact DECIMAL with a Float64 label
    val r = ChSql.sql(spark,
      "SELECT 18446744073709551616 AS v, toTypeName(18446744073709551616) AS t",
      SparkSpec.tiny).head
    assert(r.get(0) === 1.8446744073709552e19)
    assert(r.getString(1) === "Float64")
    // UInt64 max itself stays exact
    val m = ChSql.sql(spark,
      "SELECT toTypeName(18446744073709551615) AS t", SparkSpec.tiny).head
    assert(m.getString(0) === "UInt64")
  }

  test("ANY/ALL join strictness strips to plain joins") {
    val n = ChSql.sql(spark,
      """SELECT count() AS c FROM nation AS n
        |ANY LEFT JOIN region AS r ON n.n_regionkey = r.r_regionkey""".stripMargin,
      SparkSpec.tiny).collect()(0).getLong(0)
    assert(n === 25L)
  }

  test("ROLLUP fills only subtotal rows; genuine NULL data keys survive") {
    // k is NULL on one data row; the subtotal row's masked slot gets the
    // type default (0) while the data row's NULL must stay NULL
    val rows = ChSql.sql(spark,
      """SELECT k, count() AS c FROM
        |  (SELECT if(number = 0, NULL, number % 2) AS k
        |   FROM numbers(5))
        |GROUP BY k WITH ROLLUP ORDER BY c, k NULLS FIRST""".stripMargin,
      SparkSpec.tiny).collect()
    // groups: NULL×1, 0×2, 1×2, rollup total ×5 (key filled to 0)
    val asPairs = rows.map(r =>
      (if (r.isNullAt(0)) null else r.getAs[Number](0).longValue,
        r.getLong(1))).toSeq
    assert(asPairs.contains((null, 1L)), s"data NULL row lost: $asPairs")
    assert(asPairs.contains((0L, 5L)), s"subtotal not filled: $asPairs")
  }

  test("ROLLUP key list splits paren-aware (function keys intact)") {
    val rows = ChSql.sql(spark,
      """SELECT concat(n_name, '!') AS tag, n_regionkey, count() AS c
        |FROM nation GROUP BY concat(n_name, '!'), n_regionkey WITH ROLLUP
        |ORDER BY c DESC, tag NULLS FIRST, n_regionkey NULLS FIRST
        |LIMIT 1""".stripMargin, SparkSpec.tiny).collect()
    // grand-total row: function key not fillable by name (stays NULL via
    // fallback) but the bare key n_regionkey fills to 0 and count is 25
    assert(rows(0).getLong(2) === 25L)
    assert(rows(0).getAs[Number](1).longValue === 0L)
  }

  test("bare ARRAY JOIN rename leaves string literals alone") {
    val r = ChSql.sql(spark,
      """SELECT 'd is big' AS msg, d FROM
        |  (SELECT [1, 2] AS d) ARRAY JOIN d ORDER BY d""".stripMargin,
      SparkSpec.tiny).collect()
    assert(r.map(_.getString(0)).toSeq === Seq("d is big", "d is big"))
    assert(r.map(_.getAs[Number](1).intValue).toSeq === Seq(1, 2))
  }

  test("comparisons against nan are NULL when the other side is NULL") {
    val r = ChSql.sql(spark,
      """SELECT nan = NULL AS a, nan < materialize(NULL) AS b,
        |       nan = 1.0 AS c""".stripMargin, SparkSpec.tiny).collect()(0)
    assert(r.isNullAt(0), "nan = NULL must be NULL")
    assert(r.isNullAt(1), "nan < NULL must be NULL")
    assert(r.getBoolean(2) === false)
  }

  test("argMinArray skips rows with empty value arrays") {
    val r = ChSql.sql(spark,
      """SELECT argMinArray(a, v) AS m FROM
        |  (SELECT ['x', 'y'] AS a, [2, 1] AS v
        |   UNION ALL SELECT [], [])""".stripMargin,
      SparkSpec.tiny).collect()(0)
    assert(r.getString(0) === "y")
  }
}
