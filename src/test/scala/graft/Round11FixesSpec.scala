package graft

/** Round-11 pins (one guard per advice-r10 item — the negative space
  * each rewrite must NOT touch, per the dialect-shim guard-spec rule):
  *
  *  - rewriteTableAliasQualifiers must not rewrite `t.` inside a scope
  *    where `t` is used UNALIASED (its own subquery FROM) — substituting
  *    the outer alias would silently create a correlated outer reference
  *    (ref src/Interpreters/DatabaseAndTableWithAlias: resolution is
  *    per-scope).
  *  - system.numbers is bounded only by a LIMIT that lexically GOVERNS
  *    the scan (same or enclosing depth, non-aggregating select) or by
  *    max_rows_to_read under read_overflow_mode='break', whose VALUE is
  *    the bound (ref src/QueryPipeline/SizeLimits). A LIMIT inside an
  *    unrelated subquery, or max_rows_to_read under the default 'throw'
  *    mode, leaves the scan unbounded → rejected.
  *  - merge() emits `_table` AFTER the data columns, rejects statements
  *    whose bare `*` would absorb the virtual column, and rejects
  *    mismatched branch schemas (ref src/Storages/StorageMerge.cpp:
  *    virtuals are excluded from star expansion; schemas unify by name).
  *  - toTypeName over a column DECLARED Bool reports Bool even when the
  *    static fold cannot prove it (storage is a plain Spark boolean).
  */
class Round11FixesSpec extends SparkSpec {

  private def ch(q: String) = ChSql.sql(spark, q, SparkSpec.tiny)

  // ---- alias-qualifier rewrite scope ----

  test("alias qualifier rewrite skips tables also used unaliased") {
    val sql = "SELECT 1 FROM tbl AS a WHERE a.x IN (SELECT tbl.y FROM tbl)"
    val out = ChSql.rewriteTableAliasQualifiers(sql)
    assert(out == sql, out) // tbl.y must stay tbl.y
  }

  test("alias qualifier rewrite still fires when every use is aliased") {
    val out = ChSql.rewriteTableAliasQualifiers(
      "SELECT t.a FROM tbl AS t JOIN u AS v ON tbl.a = u.b")
    assert(out.contains("ON t.a = v.b"), out)
  }

  // ---- system.numbers bounding ----

  test("LIMIT in an unrelated subquery does not bound system.numbers") {
    intercept[Exception] {
      ch("""SELECT count() FROM system.numbers
           |WHERE number IN (SELECT number FROM numbers(5) LIMIT 3)"""
        .stripMargin).collect()
    }
  }

  test("LIMIT over an aggregate of system.numbers does not bound it") {
    // `SELECT count() FROM system.numbers LIMIT 5` limits the 1-row
    // aggregate result, not the infinite read — the reference never
    // terminates here
    intercept[Exception] {
      ch("SELECT count() FROM system.numbers LIMIT 5").collect()
    }
  }

  test("governing LIMIT in an enclosing query bounds the scan") {
    val r = ch("SELECT * FROM (SELECT number FROM system.numbers) LIMIT 4")
      .collect()
    assert(r.length == 4)
  }

  test("max_rows_to_read bounds system.numbers only under break mode") {
    try {
      spark.conf.set("graft.ch.max_rows_to_read", "100")
      // default overflow mode is 'throw' → the reference raises
      // TOO_MANY_ROWS, not a finite result: stay unhandled
      intercept[Exception] {
        ch("SELECT count() FROM system.numbers").collect()
      }
      spark.conf.set("graft.ch.read_overflow_mode", "break")
      val n = ch("SELECT count() AS c FROM system.numbers")
        .collect().head.getLong(0)
      assert(n == 100L, s"break-mode bound should be the setting value, got $n")
    } finally {
      spark.conf.unset("graft.ch.max_rows_to_read")
      spark.conf.unset("graft.ch.read_overflow_mode")
    }
  }

  // ---- merge() virtual column placement ----

  private def ddl(q: String): Unit =
    assert(graft.golden.DdlEmu.handle(spark, SparkSpec.tiny, q), q)

  test("merge() star expansion with _table elsewhere stays unhandled") {
    ddl("CREATE TABLE r11m1 (x UInt32) ENGINE = Memory")
    ddl("CREATE TABLE r11m2 (x UInt32) ENGINE = Memory")
    ddl("INSERT INTO r11m1 VALUES (1)")
    ddl("INSERT INTO r11m2 VALUES (2)")
    try {
      // explicit select list: _table resolves, placed after data cols
      val rows = ch(
        "SELECT x, _table FROM merge(currentDatabase(), '^r11m\\d$') ORDER BY x")
        .collect()
      assert(rows.map(r => (r.get(0).toString.toLong, r.getString(1)))
        .toSeq == Seq((1L, "r11m1"), (2L, "r11m2")))
      // filter on the virtual column without selecting it
      val c = ch("SELECT count() AS c FROM merge(currentDatabase(), " +
        "'^r11m\\d$') WHERE _table = 'r11m2'").collect().head.getLong(0)
      assert(c == 1L)
      // bare * + _table: the reference excludes virtuals from star
      // expansion; a UNION ALL column can't — must stay unhandled
      intercept[Exception] {
        ch("SELECT * FROM merge(currentDatabase(), '^r11m\\d$') " +
          "WHERE _table = 'r11m1'").collect()
      }
    } finally {
      ddl("DROP TABLE r11m1"); ddl("DROP TABLE r11m2")
    }
  }

  test("merge() over mismatched schemas stays unhandled") {
    ddl("CREATE TABLE r11n1 (x UInt32) ENGINE = Memory")
    ddl("CREATE TABLE r11n2 (y String) ENGINE = Memory")
    try {
      intercept[Exception] {
        ch("SELECT x FROM merge(currentDatabase(), '^r11n\\d$')").collect()
      }
    } finally {
      ddl("DROP TABLE r11n1"); ddl("DROP TABLE r11n2")
    }
  }

  // ---- declared-Bool toTypeName ----

  test("toTypeName reports Bool for a declared Bool column") {
    // the toTypeName fold resolves declared types by column name —
    // clear state another suite's tables may have left for `b`
    graft.golden.DdlEmu.resetSession(spark)
    ddl("CREATE TABLE r11b (b Bool, nb Nullable(Bool)) ENGINE = Memory")
    ddl("INSERT INTO r11b VALUES (true, false)")
    try {
      val r = ch("SELECT toTypeName(b) AS tb, toTypeName(nb) AS tnb FROM r11b")
        .collect().head
      assert(r.getString(0) == "Bool", r.getString(0))
      assert(r.getString(1) == "Nullable(Bool)", r.getString(1))
    } finally ddl("DROP TABLE r11b")
  }

  // ---- ALIAS columns (computed at read, hidden from star) ----

  test("ALIAS columns resolve explicitly, stay out of star expansion") {
    ddl("CREATE TABLE r11a (a UInt32, b Int32, c UInt8 ALIAS a, " +
      "d Int64 ALIAS b + 1) ENGINE = Memory")
    ddl("INSERT INTO r11a (a, b) VALUES (7, 10)")
    try {
      val r = ch("SELECT a, c, d FROM r11a").collect().head
      assert(r.get(1).toString.toLong == 7L && r.get(2).toString.toLong == 11L)
      // star excludes ALIAS columns (ref TranslateQualifiedNamesVisitor)
      assert(ch("SELECT * FROM r11a").columns.toSeq == Seq("a", "b"))
      // WHERE on an alias column works (it lives on the view)
      assert(ch("SELECT count() AS n FROM r11a WHERE c = 7")
        .collect().head.getLong(0) == 1L)
    } finally ddl("DROP TABLE r11a")
  }

  test("star rewrite leaves tables without hidden columns alone") {
    // negative space: no ALIAS/MATERIALIZED → the rewrite must not fire
    val sql = "SELECT * FROM lineitem WHERE l_quantity > 49"
    assert(ChSql.rewriteStarHidden(sql) == sql)
  }

  // ---- DESC TABLE (CH 7-column shape, maintained through ALTER) ----

  test("DESC TABLE reports CH types and default kinds after ALTER") {
    ddl("CREATE TABLE r11d (x UInt32, z UInt64) ENGINE = Memory")
    ddl("ALTER TABLE r11d ADD COLUMN y String MATERIALIZED toString(x) AFTER x")
    try {
      val rows = ch("DESC TABLE r11d").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
      assert(rows(1).getString(1) == "String" &&
        rows(1).getString(2) == "MATERIALIZED" &&
        rows(1).getString(3) == "toString(x)", rows.mkString("|"))
    } finally ddl("DROP TABLE r11d")
  }

  // ---- union-positional supertype in the static toTypeName fold ----

  test("toTypeName over UNION branches takes the least supertype") {
    val r1 = ch("SELECT x, toTypeName(x) AS t FROM " +
      "(SELECT 1 AS x UNION ALL SELECT -1) ORDER BY x DESC").collect()
    assert(r1.forall(_.getString(1) == "Int16"), r1.mkString("|"))
    val r2 = ch("SELECT toTypeName(x) AS t FROM " +
      "(SELECT 1 AS x UNION ALL SELECT NULL)").collect()
    assert(r2.forall(_.getString(0) == "Nullable(UInt8)"), r2.mkString("|"))
    // negative space: subquery REBINDING (no union) keeps first-binding
    // behavior — the 01455 class must not regress
    val r3 = ch("SELECT toTypeName(number) AS t FROM " +
      "(SELECT CAST(number, 'Nullable(UInt8)') AS number FROM numbers(1))")
      .collect()
    assert(r3.head.getString(0) == "Nullable(UInt8)", r3.mkString("|"))
  }

  // ---- input_format_null_as_default ----

  test("NULL into a non-Nullable column takes the DEFAULT (VALUES only)") {
    ddl("CREATE TABLE r11n (x Nullable(String) DEFAULT 'Hello', " +
      "y String DEFAULT 'World') ENGINE = Memory")
    ddl("INSERT INTO r11n VALUES (NULL, NULL)")
    try {
      val r = ch("SELECT x, y FROM r11n").collect().head
      assert(r.isNullAt(0), "Nullable column keeps the NULL")
      assert(r.getString(1) == "World", "non-Nullable takes the default")
    } finally ddl("DROP TABLE r11n")
  }

  // ---- DateTime64(p) declared columns display p fractional digits ----

  test("declared DateTime64 column renders its scale") {
    ddl("CREATE TABLE r11t (dt6 DateTime64(6, 'UTC'), dt3 DateTime64(3, 'UTC')) ENGINE = Memory")
    ddl("INSERT INTO r11t VALUES ('2019-09-16 19:20:33.123000', '2019-09-16 19:20:33.123')")
    try {
      val rows = graft.golden.Golden.formatDf(ch("SELECT dt6, dt3 FROM r11t"))
      assert(rows.head == "2019-09-16 19:20:33.123000\t2019-09-16 19:20:33.123",
        rows.head)
      // comparisons across scales still work through the UDT lowering
      assert(ch("SELECT dt6 = dt3 AS eq FROM r11t").collect().head
        .get(0).toString == "true")
    } finally ddl("DROP TABLE r11t")
  }

  // ---- session settings limit/offset ----

  test("SET limit/offset compose with the statement's own window") {
    try {
      spark.conf.set("graft.ch.limit", "5")
      val r = ch("SELECT number FROM numbers(100)").collect()
      assert(r.length == 5)
      spark.conf.set("graft.ch.offset", "3")
      // query LIMIT 10 OFFSET 20 + setting (5, 3): start 23, rows
      // min(5, 10-3) = 5
      val r2 = ch("SELECT number FROM numbers(100) LIMIT 10 OFFSET 20")
        .collect().map(_.getLong(0)).toSeq
      assert(r2 == Seq(23L, 24L, 25L, 26L, 27L), r2)
    } finally {
      spark.conf.unset("graft.ch.limit")
      spark.conf.unset("graft.ch.offset")
    }
  }

  // ---- PREWHERE next to a table NAMED prewhere ----

  test("PREWHERE+WHERE rewrite skips a table named prewhere") {
    ddl("CREATE TABLE prewhere (x Array(UInt64), s String) ENGINE = Memory")
    ddl("INSERT INTO prewhere VALUES ([1], 'a')")
    try {
      val n = ch("SELECT count() AS n FROM prewhere PREWHERE " +
        "(length(s) >= 1) = 0 WHERE NOT ignore(x)").collect().head.getLong(0)
      assert(n == 0L)
    } finally ddl("DROP TABLE prewhere")
  }

  // ---- double-quoted identifiers ----

  test("double-quoted tokens are identifiers, not strings") {
    val r = ch("SELECT \"number\" FROM numbers(3) WHERE \"number\" > 1")
      .collect()
    assert(r.length == 1 && r.head.getLong(0) == 2L)
  }
}
