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
    ddl("CREATE TABLE r11b (b Bool, nb Nullable(Bool)) ENGINE = Memory")
    ddl("INSERT INTO r11b VALUES (true, false)")
    try {
      val r = ch("SELECT toTypeName(b) AS tb, toTypeName(nb) AS tnb FROM r11b")
        .collect().head
      assert(r.getString(0) == "Bool", r.getString(0))
      assert(r.getString(1) == "Nullable(Bool)", r.getString(1))
    } finally ddl("DROP TABLE r11b")
  }
}
