package graft

/** Round-10 pins:
  *  - EXPLAIN surface (ref src/Parsers/ASTExplainQuery.h:20-27) — each
  *    kind succeeds with a meaningful Spark-analogue rendering.
  *  - uniq* sketch param forms skip NULLs like the 1-arg form (the
  *    appended precision constant must not struct-wrap the column; ref
  *    AggregateFunctionUniqCombined.h NULL-skipping via nullable
  *    adaptor).
  *  - joinGet over a composite-key StorageJoin probes ALL keys (ref
  *    src/Functions/FunctionJoinGet.cpp) and rejects arity mismatch.
  *  - system.numbers without LIMIT is rejected, with LIMIT it is the
  *    lazy generator (ref src/Storages/System/StorageSystemNumbers.cpp:
  *    the table is infinite — an unbounded read never terminates).
  *  - CH wrapping integer arithmetic stays scoped to CH statements:
  *    Spark-native pipelines in the same session keep ANSI overflow.
  */
class Round10FixesSpec extends SparkSpec {

  private def ch(q: String) = ChSql.sql(spark, q, SparkSpec.tiny)

  // ---- EXPLAIN surface ----

  test("EXPLAIN (default PLAN) returns a non-empty optimized plan") {
    val rows = ch("EXPLAIN SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY l_returnflag")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).exists(_.contains("Aggregate")))
  }

  test("EXPLAIN PIPELINE returns the physical plan") {
    val rows = ch("EXPLAIN PIPELINE SELECT count() FROM orders").collect()
    assert(rows.map(_.getString(0)).mkString("\n").toLowerCase
      .contains("hashaggregate"))
  }

  test("EXPLAIN SYNTAX returns the rewritten (translated) statement") {
    val rows = ch("EXPLAIN SYNTAX SELECT toInt32(1) x FROM numbers(3)")
      .collect()
    val text = rows.map(_.getString(0)).mkString("\n")
    assert(text.toLowerCase.contains("select"))
  }

  test("EXPLAIN AST returns a parsed tree") {
    assert(ch("EXPLAIN AST SELECT 1 + 2").collect().nonEmpty)
  }

  test("EXPLAIN QUERY TREE returns the analyzed plan") {
    assert(ch("EXPLAIN QUERY TREE SELECT n_name FROM nation").collect()
      .nonEmpty)
  }

  test("EXPLAIN ESTIMATE returns per-scan estimate rows") {
    val df = ch("EXPLAIN ESTIMATE SELECT * FROM lineitem WHERE l_quantity > 10")
    assert(df.columns.toSeq == Seq("database", "table", "parts", "rows", "bytes"))
    assert(df.collect().nonEmpty)
  }

  test("EXPLAIN with options before the statement still parses") {
    assert(ch("EXPLAIN PLAN header = 1, actions = 1 SELECT 1").collect()
      .nonEmpty)
  }

  // ---- uniq* param-form NULL semantics ----

  test("uniqCombined(K)(x) skips NULLs exactly like uniqCombined(x)") {
    val r = ch("""SELECT uniqCombined(17)(x) AS a, uniqCombined(x) AS b,
                 |       uniqHLL12(x) AS c, uniqTheta(x) AS d
                 |FROM (SELECT if(number % 3 = 0, NULL, number % 50) AS x
                 |      FROM numbers(1000))""".stripMargin).collect().head
    // 50 non-null distinct values (every residue 0..49 occurs at some
    // number with number%3≠0); the struct-wrap bug counted NULL as one
    // more (51). Sketches at this size are exact.
    assert(r.getLong(0) == r.getLong(1),
      s"param form ${r.getLong(0)} != bare form ${r.getLong(1)}")
    assert(r.getLong(0) == 50)
  }

  test("uniq sketch multi-column tuple form still works") {
    val r = ch("""SELECT uniqCombined(number % 5, number % 3) AS t
                 |FROM numbers(100)""".stripMargin).collect().head
    assert(r.getLong(0) == 15)
  }

  // ---- joinGet composite keys ----

  test("joinGet over a composite-key Join table probes all keys") {
    graft.golden.DdlEmu.handle(spark, SparkSpec.tiny,
      "CREATE TABLE jg2 (k1 UInt32, k2 String, v String) " +
        "ENGINE = Join(ANY, LEFT, k1, k2)")
    graft.golden.DdlEmu.handle(spark, SparkSpec.tiny,
      "INSERT INTO jg2 VALUES (1, 'a', 'one-a'), (1, 'b', 'one-b'), (2, 'a', 'two-a')")
    val r = ch("""SELECT joinGet('jg2', 'v', toUInt32(1), 'b') AS x,
                 |       joinGetOrNull('jg2', 'v', toUInt32(1), 'z') AS miss""".stripMargin)
      .collect().head
    assert(r.getString(0) == "one-b")
    assert(r.isNullAt(1))
    // arity mismatch must throw, not silently probe one key
    intercept[Exception] {
      ch("SELECT joinGet('jg2', 'v', toUInt32(1))").collect()
    }
    graft.golden.DdlEmu.handle(spark, SparkSpec.tiny, "DROP TABLE jg2")
  }

  // ---- system.numbers LIMIT contract ----

  test("system.numbers with LIMIT works; without LIMIT is rejected") {
    val ok = ch("SELECT count() FROM (SELECT number FROM system.numbers LIMIT 7)")
      .collect().head.getLong(0)
    assert(ok == 7)
    intercept[Exception] {
      ch("SELECT count() FROM system.numbers").collect()
    }
  }

  // ---- table-name-through-alias guards (advice r9: the rewrite must
  // skip dotted-qualified occurrences and double-aliased tables) ----

  test("rewriteTableAliasQualifiers rewrites table-name refs to the alias") {
    val out = ChSql.rewriteTableAliasQualifiers(
      "SELECT t.a FROM tbl AS t JOIN u AS v ON tbl.a = u.b")
    assert(out.contains("ON t.a = v.b"), out)
  }

  test("rewriteTableAliasQualifiers skips dotted-qualified and double aliases") {
    // db.tbl.col must not become db.t.col
    val a = ChSql.rewriteTableAliasQualifiers(
      "SELECT db.tbl.a FROM tbl AS t WHERE tbl.a > 0")
    assert(a.contains("db.tbl.a") && a.contains("WHERE t.a > 0"), a)
    // a table aliased twice is ambiguous — no rewrite at all
    val b = ChSql.rewriteTableAliasQualifiers(
      "SELECT 1 FROM tbl AS x JOIN tbl AS y ON tbl.a = y.a")
    assert(b.contains("tbl.a"), b)
  }

  test("keyword scanner treats underscore as a word character") {
    // `having_check` must not read as the HAVING keyword (r9 regression)
    val out = ChSql.rewriteAliasRefs(
      "SELECT date AS period, 1 AS having_check FROM t GROUP BY period " +
        "HAVING having_check != -1")
    assert(out.contains("1 AS having_check"), out)
  }

  // ---- wrap-arithmetic scoping ----

  test("CH statements wrap integer overflow; native pipelines stay ANSI") {
    val wrapped = ch("SELECT toInt64(9223372036854775807) + 1 AS x")
      .collect().head.getLong(0)
    assert(wrapped == Long.MinValue)
    val e = intercept[Exception] {
      spark.sql("SELECT CAST(9223372036854775807 AS BIGINT) + CAST(1 AS BIGINT)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("overflow"),
      s"expected ANSI overflow outside CH scope, got: ${e.getMessage}")
  }
}
