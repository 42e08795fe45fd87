package graft

/** Round-12 pins (one guard per r11 verdict/advice item, per the
  * dialect-shim guard-spec rule):
  *
  *  - a governing LIMIT sizes the system.numbers stand-in to AT LEAST
  *    its own value — `LIMIT 20000000` must stream 20M rows, not
  *    silently truncate at the old fixed 10M (r11 verdict #2).
  *  - a LIMIT at an ENCLOSING depth only bounds the scan when every
  *    select scope between the scan and it is a non-aggregating
  *    projection: `SELECT count() FROM (SELECT * FROM system.numbers)
  *    LIMIT 5` limits the 1-row aggregate, the read stays infinite
  *    (advice r11 medium #2).
  *  - the session limit/offset window applies only to client-facing
  *    statements, never to engine-internal helper SELECTs (INSERT
  *    default padding) — `SET limit = 1` must not lose inserted rows
  *    (advice r11 medium #1).
  *  - LIMIT arithmetic folds with operator precedence: 1+2*3 = 7
  *    (advice r11 low).
  *  - the empty-aggregate zero-fill resolves declared nullability
  *    scoped to the tables the plan reads — a same-named column in an
  *    unrelated table must not flip the answer (advice r11 low).
  */
class Round12FixesSpec extends SparkSpec {

  private def ch(q: String) = ChSql.sql(spark, q, SparkSpec.tiny)

  // ---- governing-LIMIT value sizes the numbers stand-in ----

  test("LIMIT 20000000 on system.numbers returns 20M rows") {
    val n = ch("SELECT number FROM system.numbers LIMIT 20000000").count()
    assert(n == 20000000L, n)
  }

  test("LIMIT with OFFSET sizes the stand-in past limit+offset") {
    val rows = ch(
      "SELECT number FROM system.numbers LIMIT 3 OFFSET 11999999")
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(11999999L, 12000000L, 12000001L), rows.toSeq)
  }

  // ---- enclosing-depth LIMIT vs intermediate aggregation ----

  test("LIMIT over an aggregating subquery does not bound the scan") {
    intercept[Exception] {
      ch("SELECT count() FROM (SELECT * FROM system.numbers) LIMIT 5")
        .collect()
    }
  }

  test("LIMIT through a plain projection subquery still bounds it") {
    val rows = ch(
      "SELECT number FROM (SELECT number FROM system.numbers) LIMIT 7")
      .collect()
    assert(rows.length == 7, rows.length)
  }

  test("forward GROUP BY between scan and LIMIT blocks the bound") {
    intercept[Exception] {
      ch("SELECT number % 2 AS p FROM system.numbers " +
        "GROUP BY number % 2 LIMIT 5").collect()
    }
  }

  // ---- session limit window skips engine-internal statements ----

  test("SET limit does not truncate INSERT with computed defaults") {
    import graft.golden.DdlEmu
    DdlEmu.resetSession(spark)
    DdlEmu.handle(spark, SparkSpec.tiny,
      "CREATE TABLE r12_def (a UInt32, b UInt32 DEFAULT a * 2) " +
        "ENGINE = Memory")
    spark.conf.set("graft.ch.limit", "1")
    try {
      DdlEmu.handle(spark, SparkSpec.tiny,
        "INSERT INTO r12_def (a) VALUES (1), (2), (3)")
      val n = spark.table("r12_def").count()
      assert(n == 3L, s"expected 3 inserted rows, got $n")
      // and the window DOES apply to the client-facing SELECT
      val out = ch("SELECT a FROM r12_def ORDER BY a").collect()
      assert(out.length == 1, out.toSeq)
    } finally spark.conf.unset("graft.ch.limit")
  }

  // ---- LIMIT arithmetic precedence ----

  test("settings window folds LIMIT arithmetic with precedence") {
    spark.conf.set("graft.ch.limit", "100")
    try {
      val out = ChSql.applySettingsLimitOffset(
        "SELECT x FROM t LIMIT 1+2*3")
      assert(out.trim.endsWith("LIMIT 7"), out)
    } finally spark.conf.unset("graft.ch.limit")
  }

  // ---- empty-agg declared nullability is table-scoped ----

  test("empty-agg zero-fill survives a cross-table name collision") {
    import graft.golden.DdlEmu
    DdlEmu.resetSession(spark)
    // same column name, OPPOSITE declared nullability, creation order
    // chosen so a global headOption lookup would be wrong for one side
    DdlEmu.handle(spark, SparkSpec.tiny,
      "CREATE TABLE r12_nn (v UInt32) ENGINE = Memory")
    DdlEmu.handle(spark, SparkSpec.tiny,
      "CREATE TABLE r12_nul (v Nullable(UInt32)) ENGINE = Memory")
    DdlEmu.handle(spark, SparkSpec.tiny,
      "INSERT INTO r12_nn VALUES (1)")
    DdlEmu.handle(spark, SparkSpec.tiny,
      "INSERT INTO r12_nul VALUES (1)")
    val z = ch("SELECT sum(v) AS s FROM r12_nn WHERE 0").collect()
    assert(!z.head.isNullAt(0) && z.head.getLong(0) == 0L,
      s"declared non-Nullable sum over empty set must be 0: ${z.toSeq}")
    val n = ch("SELECT sum(v) AS s FROM r12_nul WHERE 0").collect()
    assert(n.head.isNullAt(0),
      s"declared Nullable sum over empty set must be NULL: ${n.toSeq}")
  }

  // ---- rows_before_limit: subquery-LIMIT pass-through, no extra job ----

  test("FORMAT JSON subquery-LIMIT counter adds no extra jobs") {
    val dir = java.nio.file.Files.createTempDirectory("r12fmt")
    // the subquery-LIMIT detector requires a paren-free inner select, so
    // the source is a declared table (also gives the JSON meta its CH
    // type). The prelude's own jobs are measured by running it alone and
    // differencing — only the SELECT statement's job count is pinned.
    val prelude =
      "CREATE TABLE r12_fmt (x UInt32) ENGINE = Memory;\n" +
        "INSERT INTO r12_fmt VALUES " +
        (1 to 20).map(i => s"($i)").mkString(", ") + ";\n"
    val sqlA = dir.resolve("a.sql"); val sqlB = dir.resolve("b.sql")
    // control: the SAME statement through the TSV path, which does one
    // plain collect and computes no counter — whatever incremental jobs
    // CollectLimit takes in this environment, JSON must not exceed it
    java.nio.file.Files.writeString(sqlA, prelude +
      "SELECT x FROM (SELECT x FROM r12_fmt LIMIT 7) FORMAT JSON;\n")
    java.nio.file.Files.writeString(sqlB, prelude +
      "SELECT x FROM (SELECT x FROM r12_fmt LIMIT 7);\n")
    java.nio.file.Files.writeString(dir.resolve("a.reference"), "")
    java.nio.file.Files.writeString(dir.resolve("b.reference"), "")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // async listener bus: wait until the count is stable
    def drained(): Int = {
      var prev = -1; var cur = jobs.get()
      while (cur != prev) { prev = cur; Thread.sleep(500); cur = jobs.get() }
      cur
    }
    try {
      Thread.sleep(2000) // settle prior tests' events BEFORE attaching
      spark.sparkContext.addSparkListener(listener)
      graft.golden.Golden.runFile(spark, sqlB.toString, SparkSpec.tiny)
      val tsvJobs = drained()
      val (actual, _) =
        graft.golden.Golden.runFile(spark, sqlA.toString, SparkSpec.tiny)
      val jsonJobs = drained() - tsvJobs
      val txt = actual.mkString("\n")
      assert(txt.contains("\"rows_before_limit_at_least\": 7"), txt)
      // the body collect is the only action: the rows_before_limit
      // counter must not re-execute the subquery (which would add jobs
      // over the counter-free TSV execution of the same statement)
      assert(jsonJobs <= tsvJobs, s"FORMAT JSON took $jsonJobs jobs vs " +
        s"$tsvJobs for the same statement without the counter")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ---- column matchers/transformers (ref ASTColumnsTransformers.cpp;
  // 01470_columns_transformers SELECT semantics — the EXPLAIN SYNTAX
  // halves of that file need CH optimizer-pass rendering and stay
  // documented divergences; goldens 02343_strict/01470_2 cover the rest)

  private def ddl(q: String): Unit =
    assert(graft.golden.DdlEmu.handle(spark, SparkSpec.tiny, q), q)

  private def mkTransformers(): Unit = {
    ddl("DROP TABLE IF EXISTS r12ct")
    ddl("CREATE TABLE r12ct (i Int64, j Int16, k Int64) ENGINE = Memory")
    ddl("INSERT INTO r12ct VALUES (100, 10, 324), (120, 8, 23)")
  }

  test("* APPLY(sum) expands over all columns") {
    mkTransformers()
    val r = ch("SELECT * APPLY(sum) FROM r12ct").collect()
    assert(r.map(_.toSeq.map(_.toString).mkString(","))
      .sameElements(Array("220,18,347")), r.mkString("|"))
  }

  test("qualified star APPLY; APPLY chains compose left to right") {
    mkTransformers()
    val r = ch("SELECT r12ct.* APPLY(avg) FROM r12ct").collect()
    assert(r.head.toSeq.map(_.toString) == Seq("110.0", "9.0", "173.5"),
      r.mkString("|"))
    val r2 = ch("SELECT COLUMNS('[jk]') APPLY(toString) APPLY(length) " +
      "FROM r12ct").collect()
    assert(r2.map(_.toSeq.map(_.toString).mkString(",")).sorted
      .sameElements(Array("1,2", "2,3")), r2.mkString("|"))
  }

  test("EXCEPT removes, REPLACE rewrites, chains compose") {
    mkTransformers()
    val r = ch("SELECT * EXCEPT(i) APPLY(sum) FROM r12ct").collect()
    assert(r.head.toSeq.map(_.toString) == Seq("18", "347"), r.mkString("|"))
    val r2 = ch("SELECT * REPLACE(i + 1 AS i) APPLY(sum) FROM r12ct")
      .collect()
    assert(r2.head.toSeq.map(_.toString) == Seq("222", "18", "347"),
      r2.mkString("|"))
    // chained REPLACE composes: (i+1)+1
    val r3 = ch("SELECT * REPLACE(i + 1 AS i) REPLACE(i + 1 AS i) " +
      "FROM r12ct ORDER BY j").collect()
    assert(r3.map(_.get(0).toString).sameElements(Array("122", "102")),
      r3.mkString("|"))
  }

  test("STRICT transformers throw on unmatched names") {
    mkTransformers()
    intercept[Throwable] {
      ch("SELECT * EXCEPT STRICT(i, j1) FROM r12ct").collect()
    }
    intercept[Throwable] {
      ch("SELECT * REPLACE STRICT(i + 1 AS col) FROM r12ct").collect()
    }
    intercept[Throwable] { // same column twice in one REPLACE
      ch("SELECT * REPLACE(j + 1 AS j, j + 2 AS j) FROM r12ct").collect()
    }
    intercept[Throwable] { // REPLACE after APPLY matches nothing: strict
      ch("SELECT * APPLY(toString) REPLACE STRICT(i + 1 AS i) FROM r12ct")
        .collect()
    }
    // non-strict after APPLY: silently matches nothing
    val ok = ch("SELECT * APPLY(sum) EXCEPT(i) FROM r12ct").collect()
    assert(ok.head.length == 3, ok.mkString("|"))
  }

  test("COLUMNS list + EXCEPT; subquery source; EXCEPT regex") {
    mkTransformers()
    val r = ch("SELECT i, j, COLUMNS(i, j, k) APPLY(toFloat64), " +
      "COLUMNS(i, j) EXCEPT (i) FROM r12ct ORDER BY i").collect()
    assert(r.head.toSeq.map(_.toString) ==
      Seq("100", "10", "100.0", "10.0", "324.0", "10"), r.mkString("|"))
    val r2 = ch("SELECT * EXCEPT (id) FROM (SELECT 1 AS id, 2 AS v)")
      .collect()
    assert(r2.head.toSeq == Seq(2), r2.mkString("|"))
    ddl("DROP TABLE IF EXISTS r12cb")
    ddl("CREATE TABLE r12cb (i Int32, a_bytes Int32, b_bytes Int32) " +
      "ENGINE = Memory")
    ddl("INSERT INTO r12cb VALUES (7, 120, 8)")
    val r3 = ch("SELECT * EXCEPT 'bytes' FROM r12cb").collect()
    assert(r3.head.toSeq == Seq(7), r3.mkString("|"))
  }

  // ---- CH any(x) maps to first-non-null, not Spark's bool_or ----

  test("any() over non-boolean column aggregates first value") {
    mkTransformers()
    val r = ch("SELECT any(i) FROM r12ct").collect()
    assert(r.head.get(0).toString == "100", r.mkString("|"))
  }
}

