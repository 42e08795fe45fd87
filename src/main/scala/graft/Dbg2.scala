package graft
object Dbg2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val stmts = Seq(
      "CREATE TABLE t_json(id UInt64, obj JSON) ENGINE = MergeTree ORDER BY id",
      "CREATE TABLE t_map(id UInt64, m Map(String, UInt64)) ENGINE = MergeTree ORDER BY id",
      "INSERT INTO t_map SELECT number, (arrayMap(x -> 'col' || toString(x), range(number % 10)), range(number % 10))::Map(String, UInt64) FROM numbers(1000)",
      "INSERT INTO t_json SELECT id, m FROM t_map"
    )
    stmts.foreach { s =>
      println("### " + s.take(90))
      try { if (!graft.golden.DdlEmu.handle(spark, sf, s)) graft.ChSql.sql(spark, s, sf).show(5, false) }
      catch { case e: Throwable => println("ERR " + e); e.getStackTrace.take(8).foreach(t => println("  "+t)); return }
    }
    Seq(
      "SELECT sum(m['col1']), sum(m['col4']), sum(m['col7']), sum(m['col8'] = 0) FROM t_map",
      "SELECT sum(obj.col1), sum(obj.col4), sum(obj.col7), sum(obj.col8 = 0) FROM t_json",
      "SELECT sum(obj.col8 = 0), count() FROM t_json",
      "SELECT obj.col8 FROM t_json WHERE id >= 8 LIMIT 3",
      "SELECT toTypeName(obj) FROM t_json LIMIT 1"
    ).foreach { q =>
      println("### " + q)
      try graft.ChSql.sql(spark, q, sf).show(6, false)
      catch { case e: Throwable =>
        var c: Throwable = e; while (c.getCause != null) c = c.getCause
        println("ERR " + c); c.getStackTrace.take(8).foreach(t => println("  " + t))
      }
    }
    // distributed repro
    Seq(
      "CREATE TABLE t_json_local(data JSON) ENGINE = MergeTree ORDER BY tuple()",
      "CREATE TABLE t_json_dist AS t_json_local ENGINE = Distributed(test_cluster_two_shards, currentDatabase(), t_json_local)",
      """INSERT INTO t_json_local FORMAT JSONAsObject {"k1": 2, "k2": {"k3": "qqq", "k4": [44, 55]}}"""
    ).foreach { s =>
      println("### " + s.take(90))
      try { if (!graft.golden.DdlEmu.handle(spark, sf, s)) println("UNHANDLED") }
      catch { case e: Throwable => println("ERR " + e); return }
    }
    Seq("SELECT data, toTypeName(data) FROM t_json_dist",
        "SELECT data.k1, data.k2.k3, data.k2.k4 FROM t_json_dist").foreach { q =>
      println("### " + q)
      try { val df = graft.ChSql.sql(spark, q, sf); df.show(6, false); df.collect().foreach(r => println("ROW " + graft.golden.Golden.fmt(r.get(0)))) }
      catch { case e: Throwable =>
        var c: Throwable = e; while (c.getCause != null) c = c.getCause
        println("ERR " + c)
      }
    }
  }
}
