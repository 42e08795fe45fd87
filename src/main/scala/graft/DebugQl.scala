package graft
object DebugQl {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sf = "/root/testdata/sf0.001"
    args.foreach { f =>
      println(s"########## $f")
      try {
        val (got, want) = graft.golden.Golden.runFile(spark,
          s"/root/reference/tests/queries/0_stateless/$f", sf)
        val n = math.max(got.length, want.length)
        (0 until n).foreach { i =>
          val g = if (i < got.length) got(i) else "<missing>"
          val w = if (i < want.length) want(i) else "<missing>"
          println((if (g == w) "  OK " else "DIFF ") + "[" + g + "] | [" + w + "]")
        }
      } catch { case e: Exception => println("ERR " + Option(e.getMessage).getOrElse("").take(600)) }
    }
    sys.env.get("DEBUG_SQL").foreach { q =>
      println("=== DEBUG_SQL ===")
      try ChSql.sql(spark, q, sf).show(60, false)
      catch { case e: Exception => println("ERR " + e.getMessage.take(600)) }
    }
  }
}
