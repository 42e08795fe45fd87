package graft

/** Scratch: print got-vs-want aligned for one golden file (not API). */
object ProfR15c {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val (got, want) = golden.Golden.runFile(spark, args(0),
      "/root/testdata/sf0.001")
    val from = if (args.length > 1) args(1).toInt else 0
    val to = if (args.length > 2) args(2).toInt else from + 40
    for (i <- from until math.min(to, math.max(got.length, want.length))) {
      val g = if (i < got.length) got(i) else "<missing>"
      val w = if (i < want.length) want(i) else "<missing>"
      val mark = if (g == w) " " else "!"
      println(f"$mark$i%4d G<$g>")
      if (g != w) println(f"$mark$i%4d W<$w>")
    }
    spark.stop()
  }
}
