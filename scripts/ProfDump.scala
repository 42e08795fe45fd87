package graft

/** Scratch: run one golden file and print actual vs expected lines
  * (repr-escaped, full) for precise diffing (not part of the API). */
object ProfDump {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val (actual, expected) =
      golden.Golden.runFile(spark, args(0), sfDir)
    def esc(s: String): String =
      s.flatMap {
        case c if c >= 32 && c < 127 => c.toString
        case c => f"\\u${c.toInt}%04x"
      }
    val n = math.max(actual.length, expected.length)
    println(s"== ${actual.length} actual vs ${expected.length} expected")
    (0 until n).foreach { i =>
      val a = actual.lift(i).map(esc).getOrElse("<missing>")
      val e = expected.lift(i).map(esc).getOrElse("<missing>")
      val mark = if (a == e) "  " else "!!"
      println(f"$mark $i%3d A|$a")
      if (a != e) println(f"   $i%3d E|$e")
    }
    spark.stop()
  }
}
