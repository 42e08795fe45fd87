package graft

/** Scratch: print ChSql.translate of each line in args(0) (not API). */
object ProfTrans {
  def main(args: Array[String]): Unit = {
    scala.io.Source.fromFile(args(0)).getLines().foreach { l =>
      if (l.trim.nonEmpty) {
        println("IN : " + l)
        try println("OUT: " + ChSql.translate(l))
        catch { case e: Throwable => println("ERR: " + e.getMessage) }
      }
    }
  }
}

object ProfTrans2 {
  def main(args: Array[String]): Unit = {
    val q = "SELECT reinterpret(a, 'String'), reinterpretAsString(a), reinterpretAsUInt8('1') as a"
    println(ChSql.rewriteAliasRefs(q))
    println(ChSql.rewriteAliasRefs("SELECT a + 1, 2 AS a"))
  }
}
