package graft

/** Scratch: print dialect translation of one expression (not API). */
object ProfR15b {
  def main(args: Array[String]): Unit = {
    println("TRANSLATED: <" + ChSql.translate(args.mkString(" ")) + ">")
  }
}
