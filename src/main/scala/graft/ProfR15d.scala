package graft

/** Scratch: print ChExplain.explainSyntax for one statement (not API). */
object ProfR15d {
  def main(args: Array[String]): Unit = {
    if (sys.env.contains("R15_DDL")) {
      val spark = Engine.session(4)
      spark.sparkContext.setLogLevel("ERROR")
      sys.env("R15_DDL").split(";;").foreach(d =>
        println("ddl ok=" + golden.DdlEmu.handle(spark,
          "/root/testdata/sf0.001", d)))
    }
    val sql = args.mkString(" ")
    ChExplain.explainSyntax(sql) match {
      case Some(lines) => lines.foreach(l => println("|" + l))
      case None => println("<<None>>")
    }
    println("constraints: " +
      golden.DdlEmu.assumeConstraints.toMap)
  }
}
