package graft

/** Scratch: list toTypeName() arguments that fail static inference in
  * each candidate file (not part of the API). */
object ProfTtn {
  def main(args: Array[String]): Unit = {
    val files = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(args(0))).toArray.map(_.toString)
    files.foreach { f =>
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(f))
      val sqls = golden.Golden.splitStatements(text)
      val bad = scala.collection.mutable.LinkedHashSet.empty[String]
      sqls.foreach { sql0 =>
        // pre-passes that normally run before type introspection
        val sql = try ChSql.rewriteCastCall(ChSql.rewriteColonCast(
          ChSql.rewriteScalarWith(ChSql.rewriteStringEscapes(sql0))))
        catch { case _: Throwable => sql0 }
        val re = "(?i)\\btoTypeName\\s*\\(".r
        re.findAllMatchIn(sql).foreach { m =>
          val open = m.end - 1
          var depth = 0; var i = open; var end = -1
          var inStr = false
          while (end < 0 && i < sql.length) {
            val c = sql.charAt(i)
            if (inStr) { if (c == '\\') i += 1 else if (c == '\'') inStr = false }
            else if (c == '\'') inStr = true
            else if (c == '(') depth += 1
            else if (c == ')') { depth -= 1; if (depth == 0) end = i }
            i += 1
          }
          if (end > 0) {
            val arg = sql.substring(open + 1, end)
            if (functions.ChTypes.typeNameOf(arg,
              Map("number" -> functions.ChTypes.UInt64)).isEmpty)
              bad += arg.replace('\n', ' ').take(120)
          }
        }
      }
      if (bad.nonEmpty) {
        println("## " + f.substring(f.lastIndexOf('/') + 1))
        bad.foreach(b => println("   " + b))
      }
    }
  }
}
