package graft

object ProfStage {
  def main(args: Array[String]): Unit = {
    var s = "SELECT CAST(1 AS Bool)"
    println("in    : " + s)
    s = ChSql.rewriteStringEscapes(s); println("escape: " + s)
    s = ChSql.rewriteColonCast(s); println("colon : " + s)
    s = ChSql.rewriteCastCall(s); println("call  : " + s)
    s = ChSql.rewriteTypeIntrospection(s); println("intro : " + s)
    s = ChSql.rewriteChTypes(s); println("types : " + s)
  }
}
