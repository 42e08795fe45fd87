package graft
object ProfTrans4 {
  def main(args: Array[String]): Unit = {
    Seq(
      "toTypeName(rand(cast(4 as Nullable(UInt8))))",
      "toTypeName(rand(Null))",
      "toTypeName(randCanonical(CAST(4 as Nullable(UInt8))))",
      "toTypeName(t)"
    ).foreach { e =>
      println(e + " => " + functions.ChTypes.typeNameOf(e.stripPrefix("toTypeName(").stripSuffix(")")))
    }
    println(ChSql.translate("select toTypeName(rand(cast(4 as Nullable(UInt8))))"))
    println(ChSql.translate("SELECT CAST((1, 'Hello') AS Tuple(x UInt64, s String)) AS t, toTypeName(t)"))
  }
}

object ProfTrans5 {
  def main(args: Array[String]): Unit = {
    println(functions.ChTypes.typeNameOf("CAST((1, 'Hello') AS Tuple(x UInt64, s String))"))
    println(functions.ChTypes.typeNameOf("CAST(4 as Nullable(UInt8))"))
  }
}
