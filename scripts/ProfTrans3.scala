package graft
object ProfTrans3 {
  def main(args: Array[String]): Unit = {
    Seq(
      "SELECT reinterpret(a), 2 AS a",
      "SELECT f(a, 'x'), 2 AS a",
      "SELECT f(a), 2 as a",
      "SELECT a, reinterpretAsUInt8('1') as a",
      "SELECT f(a, 'x'), reinterpretAsUInt8('1') as a"
    ).foreach(q => println(ChSql.rewriteAliasRefs(q)))
  }
}
