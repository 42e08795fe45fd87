package graft
object ProfTypesDbg {
  def main(args: Array[String]): Unit = {
    println("A=" + ChSql.selectItemTypeNames("SELECT 1, [1, 2, 3]"))
    println("B=" + ChSql.selectItemTypeNames("SELECT [1, 2, 3], (1, 'a')"))
    println("C=" + ChSql.selectItemTypeNames("SELECT 1, (1, 'a')"))
    println("D=" + ChSql.selectItemTypeNames("SELECT 1, 'a', [1, 2, 3]"))
  }
}
