package graft

/** Scratch: print the generated code for one dialect statement
  * (not part of the API). args(0) = SQL text. */
object ProfRepro {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val sql = if (args.nonEmpty) args.mkString(" ")
      else "SELECT isIPv6String('1234::1234:')"
    val df = ChSql.sql(spark, sql, "/root/testdata/sf0.001")
    import org.apache.spark.sql.execution.debug._
    println(df.queryExecution.executedPlan)
    df.debugCodegen()
    spark.stop()
  }
}
