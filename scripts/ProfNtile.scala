package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: diff GlobalRank.withRowNumber/ntile vs global-window reference
  * on sf0.01 orders (not part of the API). */
object ProfNtile {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    Tables.register(spark, "/root/testdata/sf0.01")
    val base = spark.table("orders").filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"))
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    val ref = base.withColumn("rn_ref",
        row_number().over(Window.orderBy(order: _*)))
      .withColumn("t_ref", ntile(4).over(Window.orderBy(order: _*)))
    val got = graft.operators.GlobalRank.withRowNumber(base, order, "rn_got")
    val gotT = graft.operators.GlobalRank.ntile(base, order, 4, "t_got")
    val j = ref.join(got, Seq("o_orderkey", "o_totalprice"))
      .join(gotT, Seq("o_orderkey", "o_totalprice"))
    val bad = j.filter(col("rn_ref") =!= col("rn_got") ||
      col("t_ref") =!= col("t_got"))
    println("[prof] total=" + base.count() + " bad=" + bad.count())
    bad.orderBy("rn_ref").show(20, false)
    spark.stop()
  }
}
