package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("codec: build/serialize/deserialize/toArray roundtrip incl. negatives") {
    val vs = Array(-130L, -1L, 0L, 1L, 63L, 64L, 65L, 1000000L, 1L << 40)
    val bm = Bitmap.fromValues(vs)
    assert(bm.cardinality == vs.length)
    val rt = Bitmap.deserialize(Bitmap.serialize(bm))
    assert(Bitmap.toArray(rt).toSeq == vs.sorted.toSeq)
    assert(Bitmap.min(rt).contains(-130L) && Bitmap.max(rt).contains(1L << 40))
    vs.foreach(v => assert(Bitmap.contains(rt, v)))
    assert(!Bitmap.contains(rt, 2L) && !Bitmap.contains(rt, -129L))
  }

  test("codec: and/or/xor/andnot match set algebra") {
    val a = Bitmap.fromValues(Seq(1L, 2L, 3L, 100L, 1000L))
    val b = Bitmap.fromValues(Seq(3L, 4L, 100L, 2000L))
    def s(bm: Bitmap.BM) = Bitmap.toArray(bm).toSet
    assert(s(Bitmap.and(a, b)) == Set(3L, 100L))
    assert(s(Bitmap.or(a, b)) == Set(1L, 2L, 3L, 4L, 100L, 1000L, 2000L))
    assert(s(Bitmap.xor(a, b)) == Set(1L, 2L, 4L, 1000L, 2000L))
    assert(s(Bitmap.andnot(a, b)) == Set(1L, 2L, 1000L))
    assert(Bitmap.and(a, Bitmap.empty).cardinality == 0)
    assert(s(Bitmap.or(a, Bitmap.empty)) == s(a))
  }

  test("scalar expressions over columns") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
      .select(BitmapExprs.bitmapBuild(col("a")).as("ba"),
        BitmapExprs.bitmapBuild(col("b")).as("bb"))
    val r = df.select(
      BitmapExprs.bitmapCardinality(col("ba")),
      BitmapExprs.bitmapAndCardinality(col("ba"), col("bb")),
      BitmapExprs.bitmapOrCardinality(col("ba"), col("bb")),
      BitmapExprs.bitmapHasAny(col("ba"), col("bb")),
      BitmapExprs.bitmapHasAll(col("ba"), col("bb")),
      BitmapExprs.bitmapContains(col("ba"), lit(2L)),
      BitmapExprs.bitmapContains(col("ba"), lit(9L)),
      BitmapExprs.bitmapToArray(BitmapExprs.bitmapXor(col("ba"), col("bb"))))
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 4)
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getBoolean(5) && !r.getBoolean(6))
    assert(r.getSeq[Long](7).toSet == Set(1L, 4L))
  }

  test("hasAll: subset true, superset-miss false") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(2L, 3L))).toDF("a", "b")
      .select(BitmapExprs.bitmapBuild(col("a")).as("ba"),
        BitmapExprs.bitmapBuild(col("b")).as("bb"))
    val r = df.select(
      BitmapExprs.bitmapHasAll(col("ba"), col("bb")),
      BitmapExprs.bitmapHasAll(col("bb"), col("ba"))).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("groupBitmap UDAF: cardinality == count distinct; partial merge works") {
    val df = (1 to 10000).map(i => (i % 7, (i % 321).toLong)).toDF("g", "v")
      .repartition(8)
    val gb = udaf(new Bitmap.GroupBitmap(), ExpressionEncoder[(Long, Boolean)]())
    val got = df.groupBy("g").agg(gb(col("v"), lit(true)).as("card"))
      .as[(Int, Long)].collect().toMap
    val exp = df.groupBy("g").agg(countDistinct(col("v")).as("c"))
      .as[(Int, Long)].collect().toMap
    assert(got == exp)
  }

  test("GroupBitmapOr merges bitmap states across groups") {
    val bs = udaf(new Bitmap.GroupBitmapState(), ExpressionEncoder[(Long, Boolean)]())
    val or = udaf(new Bitmap.GroupBitmapOr(), ExpressionEncoder[Array[Byte]]())
    val df = Seq((1, 10L), (1, 20L), (2, 20L), (2, 30L)).toDF("g", "v")
    val states = df.groupBy("g").agg(bs(col("v"), lit(true)).as("bm"))
    val merged = states.agg(or(col("bm")).as("all"))
      .select(BitmapExprs.bitmapToArray(col("all"))).as[Seq[Long]].head()
    assert(merged.toSet == Set(10L, 20L, 30L))
  }
}
