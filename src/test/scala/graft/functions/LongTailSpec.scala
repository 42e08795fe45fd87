package graft.functions

import graft.{ChSql, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-9 long-tail functions (ref src/Functions/extractAllGroups.h,
  * formatReadable.cpp, defaultValueOfArgumentType.cpp, fuzzBits.cpp,
  * FunctionsBitmap.h subset family). Expected values transcribed from
  * the reference's own stateless tests 01246/01492/00461/00829/01284.
  */
class LongTailSpec extends SparkSpec {

  private def one(q: String): Any =
    ChSql.sql(spark, q, SparkSpec.tiny).head.get(0)

  test("extractAllGroupsVertical matches 01246 shapes") {
    assert(one("SELECT extractAllGroupsVertical('hello world', '(\\\\w+)')")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq === Seq(Seq("hello"), Seq("world")))
    assert(one("SELECT extractAllGroupsVertical(" +
      "'abc=111, def=222, ghi=333 \"jkl mno\"=\"444 foo bar\"', " +
      "'(\"[^\"]+\"|\\\\w+)=(\"[^\"]+\"|\\\\w+)')")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq === Seq(
      Seq("abc", "111"), Seq("def", "222"), Seq("ghi", "333"),
      Seq("\"jkl mno\"", "\"444 foo bar\"")))
  }

  test("extractAllGroupsHorizontal matches 01246 shapes") {
    assert(one("SELECT extractAllGroupsHorizontal('hello world', '(\\\\w+)')")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq === Seq(Seq("hello", "world")))
    assert(one("SELECT extractAllGroupsHorizontal(" +
      "'abc=111, def=222, ghi=333', '(\\\\w+)=(\\\\w+)')")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]].map(_.toSeq).toSeq === Seq(
      Seq("abc", "def", "ghi"), Seq("111", "222", "333")))
    // zero capture groups is an error (serverError 36 in the reference)
    intercept[Exception](one(
      "SELECT extractAllGroupsHorizontal('hello world', '\\\\w+')"))
  }

  test("formatReadableQuantity matches 01492 rows") {
    // spot rows from 01492_format_readable_quantity.reference
    assert(one("SELECT formatReadableQuantity(1.0)") === "1.00")
    assert(one("SELECT formatReadableQuantity(403.4287934927351)")
      === "403.43")
    assert(one("SELECT formatReadableQuantity(1096.633158428459)")
      === "1.10 thousand")
    assert(one("SELECT formatReadableQuantity(2147483647)")
      === "2.15 billion")
    // beyond the last unit the value keeps growing, no separators
    assert(one("SELECT formatReadableQuantity(12851600000000000000.0)")
      === "12851.60 quadrillion")
  }

  test("formatReadableDecimalSize uses decimal units") {
    assert(one("SELECT formatReadableDecimalSize(1.0)") === "1.00 B")
    assert(one("SELECT formatReadableDecimalSize(1100)") === "1.10 KB")
    assert(one("SELECT formatReadableDecimalSize(2147483647)")
      === "2.15 GB")
  }

  test("defaultValueOfArgumentType matches 00461") {
    assert(one("SELECT defaultValueOfArgumentType(1)") === 0)
    assert(one("SELECT defaultValueOfArgumentType(array(1, 2, 3))")
      .asInstanceOf[scala.collection.Seq[_]].toSeq === Seq())
    assert(one("SELECT defaultValueOfArgumentType('abc')") === "")
    val row = one("SELECT defaultValueOfArgumentType(" +
      "named_struct('a', 1, 'b', 'Hello', 'c', DATE '2020-01-01'))")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(row.getInt(0) === 0)
    assert(row.getString(1) === "")
    assert(row.getDate(2).toString === "1970-01-01")
  }

  test("bitmap subset family matches 00829 rows") {
    import BitmapExprs._
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      bitmapToArray(subBitmap(bitmapBuild(typedLit(Seq(1L, 5L, 7L, 9L))),
        lit(0L), lit(4L))).as("a"),
      bitmapToArray(subBitmap(bitmapBuild(typedLit(Seq(1L, 5L, 7L, 9L))),
        lit(1L), lit(4L))).as("b"),
      bitmapToArray(bitmapSubsetInRange(
        bitmapBuild(typedLit(Seq(1L, 5L, 7L, 9L))), lit(2L), lit(8L)))
        .as("c"),
      bitmapToArray(bitmapSubsetLimit(
        bitmapBuild(typedLit(Seq(1L, 5L, 7L, 9L))), lit(2L), lit(2L)))
        .as("d"),
      bitmapToArray(subBitmap(bitmapBuild(typedLit(Seq.empty[Long])),
        lit(0L), lit(10L))).as("e"))
    val r = df.collect()(0)
    assert(r.getSeq[Long](0) === Seq(1L, 5L, 7L, 9L))
    assert(r.getSeq[Long](1) === Seq(5L, 7L, 9L))
    assert(r.getSeq[Long](2) === Seq(5L, 7L))
    assert(r.getSeq[Long](3) === Seq(5L, 7L))
    assert(r.getSeq[Long](4) === Seq())
  }

  test("fuzzBits flips bits at the requested rate (01284 contract)") {
    // 10,000 zero bytes at p=0.3 → expect ~30% of 80,000 bits set.
    // Measured on BINARY input at the byte level (Spark's substring is
    // codepoint-based, so the reference's string-substring probe would
    // mis-measure flipped high bits here).
    val bytes = ChSql.sql(spark,
      "SELECT fuzzBits(CAST(repeat(char(0), 10000) AS BINARY), 0.3)",
      SparkSpec.tiny).collect()(0).getAs[Array[Byte]](0)
    assert(bytes.length === 10000)
    val sum = bytes.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
    assert(sum > 0.29 * 8 * 10000 && sum < 0.31 * 8 * 10000,
      s"flip count $sum outside [23200, 24800]")
    // p=0 is the identity; empty input stays empty
    assert(one("SELECT fuzzBits('abc', 0.0)") === "abc")
    assert(one("SELECT fuzzBits('', 0.3)") === "")
    intercept[Exception](one("SELECT fuzzBits('abc', -1.0)"))
  }
}
