package graft.functions

import graft.{ChSql, SparkSpec}

/** CH-name SQL surface: every registered family callable through
  * spark.sql with ClickHouse names/semantics. */
class ChRegistrySpec extends SparkSpec {

  private def one[T](chQuery: String): T =
    ChSql.sql(spark, chQuery, SparkSpec.tiny).collect()(0).getAs[T](0)

  private def oneSeq(chQuery: String): List[Any] =
    ChSql.sql(spark, chQuery, SparkSpec.tiny).collect()(0)
      .getAs[scala.collection.Seq[Any]](0).toList

  test("conversions incl. OrZero/OrNull") {
    assert(one[Long]("SELECT toInt64('42')") == 42L)
    assert(one[Long]("SELECT toInt64OrZero('oops')") == 0L)
    assert(one[Any]("SELECT toInt64OrNull('oops')") == null)
    assert(one[String]("SELECT toString(3.5)") == "3.5")
  }

  test("date/time family") {
    assert(one[Int]("SELECT toYear(toDateTime('2024-03-15 10:30:00'))") == 2024)
    assert(one[Int]("SELECT toDayOfWeek(toDateTime('2024-03-15 00:00:00'))") == 5) // Friday, ISO
    // toStartOfMonth returns Date for any input (DateTimeTransforms.h)
    assert(one[java.sql.Date]("SELECT toStartOfMonth(toDateTime('2024-03-15 10:30:00'))")
      .toString == "2024-03-01")
    assert(one[java.sql.Timestamp]("SELECT toStartOfFiveMinutes(toDateTime('2024-03-15 10:33:00'))")
      .toString.contains("10:30:00"))
    assert(one[java.sql.Timestamp]("SELECT addDays(toDateTime('2024-03-15 00:00:00'), 3)")
      .toString.startsWith("2024-03-18"))
    assert(one[Long]("SELECT dateDiff('day', toDateTime('2024-03-01 00:00:00'), toDateTime('2024-03-15 00:00:00'))") == 14L)
    assert(one[Int]("SELECT toYYYYMM(toDateTime('2024-03-15 00:00:00'))") == 202403)
    assert(one[String]("SELECT formatDateTime(toDateTime('2024-03-15 10:30:00'), '%Y-%m-%d %H:%i')") == "2024-03-15 10:30")
  }

  test("arithmetic and rounding") {
    assert(one[Long]("SELECT intDiv(7, 2)") == 3L)
    // CH truncates toward zero (C++ a/b; pinned by 00977_int_div.reference
    // rows intDiv(-1, 2..10) = 0 and 01350's Long.MIN cases)
    assert(one[Long]("SELECT intDiv(-7, 2)") == -3L)
    assert(one[Long]("SELECT intDivOrZero(7, 0)") == 0L)
    assert(one[Double]("SELECT divide(5, 2)") == 2.5)
    assert(one[Double]("SELECT roundBankers(CAST(2.5 AS DOUBLE), 0)") == 2.0)
    assert(one[Long]("SELECT roundToExp2(100)") == 64L)
    assert(one[Int]("SELECT roundAge(30)") == 25)
  }

  test("conditionals") {
    assert(one[Int]("SELECT if(1 = 1, 10, 20)") == 10)
    assert(one[String]("SELECT multiIf(1 = 2, 'a', 1 = 1, 'b', 'c')") == "b")
    assert(one[Int]("SELECT ifNull(CAST(NULL AS INT), 7)") == 7)
  }

  test("strings, search, split") {
    assert(one[Int]("SELECT lengthUTF8('héllo')") == 5)
    assert(one[Int]("SELECT position('hello world', 'wor')") == 7)
    assert(one[Boolean]("SELECT match('ab12', '^[a-z]+[0-9]+$')"))
    assert(one[String]("SELECT replaceOne('aXbXc', 'X', '-')") == "a-bXc")
    assert(one[String]("SELECT replaceAll('aXbXc', 'X', '-')") == "a-b-c")
    assert(one[Long]("SELECT countSubstrings('abcabcabc', 'bc')") == 3L)
    assert(one[Boolean]("SELECT multiSearchAny('hello world', 'xyz', 'wor')"))
    assert(oneSeq("SELECT splitByChar(',', 'a,b,c')") == List("a", "b", "c"))
    assert(one[String]("SELECT arrayStringConcat(splitByChar(',', 'a,b,c'), '-')") == "a-b-c")
    assert(one[Boolean]("SELECT hasToken('the quick fox', 'quick')"))
  }

  test("arrays incl. lambda-first higher-order") {
    assert(oneSeq("SELECT arrayMap(x -> x * 2, array(1, 2, 3))") == List(2, 4, 6))
    assert(oneSeq("SELECT arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4))") == List(2, 4))
    assert(one[Boolean]("SELECT arrayExists(x -> x > 2, array(1, 2, 3))"))
    assert(one[Int]("SELECT arrayCount(x -> x > 1, array(1, 2, 3))") == 2)
    assert(one[Int]("SELECT arrayFirst(x -> x > 1, array(1, 2, 3))") == 2)
    assert(one[Long]("SELECT arraySum(array(1, 2, 3))") == 6L)
    assert(oneSeq("SELECT arrayCumSum(array(1, 2, 3))") == List(1L, 3L, 6L))
    assert(oneSeq("SELECT arrayDifference(array(1, 4, 9))") == List(0, 3, 5))
    assert(one[Int]("SELECT arrayUniq(array(1, 1, 2))") == 2)
    assert(oneSeq("SELECT arrayCompact(array(1, 1, 2, 2, 1))") == List(1, 2, 1))
    assert(one[Long]("SELECT indexOf(array(10, 20, 30), 20)") == 2L)
    assert(one[Boolean]("SELECT hasAll(array(1, 2, 3), array(1, 3))"))
    assert(math.abs(one[Double]("SELECT cosineDistance(array(1.0, 0.0), array(1.0, 0.0))")) < 1e-12)
  }

  test("JSON and URL") {
    assert(one[String]("""SELECT JSONExtractString('{"k": "v"}', 'k')""") == "v")
    assert(one[Long]("""SELECT JSONExtractInt('{"k": 42}', 'k')""") == 42L)
    assert(one[Boolean]("""SELECT JSONHas('{"k": 1}', 'k')"""))
    assert(one[String]("SELECT domain('https://ex.com:8080/p?q=1')") == "ex.com")
    assert(one[String]("SELECT path('https://ex.com/a/b?q=1')") == "/a/b")
    assert(one[String]("SELECT extractURLParameter('https://ex.com/?a=1&b=2', 'b')") == "2")
    assert(one[Int]("SELECT port('https://ex.com:8080/p')") == 8080)
  }

  test("hash, bits, IP") {
    assert(one[String]("SELECT MD5('abc')") == "900150983cd24fb0d6963f7d28e17f72")
    assert(one[Int]("SELECT bitAnd(12, 10)") == 8)
    assert(one[Int]("SELECT bitCount(255)") == 8)
    assert(one[Int]("SELECT bitHammingDistance(0, 255)") == 8)
    assert(one[String]("SELECT IPv4NumToString(3232235777)") == "192.168.1.1")
    assert(one[Long]("SELECT IPv4StringToNum('192.168.1.1')") == 3232235777L)
    assert(one[Boolean]("SELECT isIPv4String('10.0.0.1')"))
  }

  test("dialect shim: PREWHERE, FINAL, FORMAT, GLOBAL IN, ==") {
    val df = ChSql.sql(spark,
      """SELECT count() AS n FROM lineitem PREWHERE l_quantity > 30
        |  FORMAT TabSeparated""".stripMargin
        .replace("count()", "count(*)"), SparkSpec.tiny)
    assert(df.collect()(0).getLong(0) > 0)
    val df2 = ChSql.sql(spark,
      "SELECT count(*) AS n FROM orders FINAL WHERE o_custkey GLOBAL IN " +
        "(SELECT c_custkey FROM customer) AND 1 == 1", SparkSpec.tiny)
    assert(df2.collect()(0).getLong(0) > 0)
  }

  test("wave 2: bin/unbin, regexp groups, date parts, ISO week") {
    assert(one[String]("SELECT bin(10)") == "00001010")
    assert(one[String]("SELECT bin(256)") == "0000000100000000")
    assert(one[String]("SELECT unbin('0011000100110010')") == "12")
    assert(one[scala.collection.Seq[String]](
      "SELECT extractGroups('2024-01-15', '(\\\\d+)-(\\\\d+)-(\\\\d+)')")
      .toList == List("2024", "01", "15"))
    assert(one[Long]("SELECT countMatches('a1b22c333', '\\\\d+')") == 3L)
    assert(one[String]("SELECT dateName('month', DATE '2024-03-15')") == "March")
    assert(one[String]("SELECT dateName('weekday', DATE '2024-03-15')") == "Friday")
    assert(one[Long](
      "SELECT age('month', DATE '2024-01-31', DATE '2024-03-01')") == 1L)
    assert(one[Long](
      "SELECT age('day', DATE '2024-01-01', DATE '2024-01-08')") == 7L)
    assert(one[Int]("SELECT toISOWeek(DATE '2024-01-04')") == 1)
    assert(one[Int]("SELECT toISOYear(DATE '2023-01-01')") == 2022) // ISO year
  }

  test("wave 2: map algebra") {
    assert(one[Map[Int, Int]](
      "SELECT mapUpdate(map(1, 10, 2, 20), map(2, 99, 3, 30))")
      == Map(1 -> 10, 2 -> 99, 3 -> 30))
    assert(one[Map[Long, Long]](
      "SELECT mapPopulateSeries(map(1L, 1L, 4L, 4L))")
      == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 4L))
  }

  test("lambda-first arrayFold / mapFilter / mapApply") {
    assert(one[Int](
      "SELECT arrayFold((acc, x) -> acc + x, array(1, 2, 3), 0)") == 6)
    assert(one[Map[Int, Int]](
      "SELECT mapFilter((k, v) -> v > 10, map(1, 5, 2, 20))") == Map(2 -> 20))
    assert(one[Map[Int, Int]](
      "SELECT mapApply((k, v) -> v * 2, map(1, 5, 2, 20))")
      == Map(1 -> 10, 2 -> 40))
  }

  test("wave 2: array norms and AUC") {
    assert(one[Double]("SELECT arrayL1Norm(array(1.0, -2.0, 3.0))") == 6.0)
    assert(one[Double]("SELECT arrayLinfNorm(array(1.0, -5.0, 3.0))") == 5.0)
    assert(one[Double](
      "SELECT arrayL1Distance(array(1.0, 2.0), array(3.0, 1.0))") == 3.0)
    assert(one[Double](
      "SELECT arrayLinfDistance(array(1.0, 2.0), array(3.0, 1.0))") == 2.0)
    // perfect ranking → AUC 1; all-tied scores keep ARRAY order in the
    // reference's stable desc sort (arrayAUC.cpp), so [1,1,0,0] → 1.0
    assert(one[Double](
      "SELECT arrayAUC(array(0.9, 0.8, 0.2, 0.1), array(1, 1, 0, 0))") == 1.0)
    assert(one[Double](
      "SELECT arrayAUC(array(0.5, 0.5, 0.5, 0.5), array(1, 1, 0, 0))") == 1.0)
    assert(one[Double](
      "SELECT arrayAUC(array(0.1, 0.9), array(1, 0))") == 0.0)
  }

  test("wave 2: JSON raw/keys/JSON_VALUE/JSON_QUERY") {
    assert(one[String](
      """SELECT JSONExtractRaw('{"a": {"b": 1}}', 'a')""") == """{"b":1}""")
    assert(one[String](
      """SELECT JSONExtractRaw('{"a": "str"}', 'a')""") == "\"str\"")
    assert(one[scala.collection.Seq[String]](
      """SELECT JSONExtractKeys('{"x": 1, "y": 2}')""").toList == List("x", "y"))
    assert(one[String](
      """SELECT JSON_VALUE('{"a": {"b": "v"}}', '$.a.b')""") == "v")
    assert(one[String](
      """SELECT JSON_VALUE('{"a": 1}', '$.missing')""") == "")
    assert(one[String](
      """SELECT JSON_QUERY('{"a": 5}', '$.a')""") == "[5]")
    assert(one[Int]("""SELECT JSONLength('[1, 2, 3]')""") == 3)
  }

  test("URL family completion, pads, intervals") {
    assert(one[String](
      "SELECT firstSignificantSubdomain('https://news.clickhouse.com/path')")
      == "clickhouse")
    assert(one[String](
      "SELECT firstSignificantSubdomain('https://www.example.co.uk/x')")
      == "example")
    assert(one[String](
      "SELECT cutToFirstSignificantSubdomain('https://news.clickhouse.com/p')")
      == "clickhouse.com")
    assert(one[String](
      "SELECT cutToFirstSignificantSubdomain('https://www.example.co.uk/x')")
      == "example.co.uk")
    assert(one[String]("SELECT encodeURLComponent('a b&c')") == "a%20b%26c")
    assert(one[String]("SELECT decodeURLComponent('a%20b%26c')") == "a b&c")
    assert(one[String]("SELECT decodeURLComponent('a+b')") == "a+b")
    assert(one[String]("SELECT leftPad('7', 3, '0')") == "007")
    assert(one[String]("SELECT rightPad('7', 3, '.')") == "7..")
    assert(one[java.sql.Timestamp](
      "SELECT toDateTime('2024-01-01 00:00:00') + toIntervalHour(2)")
      .toString.contains("02:00:00"))
  }

  test("greatCircleDistance LUT kernel") {
    // Paris (2.3522, 48.8566) → London (-0.1276, 51.5072) ≈ 343.5 km
    val d = one[Float](
      "SELECT greatCircleDistance(2.3522, 48.8566, -0.1276, 51.5072)")
    assert(math.abs(d - 343500) < 2000, s"got $d")
    assert(one[Float]("SELECT geoDistance(0, 0, 0, 0)") == 0.0f)
    // one degree of latitude: the reference's flat-model value
    // (01043_geo_distance pins 111195.055)
    val dl = one[Float]("SELECT greatCircleDistance(0, 0, 0, 1)")
    assert(dl === 111195.055f, s"got $dl")
  }

  test("text analysis extras") {
    assert(one[String]("SELECT detectLanguage('the cat is on the mat and it is here')") == "en")
    assert(one[Double]("SELECT ngramSearch('hello world', 'hello world')") == 1.0)
  }

  test("registry wave r5: multiSearch, julian day, URL hierarchy, JSON pairs") {
    assert(oneSeq(
      "SELECT multiSearchAllPositions('Hello, World!', ['hello', '!', 'world'])")
      == Seq(0L, 13L, 0L))
    assert(one[Number](
      "SELECT multiSearchFirstIndex('Hello World', ['xyz', 'World', 'Hello'])")
      .longValue == 2L)
    assert(one[Long](
      "SELECT multiSearchFirstPosition('Hello World', ['xyz', 'World', 'o'])") == 5L)
    assert(one[Int]("SELECT toModifiedJulianDay('2020-11-01')") == 59154)
    assert(one[Int]("SELECT toModifiedJulianDay('1858-11-16')") == -1)
    assert(one[String]("SELECT fromModifiedJulianDay(59154)") == "2020-11-01")
    assert(spark.sql("SELECT toModifiedJulianDayOrNull('unparsable')")
      .collect()(0).isNullAt(0))
    assert(oneSeq(
      "SELECT URLHierarchy('https://example.com/browse/CONV-6788?a=b')")
      == Seq("https://example.com/", "https://example.com/browse/",
        "https://example.com/browse/CONV-6788?", "https://example.com/browse/CONV-6788?a=b"))
    assert(oneSeq(
      "SELECT URLPathHierarchy('https://example.com/browse/x')")
      == Seq("/browse/", "/browse/x"))
    assert(oneSeq("SELECT URLHierarchy('no-protocol')")
      == Seq("no-protocol"))
    val kv = ChSql.sql(spark,
      """SELECT JSONExtractKeysAndValues('{"x": {"a": 5, "b": 7}}', 'x', 'Int8') AS p""",
      SparkSpec.tiny).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(kv.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 5L), ("b", 7L)))
    val theta = one[Long]("SELECT uniqTheta(number) FROM numbers(100)")
    assert(theta > 90L && theta < 110L) // sketch estimate, ±10%
    assert(ChSql.sql(spark,
      "SELECT runningAccumulate(number) AS r FROM numbers(4)",
      SparkSpec.tiny).collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L, 6L))
  }

  test("sipHash64 timestamp arg consumes its width slot (alignment)") {
    // Regression: TimestampType must call nextSlot() like every other
    // leaf, else a following small-int literal reads the timestamp's
    // (empty) slot and hashes at Spark width 4 instead of CH UInt16 2.
    def le(v: Long, n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var i = 0
      while (i < n) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      b
    }
    val ts = 1577934245L // 2020-01-02 03:04:05 UTC, CH DateTime = UInt32
    val expected = ChHash.sipCombine(
      ChHash.sipHash64(le(ts, 4)), ChHash.sipHash64(le(300L, 2)))
    val got = ChSql.sql(spark,
      "SELECT sipHash64(toDateTime('2020-01-02 03:04:05'), 300) AS h",
      SparkSpec.tiny).collect()(0).getDecimal(0)
    assert(got.toPlainString == java.lang.Long.toUnsignedString(expected))
  }
}
