package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Wave-3 registry surface: vector norms, codings, bit rotation,
  * array enumerate/resize, encryption, moment aggregates, sumMap —
  * all through the SQL-registered CH names. */
class Wave3Spec extends SparkSpec {

  private def one(sql: String): Row = {
    ChRegistry.register(spark)
    spark.sql(sql).collect()(0)
  }

  test("vector norms and distances") {
    val r = one(
      """SELECT L1Norm(array(1.0d, -2.0d, 2.0d)) AS l1,
        |       L2Norm(array(3.0d, 4.0d)) AS l2,
        |       LinfNorm(array(1.0d, -5.0d)) AS linf,
        |       L2SquaredNorm(array(3.0d, 4.0d)) AS l2sq,
        |       LpNorm(array(1.0d, 1.0d), 1.0d) AS lp1,
        |       L1Distance(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS d1,
        |       LinfDistance(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS dinf,
        |       L2SquaredDistance(array(0.0d, 0.0d), array(3.0d, 4.0d))
        |         AS d2sq""".stripMargin)
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 5.0)
    assert(r.getDouble(3) === 25.0)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-12)
    assert(r.getDouble(5) === 7.0)
    assert(r.getDouble(6) === 4.0)
    assert(r.getDouble(7) === 25.0)
  }

  test("normalize family: unit norm out") {
    val r = one(
      """SELECT L2Norm(L2Normalize(array(3.0d, 4.0d))) AS n2,
        |       L1Norm(L1Normalize(array(2.0d, -2.0d))) AS n1,
        |       LinfNorm(LinfNormalize(array(0.5d, -8.0d))) AS ninf""".stripMargin)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("UUID and MAC codings round-trip") {
    val r = one(
      """SELECT UUIDNumToString(UUIDStringToNum(
        |         '61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS uuid,
        |       MACNumToString(MACStringToNum('12:34:56:78:9A:BC')) AS mac,
        |       MACStringToOUI('12:34:56:78:9A:BC') AS oui""".stripMargin)
    assert(r.getString(0) === "61f0c404-5cb3-11e7-907b-a6006ad3dba0")
    assert(r.getString(1) === "12:34:56:78:9A:BC")
    assert(r.getLong(2) === 0x123456L)
  }

  test("hash family: sha tiers and crc32") {
    val r = one(
      """SELECT SHA1('abc') AS s1, SHA224('abc') AS s224,
        |       SHA512('abc') AS s512, CRC32('abc') AS c""".stripMargin)
    assert(r.getString(0) === "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(1) ===
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(r.getLong(3) === 891568578L)
  }

  test("bit rotation and bit tests") {
    val r = one(
      """SELECT bitRotateLeft(1, 1) AS rl, bitRotateRight(2, 1) AS rr,
        |       bitRotateLeft(1, 64) AS rl64,
        |       bitTestAll(7, 0, 1, 2) AS all1, bitTestAll(5, 0, 1) AS all0,
        |       bitTestAny(4, 0, 2) AS any1, bitTestAny(8, 0, 1) AS any0,
        |       bitPositionsToArray(10) AS pos""".stripMargin)
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 1L)
    assert(r.getBoolean(3) === true)
    assert(r.getBoolean(4) === false)
    assert(r.getBoolean(5) === true)
    assert(r.getBoolean(6) === false)
    assert(r.getSeq[Int](7) === Seq(1, 3))
  }

  test("array enumerate / resize / cumsum-non-negative") {
    val r = one(
      """SELECT arrayEnumerateUniq(array(10, 20, 10, 10)) AS uniq,
        |       arrayEnumerateDense(array(30, 10, 30, 20)) AS dense,
        |       arrayResize(array(1, 2, 3), 2) AS shrink,
        |       arrayResize(array(1, 2), 4, 9) AS grow,
        |       arrayCumSumNonNegative(array(1.0d, 1.0d, -4.0d, 1.0d)) AS nn,
        |       arrayEnumerateUniq(array()) AS empty""".stripMargin)
    assert(r.getSeq[Int](0) === Seq(1, 1, 2, 3))
    assert(r.getSeq[Int](1) === Seq(1, 2, 1, 3))
    assert(r.getSeq[Int](2) === Seq(1, 2))
    assert(r.getSeq[Int](3) === Seq(1, 2, 9, 9))
    assert(r.getSeq[Double](4) === Seq(1.0, 2.0, 0.0, 1.0))
    assert(r.getSeq[Int](5) === Seq.empty)
  }

  test("display helpers: ascii, basename, bar") {
    val r = one(
      """SELECT ascii('A') AS a, basename('/a/b/c.txt') AS b,
        |       bar(5.0d, 0.0d, 10.0d, 10) AS half,
        |       bar(10.0d, 0.0d, 10.0d, 4) AS full""".stripMargin)
    assert(r.getInt(0) === 65)
    assert(r.getString(1) === "c.txt")
    assert(r.getString(2) === "█████")
    assert(r.getString(3) === "████")
  }

  test("encryption: ECB and CBC round-trip, mysql aliases") {
    val r = one(
      """SELECT CAST(decrypt('aes-128-ecb',
        |         encrypt('aes-128-ecb', 'secret payload', '0123456789abcdef'),
        |         '0123456789abcdef') AS STRING) AS ecb,
        |       CAST(aes_decrypt_mysql('aes-256-cbc',
        |         aes_encrypt_mysql('aes-256-cbc', 'other text',
        |           '0123456789abcdef0123456789abcdef'),
        |         '0123456789abcdef0123456789abcdef') AS STRING) AS cbc""".stripMargin)
    assert(r.getString(0) === "secret payload")
    assert(r.getString(1) === "other text")
  }

  test("moment aggregates match closed-form moments") {
    ChRegistry.register(spark)
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 7.0, 9.0)
    import spark.implicits._
    xs.toDF("x").createOrReplaceTempView("w3_moments")
    val r = spark.sql(
      """SELECT skewPop(x), skewSamp(x), kurtPop(x), kurtSamp(x)
        |FROM w3_moments""".stripMargin).collect()(0)
    val n = xs.size.toDouble
    val m1 = xs.sum / n
    def cm(k: Int) = xs.map(x => math.pow(x - m1, k)).sum / n
    val skewPop = cm(3) / math.pow(cm(2), 1.5)
    val kurtPop = cm(4) / math.pow(cm(2), 2)
    val skewSamp = cm(3) * n / (n - 1) / math.pow(cm(2) * n / (n - 1), 1.5)
    val kurtSamp = cm(4) * n / (n - 1) / math.pow(cm(2) * n / (n - 1), 2)
    assert(math.abs(r.getDouble(0) - skewPop) < 1e-9)
    assert(math.abs(r.getDouble(1) - skewSamp) < 1e-9)
    assert(math.abs(r.getDouble(2) - kurtPop) < 1e-9)
    assert(math.abs(r.getDouble(3) - kurtSamp) < 1e-9)
  }

  test("sumMap/minMap/maxMap: CH tuple-of-arrays shape, keys sorted") {
    ChRegistry.register(spark)
    import spark.implicits._
    Seq(
      (Seq("b", "a"), Seq(2.0, 1.0)),
      (Seq("a", "c"), Seq(10.0, 5.0))
    ).toDF("ks", "vs").createOrReplaceTempView("w3_summap")
    val r = spark.sql(
      """SELECT sumMap(ks, vs) AS s, minMap(ks, vs) AS mn,
        |       maxMap(ks, vs) AS mx FROM w3_summap""".stripMargin)
      .collect()(0)
    val s = r.getStruct(0)
    assert(s.getSeq[String](0) === Seq("a", "b", "c"))
    assert(s.getSeq[Double](1) === Seq(11.0, 2.0, 5.0))
    val mn = r.getStruct(1)
    assert(mn.getSeq[Double](1) === Seq(1.0, 2.0, 5.0))
    val mx = r.getStruct(2)
    assert(mx.getSeq[Double](1) === Seq(10.0, 2.0, 5.0))
  }

  test("wave 3c: string/format/digit helpers") {
    val r = one(
      """SELECT isNaN(CAST('NaN' AS DOUBLE)) AS nan, isNaN(1.0d) AS notnan,
        |       char(72, 105) AS hi,
        |       concatWithSeparator('-', 'a', 'b', 'c') AS cws,
        |       format('{} and {}', 'x', 'y') AS fmt,
        |       format('100% of {}', 'z') AS pct,
        |       countDigits(-123.45d) AS cd,
        |       normalizeQuery(
        |         "SELECT id FROM t WHERE x = 42 AND s = 'abc'") AS nq
        |""".stripMargin)
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(r.getString(2) === "Hi")
    assert(r.getString(3) === "a-b-c")
    assert(r.getString(4) === "x and y")
    assert(r.getString(5) === "100% of z")
    assert(r.getInt(6) === 5)
    assert(r.getString(7) === "SELECT id FROM t WHERE x = ? AND s = ?")
  }

  test("wave 3c: base58 round-trip and hash names") {
    val r = one(
      """SELECT base58Encode('Hello') AS enc,
        |       base58Decode(base58Encode('encode me')) AS rt,
        |       murmurHash3_32('abc') IS NOT NULL AS m32,
        |       murmurHash3_64('abc') IS NOT NULL AS m64,
        |       intHash32(42) IS NOT NULL AS ih""".stripMargin)
    // 'Hello' in bitcoin-alphabet base58 (ref FunctionBase58Conversion.h)
    assert(r.getString(0) === "9Ajdvzr")
    assert(r.getString(1) === "encode me")
    assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4))
  }

  test("sub-second date arithmetic and TimeDiff") {
    val r = one(
      """SELECT addMilliseconds(TIMESTAMP '2024-01-01 00:00:00', 1500) AS a,
        |       subtractMicroseconds(
        |         TIMESTAMP '2024-01-01 00:00:00.000500', 500) AS b,
        |       TimeDiff(TIMESTAMP '2024-01-01 00:00:00',
        |                TIMESTAMP '2024-01-01 00:01:40') AS d""".stripMargin)
    assert(r.getTimestamp(0).toString === "2024-01-01 00:00:01.5")
    assert(r.getTimestamp(1).toString === "2024-01-01 00:00:00.0")
    assert(r.getLong(2) === 100L)
  }
}
