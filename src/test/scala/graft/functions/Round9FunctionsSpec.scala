package graft.functions

import graft.{ChSql, SparkSpec}

/** Round-9 semantic fixes pinned to reference behavior:
  *  - sipHash128ReferenceKeyed multi-arg combine (ref FunctionsHashing.h
  *    SipHash128ReferenceKeyedImpl::combineHashesKeyed:421-432 re-applies
  *    the keyed reference algorithm; the UNKEYED reference form combines
  *    via the non-reference SipHash128Impl:400)
  *  - AES-GCM full-length IV + strict IV size checks (ref FunctionsAES.h
  *    validateIV:125-130 and the GCM EVP_CTRL_AEAD_SET_IVLEN path:335;
  *    vectors from tests/queries/0_stateless/01318_encrypt with its
  *    16-byte IV fixture)
  *  - JSON schema inference of UInt64 on Int64 overflow (ref
  *    SchemaInferenceUtils.cpp tryInferNumber:653-708, Int64+UInt64
  *    merge:81-95)
  *  - all-NULL tuple [NOT] IN as a whole-predicate constant (01774)
  */
class Round9FunctionsSpec extends SparkSpec {

  private def one(q: String): Any =
    ChSql.sql(spark, q, SparkSpec.tiny).head.get(0)

  private def le16(lo: Long, hi: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = ((lo >>> (8 * i)) & 0xff).toByte
      out(8 + i) = ((hi >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }
  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString

  test("sipHash128ReferenceKeyed multi-arg combines with the keyed " +
    "reference algorithm") {
    val k0 = 506097522914230528L
    val k1 = 1084818905618843912L
    val (aLo, aHi) = ChHash.sipHash128RefKeyed(k0, k1, "abc".getBytes)
    val (bLo, bHi) = ChHash.sipHash128RefKeyed(k0, k1, "xyz".getBytes)
    val (cLo, cHi) =
      ChHash.sipHash128RefKeyed(k0, k1, le16(aLo, aHi) ++ le16(bLo, bHi))
    val got = one("SELECT hex(sipHash128ReferenceKeyed((toUInt64(" +
      "506097522914230528), toUInt64(1084818905618843912)), 'abc', 'xyz'))")
    assert(got === hex(le16(cLo, cHi)))
  }

  test("unkeyed sipHash128Reference multi-arg still combines via the " +
    "non-reference sipHash128") {
    val (aLo, aHi) = ChHash.sipHash128RefKeyed(0L, 0L, "abc".getBytes)
    val (bLo, bHi) = ChHash.sipHash128RefKeyed(0L, 0L, "xyz".getBytes)
    val (cLo, cHi) =
      ChHash.sipHash128Keyed(0L, 0L, le16(aLo, aHi) ++ le16(bLo, bHi))
    val got = one("SELECT hex(sipHash128Reference('abc', 'xyz'))")
    assert(got === hex(le16(cLo, cHi)))
  }

  // 01318_encrypt fixture: 16-byte IV, keys are prefixes of one blob
  private val key16 = "unhex('fb9958e2e897ef3fdb49067b51a24af6')"
  private val key32 = "unhex('fb9958e2e897ef3fdb49067b51a24af6" +
    "45b3626eed2f9ea1dc7fd4dd71b7e38f')"
  private val iv16 = "unhex('8CA3554377DFF8A369BC50A89780DD85')"

  test("AES-GCM uses the FULL 16-byte IV (01318 vectors)") {
    assert(one(s"SELECT hex(encrypt('aes-128-gcm', 'text', $key16, $iv16))")
      === "C08B1CF60C5A2C92C55DAC62223CBA22C736446C")
    assert(one(s"SELECT hex(encrypt('aes-128-gcm', '', $key16, $iv16))")
      === "3D67D2B8D8F49A24C482085FEC494231")
    assert(one(s"SELECT hex(encrypt('aes-256-gcm', 'text', $key32, $iv16))")
      === "8742CE3A7B0595B281C712600D274CA881F47414")
  }

  test("AES-GCM roundtrips with an arbitrary-length IV") {
    assert(one(s"SELECT decrypt('aes-256-gcm', " +
      s"encrypt('aes-256-gcm', 'hello', $key32, $iv16), $key32, $iv16)")
      === "hello")
  }

  test("non-empty wrong-size IVs throw per validateIV") {
    // OpenSSL mode: size != cipher size throws (even longer)
    intercept[Exception](one(
      s"SELECT encrypt('aes-128-cbc', 'text', $key16, unhex('AABB'))"))
    // MySQL mode: shorter-than-required throws, longer truncates
    intercept[Exception](one(
      s"SELECT aes_encrypt_mysql('aes-128-cbc', 'text', $key16, " +
        "unhex('AABB'))"))
    assert(one(s"SELECT hex(aes_encrypt_mysql('aes-128-cbc', 'text', " +
      s"$key16, concat($iv16, unhex('FF')))) = " +
      s"hex(aes_encrypt_mysql('aes-128-cbc', 'text', $key16, $iv16))")
      === true)
  }

  test("GCM rejects an empty IV; MySQL mode rejects GCM/CTR") {
    intercept[Exception](one(
      s"SELECT encrypt('aes-128-gcm', 'text', $key16)"))
    intercept[Exception](one(
      s"SELECT aes_encrypt_mysql('aes-128-gcm', 'text', $key16, $iv16)"))
    intercept[Exception](one(
      s"SELECT aes_encrypt_mysql('aes-128-ctr', 'text', $key16, $iv16)"))
  }

  private def descTypes(sql: String): Seq[String] =
    graft.formats.DescFormat.tryHandle(sql, Map.empty[String, String])
      .get.map(_.split("\t")(1))

  test("JSON integer overflowing Int64 infers UInt64, not Float64") {
    assert(descTypes(
      "desc format(JSONEachRow, '{\"x\":18446744073709551615}')")
      === Seq("Nullable(UInt64)"))
    // Int64 + UInt64 rows merge to UInt64
    assert(descTypes("desc format(JSONEachRow, '{\"x\":1}\n" +
      "{\"x\":18446744073709551615}')") === Seq("Nullable(UInt64)"))
    // beyond UInt64 still falls to Float64
    assert(descTypes(
      "desc format(JSONEachRow, '{\"x\":184467440737095516150}')")
      === Seq("Nullable(Float64)"))
    // negative overflow is Float64 (no UInt64 for negatives)
    assert(descTypes(
      "desc format(JSONEachRow, '{\"x\":-18446744073709551615}')")
      === Seq("Nullable(Float64)"))
  }

  test("format() reads a full-range UInt64 value") {
    assert(one("SELECT x FROM format(JSONEachRow, " +
      "'{\"x\":18446744073709551615}')").toString
      === "18446744073709551615")
  }

  test("all-NULL tuple [NOT] IN is a whole-predicate constant") {
    assert(one("SELECT (NULL, NULL) IN ((NULL, NULL))") === false)
    assert(one("SELECT (NULL, NULL) NOT IN ((NULL, NULL))") === true)
    // under a preceding NOT the old FALSE-AND prefix broke precedence
    assert(one("SELECT NOT (NULL, NULL) IN ((NULL, NULL))") === true)
    assert(one("SELECT (NULL, NULL, NULL) IN ((1, 2, 3), (NULL, NULL, " +
      "NULL))") === false)
  }
}
