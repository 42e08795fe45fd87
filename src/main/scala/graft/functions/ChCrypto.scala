package graft.functions

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}

/** CH encrypt/decrypt/aes_encrypt_mysql/aes_decrypt_mysql semantics (ref
  * src/Functions/FunctionsAES.h): deterministic raw-AES output — mode
  * string `aes-{128,192,256}-{ecb,cbc,cfb128,ofb,ctr,gcm}`, exact key
  * length required (the MySQL-compat variants instead FOLD an over-long
  * key by XOR and truncate an over-long IV), a missing IV means the
  * all-zero IV while a non-empty-but-short one throws, and GCM appends
  * the 16-byte tag to the ciphertext and takes the IV at its full
  * arbitrary length. Spark's builtin aes_encrypt prepends a RANDOM IV in CBC
  * mode, so the CH-exact contract needs direct JCE use; scalar per-row
  * crypto is a legitimate UDF tier (no plan semantics, O(1) state).
  */
object ChCrypto {

  private case class Mode(bits: Int, alg: String) {
    def keyLen: Int = bits / 8
    def ivLen: Int = alg match {
      case "ecb" => 0
      case "gcm" => 12
      case _ => 16
    }
    def transformation: String = alg match {
      case "ecb" => "AES/ECB/PKCS5Padding"
      case "cbc" => "AES/CBC/PKCS5Padding"
      case "cfb128" => "AES/CFB/NoPadding"
      case "ofb" => "AES/OFB/NoPadding"
      case "ctr" => "AES/CTR/NoPadding"
      case "gcm" => "AES/GCM/NoPadding"
      case other => throw new IllegalArgumentException(
        s"unsupported cipher mode aes-$bits-$other")
    }
  }

  private def parseMode(m: String): Mode = {
    val p = m.trim.toLowerCase.split("-")
    require(p.length == 3 && p(0) == "aes", s"Invalid mode: $m")
    require(Set("128", "192", "256")(p(1)), s"Invalid mode: $m")
    Mode(p(1).toInt, p(2))
  }

  /** MySQL key folding: bytes past the required length XOR back in. */
  private def foldKey(key: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < key.length) { out(i % n) = (out(i % n) ^ key(i)).toByte; i += 1 }
    out
  }

  private def fitKey(key: Array[Byte], m: Mode, mysql: Boolean): Array[Byte] =
    if (mysql) foldKey(key, m.keyLen)
    else {
      require(key.length == m.keyLen,
        s"Invalid key size: ${key.length} expected ${m.keyLen}")
      key
    }

  /** ref validateIV (FunctionsAES.h:125-130): MySQL mode throws on a
    * non-empty IV SHORTER than required (longer is truncated); OpenSSL
    * mode throws on any non-empty IV whose size differs. An empty IV is
    * "no IV" → the all-zero default. GCM is handled separately (full IV
    * of arbitrary length, required non-empty).
    */
  private def fitIv(iv: Array[Byte], m: Mode, mysql: Boolean): Array[Byte] = {
    val n = m.ivLen
    if (n == 0) Array.emptyByteArray
    else if (iv.isEmpty) new Array[Byte](n)
    else if (mysql) {
      require(iv.length >= n, s"Invalid IV size: ${iv.length} expected $n")
      java.util.Arrays.copyOf(iv, n)
    } else {
      require(iv.length == n, s"Invalid IV size: ${iv.length} expected $n")
      iv
    }
  }

  private def cipher(modeStr: String, key: Array[Byte], iv: Array[Byte],
      mysql: Boolean, encrypt: Boolean): Cipher = {
    val m = parseMode(modeStr)
    // MySQL-compat supports only ecb/cbc/cfb/ofb (ref getMethod:95-106)
    if (mysql) require(Set("ecb", "cbc", "cfb128", "ofb")(m.alg),
      "Unsupported cipher mode")
    val c = Cipher.getInstance(m.transformation)
    val k = new SecretKeySpec(fitKey(key, m, mysql), "AES")
    val dir = if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE
    m.alg match {
      case "ecb" => c.init(dir, k)
      case "gcm" =>
        // ref FunctionsAES.h:314-341: GCM IV may be of ARBITRARY size >0
        // (EVP_CTRL_AEAD_SET_IVLEN is set to the actual length — a
        // 16-byte IV is used in full, not truncated to 12); an empty IV
        // throws. MySQL-compat mode does not support GCM at all
        // (getMethod:95-121).
        require(!mysql, "Unsupported cipher mode")
        require(iv.nonEmpty, s"Invalid IV size: 0 expected ${m.ivLen}")
        c.init(dir, k, new GCMParameterSpec(128, iv))
      case _ => c.init(dir, k, new IvParameterSpec(fitIv(iv, m, mysql)))
    }
    c
  }

  def encrypt(mode: String, plain: Array[Byte], key: Array[Byte],
      iv: Array[Byte], mysql: Boolean): Array[Byte] =
    cipher(mode, key, iv, mysql, encrypt = true).doFinal(plain)

  def decrypt(mode: String, ct: Array[Byte], key: Array[Byte],
      iv: Array[Byte], mysql: Boolean): Array[Byte] =
    cipher(mode, key, iv, mysql, encrypt = false).doFinal(ct)
}
