package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming (M.F. Porter, "An algorithm for suffix stripping",
  * 1980 — the public algorithm; ref src/Functions/stem.cpp delegates to
  * libstemmer's equivalent English stemmer). Implemented for `en`;
  * other languages pass through unchanged (the reference's ru/fr/…
  * stemmers need the Snowball dictionary machinery — documented hook:
  * extend `stem()` per language the same way).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var b = word.toCharArray
    var k = b.length - 1

    def isConsonant(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !isConsonant(i - 1)
      case _ => true
    }

    /** Measure of the stem b[0..j]: number of VC sequences. */
    def m(j: Int): Int = {
      var n = 0; var i = 0
      while (i <= j && isConsonant(i)) i += 1
      if (i > j) return 0
      while (i <= j) {
        while (i <= j && !isConsonant(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && isConsonant(i)) i += 1
      }
      n
    }

    def endsWith(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) false
      else (0 until l).forall(i => b(k - l + 1 + i) == s.charAt(i))
    }
    /** j = last index of the stem once suffix s is stripped. */
    def stemEnd(s: String): Int = k - s.length

    def vowelInStem(j: Int): Boolean = (0 to j).exists(i => !isConsonant(i))
    def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && isConsonant(i)
    /** cvc ending where the last c is not w, x or y. */
    def cvc(i: Int): Boolean =
      i >= 2 && isConsonant(i) && !isConsonant(i - 1) && isConsonant(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    def setTo(s: String, j: Int): Unit = {
      val nb = new Array[Char](j + 1 + s.length)
      System.arraycopy(b, 0, nb, 0, j + 1)
      s.getChars(0, s.length, nb, j + 1)
      b = nb
      k = nb.length - 1
    }
    // Step 1a — plurals
    if (endsWith("sses")) setTo("ss", stemEnd("sses"))
    else if (endsWith("ies")) setTo("i", stemEnd("ies"))
    else if (!endsWith("ss") && endsWith("s")) k -= 1

    // Step 1b — -ed / -ing
    var extraStep1b = false
    if (endsWith("eed")) {
      if (m(stemEnd("eed")) > 0) k -= 1
    } else if (endsWith("ed") && vowelInStem(stemEnd("ed"))) {
      k = stemEnd("ed"); extraStep1b = true
    } else if (endsWith("ing") && vowelInStem(stemEnd("ing"))) {
      k = stemEnd("ing"); extraStep1b = true
    }
    if (extraStep1b) {
      if (endsWith("at") || endsWith("bl") || endsWith("iz")) setTo("e", k)
      else if (doubleC(k) && b(k) != 'l' && b(k) != 's' && b(k) != 'z') k -= 1
      else if (m(k) == 1 && cvc(k)) setTo("e", k)
    }

    // Step 1c — y → i when stem has a vowel
    if (endsWith("y") && vowelInStem(stemEnd("y"))) b(k) = 'i'

    // Step 2 — double suffices (measure > 0)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "bli" -> "ble", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
      "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log")
    step2.find { case (s, _) => endsWith(s) }.foreach { case (s, rep) =>
      if (m(stemEnd(s)) > 0) setTo(rep, stemEnd(s))
    }

    // Step 3
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (s, _) => endsWith(s) }.foreach { case (s, rep) =>
      if (m(stemEnd(s)) > 0) setTo(rep, stemEnd(s))
    }

    // Step 4 — drop (measure > 1)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    step4.find(endsWith).foreach { s =>
      val j = stemEnd(s)
      val ok = s != "ion" || (j >= 0 && (b(j) == 's' || b(j) == 't'))
      if (ok && m(j) > 1) k = j
    }

    // Step 5a — drop final e
    if (b(k) == 'e') {
      val j = k - 1
      if (m(j) > 1 || (m(j) == 1 && !cvc(j))) k -= 1
    }
    // Step 5b — -ll → -l when measure > 1
    if (k >= 1 && b(k) == 'l' && doubleC(k) && m(k - 1) > 1) k -= 1

    new String(b, 0, k + 1)
  }
}

/** stem(language, word) — ref src/Functions/stem.cpp. */
case class ChStem(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(lang: Any, word: Any): Any = {
    val w = word.asInstanceOf[UTF8String].toString
    lang.asInstanceOf[UTF8String].toString match {
      case "en" => UTF8String.fromString(PorterStemmer.stem(w.toLowerCase))
      case _ => UTF8String.fromString(w) // unhandled language: identity
    }
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ChStem = copy(left = l, right = r)
}
