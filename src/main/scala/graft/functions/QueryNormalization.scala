package graft.functions

/** Query-text normalization (ref src/Parsers/queryNormalization.h):
  * literals → `?`, comma-separated literal lists → `?..`, insignificant
  * runs (whitespace + comments) → one space, complex identifiers (>2
  * digits, ≥36 bytes) → `` `?` `` unless keepNames. Reimplemented over a
  * small token scanner with the same observable contract.
  */
object QueryNormalization {

  private sealed trait Tok
  private case object Insig extends Tok // whitespace / comment
  private case object Lit extends Tok // number / string literal
  private case object Comma extends Tok
  private case class Ident(text: String, quoted: Boolean,
      followedByParen: Boolean) extends Tok
  private case class Other(text: String) extends Tok

  private def lex(s: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    override def hasNext: Boolean = i < s.length
    override def next(): Tok = {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        Insig
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        Insig
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < s.length &&
          !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, s.length)
        Insig
      } else if (c == '$' && i + 1 < s.length &&
        (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '$')) {
        // heredoc $tag$...$tag$ is a string literal (ref Lexer.cpp HereDoc)
        val tagEnd = s.indexOf('$', i + 1)
        if (tagEnd < 0) { i += 1; Other("$") }
        else {
          val tag = s.substring(i, tagEnd + 1)
          val close = s.indexOf(tag, tagEnd + 1)
          if (close < 0) { i += 1; Other("$") }
          else { i = close + tag.length; Lit }
        }
      } else if (c == '\'') {
        i += 1
        while (i < s.length && s.charAt(i) != '\'') {
          if (s.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
        Lit
      } else if (c.isDigit ||
        (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
          s.charAt(i) == '.' ||
          ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > 0 &&
            (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        Lit
      } else if (c == ',') { i += 1; Comma }
      else if (c == '`') {
        val start = i
        i += 1
        while (i < s.length && s.charAt(i) != '`') i += 1
        i = math.min(i + 1, s.length)
        Ident(s.substring(start, i), quoted = true,
          followedByParen = i < s.length && s.charAt(i) == '(')
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
          s.charAt(i) == '_')) i += 1
        Ident(s.substring(start, i), quoted = false,
          followedByParen = i < s.length && s.charAt(i) == '(')
      } else { i += 1; Other(c.toString) }
    }
  }

  def normalize(query: String, keepNames: Boolean): String = {
    val out = new StringBuilder
    var prevInsig = false
    var litsInSeq = 0
    var prevComma = false
    var prevWs = false
    var first = true
    lex(query).foreach {
      case Insig =>
        if (!prevInsig) {
          if (litsInSeq == 0) { if (!first) out.append(' ') }
          else prevWs = true
        }
        prevInsig = true
      case tok =>
        prevInsig = false
        first = false
        tok match {
          case Lit =>
            if (litsInSeq == 0) out.append('?')
            litsInSeq += 1
            prevWs = false
            prevComma = false
          case Comma if litsInSeq > 0 => prevComma = true
          case other =>
            if (litsInSeq > 1) out.append("..")
            if (prevComma) out.append(',')
            if (prevWs) out.append(' ')
            litsInSeq = 0
            prevComma = false
            prevWs = false
            other match {
              case Ident(text, quoted, fnParen) if quoted || !fnParen =>
                val bare = if (quoted) text.stripPrefix("`").stripSuffix("`")
                  else text
                val complex = !keepNames && (bare.length >= 36 ||
                  bare.exists(_.isWhitespace) ||
                  bare.count(_.isDigit) > 2)
                if (complex) out.append("`?`") else out.append(text)
              case Ident(text, _, _) => out.append(text)
              case Comma => out.append(',')
              case Other(t) => out.append(t)
              case _ =>
            }
        }
    }
    // end-of-stream flushes like any other boundary token
    if (litsInSeq > 1) out.append("..")
    if (prevComma) out.append(',')
    if (prevWs) out.append(' ')
    out.toString
  }
}
