package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** extractTextFromHTML (ref src/Functions/extractTextFromHTML.cpp):
  * comments (`<!-- -->`) removed with content; CDATA pasted verbatim;
  * lowercase `script`/`style` elements removed with their content
  * (closing tags hidden inside CDATA stay hidden); every other tag-like
  * run `<...>` dropped; whitespace collapsed to single spaces, with a
  * separator space inserted between text runs split by removed elements;
  * entities left undecoded. The state walk below mirrors the reference's
  * extract() loop rule-for-rule.
  */
object HtmlText {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\u000b'

  def extractText(s: String): String = {
    val end = s.length
    val dst = new java.lang.StringBuilder
    var src = 0

    def startsWith(p: String): Boolean =
      src + p.length < end && s.regionMatches(src, p, 0, p.length)
    def checkAndSkip(p: String): Boolean =
      if (startsWith(p)) { src += p.length; true } else false

    // <!-- ... --> ; also tolerates the malformed <!--> <!---> forms.
    // An unterminated comment consumes only what was scanned — the
    // remaining text is still emitted (ref extractTextFromHTML.cpp:96
    // breaks without advancing src to end, so `Hello<!--->world` keeps
    // `world`).
    def processComment(): Boolean = {
      if (!checkAndSkip("<!--")) return false
      var done = false
      while (!done) {
        val gt = s.indexOf('>', src)
        if (gt < 0 || gt >= end) done = true
        else {
          if (gt > src + 2 && s.charAt(gt - 1) == '-' &&
            s.charAt(gt - 2) == '-') { src = gt + 1; done = true }
          else src = gt + 1
        }
      }
      true
    }

    // <![CDATA[ ... ]]> — verbatim when copy=true
    def processCDATA(copy: Boolean): Boolean = {
      if (!checkAndSkip("<![CDATA[")) return false
      var gt = src
      var done = false
      while (!done) {
        gt = s.indexOf('>', gt)
        if (gt < 0) { src = end; done = true }
        else if (gt >= 2 && s.charAt(gt - 1) == ']' &&
          s.charAt(gt - 2) == ']') {
          if (copy) dst.append(s, src, gt - 2)
          src = gt + 1
          done = true
        } else gt += 1
      }
      true
    }

    // <script ...> … </script >  (content dropped; CDATA inside hides
    // closing tags; namespace forms like <script:a> are NOT elements)
    def processElementAndSkipContent(tag: String): Boolean = {
      val oldSrc = src
      if (!(src < end && s.charAt(src) == '<')) return false
      src += 1
      if (!checkAndSkip(tag)) { src = oldSrc; return false }
      if (src >= end) return false
      if (!(isWs(s.charAt(src)) || s.charAt(src) == '>')) {
        src = oldSrc; return false
      }
      val gt = s.indexOf('>', src)
      if (gt < 0) { src = end; return false }
      src = gt + 1
      var done = false
      while (!done) {
        val lt = s.indexOf('<', src)
        src = if (lt < 0) end else lt
        if (src + 1 >= end) { src = end; done = true }
        else {
          src += 1
          var continueLoop = false
          if (s.charAt(src) == '!') {
            src -= 1
            if (processCDATA(copy = false)) continueLoop = true
            else src += 1
          }
          if (!continueLoop) {
            if (s.charAt(src) != '/') () // keep scanning
            else {
              src += 1
              if (checkAndSkip(tag)) {
                while (src < end && isWs(s.charAt(src))) src += 1
                if (src >= end) done = true
                else if (s.charAt(src) == '>') { src += 1; done = true }
              }
            }
          }
        }
      }
      true
    }

    def skipTag(): Boolean = {
      if (src < end && s.charAt(src) == '<') {
        val gt = s.indexOf('>', src)
        src = if (gt < 0) end else gt + 1
        true
      } else false
    }

    // plain text up to the next '<': collapse whitespace runs, emit the
    // separator space when a previous write didn't end in one
    def copyText(needsWs: Boolean): Unit = {
      while (src < end && isWs(s.charAt(src))) src += 1
      var lt = s.indexOf('<', src)
      if (lt < 0) lt = end
      if (needsWs && src < lt) dst.append(' ')
      var break = false
      while (!break) {
        var ws = src
        while (ws < lt && !isWs(s.charAt(ws))) ws += 1
        dst.append(s, src, ws)
        src = ws
        while (src < lt && isWs(s.charAt(src))) src += 1
        if (src < lt) dst.append(' ') else break = true
      }
      src = lt
    }

    while (src < end) {
      val needsWs = dst.length > 0 && dst.charAt(dst.length - 1) != ' '
      copyText(needsWs)
      if (src < end) {
        val _ = processComment() || processCDATA(copy = true) ||
          processElementAndSkipContent("script") ||
          processElementAndSkipContent("style") || skipTag()
      }
    }
    dst.toString
  }

  case class ExtractTextFromHtml(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "extractTextFromHTML"
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(extractText(input.asInstanceOf[UTF8String]
        .toString))
    override protected def withNewChildInternal(
        c: Expression): ExtractTextFromHtml = copy(child = c)
  }

  def extractTextFromHTML(c: Column): Column =
    ColumnBridge.column(ExtractTextFromHtml(ColumnBridge.expression(c)))
}
