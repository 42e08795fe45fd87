package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URLHierarchy / URLPathHierarchy (ref src/Functions/URL/
  * URLPathHierarchy.cpp URLHierarchyImpl and URLHierarchy.cpp
  * URLPathHierarchyImpl — the reference's file names are swapped):
  * cumulative URL prefixes cut at every `/`, `?`, `#` after the domain.
  * URLHierarchy includes the protocol+domain prefix (a URL without
  * `proto://` yields itself as the only element); URLPathHierarchy
  * emits domain-relative prefixes and yields an empty array without a
  * protocol. */
case class UrlHierarchy(child: Expression, pathOnly: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (pathOnly) "URLPathHierarchy" else "URLHierarchy"

  private def isSep(c: Char) = c == '/' || c == '?' || c == '#'

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    // protocol: lowercase letters / digits, then "://" and something
    while (pos < n && ((s.charAt(pos) > 'a' && s.charAt(pos) < 'z') ||
      (s.charAt(pos) > '0' && s.charAt(pos) < '9'))) pos += 1
    val hasProto = pos > 0 && pos + 2 < n && s.charAt(pos) == ':' &&
      s.charAt(pos + 1) == '/' && s.charAt(pos + 2) == '/' && pos + 3 < n
    if (!hasProto) {
      if (!pathOnly && n > 0) out += UTF8String.fromString(s)
      return new GenericArrayData(out.toArray[Any])
    }
    pos += 3
    // domain: up to the next separator (inclusive if present)
    while (pos < n && !isSep(s.charAt(pos))) pos += 1
    val start = pos // URLPathHierarchy tokens begin after the domain
    if (pos < n) pos += 1
    if (!pathOnly) out += UTF8String.fromString(s.substring(0, pos))
    var done = false
    while (!done) {
      while (pos < n && isSep(s.charAt(pos))) pos += 1
      if (pos >= n) done = true
      else {
        while (pos < n && !isSep(s.charAt(pos))) pos += 1
        if (pos < n) pos += 1
        out += UTF8String.fromString(
          s.substring(if (pathOnly) start else 0, pos))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): UrlHierarchy =
    copy(child = c)
}
