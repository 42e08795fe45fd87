package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** URLHash(url[, level]) — CityHash64 of the URL with one trailing
  * '/', '?' or '#' dropped; the leveled form hashes the prefix up to the
  * Nth path level (ref FunctionsHashing.h URLHashImpl:1494 /
  * URLHierarchyHashImpl:1507 — ported walk-for-walk, including the
  * reference's exclusive `> 'a' && < 'z'` protocol-scan bounds). */
object UrlHash {

  private def sep(b: Byte): Boolean = b == '/' || b == '?' || b == '#'

  private[functions] def findLevelLength(level: Long,
      s: Array[Byte]): Int = {
    val end = s.length
    var pos = 0
    while (pos < end && ((s(pos) > 'a' && s(pos) < 'z') ||
      (s(pos) > '0' && s(pos) < '9'))) pos += 1
    var proto = pos != 0 && pos != end
    if (proto) {
      proto = s(pos) == ':'; pos += 1
      if (proto) { proto = pos < end && s(pos) == '/'; pos += 1 }
      if (proto) { proto = pos < end && s(pos) == '/'; pos += 1 }
      if (proto) proto = pos < end
    }
    if (!proto)
      return if (level == 0) end else 0
    while (pos < end && !sep(s(pos))) pos += 1
    if (pos != end) pos += 1
    if (level == 0) return pos
    var currentLevel = 0L
    while (currentLevel != level && pos < end) {
      while (pos < end && sep(s(pos))) pos += 1
      if (pos < end) {
        while (pos < end && !sep(s(pos))) pos += 1
        if (pos != end) pos += 1
        currentLevel += 1
      }
    }
    if (currentLevel == level) pos else 0
  }

  private def hashPrefix(data: Array[Byte], size: Int): Long = {
    val n = if (size > 0 && sep(data(size - 1))) size - 1 else size
    ChHash.cityHash64(java.util.Arrays.copyOf(data, n))
  }

  def urlHash(bytes: Array[Byte], level: Option[Long]): Long = level match {
    case None => hashPrefix(bytes, bytes.length)
    case Some(l) => hashPrefix(bytes, findLevelLength(l, bytes))
  }

  case class UrlHashExpr(left: Expression, right: Expression,
      leveled: Boolean) extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "URLHash"
    override def nullSafeEval(u: Any, l: Any): Any =
      urlHash(u.asInstanceOf[UTF8String].getBytes,
        if (leveled) Some(l.asInstanceOf[Number].longValue()) else None)
    override protected def withNewChildrenInternal(
        nl: Expression, nr: Expression): UrlHashExpr =
      copy(left = nl, right = nr)
  }

  def urlHashCol(u: Column, level: Option[Column]): Column =
    ColumnBridge.column(UrlHashExpr(ColumnBridge.expression(u),
      ColumnBridge.expression(level.getOrElse(
        org.apache.spark.sql.functions.lit(0L))), level.isDefined))
}
