package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime tier of `toTypeName` (ref src/Functions/toTypeName.cpp):
  * when the static CH-type inference (ChSql.rewriteTypeIntrospection /
  * ChTypes) cannot fold the call, derive the CH type name from the
  * RESOLVED Spark type of the argument. Best-effort by construction —
  * Spark's type system cannot carry every CH distinction (UInt64 vs
  * Int64, DateTime vs DateTime64 precision, LowCardinality), so for a
  * direct column reference the DECLARED CH type text (captured at
  * CREATE by the DDL emulation and threaded through `declared`) takes
  * priority whenever its base type is consistent with the resolved
  * Spark type; everything else names the Spark-visible type. The static
  * fold keeps priority for all calls it can prove. Nullability comes
  * from the expression.
  */
case class ChTypeNameOf(child: Expression,
    declared: Option[String] = None)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "toTypeName"

  private def name(dt: DataType, nul: Boolean): String = {
    val core = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType | BinaryType => "String"
      case BooleanType =>
        // a column DECLARED Bool keeps its display type even though it
        // is stored as a plain Spark boolean (advice r10); comparison
        // RESULTS are UInt8 in CH
        if (declared.exists(d =>
          "(?i)(?<![A-Za-z])Bool(?![A-Za-z])".r.findFirstIn(d).isDefined))
          "Bool"
        else "UInt8"
      case _: BoolUDT => "Bool"
      case DateType => "Date"
      case TimestampType | TimestampNTZType => "DateTime"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case a: ArrayType => s"Array(${name(a.elementType, a.containsNull)})"
      case m: MapType =>
        s"Map(${name(m.keyType, nul = false)}, " +
          s"${name(m.valueType, m.valueContainsNull)})"
      case s: StructType =>
        s.fields.map(f => name(f.dataType, f.nullable))
          .mkString("Tuple(", ", ", ")")
      case NullType => "Nullable(Nothing)"
      case other => other.simpleString
    }
    if (nul && dt != NullType && !dt.isInstanceOf[StructType] &&
      !dt.isInstanceOf[ArrayType] && !dt.isInstanceOf[MapType])
      s"Nullable($core)"
    else core
  }

  /** Base CH type of a declared text, wrappers stripped. */
  private def baseOf(t: String): String = {
    var s = t.trim
    var go = true
    while (go) {
      val m = "(?is)^(Nullable|LowCardinality)\\s*\\((.*)\\)\\s*$"
        .r.findFirstMatchIn(s)
      m match { case Some(mm) => s = mm.group(2).trim; case None => go = false }
    }
    s
  }

  /** The declared CH text is trusted only when its base type agrees with
    * the resolved Spark type — a cross-table column-name collision in
    * the declared-type registry must not relabel an unrelated column. */
  private def declaredConsistent(d: String, dt: DataType): Boolean = {
    val b = baseOf(d).toLowerCase
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        b.startsWith("uint") || b.startsWith("int") ||
          b.startsWith("enum") || b.startsWith("interval")
      case BooleanType | _: BoolUDT => b == "bool"
      case FloatType | DoubleType => b.startsWith("float")
      case StringType | BinaryType =>
        b == "string" || b.startsWith("fixedstring") ||
          b.startsWith("enum") || b == "uuid" || b == "ipv4" || b == "ipv6"
      case DateType => b == "date" || b == "date32"
      case TimestampType | TimestampNTZType => b.startsWith("datetime")
      case _: DecimalType =>
        b.startsWith("decimal") || b.startsWith("datetime64") ||
          b == "uint64" || b == "int128" || b == "uint128" ||
          b == "int256" || b == "uint256"
      case _: ArrayType => b.startsWith("array") || b.startsWith("ring")
      case _: MapType => b.startsWith("map")
      case _: StructType =>
        b.startsWith("tuple") || b.startsWith("point") ||
          b.startsWith("aggregatefunction")
      case _ => false
    }
  }

  // the name depends only on the input TYPE: ignore the value (and keep
  // the output non-null even for NULL input, like the reference)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = UTF8String.fromString(
    declared.filter(d => declaredConsistent(d, child.dataType)) match {
      case Some(d) => d.trim.replaceAll("\\s*,\\s*", ", ")
      case None => name(child.dataType, child.nullable)
    })

  override protected def withNewChildInternal(c: Expression): ChTypeNameOf =
    copy(child = c)
}
