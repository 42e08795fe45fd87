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
  * Int64, DateTime vs DateTime64 precision, LowCardinality), so the
  * mapping names the Spark-visible type; the static fold keeps priority
  * for everything it can prove. Nullability comes from the expression.
  */
case class ChTypeNameOf(child: Expression)
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
      case BooleanType => "UInt8" // comparison results are UInt8 in CH
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

  // the name depends only on the input TYPE: ignore the value (and keep
  // the output non-null even for NULL input, like the reference)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = UTF8String.fromString(name(child.dataType, child.nullable))

  override protected def withNewChildInternal(c: Expression): ChTypeNameOf =
    copy(child = c)
}
