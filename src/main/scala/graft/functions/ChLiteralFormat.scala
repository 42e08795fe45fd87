package graft.functions

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** toString of a composite value in CH literal syntax — `[1,'a',NULL]`,
  * `(1,'x')` — (ref src/DataTypes/Serializations/SerializationArray.cpp
  * text form). Scalar toString stays with the cast path; this expression
  * handles Array/Struct/Map children, reusing the golden harness's CH
  * value formatter so SELECT toString([…]) matches the wire text exactly.
  */
case class ChLiteralString(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "toString"

  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(child.dataType)

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.golden.Golden.fmt(toScala(v)))

  override protected def withNewChildInternal(c: Expression): ChLiteralString =
    copy(child = c)
}
