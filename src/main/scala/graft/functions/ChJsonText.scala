package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, UserDefinedType}

/** A DYNAMIC Object('json') value outside a typed table column (e.g. a
  * `'literal'::JSON` cast; ref src/DataTypes/DataTypeObject.h — the
  * cast keeps the dynamic type, whose text serialization is the
  * flattened dotted-path JSON, unlike table columns which finalize to
  * concrete Tuples and display as tuple text). The wrapper rides a UDT
  * over String so TSV shows the raw JSON and the JSON output formats
  * embed it unquoted. */
case class ChJsonText(s: String) {
  override def toString: String = s
}

class JsonTextUDT extends UserDefinedType[ChJsonText] {
  override def sqlType: DataType = StringType
  override def serialize(obj: ChJsonText): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(obj.s)
  override def deserialize(datum: Any): ChJsonText =
    ChJsonText(datum.toString)
  override def userClass: Class[ChJsonText] = classOf[ChJsonText]
  override def typeName: String = "chjson"
}

object ChJsonText {
  val udt = new JsonTextUDT
}

case class ChJsonWrap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ChJsonText.udt
  override def prettyName: String = "CAST"
  override protected def nullSafeEval(v: Any): Any = v
  override protected def withNewChildInternal(c: Expression): ChJsonWrap =
    copy(child = c)
}
