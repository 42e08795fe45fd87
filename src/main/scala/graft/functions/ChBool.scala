package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH `Bool` display type (ref src/DataTypes/DataTypesNumber.cpp Bool
  * registration + Serializations/SerializationBool.cpp): stored as
  * UInt8 but rendered `true`/`false`, unlike comparison results which
  * are UInt8 and render 1/0. Spark has one BooleanType for both, so the
  * display distinction rides a UDT exactly like [[ChIPv4]]/[[ChIPv6]]:
  * underlying BooleanType, lowered by ChIpCoercionRule wherever a real
  * boolean is needed. */
@SQLUserDefinedType(udt = classOf[BoolUDT])
case class ChBool(b: Boolean) {
  override def toString: String = if (b) "true" else "false"
}

class BoolUDT extends UserDefinedType[ChBool] {
  override def sqlType: DataType = BooleanType
  override def serialize(obj: ChBool): Any = obj.b
  override def deserialize(datum: Any): ChBool =
    ChBool(datum.asInstanceOf[Boolean])
  override def userClass: Class[ChBool] = classOf[ChBool]
  override def typeName: String = "chbool"
}

object ChBool {
  val udt = new BoolUDT
}

/** Tag a boolean expression as CH Bool (display true/false). */
case class ChBoolWrap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ChBool.udt
  override def prettyName: String = "toBool"
  override protected def nullSafeEval(v: Any): Any = v
  override protected def withNewChildInternal(c: Expression): ChBoolWrap =
    copy(child = c)
}

/** Strip the Bool display tag back to a plain boolean (the physical
  * representation is already a boolean, so this is a no-op at runtime —
  * it only exists because Cast refuses UDT sources). */
case class ChBoolUnwrap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "fromBool"
  override protected def nullSafeEval(v: Any): Any = v
  override protected def withNewChildInternal(c: Expression): ChBoolUnwrap =
    copy(child = c)
}
