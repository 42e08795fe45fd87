package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CH Enum8/Enum16 cast (ref src/DataTypes/DataTypeEnum.cpp): a value
  * maps to its declared name, a name passes through (after validating
  * membership). The engine carries enums as their string form — CH
  * renders the name in every output format, and that is the observable
  * contract its golden tests pin. */
case class ChEnum(child: Expression, names: Seq[String], vals: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (names.length == vals.length && names.nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("enum spec must pair names/values")

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String =>
      if (names.contains(s.toString)) s else null
    case n: Number =>
      val i = vals.indexOf(n.longValue())
      if (i >= 0) UTF8String.fromString(names(i)) else null
    case _ => null
  }

  override protected def withNewChildInternal(c: Expression): ChEnum =
    copy(child = c)

  override def prettyName: String = "chEnum"
}
