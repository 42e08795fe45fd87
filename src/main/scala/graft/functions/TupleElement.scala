package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StructType}

/** Positional tuple element access, CH's `t.1` / `tupleElement(t, 1)`
  * (ref src/Functions/tupleElement.cpp). Spark's `getField` is
  * name-based, and a parenthesized tuple literal `(a, b)` names its
  * fields after the member expressions — so CH's ordinal access needs a
  * dedicated expression that resolves the ordinal against whatever the
  * struct's field names turned out to be. */
case class TupleElement(child: Expression, index: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if index >= 1 && index <= s.length =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case s: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"tuple element $index out of range 1..${s.length}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"tupleElement needs a tuple, got $other")
    }

  override def dataType: DataType =
    child.dataType.asInstanceOf[StructType](index - 1).dataType

  override def nullable: Boolean = child.nullable ||
    child.dataType.asInstanceOf[StructType](index - 1).nullable

  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[InternalRow].get(index - 1, dataType)

  override protected def withNewChildInternal(c: Expression): TupleElement =
    copy(child = c)

  override def prettyName: String = "tupleElement"
}
