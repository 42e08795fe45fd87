package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** CH materialize(): turn a constant into a full column (ref
  * src/Functions/materialize.cpp). The Spark equivalent is an identity
  * node that reports non-foldable, so constant folding leaves it alone
  * and isConstant() sees a non-constant. */
case class MaterializeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def withNewChildInternal(c: Expression): MaterializeExpr =
    copy(child = c)
  override def prettyName: String = "materialize"
}

/** CH isConstant() (ref isConstant.cpp): whether the argument column is
  * constant. Evaluates the CHILD'S foldability, not its value — so NULL
  * literals still count as constant. */
case class IsConstantExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    if (child.foldable) 1 else 0
  override protected def withNewChildInternal(c: Expression): IsConstantExpr =
    copy(child = c)
  override def prettyName: String = "isConstant"
}
