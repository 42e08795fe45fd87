package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** CH `/` is Float64 IEEE-754 division (ref src/Functions/divide.cpp
  * DivideFloatingImpl): 1/0 = +inf, -1/0 = -inf, 1/-0.0 = -inf,
  * 0/0 = nan. Neither Spark eval mode matches (ANSI throws, LEGACY
  * yields NULL), and sign-of-zero can't be observed through builtin
  * comparisons (-0.0 == 0.0), so this expression performs the raw JVM
  * double division, which IS IEEE-754. Children are pre-cast to double
  * by the rewrite rule; being a distinct node also makes the rewrite
  * idempotent in every eval mode.
  */
case class IeeeDivide(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ch_divide"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    l.asInstanceOf[Double] / r.asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"$l / $r")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IeeeDivide = copy(newLeft, newRight)
}
