package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, UserDefinedType}

/** A constant of a UDT whose storage type is a Java primitive (IPv4
  * rides in `long`, Bool in `boolean`). Spark's `Literal.doGenCode`
  * reaches such values through `references[i]` with a cast straight to
  * the primitive (`(long) references[i]`), which is invalid Java — the
  * whole stage then compiles-and-aborts per batch and falls back to
  * interpretation. This leaf emits the boxed cast + `xxxValue()` unbox
  * instead. Non-foldable so ConstantFolding doesn't wrap it back into
  * the broken `Literal`.
  */
case class ChUdtConst(value: Any, dataType: DataType)
    extends LeafExpression {
  override def foldable: Boolean = false
  override def nullable: Boolean = value == null
  override def eval(input: InternalRow): Any = value
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (value == null) ExprCode.forNullValue(dataType)
    else {
      val javaType = CodeGenerator.javaType(dataType)
      val boxed = CodeGenerator.boxedType(dataType)
      val ref = ctx.addReferenceObj("udtConst", value, boxed)
      ExprCode.forNonNullValue(
        JavaCode.expression(s"$ref.${javaType}Value()", dataType))
    }
  }
}

/** Optimizer rule: replace primitive-carrier UDT literals (produced by
  * ConstantFolding evaluating toIPv4/true-Bool/... over constants) with
  * [[ChUdtConst]] so whole-stage codegen survives.
  */
object ChUdtLiteralRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_ => true) {
      case Literal(v, udt: UserDefinedType[_])
          if v != null &&
            CodeGenerator.isPrimitiveType(CodeGenerator.javaType(udt.sqlType)) =>
        ChUdtConst(v, udt)
    }
}
