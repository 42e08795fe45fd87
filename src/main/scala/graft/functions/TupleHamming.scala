package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** tupleHammingDistance(t1, t2): count of positions where the tuples
  * differ (ref src/Functions/tupleHammingDistance.cpp). */
case class TupleHamming(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (a: StructType, b: StructType) if a.length == b.length =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tupleHammingDistance needs same-arity tuples, got $other")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ra, rb) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    val fa = left.dataType.asInstanceOf[StructType]
    val fb = right.dataType.asInstanceOf[StructType]
    var n = 0
    var sawNull = false
    for (i <- 0 until fa.length) {
      val (va, vb) = (ra.get(i, fa(i).dataType), rb.get(i, fb(i).dataType))
      val same = (va, vb) match {
        case (null, _) | (_, null) => sawNull = true; true // NULL propagates
        case (x: Number, y: Number) =>
          if (x.isInstanceOf[java.lang.Double] ||
            x.isInstanceOf[java.lang.Float] ||
            y.isInstanceOf[java.lang.Double] ||
            y.isInstanceOf[java.lang.Float]) x.doubleValue() == y.doubleValue()
          else x.longValue() == y.longValue()
        case (x, y) => x == y
      }
      if (!same) n += 1
    }
    if (sawNull) null else n
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TupleHamming = copy(left = l, right = r)

  override def prettyName: String = "tupleHammingDistance"
}
