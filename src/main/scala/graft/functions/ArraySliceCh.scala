package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** CH arraySlice(arr, offset[, length]) with CH's exact edge semantics
  * (ref src/Functions/array/arraySlice.cpp +
  * src/Functions/GatherUtils/Algorithms.h sliceDynamicOffsetBounded /
  * Sources.h getSliceFromLeft/Right):
  *   - 1-based offset; negative offset indexes from the right
  *   - negative length L means "up to |L| before the end":
  *     size = L + (offset > 0 ? n - (offset-1) : -offset)
  *   - NULL offset → 1; NULL/absent length → n
  *   - offset == 0 or computed size <= 0 → empty array
  * Spark's `slice` has different negative-length and clamp rules, so this
  * is a dedicated expression rather than a composition.
  */
case class ChArraySlice(arr: Expression, offset: Expression,
    length: Option[Expression])
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(arr, offset) ++ length
  override def dataType: DataType = arr.dataType
  override def nullable: Boolean = arr.nullable
  override def prettyName: String = "arraySlice"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    arr.dataType match {
      case _: ArrayType | NullType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"arraySlice: first argument must be an array, got $other")
    }
  }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements().toLong
    val offV = offset.eval(input)
    val off = if (offV == null) 1L else num(offV)
    val lenV = length.map(_.eval(input))
    // a NULL length takes the UNBOUNDED branch, same as no length arg
    // (ref arraySlice.cpp `length_column->onlyNull()`)
    val unbounded = lenV.forall(_ == null)
    val len0 = lenV match {
      case Some(v) if v != null => num(v)
      case _ => n
    }
    val size =
      if (len0 < 0) len0 + (if (off > 0) n - (off - 1) else -off) else len0
    val et = arr.dataType.asInstanceOf[ArrayType].elementType
    if (off == 0 || size <= 0) return new GenericArrayData(Array.empty[Any])
    // (start, take) replicating Sources.h clamp rules; -off is read as
    // UNSIGNED (offset -2^63 means "far from the right": the unbounded
    // form then yields the whole array — 01664)
    val (start, take) =
      if (off > 0) {
        val o = off - 1
        if (o >= n) (0L, 0L) else (o, math.min(size, n - o))
      } else {
        val o = -off // positive count from the right (may wrap negative)
        val oBig = java.lang.Long.compareUnsigned(o, n) > 0
        if (oBig) {
          if (unbounded) (0L, n) // getSliceFromRight(huge) → whole array
          else (0L, if (size + n > o && o > 0)
            math.min(n, size + n - o) else 0L)
        } else (n - o, math.min(size, o))
      }
    val out = new Array[Any](take.toInt)
    var i = 0
    while (i < take) {
      out(i) = ad.get((start + i).toInt, et)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def num(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case other => other.toString.toLong
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(arr = c(0), offset = c(1),
      length = if (c.length > 2) Some(c(2)) else None)
}
