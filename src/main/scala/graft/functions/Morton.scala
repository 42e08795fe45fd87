package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** mortonEncode / mortonDecode (ref src/Functions/mortonEncode.cpp,
  * mortonDecode.cpp): bit-interleaved Z-order curve over 1–8 unsigned
  * args, with an optional leading mask tuple that dilates each
  * argument's bits by its expand ratio. Bit j of argument i lands at
  * result position (j·mᵢ + mᵢ − 1)·n + i (verified against the
  * reference's 02457 fixtures, e.g. mortonEncode((1,2,3,1),1,2,3,4) =
  * 4205569); positions ≥ 64 are silently dropped — the reference
  * wraps in UInt64, so mortonEncode((4,4,4,4),128,128,128,128) = 0.
  * Pure bit arithmetic → safe for partition keys at any scale (the
  * reference uses it for space-filling-curve ORDER BY keys).
  */
object Morton {
  def encode(masks: Array[Int], vals: Array[Long]): Long = {
    val n = vals.length
    var r = 0L
    var i = 0
    while (i < n) {
      val m = masks(i)
      var v = vals(i)
      var j = 0
      while (v != 0) {
        if ((v & 1L) != 0) {
          val pos = (j * m + m - 1) * n + i
          if (pos < 64) r |= 1L << pos
        }
        v >>>= 1
        j += 1
      }
      i += 1
    }
    r
  }

  def decode(masks: Array[Int], code: Long): Array[Long] = {
    val n = masks.length
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val m = masks(i)
      var j = 0
      var pos = (m - 1) * n + i
      while (pos < 64) {
        if ((code & (1L << pos)) != 0) out(i) |= 1L << j
        j += 1
        pos = (j * m + m - 1) * n + i
      }
      i += 1
    }
    out
  }

  /** Evaluate a foldable mask spec: an integer (count of unit masks for
    * decode) or a tuple literal of expand ratios. Returns None when the
    * expression is not a mask spec (plain first argument of encode). */
  def maskSpec(e: Expression, forDecode: Boolean): Option[Array[Int]] =
    if (!e.resolved || !e.foldable) None
    else e.dataType match {
      case st: StructType =>
        val row = e.eval(null).asInstanceOf[InternalRow]
        Some(st.fields.indices.map { i =>
          row.get(i, st.fields(i).dataType) match {
            case x: Number => x.intValue
            case d: Decimal => d.toInt
          }
        }.toArray)
      case ByteType | ShortType | IntegerType | LongType if forDecode =>
        val n = e.eval(null).asInstanceOf[Number].intValue
        Some(Array.fill(n)(1))
      case _ => None
    }
}

case class MortonEncodeExpr(masks: Seq[Int], children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "mortonEncode"
  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v match {
        case x: Number => x.longValue
        case d: Decimal => d.toLong
        case b: Boolean => if (b) 1L else 0L
      }
      i += 1
    }
    Morton.encode(masks.toArray, vals)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MortonEncodeExpr = copy(children = cs)
}

case class MortonDecodeExpr(masks: Seq[Int], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StructType(
    masks.indices.map(i => StructField(s"col${i + 1}", LongType,
      nullable = false)))
  override def prettyName: String = "mortonDecode"
  override protected def nullSafeEval(code: Any): Any = {
    val c = code match {
      case x: Number => x.longValue
      case d: Decimal => d.toLong
    }
    InternalRow.fromSeq(Morton.decode(masks.toArray, c).toSeq)
  }
  override protected def withNewChildInternal(c: Expression): MortonDecodeExpr =
    copy(child = c)
}
