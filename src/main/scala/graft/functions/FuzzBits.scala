package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** fuzzBits(s, prob) — flips each BIT of the string's bytes independently
  * with probability `prob` (ref src/Functions/fuzzBits.cpp: a random-bit
  * mask is XORed byte-wise). Operates on raw bytes (UTF8String is a byte
  * container, so byte-level flips round-trip like CH's byte strings);
  * output type follows the input (string→string, binary→binary).
  * Randomized by definition — spec asserts the statistical contract
  * (bit-flip rate), mirroring the reference's own 01284 test.
  */
case class FuzzBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fuzzBits"

  private def flip(bytes: Array[Byte], p: Double): Array[Byte] = {
    require(p >= 0.0 && p <= 1.0,
      s"fuzzBits probability $p is out of bound [0, 1]")
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i < bytes.length) {
      var mask = 0
      var bit = 0
      while (bit < 8) {
        if (r.nextDouble() < p) mask |= 1 << bit
        bit += 1
      }
      out(i) = (bytes(i) ^ mask).toByte
      i += 1
    }
    out
  }

  override def nullSafeEval(s: Any, p: Any): Any = {
    val prob = p match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
    }
    s match {
      case u: UTF8String => UTF8String.fromBytes(flip(u.getBytes, prob))
      case b: Array[Byte] => flip(b, prob)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FuzzBitsExpr =
    copy(left = newLeft, right = newRight)
}

object FuzzBits {
  def fuzzBits(s: Column, p: Column): Column =
    ColumnBridge.column(FuzzBitsExpr(
      ColumnBridge.expression(s), ColumnBridge.expression(p)))
}
