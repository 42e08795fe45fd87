package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-byte binary rendering of a string: 'H' → 01001000 … (ref
  * src/Functions/FunctionsCoding.h bin() over String — each byte emits
  * exactly 8 bits, unlike the integer form which strips leading zero
  * bytes). */
case class ChBinString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "bin"
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case u: UTF8String => u.getBytes
      case b: Array[Byte] => b
      // floats render their raw IEEE bytes in MEMORY (little-endian)
      // order, unlike integers' trimmed big-endian print (ref
      // src/Functions/FunctionsCodingHex: executeFloatAndDecimal)
      case f: java.lang.Float =>
        val bits = java.lang.Float.floatToIntBits(f)
        Array.tabulate[Byte](4)(i => ((bits >>> (8 * i)) & 0xff).toByte)
      case d: java.lang.Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        Array.tabulate[Byte](8)(i => ((bits >>> (8 * i)) & 0xff).toByte)
    }
    val sb = new java.lang.StringBuilder(bytes.length * 8)
    var i = 0
    while (i < bytes.length) {
      var bit = 7
      while (bit >= 0) { sb.append((bytes(i) >> bit) & 1); bit -= 1 }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): ChBinString =
    copy(child = c)
}

/** Pack a '0'/'1' bit string into bytes, zero-padding the trailing
  * partial byte — the write half of bitSlice (ref
  * src/Functions/bitSlice.cpp writeSliceWithLeftShift: the slice is
  * re-aligned to bit 0 and the tail byte is zero-filled). The selection
  * half reuses the CH substring semantics over the bin() rendering, so
  * `bin(bitSlice(s, o, l)) = rpadToByte(substring(bin(s), o, l))` —
  * the exact invariant the reference's 02154 tests assert. */
case class PackBits(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "pack_bits"
  override protected def nullSafeEval(v: Any): Any = {
    val bits = v.asInstanceOf[UTF8String].toString
    val n = bits.length
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (bits.charAt(i) == '1')
        out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
  override protected def withNewChildInternal(c: Expression): PackBits =
    copy(child = c)
}
