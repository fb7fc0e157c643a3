package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two 16-hex-char simhash strings as ONE native
  * pass — the [[graft.operators.Dedup.hammingHexStrHof]] semantics without
  * the interpreted higher-order-function tax (16 locate/substring calls
  * and a UTF8String allocation per digit, per candidate pair — the
  * dominant verify cost of the simhash pair suite at scale).
  *
  * Digit semantics mirror the HOF formulation exactly, including its
  * edge cases, so swapping it in cannot change any oracle row:
  *   - digit i is `strpos('0123456789abcdef', substring(s, i+1, 1)) - 1`:
  *     a hex char maps to its value, a NON-hex char to -1 (strpos miss),
  *     and a position past the end of the string to 0 (empty substring —
  *     Spark's locate('') returns 1);
  *   - per digit, `bit_count(xor(da, db))` over LONGs (so the -1 sentinel
  *     xors across all 64 bits, exactly as the HOF's cast-to-long did);
  *   - the 16 counts sum to a long.
  * A differential spec pins native == HOF on random inputs including the
  * short-string and non-hex edges.
  */
case class HexHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "hex_hamming expects (string, string)")

  // strpos('0123456789abcdef', c) - 1 for the char at 0-based index i,
  // with the HOF's edge behavior: past-the-end -> 0, non-hex -> -1.
  // `ascii` = byte index == char index (the always-true case for real
  // sigs): read the byte directly, no allocation; otherwise fall back to
  // the char-exact substring path.
  private def digit(s: UTF8String, i: Int, ascii: Boolean): Long =
    if (ascii) {
      if (i >= s.numBytes()) 0L
      else {
        val ch = s.getByte(i).toChar
        if (ch >= '0' && ch <= '9') (ch - '0').toLong
        else if (ch >= 'a' && ch <= 'f') (ch - 'a' + 10).toLong
        else -1L
      }
    } else {
      if (i >= s.numChars()) 0L
      else HexHamming.HexDigits.indexOf(
        s.substringSQL(i + 1, 1).toString).toLong
    }

  override def nullSafeEval(aAny: Any, bAny: Any): Any =
    kernel(aAny.asInstanceOf[UTF8String], bAny.asInstanceOf[UTF8String])

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed child UTF8Strings. */
  def kernel(a: UTF8String, b: UTF8String): Long = {
    val aAscii = a.numBytes() == a.numChars()
    val bAscii = b.numBytes() == b.numChars()
    var acc = 0L
    var i = 0
    while (i < 16) {
      acc += java.lang.Long.bitCount(
        digit(a, i, aAscii) ^ digit(b, i, bAscii))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hexHamming", this,
      classOf[HexHamming].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HexHamming =
    copy(left = newLeft, right = newRight)
}

object HexHamming {
  private val HexDigits = "0123456789abcdef"
}
