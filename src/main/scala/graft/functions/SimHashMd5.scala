package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array, as a 16-hex-char string, using md5 as
  * the per-token hash — ENGINE-PORTABLE: token hash = first 16 hex chars of
  * md5(token) read as 16 hex digits (digit i holds bits 4i+3..4i of the
  * value when counted from the string's end), per-bit majority vote of all
  * tokens (vote > 0 -> 1), output rendered back to 16 lowercase hex chars,
  * most-significant digit first.
  *
  * The DuckDB oracle reproduces this with list comprehensions over
  * md5(token) substrings, which is what makes the SimHash dedup query
  * hash-checkable (a Spark-private xxhash64 formulation cannot be).
  * One flat pass per row: O(|tokens| * 16 digit reads).
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "simhash_md5 expects array<string>")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(toksAny: Any): Any =
    kernel(toksAny.asInstanceOf[ArrayData])

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed child ArrayData. */
  def kernel(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // reused across tokens — no per-token alloc
    var i = 0
    while (i < n) {
      md.update(toks.getUTF8String(i).getBytes)
      md.digest(d, 0, 16)
      // first 8 digest bytes = first 16 hex chars; hex char j (0-based from
      // the left) is the high/low nibble of byte j/2 and holds bits
      // 63-4j .. 60-4j
      var j = 0
      while (j < 16) {
        val nibble =
          if (j % 2 == 0) (d(j / 2) >> 4) & 0xf else d(j / 2) & 0xf
        var b = 0
        while (b < 4) {
          val bit = (nibble >> b) & 1
          val bitPos = (15 - j) * 4 + b
          votes(bitPos) += (if (bit == 1) 1 else -1)
          b += 1
        }
        j += 1
      }
      i += 1
    }
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      var digit = 0
      var b = 0
      while (b < 4) {
        if (votes((15 - j) * 4 + b) > 0) digit |= (1 << b)
        b += 1
      }
      out(j) = hexDigits(digit)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashMd5", this,
      classOf[SimHashMd5].getName)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = $ref.kernel(($ad) $toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}
