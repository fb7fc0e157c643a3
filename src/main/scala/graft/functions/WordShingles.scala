package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles from a token array in one pass:
  * `word_shingles(tokens, n)` -> array<string> of space-joined n-grams;
  * a document shorter than n tokens yields one whole-document shingle.
  *
  * Same semantics as the higher-order-function formulation
  * (transform(sequence, i -> concat_ws(slice(...)))) and the DuckDB oracle's
  * list comprehension — but without the per-element child re-evaluation that
  * makes nested HOFs quadratic per row. Codegen'd via the kernel-reference
  * pattern ([[NearestCells]]) so the shingling projection — the first step
  * of every dedup/boilerplate scan — stays inside WholeStageCodegen.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && right.dataType == IntegerType && right.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "word_shingles expects (array<string>, int literal)")
  }

  private lazy val shingleN: Int = right.eval().asInstanceOf[Number].intValue()

  override def nullSafeEval(toksAny: Any, nAny: Any): Any =
    kernel(toksAny.asInstanceOf[ArrayData])

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed child ArrayData. */
  def kernel(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    if (n < shingleN) {
      new GenericArrayData(Array[Any](UTF8String.fromString(words.mkString(" "))))
    } else {
      val out = new Array[Any](n - shingleN + 1)
      var j = 0
      while (j <= n - shingleN) {
        val sb = new java.lang.StringBuilder(words(j))
        var m = 1
        while (m < shingleN) { sb.append(' ').append(words(j + m)); m += 1 }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this,
      classOf[WordShingles].getName)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = $ref.kernel(($ad) $toks);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}
