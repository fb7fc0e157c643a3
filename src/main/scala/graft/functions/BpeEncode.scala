package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, public algorithm):
  * each whitespace word is split into characters, then the learned merges
  * are applied IN RANK ORDER, one left-to-right non-overlapping pass per
  * merge; the word's final symbols are its subword tokens. Output =
  * array<string> of subwords across the whole token array.
  *
  * Sequential-in-rank-order application is EXACTLY equivalent to the
  * textbook "repeatedly merge the lowest-rank adjacent pair": a merge at
  * rank r can only create symbols produced by rank r, and any pair of rank
  * q < r is built from symbols produced before q — so no instance of a
  * lower-rank pair can ever appear after its rank has passed, and one pass
  * per rank suffices. This formulation is also what makes the tokenizer
  * engine-portable: a SQL engine replays it as a chain of `replace()`
  * calls over the char-separated word (see the q80 oracle), because a
  * single `replace` IS a left-to-right non-overlapping merge pass.
  *
  * `merges` must be a foldable literal array<array<string>> of [left,
  * right] pairs in rank order — the trained model travels inside the
  * serialized plan like the IVF/PQ centroid literals, so tokenization is a
  * pure map-side projection (no shuffle, no lookup join) over any corpus
  * size. Cost is O(merges · word length) per word with a substring
  * pre-check per merge; vocabulary-scale merge tables would swap the scan
  * for the pair-heap algorithm without changing this expression's
  * contract.
  */
case class BpeEncode(tokens: Expression, mergesE: Expression)
    extends Expression {

  private lazy val merges: Array[(String, String)] =
    mergesE.eval().asInstanceOf[ArrayData].toObjectArray(
      ArrayType(StringType)).map { p =>
        val pair = p.asInstanceOf[ArrayData]
        (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
      }
  // substring pre-check key per merge: an adjacent (a, b) implies "ab"
  // occurs in the original word (symbols concatenate back to the word)
  private lazy val mergedStr: Array[String] = merges.map(p => p._1 + p._2)

  override def children: Seq[Expression] = Seq(tokens, mergesE)
  override def nullable: Boolean = tokens.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && (mergesE.dataType match {
      case ArrayType(ArrayType(StringType, _), _) => true
      case _ => false
    }) && mergesE.foldable
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "bpe_encode expects (array<string>, array<array<string>> literal)")
  }

  /** One left-to-right non-overlapping merge pass of (a, b) -> a+b. */
  private def mergePass(syms: Array[String], n: Int, a: String, b: String)
      : Int = {
    var r = 0 // read
    var w = 0 // write
    while (r < n) {
      if (r + 1 < n && syms(r) == a && syms(r + 1) == b) {
        syms(w) = syms(r) + syms(r + 1)
        r += 2
      } else {
        syms(w) = syms(r)
        r += 1
      }
      w += 1
    }
    w
  }

  private def encodeWord(w: String,
                         out: scala.collection.mutable.ArrayBuffer[AnyRef])
      : Unit = {
    var n = w.length
    if (n == 0) return
    var syms = new Array[String](n)
    var i = 0
    while (i < n) {
      syms(i) = String.valueOf(w.charAt(i)); i += 1
    }
    var m = 0
    while (m < merges.length && n > 1) {
      if (w.contains(mergedStr(m)))
        n = mergePass(syms, n, merges(m)._1, merges(m)._2)
      m += 1
    }
    i = 0
    while (i < n) { out += UTF8String.fromString(syms(i)); i += 1 }
  }

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return null
    kernel(t.asInstanceOf[ArrayData])
  }

  /** Whole per-row kernel behind one monomorphic entry point (the
    * [[MinHashSig]] codegen pattern — merges are foldable instance
    * state). */
  def kernel(toks: ArrayData): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      encodeWord(toks.getUTF8String(i).toString, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    val toksGen = tokens.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
        ${toksGen.code}
        boolean ${ev.isNull} = ${toksGen.isNull};
        $ad ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.kernel(($ad) ${toksGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), mergesE = newChildren(1))
}
