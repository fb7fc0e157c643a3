package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries in ONE pass per row.
  *
  * `cdc_pairs(text, w)` -> array<struct<s:int, e:int>> of chunk
  * [start, end) pairs, 1-based inclusive start / exclusive end, tiling
  * the text exactly. Cut rule (engine-portable — the oracle replays it
  * with a position lateral in SQL): position i (1-based, i in
  * 1..max(len-w+1, 1)) cuts AFTER its w-char window iff the first md5
  * nibble of that window is '0' and i+w <= len; chunk starts are
  * position 1 plus every cut.
  *
  * Why a native expression: the HOF formulation evaluates an interpreted
  * md5-over-substr per position AND re-evaluates the whole trigger scan
  * wherever the starts array is referenced again (projection collapse —
  * see MinHashSig). This kernel reuses one MessageDigest and two 16-byte
  * buffers across all positions of a row: ~len digests per row,
  * allocation-free on the ASCII fast path (windows are byte slices of
  * the UTF8String's backing array; the non-ASCII path pays a per-window
  * codepoint slice, matching substr()'s codepoint semantics).
  */
case class CdcPairs(text: Expression, wE: Expression) extends Expression {

  private lazy val w: Int = wE.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(text, wE)
  override def nullable: Boolean = text.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", IntegerType, nullable = false),
      StructField("e", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = text.dataType == StringType && wE.foldable &&
      wE.eval().asInstanceOf[Number].intValue() > 0
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "cdc_pairs expects (string, positive int literal)")
  }

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    kernel(t.asInstanceOf[UTF8String])
  }

  /** Whole per-row kernel behind one monomorphic entry point (generated
    * code calls it directly; `w` is foldable instance state). */
  def kernel(t: UTF8String): ArrayData = {
    val nChars = t.numChars()
    var starts = new Array[Int](8)
    starts(0) = 1
    var nStarts = 1
    if (nChars > 0) {
      val md = MessageDigest.getInstance("MD5")
      val digest = new Array[Byte](16)
      val bytes = t.getBytes
      val ascii = bytes.length == nChars
      val cps = if (ascii) null else t.toString.codePoints().toArray()
      val maxI = math.max(nChars - w + 1, 1)
      var i = 1
      while (i <= maxI) {
        if (ascii) {
          md.update(bytes, i - 1, math.min(w, nChars - (i - 1)))
        } else {
          val s = new String(cps, i - 1, math.min(w, nChars - (i - 1)))
          md.update(s.getBytes("UTF-8"))
        }
        md.digest(digest, 0, 16)
        if (((digest(0) >> 4) & 0xf) == 0 && i + w <= nChars) {
          if (nStarts == starts.length)
            starts = java.util.Arrays.copyOf(starts, nStarts * 2)
          starts(nStarts) = i + w
          nStarts += 1
        }
        i += 1
      }
    }
    val out = new Array[AnyRef](nStarts)
    var k = 0
    while (k < nStarts) {
      val e = if (k + 1 < nStarts) starts(k + 1) else nChars + 1
      out(k) = new GenericInternalRow(
        Array[Any](starts(k), e))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcPairs", this, classOf[CdcPairs].getName)
    val tGen = text.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
        ${tGen.code}
        boolean ${ev.isNull} = ${tGen.isNull};
        $ad ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.kernel(${tGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), wE = newChildren(1))
}
