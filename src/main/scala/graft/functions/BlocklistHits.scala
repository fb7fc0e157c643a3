package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist scan (Aho & Corasick 1975, the public
  * algorithm): per row, the GREEDY LEFTMOST NON-OVERLAPPING occurrence
  * count of every pattern in `text`, as one `array<long>` index-aligned
  * with the patterns literal — the C4-style banned-phrase / dictionary
  * filter, one automaton walk per document regardless of how many
  * patterns the blocklist carries (a `LIKE`-per-pattern plan re-scans the
  * text once PER pattern).
  *
  * Per-pattern greedy non-overlapping counting is chosen (rather than
  * all-occurrence counting) because it is exactly what
  * `(length(t) - length(replace(t, p, ''))) / length(p)` computes — a
  * one-line replay in any SQL engine, which is what makes the operator
  * oracle-checkable: `replace` consumes matches left to right and skips
  * the match's own characters, i.e. for each pattern independently, a
  * match is counted iff it starts at or after the end of that pattern's
  * previously counted match. The automaton discovers matches in end-
  * position order, so one `lastEnd` cursor per pattern reproduces the
  * rule in the same single pass.
  *
  * The automaton runs over UTF-8 BYTES (self-synchronizing: a byte-level
  * occurrence of a valid UTF-8 pattern is always a character-level
  * occurrence, so byte matching equals char matching); it is built once
  * per expression instance from the foldable patterns literal — the
  * blocklist travels inside the serialized plan like the BPE merge table
  * ([[BpeEncode]]), so the scan is a pure map-side projection over any
  * corpus size. Patterns must be non-empty; an empty TEXT yields all
  * zeros, a null text yields null.
  */
case class BlocklistHits(text: Expression, patternsE: Expression)
    extends Expression {

  @transient private lazy val pats: Array[Array[Byte]] =
    patternsE.eval().asInstanceOf[ArrayData]
      .toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].getBytes)

  // ---- Aho-Corasick automaton in DFA form (goto completed with fail
  // transitions during the BFS): node count = Σ pattern bytes + 1, tiny
  // for any real blocklist. The transition table is FLATTENED to one
  // int array indexed (state << 8) | byte — a single load per input
  // byte — and match states carry their pattern lists in a parallel
  // array (null for the overwhelmingly common no-output state, so the
  // hot loop pays one null check, not a collection walk).
  @transient private lazy val (dfaFlat, outs, patLen)
      : (Array[Int], Array[Array[Int]], Array[Int]) = {
    require(pats.nonEmpty && pats.forall(_.nonEmpty),
      "blocklist_hits: patterns must be non-empty strings")
    val maxNodes = pats.map(_.length).sum + 1
    val next = Array.fill(maxNodes, 256)(-1)
    val out = Array.fill(maxNodes)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var nNodes = 1
    for ((p, pi) <- pats.zipWithIndex) {
      var cur = 0
      for (b <- p) {
        val c = b & 0xff
        if (next(cur)(c) == -1) { next(cur)(c) = nNodes; nNodes += 1 }
        cur = next(cur)(c)
      }
      out(cur) += pi
    }
    // BFS: fail links, inherited outputs, goto completion
    val fail = new Array[Int](nNodes)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      if (next(0)(c) == -1) next(0)(c) = 0
      else { fail(next(0)(c)) = 0; queue += next(0)(c) }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) ++= out(fail(u))
      c = 0
      while (c < 256) {
        val v = next(u)(c)
        if (v == -1) next(u)(c) = next(fail(u))(c)
        else { fail(v) = next(fail(u))(c); queue += v }
        c += 1
      }
    }
    val flat = new Array[Int](nNodes << 8)
    var st = 0
    while (st < nNodes) {
      System.arraycopy(next(st), 0, flat, st << 8, 256)
      st += 1
    }
    (flat,
      out.take(nNodes).map(o => if (o.isEmpty) null else o.toArray),
      pats.map(_.length))
  }

  override def children: Seq[Expression] = Seq(text, patternsE)
  override def nullable: Boolean = text.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = text.dataType == StringType && (patternsE.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && patternsE.foldable
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "blocklist_hits expects (string, array<string> literal)")
  }

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    kernel(t.asInstanceOf[UTF8String])
  }

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed child UTF8String. One flat
    * transition load + one null check per input byte; match bookkeeping
    * only on (rare) output states; the result rides an UnsafeArrayData
    * over the primitive counts (no per-element boxing). */
  def kernel(s: UTF8String): ArrayData = {
    val counts = new Array[Long](pats.length)
    val lastEnd = new Array[Int](pats.length)
    val dfa = dfaFlat
    val o = outs
    var state = 0
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      state = dfa((state << 8) | (s.getByte(i) & 0xff))
      val hits = o(state)
      if (hits != null) {
        var j = 0
        while (j < hits.length) {
          val p = hits(j)
          // end-exclusive position i+1; greedy non-overlap per pattern
          if (i + 1 - patLen(p) >= lastEnd(p)) {
            counts(p) += 1
            lastEnd(p) = i + 1
          }
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklistHits", this,
      classOf[BlocklistHits].getName)
    val tGen = text.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
        ${tGen.code}
        boolean ${ev.isNull} = ${tGen.isNull};
        $ad ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.kernel(${tGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), patternsE = newChildren(1))
}
