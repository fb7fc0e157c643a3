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

  // ---- Aho-Corasick automaton, node count = Σ pattern bytes + 1. Two
  // representations behind the same walk semantics, picked by node
  // count:
  //  * DENSE (node count <= denseNodeLimit): goto completed with fail
  //    transitions during the BFS, FLATTENED to one int array indexed
  //    (state << 8) | byte — a single load per input byte. The measured
  //    win for phrase-scale blocklists (4.4x vs a replace-chain at 512
  //    patterns, COVERAGE.md), but it costs 1 KB of table per pattern
  //    byte — a 10k-entry PII dictionary (~100 KB of patterns) would
  //    allocate ~100 MB PER EXPRESSION INSTANCE per executor.
  //  * SPARSE (above the limit): the classic goto+fail form in CSR
  //    layout — per-node sorted byte keys + targets, walked with the
  //    fail chain (amortized O(1) per input byte: each fail hop
  //    shortens the live suffix). Memory scales with TRIE EDGES
  //    (~12 bytes per pattern byte), not nodes×256, so dictionary-scale
  //    blocklists stay a few MB.
  // Match states carry their pattern lists in a parallel array (null
  // for the overwhelmingly common no-output state, so the hot loop pays
  // one null check, not a collection walk). The trie itself is built
  // SPARSELY in both cases (one LongMap keyed (state<<8)|byte) so even
  // the build never allocates a nodes×256 table above the limit.
  @transient private lazy val automaton: BlocklistHits.Automaton = {
    require(pats.nonEmpty && pats.forall(_.nonEmpty),
      "blocklist_hits: patterns must be non-empty strings")
    BlocklistHits.build(pats)
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

  /** (node count, transition ints stored, dense?) — the memory-shape
    * pin BlocklistSpec asserts: a dictionary-scale blocklist must store
    * O(trie edges) transition entries, not nodes×256. */
  private[graft] def automatonShape: (Int, Long, Boolean) = {
    val a = automaton
    if (a.dense) (a.nNodes, a.dfaFlat.length.toLong, true)
    else (a.nNodes, a.csrNext.length.toLong, false)
  }

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed child UTF8String; the walk
    * itself lives on [[BlocklistHits.Automaton.run]] (shared with the
    * representation benchmark). The result rides an UnsafeArrayData
    * over the primitive counts (no per-element boxing). */
  def kernel(s: UTF8String): ArrayData = {
    val counts = new Array[Long](pats.length)
    val lastEnd = new Array[Int](pats.length)
    automaton.run(s, counts, lastEnd)
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

object BlocklistHits {

  /** Representation cutoff: at or below this many trie nodes the
    * automaton is completed to the flat DFA (nodes×256 ints — 8 MB at
    * the limit, the measured fast path for phrase-scale blocklists);
    * above it, the sparse CSR goto+fail form keeps memory proportional
    * to trie edges (~12 bytes per pattern byte), so a 10k-entry PII
    * dictionary costs a few MB instead of ~100 MB per instance. */
  private[graft] val denseNodeLimit: Int = 1 << 13

  /** One built automaton. `dfaFlat` is non-null exactly when dense; the
    * CSR triple + `fail` are non-null exactly when sparse. `outs(state)`
    * is the inherited output set (null when empty); `patLen(p)` the
    * pattern's byte length (for the greedy non-overlap cursor). */
  final class Automaton(
      val nNodes: Int,
      val dfaFlat: Array[Int],
      val csrOff: Array[Int],
      val csrKeys: Array[Byte],
      val csrNext: Array[Int],
      val fail: Array[Int],
      val outs: Array[Array[Int]],
      val patLen: Array[Int]) extends Serializable {
    def dense: Boolean = dfaFlat != null

    /** One document walk, accumulating greedy leftmost non-overlapping
      * per-pattern counts into `counts` (with `lastEnd` as the
      * per-pattern non-overlap cursor; both length = pattern count,
      * zero-initialized by the caller). Dense path: one flat transition
      * load per input byte. Sparse path: binary search over the node's
      * sorted byte keys, fail-chain on a miss (amortized O(1) per byte
      * — each fail hop strictly shortens the live suffix). Match
      * bookkeeping only on (rare) output states. */
    def run(s: UTF8String, counts: Array[Long],
            lastEnd: Array[Int]): Unit = {
      val o = outs
      val pl = patLen
      var state = 0
      val n = s.numBytes()
      var i = 0
      if (dense) {
        val dfa = dfaFlat
        while (i < n) {
          state = dfa((state << 8) | (s.getByte(i) & 0xff))
          val hits = o(state)
          if (hits != null) {
            var j = 0
            while (j < hits.length) {
              val p = hits(j)
              // end-exclusive position i+1; greedy non-overlap/pattern
              if (i + 1 - pl(p) >= lastEnd(p)) {
                counts(p) += 1
                lastEnd(p) = i + 1
              }
              j += 1
            }
          }
          i += 1
        }
      } else {
        val off = csrOff; val keys = csrKeys
        val nxt = csrNext; val fl = fail
        while (i < n) {
          val c = s.getByte(i) & 0xff
          var t = -1
          var st = state
          while (t == -1) {
            var lo = off(st); var hi = off(st + 1) - 1
            var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              val k = keys(mid) & 0xff
              if (k == c) { found = nxt(mid); lo = hi + 1 }
              else if (k < c) lo = mid + 1
              else hi = mid - 1
            }
            if (found != -1) t = found
            else if (st == 0) t = 0 // missing at root: stay (DFA parity)
            else st = fl(st)
          }
          state = t
          val hits = o(state)
          if (hits != null) {
            var j = 0
            while (j < hits.length) {
              val p = hits(j)
              if (i + 1 - pl(p) >= lastEnd(p)) {
                counts(p) += 1
                lastEnd(p) = i + 1
              }
              j += 1
            }
          }
          i += 1
        }
      }
    }
  }

  /** Build the automaton SPARSELY (one LongMap keyed (state<<8)|byte —
    * never a nodes×256 table), then densify only under the node limit.
    * Children are packed (byte.toLong<<32)|node so a plain Long sort
    * yields byte-ascending CSR rows. `denseLimit` is overridable so the
    * representation benchmark (and differential tests) can force either
    * form on the SAME pattern set; production callers use the policy
    * default. */
  private[graft] def build(pats: Array[Array[Byte]],
                           denseLimit: Int = denseNodeLimit)
      : Automaton = {
    import scala.collection.mutable
    val goto = mutable.LongMap.empty[Int]
    val children = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
    val out = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    var nNodes = 1
    for ((p, pi) <- pats.zipWithIndex) {
      var cur = 0
      for (b <- p) {
        val c = b & 0xff
        val key = (cur.toLong << 8) | c
        goto.get(key) match {
          case Some(v) => cur = v
          case None =>
            goto(key) = nNodes
            children(cur) += (c.toLong << 32) | nNodes
            children += mutable.ArrayBuffer.empty[Long]
            out += mutable.ArrayBuffer.empty[Int]
            cur = nNodes
            nNodes += 1
        }
      }
      out(cur) += pi
    }
    // BFS: fail links + inherited outputs. The queue array doubles as
    // the BFS order (fail(u) always precedes u), reused by both the
    // dense completion and nothing else.
    val fail = new Array[Int](nNodes)
    val queue = new Array[Int](nNodes)
    var qh = 0
    var qt = 0
    for (e <- children(0)) {
      val v = (e & 0xffffffffL).toInt
      fail(v) = 0
      queue(qt) = v; qt += 1
    }
    while (qh < qt) {
      val u = queue(qh); qh += 1
      out(u) ++= out(fail(u))
      for (e <- children(u)) {
        val c = (e >>> 32).toInt
        val v = (e & 0xffffffffL).toInt
        // deepest proper-suffix state with a c-transition; fail-chain
        // nodes all sit strictly shallower than u, so the target can
        // never be v itself
        var f = fail(u)
        var fv = -1
        while (fv == -1)
          goto.get((f.toLong << 8) | c) match {
            case Some(t) => fv = t
            case None => if (f == 0) fv = 0 else f = fail(f)
          }
        fail(v) = fv
        queue(qt) = v; qt += 1
      }
    }
    val outsArr =
      out.map(o => if (o.isEmpty) null else o.toArray).toArray
    val patLen = pats.map(_.length)
    if (nNodes <= denseLimit) {
      // complete to DFA in BFS order: next(u)(c) = child else
      // next(fail(u))(c); root row first (missing byte stays at root)
      val flat = new Array[Int](nNodes << 8)
      var c = 0
      while (c < 256) {
        flat(c) = goto.getOrElse(c.toLong, 0)
        c += 1
      }
      var qi = 0
      while (qi < qt) {
        val u = queue(qi); qi += 1
        val base = u << 8
        val fbase = fail(u) << 8
        c = 0
        while (c < 256) {
          flat(base + c) =
            goto.getOrElse((u.toLong << 8) | c, flat(fbase + c))
          c += 1
        }
      }
      new Automaton(nNodes, flat, null, null, null, null, outsArr, patLen)
    } else {
      // CSR: per-node sorted (byte, next) runs; |edges| = nNodes - 1
      val off = new Array[Int](nNodes + 1)
      val keys = new Array[Byte](nNodes - 1)
      val nxt = new Array[Int](nNodes - 1)
      var pos = 0
      var u = 0
      while (u < nNodes) {
        off(u) = pos
        for (e <- children(u).sorted) {
          keys(pos) = ((e >>> 32) & 0xff).toByte
          nxt(pos) = (e & 0xffffffffL).toInt
          pos += 1
        }
        u += 1
      }
      off(nNodes) = pos
      new Automaton(nNodes, null, off, keys, nxt, fail, outsArr, patLen)
    }
  }
}
