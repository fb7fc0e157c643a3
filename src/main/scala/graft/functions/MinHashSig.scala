package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a token array, computed in ONE pass per row.
  *
  * `minhash_sig(tokens, k, shingleN, useMd5)`:
  * builds word `shingleN`-gram shingles from `tokens` (documents shorter
  * than `shingleN` tokens yield a single whole-document shingle), then for
  * each of `k` hash seeds takes the minimum of hash(seed + "|" + shingle).
  *
  *   - `useMd5 = true`  -> array<string> of lexicographic-min md5 hex
  *     digests. Engine-portable: DuckDB's
  *     `list_min([md5(i || '|' || s) for s in shingles])` computes the
  *     identical signature, which makes the LSH dedup pipeline
  *     oracle-checkable end to end.
  *   - `useMd5 = false` -> array<long> via a seeded FNV-1a 64-bit hash —
  *     the cheap scale path.
  *
  * Why a native expression instead of higher-order functions: nested HOFs
  * re-evaluate their children per element after projection collapse
  * (re-tokenizing the document for every shingle x seed — quadratic row
  * cost); this expression is a flat O(k * |shingles|) loop.
  */
case class MinHashSig(tokens: Expression, kE: Expression, nE: Expression,
                      md5E: Expression, bandsE: Expression)
    extends Expression {

  private lazy val k: Int = kE.eval().asInstanceOf[Number].intValue()
  private lazy val shingleN: Int = nE.eval().asInstanceOf[Number].intValue()
  private lazy val useMd5: Boolean = md5E.eval().asInstanceOf[Boolean]
  /** bands = 0 -> raw signature; bands > 0 -> LSH band-key strings
    * "b_h1|h2|...", identical to slicing the signature into `bands`
    * contiguous rows (still one pass — no 4x signature re-evaluation via
    * slice expressions). */
  private lazy val bands: Int = bandsE.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(tokens, kE, nE, md5E, bandsE)
  override def nullable: Boolean = tokens.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType =
    if (bandsE.eval().asInstanceOf[Number].intValue() > 0 ||
        md5E.eval().asInstanceOf[Boolean])
      ArrayType(StringType, containsNull = false)
    else ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && kE.foldable && nE.foldable && md5E.foldable && bandsE.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "minhash_sig expects (array<string>, int, int, bool, int literals)")
  }

  private def shingleStrings(toks: ArrayData): Array[String] = {
    val n = toks.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    if (n < shingleN) Array(words.mkString(" "))
    else {
      val out = new Array[String](n - shingleN + 1)
      var j = 0
      while (j <= n - shingleN) {
        val sb = new java.lang.StringBuilder(words(j))
        var m = 1
        while (m < shingleN) { sb.append(' ').append(words(j + m)); m += 1 }
        out(j) = sb.toString
        j += 1
      }
      out
    }
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned byte order of md5 digests == lexicographic order of their
    * hex strings, so minima can be chosen on raw digests and only the k
    * winners hex-encoded. */
  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Seeded FNV-1a 64-bit over the shingle's UTF-8 bytes. */
  private def fnv64(seed: Int, bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  private def rawSignature(shingles: Array[String]): Array[String] = {
    // UTF-8 bytes once per shingle — NOT once per (seed, shingle); the
    // digest streams seed prefix + shingle without concatenating strings,
    // and two reusable 16-byte buffers make the k * |shingles| hash loop
    // allocation-free (only the k winning digests are hex-encoded).
    val bytes = new Array[Array[Byte]](shingles.length)
    var j = 0
    while (j < shingles.length) {
      bytes(j) = shingles(j).getBytes("UTF-8"); j += 1
    }
    val md = if (useMd5) MessageDigest.getInstance("MD5") else null
    val mins = new Array[String](k)
    var cur = new Array[Byte](16)
    var best = new Array[Byte](16)
    var i = 0
    while (i < k) {
      if (useMd5) {
        val prefix = (i.toString + "|").getBytes("UTF-8")
        var haveBest = false
        j = 0
        while (j < bytes.length) {
          md.update(prefix)
          md.update(bytes(j))
          md.digest(cur, 0, 16)
          if (!haveBest || lessUnsigned(cur, best)) {
            val t = best; best = cur; cur = t; haveBest = true
          }
          j += 1
        }
        mins(i) = if (!haveBest) "" else toHex(best)
      } else {
        var bestH = Long.MaxValue
        j = 0
        while (j < bytes.length) {
          val h = fnv64(i, bytes(j))
          if (h < bestH) bestH = h
          j += 1
        }
        mins(i) = String.valueOf(if (bytes.isEmpty) 0L else bestH)
      }
      i += 1
    }
    mins
  }

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return null
    kernel(t.asInstanceOf[ArrayData])
  }

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed tokens ArrayData (the other
    * four children are foldable instance state). */
  def kernel(toks: ArrayData): ArrayData = {
    val shingles = shingleStrings(toks)
    val sig = rawSignature(shingles)
    if (bands > 0) {
      // band keys, matching Dedup.lshBandKeys: "b_h1|h2|...|hr"
      val r = k / bands
      val out = new Array[AnyRef](bands)
      var b = 0
      while (b < bands) {
        val sb = new java.lang.StringBuilder
        sb.append(b).append('_')
        var m = 0
        while (m < r) {
          if (m > 0) sb.append('|')
          sb.append(sig(b * r + m))
          m += 1
        }
        out(b) = UTF8String.fromString(sb.toString)
        b += 1
      }
      new GenericArrayData(out)
    } else if (useMd5) {
      new GenericArrayData(sig.map(UTF8String.fromString): Array[AnyRef])
    } else {
      new GenericArrayData(sig.map(java.lang.Long.parseLong))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // evaluate only the tokens child in-line (k/n/md5/bands are foldable
    // and live in the instance's lazy state)
    val ref = ctx.addReferenceObj("minHashSig", this,
      classOf[MinHashSig].getName)
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
    copy(tokens = newChildren(0), kE = newChildren(1), nE = newChildren(2),
      md5E = newChildren(3), bandsE = newChildren(4))
}
