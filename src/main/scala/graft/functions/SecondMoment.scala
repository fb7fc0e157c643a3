package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-decimal first + second moments of a float-vector column in ONE
  * typed-Aggregator pass — the scale shape of the PCA moment build
  * ([[graft.operators.Similarity.pcaTopComponent]]): a d + d(d+1)/2
  * BigDecimal buffer per partition instead of d(d+1)/2 exploded product
  * rows per INPUT ROW, with map-side combine reducing the exchange to
  * one buffer per partition (at d = 768 the exploded form is ~300k rows
  * per input row — unworkable; the buffer is ~300k cells per PARTITION).
  *
  * The arithmetic contract is bit-identical to the exploded
  * posexplode + groupBy form it replaces: every term is the double
  * product rounded to DECIMAL scale 20 HALF_UP (exactly Spark's
  * double→decimal(38,20) cast via the shortest-repr BigDecimal), cell
  * sums are exact BigDecimal adds — associative and commutative, so
  * partition count and merge order cannot change the result — and
  * [[SecondMomentAgg.finish]] emits round(sum/n, 12) doubles exactly as
  * the previous per-group aggregate did. The upper triangle is stored
  * row-major: cell (i, j<-i..d-1) at `i*d - i*(i-1)/2 + (j-i)`.
  */
final case class MomentBuf(var n: Long,
                           var s1: Array[java.math.BigDecimal],
                           var s2: Array[java.math.BigDecimal])

/** n rows, mu(i) = round(Σxᵢ/n, 12), m(tri(i,j)) = round(Σxᵢxⱼ/n, 12). */
final case class MomentOut(n: Long, mu: Array[Double], m: Array[Double])

object SecondMomentAgg
    extends Aggregator[Array[Float], MomentBuf, MomentOut] {

  /** Spark's double→decimal(38,20) cast: shortest-repr decimal of the
    * double, rescaled HALF_UP. */
  private def dec20(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(20, java.math.RoundingMode.HALF_UP)

  override def zero: MomentBuf = MomentBuf(0L, Array.empty, Array.empty)

  override def reduce(b: MomentBuf, a: Array[Float]): MomentBuf = {
    if (a == null || a.isEmpty) return b
    val d = a.length
    if (b.s1.isEmpty) {
      b.s1 = Array.fill(d)(java.math.BigDecimal.ZERO)
      b.s2 = Array.fill(d * (d + 1) / 2)(java.math.BigDecimal.ZERO)
    }
    // a ragged corpus (truncated/corrupt vector, mixed embedding
    // versions) must FAIL LOUDLY: the triangle layout is keyed to one d,
    // and a shorter row would silently land its products in the wrong
    // cells — corrupt loadings with no error
    require(a.length == b.s1.length,
      s"SecondMomentAgg: vector of length ${a.length} in a " +
        s"${b.s1.length}-dimensional corpus")
    var i = 0
    var idx = 0
    while (i < d) {
      val xi = a(i).toDouble
      b.s1(i) = b.s1(i).add(dec20(xi))
      var j = i
      while (j < d) {
        b.s2(idx) = b.s2(idx).add(dec20(xi * a(j).toDouble))
        idx += 1
        j += 1
      }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(x: MomentBuf, y: MomentBuf): MomentBuf = {
    if (x.s1.isEmpty) return y
    if (y.s1.isEmpty) return x
    require(x.s1.length == y.s1.length,
      s"SecondMomentAgg: merging ${x.s1.length}- and ${y.s1.length}-" +
        "dimensional partitions (ragged corpus)")
    var i = 0
    while (i < x.s1.length) { x.s1(i) = x.s1(i).add(y.s1(i)); i += 1 }
    i = 0
    while (i < x.s2.length) { x.s2(i) = x.s2(i).add(y.s2(i)); i += 1 }
    x.n += y.n
    x
  }

  /** Spark round() semantics: HALF_UP on the shortest-repr decimal. */
  private def r12(x: Double): Double =
    BigDecimal.valueOf(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  override def finish(b: MomentBuf): MomentOut =
    MomentOut(b.n,
      b.s1.map(s => r12(s.doubleValue / b.n)),
      b.s2.map(s => r12(s.doubleValue / b.n)))

  // the buffer holds BigDecimal arrays (no loss-free product encoder
  // exists for them: the built-in BigDecimal encoder is decimal(38,18),
  // two scale digits short of the cast contract), so it rides kryo —
  // shuffled once per partition, never per row
  override def bufferEncoder: Encoder[MomentBuf] = Encoders.kryo[MomentBuf]
  override def outputEncoder: Encoder[MomentOut] = Encoders.product[MomentOut]
}
