package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of float vectors as a typed `Aggregator` — the
  * partial-aggregation-friendly way to average embeddings per group
  * (map-side combine runs `reduce`, the shuffle moves one (sums, count)
  * buffer per group per partition, never the vectors themselves).
  *
  * Used by IVF centroid training ([[graft.operators.Similarity.trainIvfCentroids]]);
  * register with `functions.udaf(VectorAvg)` for Column-API use.
  */
final case class VectorAvgBuf(sums: Array[Double], count: Long)

object VectorAvg
    extends Aggregator[Array[Float], VectorAvgBuf, Array[Float]] {
  type Buf = VectorAvgBuf
  private def Buf(sums: Array[Double], count: Long) = VectorAvgBuf(sums, count)

  override def zero: Buf = Buf(Array.empty, 0L)

  override def reduce(b: Buf, a: Array[Float]): Buf = {
    if (a == null) return b
    val sums = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums
    var i = 0
    val n = math.min(sums.length, a.length)
    while (i < n) { sums(i) += a(i); i += 1 }
    Buf(sums, b.count + 1)
  }

  override def merge(x: Buf, y: Buf): Buf = {
    if (x.sums.isEmpty) return y
    if (y.sums.isEmpty) return x
    val sums = new Array[Double](x.sums.length)
    var i = 0
    while (i < sums.length) { sums(i) = x.sums(i) + y.sums(i); i += 1 }
    Buf(sums, x.count + y.count)
  }

  override def finish(b: Buf): Array[Float] =
    if (b.count == 0) Array.empty
    else b.sums.map(s => (s / b.count).toFloat)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
