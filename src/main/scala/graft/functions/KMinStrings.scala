package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class KMinBuf(items: Seq[String])

/** Bounded k-minimum-values buffer as a typed `Aggregator`: each input
  * partition keeps at most `k` smallest DISTINCT strings (map-side partial
  * aggregation), so the shuffle moves one ≤k-element buffer per
  * (partition, group) instead of every hashed shingle. Deduplication
  * happens inside the buffer, which is what makes the sketch a KMV
  * sketch (Beyer et al. 2007, "On synopses for distinct-value estimation")
  * rather than a bottom-k multiset: feeding raw shingle occurrences —
  * duplicates and all — yields exactly the k smallest distinct hashes, so
  * no corpus-wide `distinct` shuffle ever has to materialize.
  *
  * The buffer stays sorted ascending; insertion rejects in O(1) once the
  * buffer is warm (candidate >= last element), which is the common case
  * under a uniform hash. Ordering is plain lexicographic string order —
  * the same total order DuckDB applies to the md5 hex digests in the
  * oracle — so the finished sketch is unique and independent of
  * arrival/merge order: deterministic under retries and AQE re-planning.
  */
final class KMinStringsAgg(k: Int)
    extends Aggregator[String, KMinBuf, Seq[String]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: KMinBuf = KMinBuf(Vector.empty)

  private def insert(b: KMinBuf, a: String): KMinBuf = {
    if (a == null) return b
    val items = b.items
    if (items.size >= k && items.last <= a) b
    else {
      val (head, tail) = items.span(_ < a)
      if (tail.nonEmpty && tail.head == a) b // already present
      else {
        val merged = (head :+ a) ++ tail
        KMinBuf(if (merged.size > k) merged.take(k) else merged)
      }
    }
  }

  override def reduce(b: KMinBuf, a: String): KMinBuf = insert(b, a)

  override def merge(x: KMinBuf, y: KMinBuf): KMinBuf =
    y.items.foldLeft(x)(insert)

  override def finish(b: KMinBuf): Seq[String] = b.items

  override def bufferEncoder: Encoder[KMinBuf] = Encoders.product[KMinBuf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
