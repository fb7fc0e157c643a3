package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate inside a bounded top-k buffer. Deliberately
  * narrow: every scored row passes through the aggregate's input encoder,
  * so carrying payload columns (e.g. the candidate vector) here costs a
  * per-row copy of the payload — survivors re-attach payloads afterwards
  * with a broadcast join of the tiny candidate set instead. */
final case class Scored(sim: Double, id: Long)

final case class TopKBuf(items: Seq[Scored])

/** Bounded top-k as a typed `Aggregator`: each input partition keeps at
  * most `k` best candidates per group (map-side partial aggregation), and
  * the shuffle moves one ≤k-element buffer per (partition, group) instead
  * of every scored row. This replaces the global
  * `row_number().over(Window.partitionBy(query))` pattern, whose shuffle
  * carries |Q| x |corpus| scored rows — the difference between a bounded
  * and an unbounded exchange at 100 TB.
  *
  * Ordering is the total order (sim desc, id asc); ids are distinct, so
  * the top-k set is unique and independent of arrival/merge order —
  * deterministic under retries and AQE re-planning. Buffers stay sorted
  * best-first, so the finished array's position IS the rank.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  private def insert(b: TopKBuf, a: Scored): TopKBuf = {
    if (a == null) return b
    val items = b.items
    if (items.size >= k && better(items.last, a)) b
    else {
      val (head, tail) = items.span(better(_, a))
      val merged = (head :+ a) ++ tail
      TopKBuf(if (merged.size > k) merged.take(k) else merged)
    }
  }

  override def reduce(b: TopKBuf, a: Scored): TopKBuf = insert(b, a)

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    y.items.foldLeft(x)(insert)

  override def finish(b: TopKBuf): TopKBuf = b

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
