package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise top-k WITHOUT a window: the
  * `row_number().over(Window.partitionBy(g).orderBy(score))` idiom sorts
  * and shuffles EVERY row of every group; this shape reuses the bounded
  * [[graft.functions.TopKAgg]] heap (built for ANN) so each partition
  * contributes at most k candidates per group and the exchange carries
  * one ≤k-element buffer per (partition, group) — the difference between
  * a bounded and an unbounded shuffle when a hot group holds a million
  * rows. Determinism: the heap's total order is (score desc, id asc), so
  * the survivor set and ranks are unique regardless of arrival order. */
object TopK {

  /** Top `k` rows per group by `scoreCol` (desc, ties by `idCol` asc).
    * Returns (groupCol, idCol, score, rk). Payload columns re-attach to
    * the tiny survivor set with a broadcast join, per the TopKAgg
    * contract — they must not ride through the heap. */
  def groupTopK(df: DataFrame, groupCol: String, scoreCol: Column,
                idCol: String, k: Int): DataFrame = {
    val agg = udaf(new graft.functions.TopKAgg(k))
    df.groupBy(col(groupCol))
      .agg(agg(scoreCol, col(idCol)).as("top"))
      .select(col(groupCol), posexplode(col("top").getField("items")))
      .select(col(groupCol),
        col("col.id").as(idCol),
        col("col.sim").as("score"),
        (col("pos") + 1).cast("int").as("rk"))
  }
}
