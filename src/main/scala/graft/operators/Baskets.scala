package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-basket pair enumeration via ONE basket aggregation — the shared
  * substrate of the co-purchase graph, item-item co-occurrence and
  * Apriori pair stages. Replaces the basket-key SELF-JOIN shape (two
  * scans of the (basket, item) frame + two join exchanges + the pair
  * aggregate) with one groupBy(basket) + a map-side index-pair explode:
  * baskets are small by domain construction (an order has ≤7 lineitems),
  * so the fan-out is bounded and the enumeration never forms a row-scale
  * join. Pair multiset equality with the self-join it replaces is
  * differential-pinned in FanOutSpec (including duplicate items within
  * one basket: no self-pair, but each unordered ROW pair counted once,
  * canonical pa < pb by value).
  */
object Baskets {

  /** (ok, pa, pb): every in-basket item pair, one row per unordered
    * row pair, pa < pb (value order), basket key retained. */
  def basketPairs(bi: DataFrame, bkCol: String, itCol: String): DataFrame =
    bi.select(col(bkCol).as("ok"), col(itCol).as("pk"))
      .groupBy(col("ok")).agg(collect_list(col("pk")).as("ps"))
      .select(col("ok"), explode(expr(
        "flatten(transform(ps, (x, i) -> filter(transform(ps, (y, j) -> " +
          "IF(j > i AND y <> x, struct(least(x, y) AS pa, " +
          "greatest(x, y) AS pb), null)), p -> p IS NOT NULL)))")).as("e"))
      .select(col("ok"), col("e.pa").as("pa"), col("e.pb").as("pb"))

  /** (pa, pb, cm): pair supports — [[basketPairs]] counted. */
  def basketPairCounts(bi: DataFrame, bkCol: String,
                       itCol: String): DataFrame =
    basketPairs(bi, bkCol, itCol)
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cm"))
}
