package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handles most runtime skew;
  * salting is the explicit tool when one key dominates so heavily that even
  * split shuffle blocks hot-spot a single executor (the classic power-law
  * user_id / null-key cases at 100 TB).
  */
object Skew {

  /** Salted equi-join: the fact side gets a random salt in [0, salts), the
    * dimension side is exploded `salts` times, and the join key becomes
    * (key, salt) — spreading each hot key over `salts` reducers. Exact same
    * result set as `fact.join(dim, keys)`, at the cost of replicating the
    * (small) dimension side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // deterministic salt from a stable row hash — reproducible, and unlike
    // rand() safe under task retries
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toSeq: _*)), lit(salts)))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency profile — the scout query used to decide whether a
    * join needs salting (top-N heaviest keys and their share). */
  def keyProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
