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

  /** Bloom-pruned join: when the dim side is SELECTIVE but too large to
    * broadcast as a hash relation, build a bloom filter over its join
    * keys (one distributed aggregate → one binary scalar on the driver)
    * and drop non-matching fact rows MAP-SIDE, BEFORE the shuffle — the
    * manual form of Spark's own InjectRuntimeFilter, for when the
    * optimizer won't fire it (subquery shapes, DSv2 sources, disabled
    * AQE). The result is EXACTLY the plain inner join: a bloom has no
    * false negatives, and the join itself kills the false positives —
    * only the shuffle volume changes. At 100 TB pruning a 1%-selective
    * join before the exchange is a 100× shuffle-byte cut. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      dimKey: String, expectedItems: Long = 1L << 20,
                      numBits: Long = 1L << 23): DataFrame = {
    val bloomRow = dim
      .agg(graft.functions.GraftFunctions.bloom_agg(
        xxhash64(col(dimKey)), expectedItems, numBits)).collect()(0)
    if (bloomRow.isNullAt(0)) return fact.limit(0).join(dim,
      col(factKey) === col(dimKey))
    val bloom = bloomRow.getAs[Array[Byte]](0)
    fact
      .filter(graft.functions.GraftFunctions.bloom_might_contain(
        lit(bloom), xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
