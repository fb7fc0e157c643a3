package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-facade for graft's native Catalyst expressions.
  *
  * Spark 4 removed the public `new Column(expr)` constructor, so custom
  * expressions are exposed through the session FunctionRegistry and invoked
  * via `call_function` — which keeps them usable from both the Column API
  * and plain SQL.
  */
object GraftFunctions {

  @volatile private var registered = false

  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    registered = true
  }

  /** Codegen'd cosine similarity over two array<float> columns. */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** One-pass MinHash signature over a token array (see [[MinHashSig]]). */
  def minhash_sig(tokens: Column, k: Int, shingleN: Int, useMd5: Boolean): Column =
    call_function("minhash_sig", tokens,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(shingleN),
      org.apache.spark.sql.functions.lit(useMd5))
}
