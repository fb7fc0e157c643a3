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
      exprs => MinHashSig(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "hyperplane_lsh", exprs => HyperplaneLsh(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_md5", exprs => SimHashMd5(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_exact", exprs => CosineExactDecimal(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "nearest_cells",
      exprs => NearestCells(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "hex_hamming", exprs => HexHamming(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "pq_adc",
      exprs => AdcCosine(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    reg.createOrReplaceTempFunction(
      "bpe_encode", exprs => BpeEncode(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_pairs", exprs => CdcPairs(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "blocklist_hits", exprs => BlocklistHits(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "map_min_sum", exprs => MapMinSum(exprs(0), exprs(1)), "built-in")
    // Spark's OWN runtime-filter bloom expressions (catalyst internal,
    // not exposed as SQL functions): registered here so the 100 TB
    // decontamination path can build an eval-set bloom DISTRIBUTEDLY
    // (one binary scalar to the driver) and probe it map-side — the
    // exact same machinery InjectRuntimeFilter uses for join pruning.
    reg.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    registered = true
  }

  /** One-pass BPE subword tokenization of a token array against a
    * foldable merge-table literal (see [[BpeEncode]]). */
  def bpe_encode(tokens: Column, merges: Column): Column =
    call_function("bpe_encode", tokens, merges)

  /** Hamming distance between 16-hex-char simhashes as one native pass
    * (see [[HexHamming]]). */
  def hex_hamming(a: Column, b: Column): Column =
    call_function("hex_hamming", a, b)

  /** Map-side IVF cell assignment: `probes` nearest centroids of `vec`
    * against a literal centroid array (see [[NearestCells]]). */
  def nearest_cells(vec: Column, centroids: Column, probes: Int,
                    exact: Boolean): Column =
    call_function("nearest_cells", vec, centroids,
      org.apache.spark.sql.functions.lit(probes),
      org.apache.spark.sql.functions.lit(exact))

  /** Decimal-exact (oracle-bitwise) cosine as one native pass
    * (see [[CosineExactDecimal]]). */
  def cosine_exact(a: Column, b: Column): Column =
    call_function("cosine_exact", a, b)

  /** Σ min(a[t], b[t]) over two string→long tf maps as one native pass
    * (see [[MapMinSum]]). */
  def map_min_sum(a: Column, b: Column): Column =
    call_function("map_min_sum", a, b)

  /** Portable 64-bit SimHash (hex string) over a token array. */
  def simhash_md5(tokens: Column): Column = call_function("simhash_md5", tokens)

  /** One-pass word n-gram shingles over a token array. */
  def word_shingles(tokens: Column, n: Int): Column =
    call_function("word_shingles", tokens,
      org.apache.spark.sql.functions.lit(n))

  /** Codegen'd content-defined chunk [start,end) pairs (see
    * [[CdcPairs]]). */
  def cdc_pairs(text: Column, w: Int): Column =
    call_function("cdc_pairs", text, org.apache.spark.sql.functions.lit(w))

  /** Codegen'd cosine similarity over two array<float> columns. */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** One-pass MinHash signature over a token array (see [[MinHashSig]]). */
  def minhash_sig(tokens: Column, k: Int, shingleN: Int, useMd5: Boolean): Column =
    call_function("minhash_sig", tokens,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(shingleN),
      org.apache.spark.sql.functions.lit(useMd5),
      org.apache.spark.sql.functions.lit(0))

  /** One-pass MinHash LSH band keys (signature + banding fused). */
  def minhash_bands(tokens: Column, k: Int, shingleN: Int, useMd5: Boolean,
                    bands: Int): Column =
    call_function("minhash_sig", tokens,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(shingleN),
      org.apache.spark.sql.functions.lit(useMd5),
      org.apache.spark.sql.functions.lit(bands))

  /** One-pass ADC cosine for PQ search (see [[AdcCosine]]). */
  def pq_adc(codes: Column, luts: Column, qnorm: Column,
             nsq: Column): Column =
    call_function("pq_adc", codes, luts, qnorm, nsq)

  /** Codegen'd random-hyperplane LSH bucket id (see [[HyperplaneLsh]]). */
  def hyperplane_lsh(vec: Column, planes: Int): Column =
    call_function("hyperplane_lsh", vec,
      org.apache.spark.sql.functions.lit(planes))

  /** Distributed bloom-filter build over a LONG column (feed it
    * `xxhash64(...)`): Spark's own `BloomFilterAggregate`, yielding the
    * serialized filter as one binary scalar. */
  def bloom_agg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    call_function("bloom_agg", hashed,
      org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(numBits))

  /** Map-side bloom probe (`BloomFilterMightContain`): `bloom` must be a
    * foldable binary literal; `hashed` the same `xxhash64` used at build. */
  def bloom_might_contain(bloom: Column, hashed: Column): Column =
    call_function("bloom_might_contain", bloom, hashed)
}
