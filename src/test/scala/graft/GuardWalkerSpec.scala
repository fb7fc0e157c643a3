package graft

import org.apache.spark.sql.functions._

/** Unit pins for the [[GuardSweep.bounded]] boundedness walker — the
  * judgment the repo-wide entity-scale broadcast guard (PlanAuditSpec)
  * delegates to. Each test freezes one rule the round-10/11 hardening
  * added, on real analyzed plans over the sf0.001 tables. */
class GuardWalkerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def analyzed(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed

  test("a grouping-free aggregate is bounded for scalar payloads but " +
    "NOT for a corpus collect_list/collect_set (1 row of corpus-sized " +
    "bytes is as broadcast-fatal as corpus rows)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(GuardSweep.bounded(analyzed(docs.agg(count(lit(1))))))
    assert(!GuardSweep.bounded(
      analyzed(docs.agg(collect_list(col("doc_id"))))))
    assert(!GuardSweep.bounded(
      analyzed(docs.agg(collect_set(col("source"))))))
    // ... unless the collected INPUT is itself bounded-by-construction
    assert(GuardSweep.bounded(
      analyzed(docs.limit(10).agg(collect_list(col("doc_id"))))))
  }

  test("Generate (explode) is never boundedness-preserving: exploding " +
    "a bounded frame's arrays can emit corpus-many rows") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val one = docs.agg(collect_list(col("doc_id")).as("ids"))
    // 1 row in, corpus rows out — the exact laundering path the
    // single-child pass-through used to bless
    assert(!GuardSweep.bounded(
      analyzed(one.select(explode(col("ids")).as("doc_id")))))
    // even over a genuinely bounded child: adjudicate real sites with a
    // stamp instead of a structural pass
    assert(!GuardSweep.bounded(
      analyzed(docs.limit(5)
        .select(explode(split(col("text"), " ")).as("tok")))))
  }

  test("a Limit bounds rows but NOT collect byte-growth beneath it: " +
    "Limit(Window(collect_list over corpus)) is 10 rows of corpus-sized " +
    "arrays and must fail the walker; the same shapes over a bounded " +
    "child (or with scalar window payloads) pass") {
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val part = W.partitionBy(lit(1))
    // 10 rows out, corpus bytes per row — the byte-growth class the
    // Aggregate rule rejects, now checked under the row bound too
    assert(!GuardSweep.bounded(analyzed(
      docs.withColumn("all", collect_list(col("text")).over(part))
        .limit(10))))
    assert(!GuardSweep.bounded(analyzed(
      docs.groupBy(col("source"))
        .agg(collect_set(col("text")).as("all")).limit(10))))
    // a scalar window payload under a limit stays bounded
    assert(GuardSweep.bounded(analyzed(
      docs.withColumn("r", row_number().over(part.orderBy(col("doc_id"))))
        .limit(10))))
    // a collect over a BOUNDED child is bounded bytes: fine under limit
    assert(GuardSweep.bounded(analyzed(
      docs.limit(50)
        .withColumn("all", collect_list(col("text")).over(part))
        .limit(10))))
    // the explicit Window rule mirrors the catch-all verdict: bounded
    // iff the child is, and a corpus collect payload never launders
    assert(!GuardSweep.bounded(analyzed(
      docs.withColumn("all", collect_list(col("text")).over(part)))))
    assert(GuardSweep.bounded(analyzed(
      docs.limit(50)
        .withColumn("all", collect_list(col("text")).over(part)))))
    // a bounded_ stamp beneath the limit still shields its subtree
    assert(GuardSweep.bounded(analyzed(
      operators.Hints.boundedBroadcast(
        docs.agg(collect_list(col("doc_id")).as("ids")),
        "cluster_domain_payload").limit(10))))
  }

  test("the catalog-table leaf rule matches the scanned file identity, " +
    "not a toString substring: nation/region parquet scans are bounded, " +
    "a corpus table whose PATH mentions the word is not") {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    assert(GuardSweep.bounded(analyzed(nation)))
    assert(GuardSweep.bounded(
      analyzed(spark.read.parquet(s"$dir/region.parquet"))))
    // a documents copy living under a 'nation'-mentioning path used to
    // satisfy the substring check
    val trap = java.nio.file.Files
      .createTempDirectory("nation_region_trap").toString
    spark.read.parquet(s"$dir/documents.parquet").limit(50)
      .write.mode("overwrite").parquet(s"$trap/corpus.parquet")
    assert(!GuardSweep.bounded(
      analyzed(spark.read.parquet(s"$trap/corpus.parquet"))))
  }

  test("a Hints.boundedBroadcast stamp short-circuits the walker (the " +
    "adjudication surface), and composition rules hold: semi/anti join " +
    "bounded by its left, union bounded iff all inputs are") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(GuardSweep.bounded(analyzed(
      operators.Hints.boundedBroadcast(
        docs.agg(collect_list(col("doc_id")).as("ids")),
        "cluster_domain_payload"))))
    val bounded10 = docs.limit(10)
    assert(GuardSweep.bounded(analyzed(
      bounded10.join(docs, Seq("doc_id"), "left_semi"))))
    assert(!GuardSweep.bounded(analyzed(
      docs.join(bounded10, Seq("doc_id"), "left_semi"))))
    assert(GuardSweep.bounded(analyzed(
      bounded10.unionAll(bounded10))))
    assert(!GuardSweep.bounded(analyzed(
      bounded10.unionAll(docs))))
  }
}
