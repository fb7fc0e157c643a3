package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-partitioning both fact tables on the
  * join key at write time removes the per-query shuffle entirely — the
  * 100 TB answer for repeated fact-fact joins (SURVEY.md §2.3). The spec
  * pins the plan property: no Exchange above the bucketed scans.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    // managed tables land in the session's default warehouse dir; the
    // in-memory catalog forgets tables across JVMs, so also remove any
    // orphaned table directories from previous runs
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val whDir = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "o_b").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(whDir, t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // disable broadcast so the join strategy decision is about
    // partitioning, not table size
    val joined = spark.table("li_b")
      .join(spark.table("o_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the sort-merge join consumes bucketed output directly: no Exchange
    // below the join (only the final aggregation may shuffle)
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(plan.contains("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"unexpected shuffle below the bucketed join:\n$joinSection")
    // and it computes the right thing
    assert(joined.collect().map(_.getAs[Long]("n")).sum == li.count())
  }
}
