package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Invariants of the large-scale bench input generator: facts replicate
  * exactly `factor` times with per-replica key remapping (no key
  * collisions), dims copy unscaled, and lineitem -> orders foreign keys
  * survive the remap (replica i of lineitem points at replica i of
  * orders). */
class ScaleUpSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private lazy val dest: String = {
    val d = Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.run(spark, src, d, factor = 3)
    d
  }

  private def n(dir: String, t: String): Long =
    spark.read.parquet(s"$dir/$t.parquet").count()

  test("facts scale by factor, dims copy unscaled") {
    for (fact <- Seq("orders", "lineitem", "events", "documents",
        "embeddings"))
      assert(n(dest, fact) == 3 * n(src, fact), fact)
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      assert(n(dest, dim) == n(src, dim), dim)
  }

  test("replica keys never collide") {
    for ((t, k) <- Seq("orders" -> "o_orderkey", "events" -> "event_id",
        "documents" -> "doc_id", "embeddings" -> "vec_id")) {
      val df = spark.read.parquet(s"$dest/$t.parquet")
      assert(df.select(k).distinct().count() ==
        3 * spark.read.parquet(s"$src/$t.parquet")
          .select(k).distinct().count(), s"$t.$k")
    }
  }

  test("lineitem foreign keys stay consistent across replicas") {
    val li = spark.read.parquet(s"$dest/lineitem.parquet")
    val o = spark.read.parquet(s"$dest/orders.parquet")
    val orphans = li.join(o, col("l_orderkey") === col("o_orderkey"),
      "left_anti")
    assert(orphans.count() == 0)
  }

  test("document payloads repeat verbatim (dedup stress by design)") {
    val docs = spark.read.parquet(s"$dest/documents.parquet")
    // every source text now appears exactly factor times more often
    val grouped = docs.groupBy(md5(col("text"))).count()
      .filter(col("count") % 3 =!= 0)
    assert(grouped.count() == 0)
  }
}
