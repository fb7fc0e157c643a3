package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph centrality for corpus curation: PageRank as iterated
  * DataFrame aggregation. A pretraining pipeline uses link-graph centrality
  * as a document quality prior (the original web-scale use of the
  * algorithm); here it is the same edge-set-only shuffle discipline as
  * [[Dedup.nearDupClustersWithRounds]] — per iteration one equi-join of
  * edges to the current rank table, one partial-combined sum keyed on the
  * destination, one left join back; the corpus/edge set never widens, and
  * lineage is cut per iteration via the [[Materializer]].
  *
  * Numeric portability (the oracle must land on identical bits): each
  * edge's contribution rank/degree is a per-row DOUBLE division (IEEE,
  * same on every engine given the same inputs), accumulated as
  * DECIMAL(38,20) so partial-aggregation ORDER cannot flip a bit, and each
  * iteration's rank is re-quantized with round(., 12) — so iteration k+1's
  * inputs are bit-identical across engines by induction. Ranks are
  * UNNORMALIZED (init 1, teleport 0.15, total mass N): no 1/N division
  * whose rounding would have to be replicated.
  */
object Graph {

  /** PageRank over a directed edge list (src, dst) in which EVERY node has
    * out-degree >= 1 (pass a symmetrized edge set for undirected graphs —
    * that also removes dangling-node mass loss, exactly how the
    * link-graph-as-quality-prior pipelines run it). Returns
    * (node, rank) for every node, unnormalized (sum of ranks ≈ node
    * count). Fixed iteration count — centrality priors want a
    * deterministic, replayable result, not a convergence race. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               materialize: Materializer = Materializer.Local): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val e = materialize(edges.select(col("src"), col("dst")).distinct())
    val deg = materialize(e.groupBy(col("src")).agg(count(lit(1)).as("d")))
    // every node has outdegree >= 1, so `deg` IS the node table
    var ranks = materialize(
      deg.select(col("src").as("node"), lit(1.0).as("r")))
    var i = 0
    while (i < iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          (col("r") / col("d")).cast("decimal(38,20)").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("c"))
      ranks = materialize(ranks.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) + lit(damping) *
            coalesce(col("c"), lit(0)).cast("double"), 12).as("r")))
      i += 1
    }
    ranks.select(col("node"), col("r").as("rank"))
  }
}
