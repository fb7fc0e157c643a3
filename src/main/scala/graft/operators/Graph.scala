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
               broadcastRanks: Boolean = false,
               distinctEdges: Boolean = true,
               materialize: Materializer = Materializer.Local): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    // distinctEdges=false skips the dedup shuffle when the caller's edge
    // set is distinct by construction (a duplicated edge double-counts
    // its contribution, so only skip when provably safe)
    val e0 = edges.select(col("src"), col("dst"))
    // materialize the edge set BEFORE it fans out to degree + join: both
    // consumers would otherwise re-run the caller's (possibly expensive)
    // edge-building plan — the q84 double-reference lesson
    val e = materialize(if (distinctEdges) e0.distinct() else e0)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // degree is loop-invariant: attach it to the edge set ONCE, so each
    // iteration pays one equi-join instead of two (at 100 TB the edge
    // table is the big operand — halving its joins halves the loop's
    // shuffle volume)
    val ed = materialize(e.join(deg, Seq("src")))
    // every node has outdegree >= 1, so `deg` IS the node table
    var ranks = materialize(
      ed.select(col("src").as("node")).distinct()
        .withColumn("r", lit(1.0)))
    // broadcastRanks: when the node set is dimension-scale (an entity
    // graph — customers x suppliers, domains x hosts) the rank table
    // broadcasts and the EDGE TABLE NEVER SHUFFLES: contributions
    // partial-combine map-side on top of the edge scan, so each iteration
    // moves only (node, partial-sum) rows. For corpus-scale node sets
    // (document graphs) leave it false — ranks shuffle-join instead.
    def rankSide(df: DataFrame) = if (broadcastRanks) broadcast(df) else df
    var i = 0
    while (i < iters) {
      val contribs = ed
        .join(rankSide(ranks.withColumnRenamed("node", "src")), Seq("src"))
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
