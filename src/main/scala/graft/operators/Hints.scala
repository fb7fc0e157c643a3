package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-hint discipline for the 100 TB target.
  *
  * A forced `broadcast()` bypasses Spark's size check: if the hinted
  * frame turns out to grow with the corpus, the job OOMs at scale
  * instead of falling back to a shuffle join — the single plan class
  * that fails a 100x scale-up while passing every small-SF test. The
  * repo-wide rule (enforced by PlanAuditSpec's entity-scale guard over
  * EVERY query's analyzed plan) is therefore:
  *
  *   - frames whose row count provably cannot grow with the corpus
  *     (scalar aggregates, explicit limits, literal relations,
  *     fixed-cardinality catalog tables, and compositions of those)
  *     may be hinted freely — the guard proves them bounded itself;
  *   - everything else is UNHINTED (AQE still broadcasts genuinely
  *     small sides at runtime), UNLESS a human has adjudicated that
  *     construction guarantees boundedness in a way the structural
  *     walker cannot see. Those sites use [[boundedBroadcast]], which
  *     stamps the hint subtree with a greppable `bounded_<why>` alias
  *     the guard accepts — every stamp is a reviewable claim, whose
  *     boundedness argument lives once in the tag glossary below (the
  *     guard rejects tags missing from the registry), with call-site
  *     comments where the claim needs local context.
  */
object Hints {

  /** `broadcast(df)` plus a machine-checkable adjudication stamp.
    *
    * `why` names the boundedness argument. The stamp is a
    * `SubqueryAlias("bounded_<why>", ...)` in the analyzed plan;
    * PlanAuditSpec's guard accepts exactly that prefix, so each use is
    * visible both in the plan and via `grep boundedBroadcast`.
    *
    * Canonical tag glossary (the reviewable registry — a call site
    * either uses one of these, whose argument is given HERE once, or
    * carries its own justifying comment):
    *   - `query_set_contract` / `eval_set_contract` — the frame is the
    *     "queries"/"eval set" side of an operator whose documented API
    *     contract makes it the small side (ANN query batches,
    *     decontamination eval sets); the corpus is always the other
    *     side.
    *   - `query_term_set` — per-term tables trimmed to the query's own
    *     terms upstream (isInCollection prefilter): <= |query| rows.
    *   - `topk_capped` — a per-key partial top-k: <= k x |keys| rows
    *     with contract-bounded keys.
    *   - `event_type_domain` / `label_domain` / `lang_domain` /
    *     `category_domain(_contract)` / `group_domain_contract` /
    *     `ctx_domain` / `arm_domain` / `series_key_domain` /
    *     `fold_domain` / `fold_buckets` — group keys drawn from a
    *     bounded categorical domain (event types, class labels,
    *     languages, data sources, experiment arms, monitored series,
    *     fixed fold counts), not from an entity id space.
    *   - `value_grid` / `time_grid` / `batch_dim_grid` /
    *     `vector_dim_domain` / `grid_cells` — one row per cell of a
    *     quantized/integral grid (value cents, calendar hours/days,
    *     batch x dimension, embedding positions, 2D density cells):
    *     bounded by the grid resolution, not the corpus.
    *   - `grid_g_rows` / `calibration_bins` / `sketch_cells` /
    *     `probe_points` / `replicate_set` / `subset_masks` /
    *     `channel_subsets` /
    *     `per_shard_rows` — synopsis/DP internals sized by an operator
    *     parameter (g <= 64 equi-rank points, bin/cell counts,
    *     bootstrap replicates, 2^|channels| masks, shard counts).
    *   - `bt_item_panel` / `marker_panel` / `single_literal_group` —
    *     comparison panels and literal-keyed one-row groups.
    *   - `cluster_domain_payload` — a scalar collect whose PAYLOAD is
    *     bounded: <= |cluster/label domain| x dim values (the walker
    *     rejects collect_list/collect_set under an otherwise-bounded
    *     verdict because a corpus-keyed collect is byte-unbounded; this
    *     tag asserts the collected input is itself domain-bounded). */
  def boundedBroadcast(df: DataFrame, why: String): DataFrame = {
    require(why.nonEmpty && why.forall(c =>
      c.isLower && c.isLetter || c.isDigit || c == '_'),
      s"adjudication tag must be lower_snake_case: '$why'")
    broadcast(df.as(s"bounded_$why"))
  }
}
