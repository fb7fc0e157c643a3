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
  *     the guard accepts — every stamp is a reviewable claim, and the
  *     call site must carry a comment justifying it.
  */
object Hints {

  /** `broadcast(df)` plus a machine-checkable adjudication stamp.
    *
    * `why` names the boundedness argument (e.g. `query_set_contract`
    * when an operator's API contract makes the frame the small "query"
    * side, or `topk_capped` when the frame is a per-key top-k whose
    * row count is k x |keys| with bounded keys). The stamp is a
    * `SubqueryAlias("bounded_<why>", ...)` in the analyzed plan;
    * PlanAuditSpec's guard accepts exactly that prefix, so each use is
    * visible both in the plan and via `grep boundedBroadcast`. */
  def boundedBroadcast(df: DataFrame, why: String): DataFrame = {
    require(why.nonEmpty && why.forall(c =>
      c.isLower && c.isLetter || c.isDigit || c == '_'),
      s"adjudication tag must be lower_snake_case: '$why'")
    broadcast(df.as(s"bounded_$why"))
  }
}
