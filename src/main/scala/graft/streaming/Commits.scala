package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Committed-batch visibility for the append-shaped streaming stores
  * ([[NearDupStream]] pairs/index, [[SynopsisStream]] histogram
  * partials, [[FreqItemsStream]] count partials, [[AnnIndexStream]]
  * index rows).
  *
  * Each store writes a batch's output into its `batch_id=<id>`
  * partition BEFORE the stream checkpoint records the batch as
  * committed (the standard foreachBatch ordering), so a reader
  * concurrent with a running drain can transiently observe a partition
  * whose commit has not landed yet. Replay rewrites identical content —
  * state converges either way — but an exact read DURING a drain must
  * filter to the checkpoint log's committed prefix. That log is the
  * stream's `<checkpointDir>/commits/<batchId>` files (one per
  * committed batch, monotonically increasing), the same source of truth
  * the engine itself resumes from. */
private[graft] object Commits {

  /** The highest committed batch id in `checkpointDir`'s commit log,
    * or None when nothing has committed yet (no dir, empty dir, or a
    * brand-new stream). Compaction-safe: ignores non-numeric entries
    * (e.g. `.compact` suffixed files keep their numeric prefix). */
  def lastCommitted(spark: SparkSession, checkpointDir: String)
      : Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val ids = fs.listStatus(p).toSeq
        .map(_.getPath.getName.stripSuffix(".compact"))
        .filter(_.forall(_.isDigit)).filter(_.nonEmpty)
        .map(_.toLong)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** `store` (which carries a `batch_id` column) restricted to the
    * committed prefix of `checkpointDir`'s log; the store unchanged
    * when no checkpoint is supplied (the documented read-uncommitted
    * mode — exact only after the drain terminates); EMPTY when a
    * checkpoint is supplied but nothing has committed yet.
    *
    * A checkpoint ROOT that does not exist while the store HAS data is
    * a misconfiguration (wrong path, relocated or cleaned-up
    * checkpoint), not a brand-new stream — the front doors only reach
    * this call once the store dir exists, so silently reading the full
    * log as EMPTY would make a typo'd path indistinguishable from an
    * empty corpus (e.g. a dedup pass concluding "no duplicates"). That
    * case throws; `<cp>/commits` merely absent-or-empty under an
    * existing root is the legitimate nothing-committed-yet state. */
  def committedOnly(spark: SparkSession, store: DataFrame,
                    checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case None => store
      case Some(cp) =>
        val root = new org.apache.hadoop.fs.Path(cp)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(root),
          s"checkpoint dir '$cp' not found but the store has data — " +
            "wrong path? For a store read away from its stream use the " +
            "*Uncommitted reader instead.")
        lastCommitted(spark, cp) match {
          case None => store.limit(0)
          case Some(last) => store.filter(col("batch_id") <= last)
        }
    }
}
