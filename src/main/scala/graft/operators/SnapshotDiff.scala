package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the data-versioning primitive of an iterated
  * training-data pipeline: between two corpus snapshots, classify every
  * document as added / removed / modified / unchanged by content hash.
  * A retraining run wants exactly this delta (re-tokenize only
  * added+modified, drop removed from indexes), and a data audit wants it
  * as the changelog.
  *
  * Scale shape: the content hash is computed MAP-SIDE on each snapshot's
  * scan, so the full-outer join shuffles (id, 16-byte hash) rows — never
  * document bodies. One shuffle per side on the id, then a sort-merge
  * full-outer; at 100 TB both sides prune to the two columns at the
  * parquet scan.
  */
object SnapshotDiff {

  /** Per-id diff of two snapshots: `(idCol, status, old_hash, new_hash)`
    * with status in added|removed|modified|unchanged. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(contentCol)).as("old_hash"))
    val n = newDf.select(col(idCol), md5(col(contentCol)).as("new_hash"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("modified")).as("status"),
        col("old_hash"), col("new_hash"))
  }
}
