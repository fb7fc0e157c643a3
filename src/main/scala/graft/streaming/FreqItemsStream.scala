package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

import graft.operators.{Materializer, Sharding, Stats, TextAnalysis}

/** Streaming maintenance face of the mergeable heavy-hitter synopsis
  * (q309's frequent-items regime — the one synopsis family that had a
  * batch readout but no T1–T5 front door after quantile histograms got
  * [[SynopsisStream]]): each micro-batch of new documents ships only
  * its own `(shard, tok, c)` token-count partial, and the persisted
  * store is the UNION of per-batch partials — merged on read with one
  * associative Σc-by-(shard, tok) aggregation, then summarized by the
  * SAME [[Stats.heavyHitterBracket]] the batch query runs, so the
  * streaming face is bit-identical to q309 by construction (the
  * k-with-threshold compression is a function of the exact merged
  * shard counts, and the merge is exact).
  *
  * Exactly-once comes from the same two pieces as [[NearDupStream]]:
  * the stream checkpoint assigns every input file to one batch (T4),
  * and each batch's partial lands in its own `batch_id=<id>` partition
  * under DYNAMIC overwrite (T5) — a crash-replayed batch rewrites only
  * itself, and because the store is an associative fold over partitions
  * there is no read-modify-write of accumulated state to race with.
  *
  * 100 TB shape: per batch only the new documents are tokenized; the
  * partial is bounded by the batch's own vocabulary (never the corpus
  * vocabulary); the merge-on-read is one partial-combined aggregation
  * keyed on (shard, tok); and the bracket summary ships k+1 numbers per
  * shard downstream. In the sharded-ANALYZE deployment, compaction of
  * old batch partitions into one is an optional offline rewrite (the
  * fold is associative), not a correctness step.
  */
object FreqItemsStream {

  /** Stream of new documents from a parquet drop directory. */
  def readDocs(spark: SparkSession, dropDir: String,
               schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dropDir)

  /** One micro-batch: the batch's own exact `(shard, tok, c)` counts
    * into its `batch_id` partition, idempotent under checkpoint
    * replay. Sharding hashes the DOC id (q309's contract: a document's
    * tokens all land on its own shard), so a doc arriving in any batch
    * contributes to the same shard the batch query would place it on. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   textCol: String, nShards: Int, countsDir: String): Unit =
    batch.select(Sharding.shardOf(idCol, nShards).as("shard"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("shard"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(countsDir)

  /** Drain every pending file and stop; same `checkpointDir` resumes
    * after the last committed batch. */
  def runAvailableNow(docs: DataFrame, idCol: String, textCol: String,
                      nShards: Int, countsDir: String,
                      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, nShards, countsDir)
      }
      .start()

  /** The exact merged `(shard, tok, c)` counts over everything ingested
    * so far, restricted to the stream checkpoint's COMMITTED batch
    * prefix — exact even while a drain is running (see [[Commits]]);
    * the front door defaults to exact-during-drain rather than opting
    * in. Explicit schema, so a store with no batches yet reads as an
    * EMPTY frame instead of failing parquet inference. */
  def mergedCounts(spark: SparkSession, countsDir: String,
                   checkpointDir: String): DataFrame =
    mergedCountsRead(spark, countsDir, Some(checkpointDir))

  /** [[mergedCounts]] WITHOUT commit-log filtering — for a store read
    * away from its stream. Exact only after the AvailableNow drain
    * terminates: concurrent with a drain it can transiently observe a
    * batch whose checkpoint commit has not landed yet (replay rewrites
    * identical content, so state still converges). */
  def mergedCountsUncommitted(spark: SparkSession, countsDir: String)
      : DataFrame =
    mergedCountsRead(spark, countsDir, None)

  private def mergedCountsRead(spark: SparkSession, countsDir: String,
                               checkpointDir: Option[String]): DataFrame = {
    val schema = StructType(Seq(StructField("shard", IntegerType),
      StructField("tok", StringType), StructField("c", LongType),
      StructField("batch_id", LongType)))
    val p = new org.apache.hadoop.fs.Path(countsDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.dropRight(1)))
    else
      Commits.committedOnly(spark,
          spark.read.schema(schema).parquet(countsDir), checkpointDir)
        .groupBy(col("shard"), col("tok")).agg(sum(col("c")).as("c"))
  }

  /** The q309 heavy-hitter bracket over everything ingested so far —
    * COMMITTED merged counts through the shared
    * [[Stats.heavyHitterBracket]]. */
  def summary(spark: SparkSession, countsDir: String,
              checkpointDir: String, kTop: Int = 32,
              materialize: Materializer = Materializer.Local): DataFrame =
    Stats.heavyHitterBracket(
      mergedCounts(spark, countsDir, checkpointDir), kTop, materialize)

  /** [[summary]] over the unfiltered store — see
    * [[mergedCountsUncommitted]] for when that is exact. */
  def summaryUncommitted(spark: SparkSession, countsDir: String,
                         kTop: Int = 32,
                         materialize: Materializer = Materializer.Local)
      : DataFrame =
    Stats.heavyHitterBracket(
      mergedCountsUncommitted(spark, countsDir), kTop, materialize)
}
