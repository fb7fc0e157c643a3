package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DataType, LongType, StructField,
  StructType}

/** Streaming maintenance face of the distributed-ANALYZE synopsis
  * (q297/q305's exact mergeable histogram): each micro-batch of new
  * rows ships only its own quantized value histogram, and the persisted
  * synopsis is the UNION of per-batch partials — merged on read with
  * one associative Σc-by-v aggregation, exactly the shard merge q305
  * certifies. Statistics maintenance without ever rescanning the
  * corpus, exact BECAUSE the histogram merge is exact.
  *
  * Exactly-once comes from the same two pieces as [[NearDupStream]]:
  * the stream checkpoint assigns every input file to one batch (T4),
  * and each batch's partial lands in its own `batch_id=<id>` partition
  * under DYNAMIC overwrite (T5) — a crash-replayed batch rewrites only
  * itself, and because the synopsis is an associative fold over
  * partitions there is NO read-modify-write of accumulated state to
  * race with (the production advantage over a rewrite-then-swap fold:
  * the store is append-shaped, replays are local, and compaction is an
  * optional offline rewrite, not a correctness step).
  *
  * 100 TB shape: per batch only the new rows are scanned; the partial
  * is bounded by the quantized domain; the merge-on-read rides
  * [[graft.operators.Stats.histCumSum]]'s consumers, so a wide domain
  * scales out downstream too.
  */
object SynopsisStream {

  /** Stream of new rows from a parquet drop directory. */
  def readValues(spark: SparkSession, dropDir: String,
                 schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dropDir)

  /** One micro-batch: the batch's own exact value histogram into its
    * `batch_id` partition, idempotent under checkpoint replay. */
  def processBatch(batch: DataFrame, batchId: Long, valueCol: String,
                   synDir: String): Unit =
    batch.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(synDir)

  /** Drain every pending file and stop; same `checkpointDir` resumes
    * after the last committed batch. */
  def runAvailableNow(values: DataFrame, valueCol: String, synDir: String,
                      checkpointDir: String): StreamingQuery =
    values.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, valueCol, synDir)
      }
      .start()

  /** The merged histogram over everything ingested so far: one
    * associative Σc-by-v over the per-batch partials, restricted to the
    * stream checkpoint's COMMITTED batch prefix — exact even while a
    * drain is running (see [[Commits]]); the front door defaults to
    * exact-during-drain rather than opting in. Explicit schema, so a
    * synopsis with no batches yet (or only empty ones) reads as an
    * EMPTY histogram instead of failing parquet inference. */
  def histogram(spark: SparkSession, synDir: String,
                checkpointDir: String,
                valueType: DataType = LongType): DataFrame =
    histogramRead(spark, synDir, valueType, Some(checkpointDir))

  /** [[histogram]] WITHOUT commit-log filtering — for a store read away
    * from its stream. Exact only after the AvailableNow drain
    * terminates (a concurrent read can transiently observe a batch
    * whose checkpoint commit has not landed). */
  def histogramUncommitted(spark: SparkSession, synDir: String,
                           valueType: DataType = LongType): DataFrame =
    histogramRead(spark, synDir, valueType, None)

  private def histogramRead(spark: SparkSession, synDir: String,
                            valueType: DataType,
                            checkpointDir: Option[String]): DataFrame = {
    val schema = StructType(Seq(StructField("v", valueType),
      StructField("c", LongType), StructField("batch_id", LongType)))
    val p = new org.apache.hadoop.fs.Path(synDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.dropRight(1)))
    else
      Commits.committedOnly(spark,
          spark.read.schema(schema).parquet(synDir), checkpointDir)
        .groupBy(col("v")).agg(sum(col("c")).as("c"))
  }
}
