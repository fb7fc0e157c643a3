package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.operators.TextAnalysis

/** Streaming maintenance face of the tokenizer-fertility drift monitor
  * (q322's regime): each micro-batch of new documents ships only its own
  * `(lang, source, toks, chars)` integer partial, and the persisted
  * store is the UNION of per-batch partials — merged on read with one
  * associative Σ-by-(lang, source) aggregation, then summarized by the
  * SAME [[TextAnalysis.fertilityBracket]] the batch query runs, so the
  * streaming face is bit-identical to q322 by construction (fertility,
  * the language reference, and the drift flag are all functions of the
  * exact merged integer sums).
  *
  * Exactly-once comes from the same two pieces as [[NearDupStream]]:
  * the stream checkpoint assigns every input file to one batch (T4),
  * and each batch's partial lands in its own `batch_id=<id>` partition
  * under DYNAMIC overwrite (T5) — a crash-replayed batch rewrites only
  * itself, and because the store is an associative fold over partitions
  * there is no read-modify-write of accumulated state to race with.
  *
  * 100 TB shape: per batch only the new documents are tokenized; the
  * partial is bounded by |langs x sources| — a few rows per batch
  * whatever the batch size; the merge-on-read is one partial-combined
  * aggregation over those bounded partials; and the bracket is algebra
  * on the merged frame. This is the cheapest face in the suite — the
  * monitor a tokenizer rollout keeps running continuously.
  */
object FertilityStream {

  /** Stream of new documents from a parquet drop directory. */
  def readDocs(spark: SparkSession, dropDir: String,
               schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dropDir)

  /** One micro-batch: the batch's own exact `(lang, source, toks,
    * chars)` partial into its `batch_id` partition, idempotent under
    * checkpoint replay. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
                   partialsDir: String): Unit =
    TextAnalysis.fertilityPartials(batch, textCol)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("toks")).cast("long").as("toks"),
        sum(col("chars")).cast("long").as("chars"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(partialsDir)

  /** Drain every pending file and stop; same `checkpointDir` resumes
    * after the last committed batch. */
  def runAvailableNow(docs: DataFrame, textCol: String,
                      partialsDir: String,
                      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, partialsDir)
      }
      .start()

  /** The exact merged `(lang, source, toks, chars)` sums over everything
    * ingested so far, restricted to the stream checkpoint's COMMITTED
    * batch prefix — exact even while a drain is running (see
    * [[Commits]]). Explicit schema, so a store with no batches yet reads
    * as an EMPTY frame instead of failing parquet inference. */
  def mergedPartials(spark: SparkSession, partialsDir: String,
                     checkpointDir: String): DataFrame =
    mergedPartialsRead(spark, partialsDir, Some(checkpointDir))

  /** [[mergedPartials]] WITHOUT commit-log filtering — for a store read
    * away from its stream. Exact only after the AvailableNow drain
    * terminates: concurrent with a drain it can transiently observe a
    * batch whose checkpoint commit has not landed yet (replay rewrites
    * identical content, so state still converges). */
  def mergedPartialsUncommitted(spark: SparkSession, partialsDir: String)
      : DataFrame =
    mergedPartialsRead(spark, partialsDir, None)

  private def mergedPartialsRead(spark: SparkSession, partialsDir: String,
                                 checkpointDir: Option[String])
      : DataFrame = {
    val schema = StructType(Seq(StructField("lang", StringType),
      StructField("source", StringType), StructField("toks", LongType),
      StructField("chars", LongType), StructField("batch_id", LongType)))
    val p = new org.apache.hadoop.fs.Path(partialsDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.dropRight(1)))
    else
      Commits.committedOnly(spark,
          spark.read.schema(schema).parquet(partialsDir), checkpointDir)
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("toks")).cast("long").as("toks"),
          sum(col("chars")).cast("long").as("chars"))
  }

  /** The q322 drift bracket over everything ingested so far — COMMITTED
    * merged partials through the shared
    * [[TextAnalysis.fertilityBracket]]. */
  def summary(spark: SparkSession, partialsDir: String,
              checkpointDir: String, tol: Double = 0.02): DataFrame =
    TextAnalysis.fertilityBracket(
      mergedPartials(spark, partialsDir, checkpointDir), tol)

  /** [[summary]] over the unfiltered store — see
    * [[mergedPartialsUncommitted]] for when that is exact. */
  def summaryUncommitted(spark: SparkSession, partialsDir: String,
                         tol: Double = 0.02): DataFrame =
    TextAnalysis.fertilityBracket(
      mergedPartialsUncommitted(spark, partialsDir), tol)
}
