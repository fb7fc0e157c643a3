package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField,
  StructType}

import graft.operators.Similarity

/** Streaming maintenance face of the IVF-PQ retrieval index — the last
  * of the four state-carrying pipeline families to get a T1–T5 front
  * door (near-dup pairs: [[NearDupStream]]; quantile synopsis:
  * [[SynopsisStream]]; heavy hitters: [[FreqItemsStream]]; now the ANN
  * index). [[Similarity.ivfPqIndex]] is a PURE map-side projection per
  * vector (coarse cell + PQ codes against FIXED seeds/codebooks), so a
  * batch's index rows depend on nothing but the batch itself: each
  * micro-batch of new vectors writes only its own `(neighbor_id,
  * cell_id, codes)` rows into its `batch_id=<id>` partition under
  * DYNAMIC overwrite, and the queryable index is simply the union of
  * partitions — no merge step at all, because the "merge" of per-row
  * projections is set union. A crash-replayed batch rewrites identical
  * content (T5), the stream checkpoint assigns every drop to one batch
  * (T4), and [[search]] over the streamed store is bit-identical to
  * [[Similarity.ivfPqSearch]] over a batch-built index of the same
  * corpus — which StreamingSpec pins across a kill-and-restart.
  *
  * The seeds and codebooks are the FIXED model artifacts of the
  * deployment (the q72/q77 contract: train once on a sample, persist,
  * assign forever; retraining is a reindex, not an append). 100 TB
  * shape: per batch only the new vectors are scanned and coded
  * (~8 + m bytes per row land in the store); a search's cost is the
  * probed cells' population, never the corpus; and because partitions
  * are append-shaped, compaction is an optional offline rewrite. */
object AnnIndexStream {

  /** Stream of new vectors from a parquet drop directory. */
  def readVectors(spark: SparkSession, dropDir: String,
                  schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dropDir)

  /** One micro-batch: the batch's own IVF-PQ index rows into its
    * `batch_id` partition, idempotent under checkpoint replay (cell
    * assignment and PQ coding are deterministic functions of the
    * vector and the fixed model). */
  def processBatch(batch: DataFrame, batchId: Long, seeds: DataFrame,
                   codebooks: Array[Array[Array[Float]]],
                   indexDir: String, idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit =
    Similarity.ivfPqIndex(batch, seeds, codebooks, idCol, vecCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(indexDir)

  /** Drain every pending file and stop; same `checkpointDir` resumes
    * after the last committed batch. */
  def runAvailableNow(vectors: DataFrame, seeds: DataFrame,
                      codebooks: Array[Array[Array[Float]]],
                      indexDir: String, checkpointDir: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, seeds, codebooks, indexDir,
          idCol, vecCol)
      }
      .start()

  /** The queryable index over everything ingested so far, restricted to
    * the stream checkpoint's COMMITTED batch prefix — exact even while
    * a drain is running (see [[Commits]]); the front door defaults to
    * exact-during-drain rather than opting in. Explicit schema, so an
    * index with no batches yet reads as EMPTY instead of failing
    * parquet inference. */
  def index(spark: SparkSession, indexDir: String,
            checkpointDir: String): DataFrame =
    indexRead(spark, indexDir, Some(checkpointDir))

  /** [[index]] WITHOUT commit-log filtering — for a store read away
    * from its stream. Exact only after the AvailableNow drain
    * terminates (a concurrent read can transiently observe a batch
    * whose checkpoint commit has not landed). */
  def indexUncommitted(spark: SparkSession, indexDir: String): DataFrame =
    indexRead(spark, indexDir, None)

  private def indexRead(spark: SparkSession, indexDir: String,
                        checkpointDir: Option[String]): DataFrame = {
    val schema = StructType(Seq(
      StructField("neighbor_id", LongType),
      StructField("cell_id", LongType),
      StructField("codes", ArrayType(LongType)),
      StructField("batch_id", LongType)))
    val p = new org.apache.hadoop.fs.Path(indexDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.dropRight(1)))
    else
      Commits.committedOnly(spark,
          spark.read.schema(schema).parquet(indexDir), checkpointDir)
        .select(col("neighbor_id"), col("cell_id"), col("codes"))
  }

  /** ADC search over the streamed store — exactly
    * [[Similarity.ivfPqSearch]] on the merged COMMITTED index, so
    * results are bit-identical to a batch-built index of the same
    * committed corpus. */
  def search(spark: SparkSession, indexDir: String,
             checkpointDir: String, queries: DataFrame,
             seeds: DataFrame, codebooks: Array[Array[Array[Float]]],
             k: Int, nprobe: Int = 1,
             idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame =
    Similarity.ivfPqSearch(index(spark, indexDir, checkpointDir),
      queries, seeds, codebooks, k, nprobe, idCol, vecCol)

  /** [[search]] over the unfiltered store — see [[indexUncommitted]]
    * for when that is exact. */
  def searchUncommitted(spark: SparkSession, indexDir: String,
                        queries: DataFrame, seeds: DataFrame,
                        codebooks: Array[Array[Array[Float]]],
                        k: Int, nprobe: Int = 1,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame =
    Similarity.ivfPqSearch(indexUncommitted(spark, indexDir),
      queries, seeds, codebooks, k, nprobe, idCol, vecCol)
}
