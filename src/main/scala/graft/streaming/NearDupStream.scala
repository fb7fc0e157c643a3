package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Streaming face of the incremental MinHash-LSH near-dup lifecycle —
  * the one LLM-pipeline operator family that previously had no T1–T5
  * front door. Mirrors the reference's micro-batch service loop
  * (`internal/service.go:362-378`: fetch → transform → load → commit
  * sync point) with Structured Streaming primitives:
  *
  *   - T1 micro-batch loop: a parquet file stream +
  *     `Trigger.AvailableNow` + `foreachBatch` — each drop of new
  *     documents is one micro-batch;
  *   - T4 checkpoint log: the stream checkpoint assigns every input
  *     file to exactly one batch id and survives restarts, so a killed
  *     run resumes at the first uncommitted batch;
  *   - T5 exactly-once: each batch's outputs land in their own
  *     `batch_id=<id>` partition via DYNAMIC partition overwrite, so a
  *     crash-replayed batch REWRITES its own partitions instead of
  *     appending duplicates (the same idempotent-rewrite contract as
  *     [[EventStream.upsertBatch]] and the batch service's day
  *     overwrite);
  *   - T8 ordering: batches are processed sequentially in arrival
  *     order, so the historical index a batch joins against is exactly
  *     the corpus as of the previous commit.
  *
  * Per batch, the work is [[Dedup.minhashIndex]] once over the new
  * documents plus [[Dedup.minhashLshPairsIncremental]] against the
  * persisted parquet index — the historical corpus is never
  * re-signatured, only the band buckets the new batch touches move —
  * and the batch's own index rows are appended (as their partition) for
  * the next batch. This is the q65/q70 differential run continuously:
  * the union of per-batch pair outputs equals the batch pair set over
  * everything ingested, which StreamingSpec pins against the q65 oracle
  * across a kill-and-restart.
  *
  * 100 TB shape: per batch, only the new documents are scanned and
  * signatured; the index join is a banded equi-join whose index side
  * prunes to the touched band partitions; no stage ever forms an
  * all-pairs product, and state lives in parquet (not executor memory),
  * so a restart is free.
  */
object NearDupStream {

  /** Stream of new documents from a parquet drop directory (the
    * ingest contract: a producer moves finished parquet files in;
    * the checkpoint assigns each file to exactly one batch). */
  def readDocs(spark: SparkSession, dropDir: String,
               schema: StructType,
               maxFilesPerTrigger: Int = Int.MaxValue): DataFrame = {
    val r = spark.readStream.schema(schema)
    (if (maxFilesPerTrigger == Int.MaxValue) r
     else r.option("maxFilesPerTrigger", maxFilesPerTrigger))
      .parquet(dropDir)
  }

  /** One micro-batch of the lifecycle, IDEMPOTENT under checkpoint
    * replay. The historical side is every index partition with
    * `batch_id < batchId` — on a crash replay the index dir may already
    * hold this batch's own partition (written before the checkpoint
    * commit), and the partition-pruned filter keeps the replay
    * bit-identical. Write order matters for the same reason: pairs
    * first, then the index rows, each into its own `batch_id=<id>`
    * partition under dynamic overwrite — whichever write a crash
    * interrupts is simply rewritten with identical content. */
  def processBatch(batch: DataFrame, batchId: Long,
                   idCol: String, textCol: String,
                   indexDir: String, pairsDir: String,
                   k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                   threshold: Double = 0.5, fast: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    try {
    // pinned HERE so the CPU-dominant signature pass runs once per batch
    // and serves both the pair join and the index write (the join's own
    // re-pin of an already-checkpointed frame is a cheap copy, not a
    // recompute)
    val newIdx = graft.operators.Materializer.Local(
      Dedup.minhashIndex(batch, idCol, textCol, k, bands, shingleN, fast))
    // explicit schema (the new batch's own index schema + the partition
    // column): an index dir whose batches were all empty has no data
    // files, and schema inference would throw — permanently, since every
    // checkpoint replay re-hits it — where an explicit schema reads an
    // empty frame and the stream progresses
    val hist =
      if (dirExists(spark, indexDir))
        spark.read.schema(newIdx.schema.add("batch_id", "long"))
          .parquet(indexDir)
          .filter(col("batch_id") < batchId).drop("batch_id")
      else newIdx.limit(0)
    // DYNAMIC overwrite as a WRITER option, not a session conf: the
    // setting must scope to these two writes only (a session-wide
    // conf.set would silently change overwrite semantics for every
    // later static-overwrite write in the same session)
    Dedup.minhashLshPairsIncremental(newIdx, hist, threshold)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(pairsDir)
    newIdx.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(indexDir)
    } finally {
      // release ONLY the blocks this batch pinned (newIdx plus the
      // incremental join's internal checkpoints): a long-lived stream
      // would otherwise accumulate executor storage for the session's
      // life, and the delta filter keeps a shared session's own pins
      // untouched
      val after = spark.sparkContext.getPersistentRDDs
      after.keySet.filterNot(pinnedBefore.contains).foreach(id =>
        after.get(id).foreach(r =>
          try r.unpersist(blocking = false)
          catch { case _: Throwable => () }))
    }
  }

  /** Filesystem-agnostic directory existence (java.io.File would
    * silently report absent on HDFS/S3 — the 100 TB deployment shape —
    * and every cross-batch pair would go missing without an error). */
  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Drain every pending file and stop (the AvailableNow lifecycle —
    * the same "run until caught up, then exit" contract as the batch
    * service loop). Restart-safe: same `checkpointDir` resumes after
    * the last committed batch. */
  def runAvailableNow(docs: DataFrame, idCol: String, textCol: String,
                      indexDir: String, pairsDir: String,
                      checkpointDir: String,
                      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                      threshold: Double = 0.5,
                      fast: Boolean = true): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, pairsDir,
          k, bands, shingleN, threshold, fast)
      }
      .start()

  /** The confirmed-pair log accumulated so far (pairs are emitted in
    * exactly one batch — the one where the later member arrived — so
    * the log needs no dedup), restricted to the stream checkpoint's
    * COMMITTED batch prefix — exact even while a drain is running (see
    * [[Commits]]); this is the front door, so exact-during-drain is the
    * default rather than an opt-in. `pairSchema` is the non-partition
    * part of the log's schema: passing it explicitly means a log whose
    * batches produced no pair yet (data-file-less dir, or no dir at
    * all) reads as an EMPTY frame instead of failing parquet schema
    * inference. */
  def confirmedPairs(spark: SparkSession, pairsDir: String,
                     checkpointDir: String,
                     pairSchema: StructType = defaultPairSchema): DataFrame =
    confirmedPairsRead(spark, pairsDir, pairSchema, Some(checkpointDir))

  /** [[confirmedPairs]] WITHOUT commit-log filtering — for a store read
    * away from its stream (the checkpoint dir unreachable). Exact only
    * after the AvailableNow drain terminates: concurrent with a drain
    * it can transiently observe a batch whose commit has not landed. */
  def confirmedPairsUncommitted(spark: SparkSession, pairsDir: String,
                                pairSchema: StructType = defaultPairSchema)
      : DataFrame =
    confirmedPairsRead(spark, pairsDir, pairSchema, None)

  private def confirmedPairsRead(spark: SparkSession, pairsDir: String,
                                 pairSchema: StructType,
                                 checkpointDir: Option[String]): DataFrame =
    if (!dirExists(spark, pairsDir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema)
    else
      Commits.committedOnly(spark,
          spark.read.schema(pairSchema.add("batch_id", "long"))
            .parquet(pairsDir), checkpointDir)
        .select(col("a_id"), col("b_id"), col("sim"))

  /** (a_id, b_id, sim) for the engine's numeric doc ids. */
  def defaultPairSchema: StructType =
    StructType(Seq(
      org.apache.spark.sql.types.StructField("a_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sim",
        org.apache.spark.sql.types.DoubleType)))
}
