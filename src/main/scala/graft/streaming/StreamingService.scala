package graft.streaming

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.schema.ExportSchema
import graft.service.ServiceConfig
import graft.sinks.{CsvStage, Storage, Warehouse}
import graft.transform.{ExportTransform, ValueFormat}

/** Structured-Streaming front door for the CLI's incremental lifecycle
  * (`Mode = "streaming"`): the same contract as
  * [[graft.service.ExportService.runUntilCaughtUp]], expressed as a file
  * stream + `Trigger.AvailableNow` + `foreachBatch` instead of a
  * hand-rolled poll loop (SURVEY.md §7.1-6).
  *
  * Parity with the batch loop, piece by piece:
  *   - the EXPORT WINDOW maturity gate (now - delay >= window end) bounds
  *     what is processed, exactly like processNext — records at or past
  *     the last mature window end stay unread for the next invocation;
  *   - each micro-batch stages RFC4180 CSV per day and loads through the
  *     same [[graft.sinks.Warehouse]] bulk-load path the batch loop uses;
  *   - recovery-then-load-then-commit ordering is preserved: orphaned rows
  *     are healed up front, the sync point is written only after the
  *     stream fully drains, so a crash mid-stream is healed by the next
  *     run (batch or streaming — the sync protocol is shared);
  *   - the committed sync point is THE SAME instant the batch loop would
  *     commit: the last mature window end (pinned by MainSpec).
  *
  * The streaming source is the SAME DSv2 connector the batch path scans
  * with (`graft-export`, micro-batch capability): gzip bundle sniffing,
  * token-streaming decode, unknown-field spillover into CustomVars, and
  * EventStart range pushdown all behave identically in both execution
  * modes — one connector, two front doors.
  */
object StreamingService {

  /** Drain all mature raw bundles and commit the batch-equivalent sync
    * point. Returns the committed sync point, or None when no window is
    * mature yet (the streaming WaitFor). */
  def runAvailableNow(spark: SparkSession, config: ServiceConfig,
                      rawDir: String, storage: Storage,
                      warehouse: Warehouse, checkpointDir: String,
                      now: () => Instant = () => Instant.now())
      : Option[Instant] = {
    // schema init + reconcile, as ExportService.init
    var schema = ExportSchema.canonical(config.includeMobile)
    if (!warehouse.initExportTable(schema)) {
      val live = warehouse.getExportTableColumns()
      schema = ExportSchema.reconcileWithExisting(live, config.includeMobile)
      warehouse.applyExportSchema(schema)
    }

    // recovery before loading, as ExportService.recover
    val lastSync = warehouse.lastSyncPoint().getOrElse(config.startTime)
    warehouse.removeOrphanedRecords(lastSync)

    // maturity gate: the largest window end with now - delay >= end — the
    // batch loop's final committed sync point
    val dur = config.effectiveDuration
    var end = ExportTransform.nextEndTime(lastSync, dur)
    if (now().isBefore(end.plus(config.exportDelay))) return None
    var syncEnd = end
    while (!now().isBefore(
        ExportTransform.nextEndTime(syncEnd, dur).plus(config.exportDelay)))
      syncEnd = ExportTransform.nextEndTime(syncEnd, dur)

    // micro-batch stream over raw bundles through the DSv2 connector,
    // gated to [lastSync, syncEnd) — the range predicate is pushed into
    // the bundle decode exactly as in the batch scan
    // the range rides as source OPTIONS (streaming scans get no filter
    // pushdown from Catalyst); the post-scan filter restates the same
    // bounds as a cheap semantic guard
    val raw = spark.readStream
      .format("graft-export")
      .option("startTime", lastSync.toString)
      .option("endTime", syncEnd.toString)
      .load(rawDir)
      .filter(col("EventStart") >= lit(lastSync.toString).cast("timestamp")
        && col("EventStart") < lit(syncEnd.toString).cast("timestamp"))
    val staged = ExportTransform.toStagedStrings(raw, schema,
      ValueFormat.Default)

    val query = staged.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // one staged CSV + bulk load per day in the batch, through the
        // same Warehouse path as the batch loop (bundleStart = day start
        // places rows in their day partition; appends-then-commit keeps
        // the orphan-healing contract on crash)
        val days = batch
          .select(to_date(to_timestamp(col("EventStart"))).cast("string")
            .as("d"))
          .where(col("d").isNotNull).distinct().collect().map(_.getString(0))
        days.sorted.foreach { day =>
          val dayRows = batch.filter(
            to_date(to_timestamp(col("EventStart"))) === lit(day))
          val name = s"stream_${id}_$day.csv"
          val ref = CsvStage.writeBundleCsv(dayRows, storage, name)
          warehouse.loadToWarehouse(ref, Instant.parse(s"${day}T00:00:00Z"),
            truncateDay = false)
          storage.deleteFile(name) // staged-file cleanup (K9)
        }
      }
      .start()
    query.awaitTermination()

    // commit strictly after the stream drains (load-then-checkpoint)
    warehouse.saveSyncPoint(syncEnd)
    Some(syncEnd)
  }
}
