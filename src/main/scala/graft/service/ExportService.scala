package graft.service

import java.time.{Duration, Instant}

import org.apache.spark.sql.SparkSession

import graft.schema.{ExportSchema, Field}
import graft.sinks.{CsvStage, Storage, StorageSyncPoint, Warehouse}
import graft.sources.DataExportSource
import graft.transform.{ExportTransform, ValueFormat}

/** Service configuration (reference: config/config.go:141-251 defaults +
  * validation). GroupFilesByDay is the legacy alias for a 24 h duration
  * (config/config.go:174-180). */
final case class ServiceConfig(
    startTime: Instant,
    exportDuration: Duration = Duration.ofHours(1),
    exportDelay: Duration = Duration.ofHours(24),
    backoff: Duration = Duration.ofSeconds(30),
    backoffStepsMax: Int = 8,
    storageOnly: Boolean = false,
    saveAsJson: Boolean = false,
    groupFilesByDay: Boolean = false,
    includeMobile: Boolean = false,
    useStartTime: Boolean = false) {

  require(!saveAsJson || storageOnly,
    "SaveAsJson requires StorageOnly (reference: config/config.go:247-249)")

  def effectiveDuration: Duration =
    if (groupFilesByDay) Duration.ofHours(24) else exportDuration

  require(86400 % effectiveDuration.getSeconds == 0
      && effectiveDuration.getSeconds >= 900,
    "ExportDuration must be 15m..24h and evenly divide 24h " +
      "(reference: config/config.go:181-187)")
  require(exportDelay.getSeconds >= 3600,
    "ExportDelay must be >= 1h (reference: config/config.go:189-193)")
}

/** Retry classification + exponential backoff
  * (reference: internal/service.go:158-171 getRetryInfo,
  * internal/service.go:231-245 BackoffOnError). */
object RetryPolicy {
  final case class Retryable(status: Int, retryAfter: Option[Duration])
      extends RuntimeException(s"retryable: HTTP $status")

  /** Reference parity (internal/service.go:158-171): an HTTP status error
    * is fatal iff it is neither 429 nor >= 500 (Retry-After honored when
    * retryable); EVERY other failure — storage timeouts, connection
    * resets — is retryable, backed off by the loop's Backoff * 2^step
    * like the reference's BackoffOnError (internal/service.go:231-245). */
  def retryInfo(e: Throwable): Option[Duration] = e match {
    case Retryable(status, after) =>
      if (status != 429 && status < 500) None
      else Some(after.getOrElse(Duration.ZERO))
    case _ => Some(Duration.ZERO)
  }

  /** backoff * 2^step, fatal past stepsMax. Returns the sleep to take, or
    * None when the error is fatal. */
  def nextBackoff(e: Throwable, step: Int, base: Duration,
                  stepsMax: Int): Option[Duration] =
    retryInfo(e).flatMap { after =>
      if (step >= stepsMax) None
      else Some(Seq(base.multipliedBy(1L << step), after).max)
    }
}

/** Outcome of one ProcessNext step. */
sealed trait StepResult
final case class BundleProcessed(start: Instant, end: Instant,
                                 records: Long, ref: String) extends StepResult
final case class WaitFor(d: Duration) extends StepResult

/** The incremental micro-batch driver loop — the reference's engine
  * (reference: internal/service.go:247-378), re-expressed with Spark doing
  * the heavy transform:
  *
  * plan window -> watermark gate -> pushdown scan (source export) ->
  * one-select transform -> CSV/JSON staging -> warehouse load (idempotent
  * partition overwrite) -> sync-point commit.
  *
  * The load-then-checkpoint ordering plus [[Warehouse.removeOrphanedRecords]]
  * at startup reproduces the exactly-once recovery invariant
  * (reference: internal/service.go:147-154; SURVEY.md §2.8 T4/T5).
  */
class ExportService(spark: SparkSession, config: ServiceConfig,
                    source: DataExportSource, storage: Storage,
                    warehouse: Option[Warehouse],
                    valueFormat: ValueFormat = ValueFormat.Default,
                    pollInterval: Duration = Duration.ofSeconds(5),
                    now: () => Instant = () => Instant.now()) {

  private var schema: Seq[Field] = ExportSchema.canonical(config.includeMobile)

  /** Startup: create-or-reconcile the export table; the reconciled schema
    * becomes the session IR driving the source field list, transform order
    * and CSV header (reference: internal/service.go:247-266, SURVEY.md §3.2). */
  def init(): Unit = {
    // UseStartTime: discard the storage sync file so processing restarts
    // from config.StartTime (reference: warehouse/localdisk.go:27-33)
    if (config.useStartTime && config.storageOnly)
      storage.deleteFile(StorageSyncPoint.SyncFileName)
    warehouse.foreach { wh =>
      val created = wh.initExportTable(schema)
      if (!created) {
        val live = wh.getExportTableColumns()
        schema = ExportSchema.reconcileWithExisting(live, config.includeMobile)
        wh.applyExportSchema(schema)
      }
    }
  }

  def currentSchema: Seq[Field] = schema

  private def lastSyncPoint(): Option[Instant] =
    if (config.storageOnly) StorageSyncPoint.read(storage)
    else warehouse.flatMap(_.lastSyncPoint())

  /** One micro-batch (reference: ProcessNext, internal/service.go:269-360). */
  def processNext(): StepResult = {
    val lastSync = lastSyncPoint().getOrElse(config.startTime)
    val start = lastSync
    val end = ExportTransform.nextEndTime(start, config.effectiveDuration)

    // Watermark gate: only process a window once now - delay >= end
    // (reference: internal/service.go:286-294). Delays whole windows —
    // deliberately NOT a per-record withWatermark (SURVEY.md §7.4 trap 6).
    val mature = !now().isBefore(end.plus(config.exportDelay))
    if (!mature) return WaitFor(Duration.between(now(), end.plus(config.exportDelay)))

    // Submit + poll (reference: internal/service.go:297-314)
    val fields = ExportSchema.sourceFieldList(schema)
    val opId = source.createExport(start, end, fields)
    var exportId: Option[String] = None
    while (exportId.isEmpty) {
      val (_, done) = source.getExportProgress(opId)
      exportId = done
      if (exportId.isEmpty) Thread.sleep(pollInterval.toMillis)
    }

    // Fetch + transform + stage (reference: internal/service.go:317-351)
    val raw = source.getExport(exportId.get)
    val bundleName = s"${start.getEpochSecond}"
    val (ref, records) =
      if (config.saveAsJson) {
        val r = CsvStage.writeBundleJson(raw, storage, s"$bundleName.json")
        (r, raw.count())
      } else {
        val staged = ExportTransform.toStagedStrings(raw, schema, valueFormat)
        val r = CsvStage.writeBundleCsv(staged, storage, s"$bundleName.csv")
        (r, staged.count())
      }

    // Load + commit; sync point saved strictly AFTER the load so a crash
    // between the two is healed by removeOrphanedRecords on restart
    // (reference: internal/service.go:121-156, crash comment :147-150).
    if (config.storageOnly) {
      StorageSyncPoint.write(storage, end)
    } else warehouse.foreach { wh =>
      val truncateDay = isDayStart(start)
      wh.loadToWarehouse(ref, start, truncateDay)
      wh.saveSyncPoint(end)
      storage.deleteFile(s"$bundleName.csv") // staged-file cleanup (K9)
    }
    BundleProcessed(start, end, records, ref)
  }

  private def isDayStart(t: Instant): Boolean =
    t.getEpochSecond % 86400 == 0

  /** Crash recovery before the first bundle (reference: SURVEY.md §3.3):
    * heal any rows loaded past the committed sync point. */
  def recover(): Unit = warehouse.foreach { wh =>
    lastSyncPoint().foreach(wh.removeOrphanedRecords)
  }

  /** Run until caught up: process windows until the watermark gate says
    * wait (the test/batch analog of Run's infinite loop with sleeps,
    * reference: internal/service.go:362-378). Errors retry with
    * exponential backoff per RetryPolicy. */
  def runUntilCaughtUp(maxBundles: Int = Int.MaxValue): Seq[BundleProcessed] = {
    init()
    recover()
    val out = scala.collection.mutable.ArrayBuffer[BundleProcessed]()
    var step = 0
    var continue = true
    while (continue && out.size < maxBundles) {
      try {
        processNext() match {
          case b: BundleProcessed => out += b; step = 0
          case WaitFor(_) => continue = false
        }
      } catch {
        case e: Throwable =>
          RetryPolicy.nextBackoff(e, step, config.backoff,
              config.backoffStepsMax) match {
            case Some(sleep) => Thread.sleep(sleep.toMillis); step += 1
            case None => throw e
          }
      }
    }
    out.toSeq
  }
}
