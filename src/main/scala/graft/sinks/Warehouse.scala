package graft.sinks

import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.{ExportSchema, Field}

/** Warehouse-database abstraction, mirroring the reference's `Database`
  * interface (reference: warehouse/warehouse.go:43-52): export-table DDL +
  * schema evolution, bulk load from a staged object, sync-point log, and
  * crash-recovery healing.
  */
trait Warehouse {
  /** Create the export table if missing; true if created
    * (reference: redshift.go:195-212, bigquery.go:196-234). */
  def initExportTable(schema: Seq[Field]): Boolean
  /** Live ordered column list (reference: redshift.go:370-394 reads
    * information_schema ordered by ordinal_position). */
  def getExportTableColumns(): Seq[String]
  /** Append-only schema evolution (ALTER TABLE ADD COLUMN analog,
    * reference: redshift.go:214-238, bigquery.go:236-263). */
  def applyExportSchema(schema: Seq[Field]): Unit
  /** Bulk-load one staged CSV bundle. `truncateDay` reproduces BigQuery's
    * WriteTruncate for the first bundle of a day
    * (reference: bigquery.go:130-161). */
  def loadToWarehouse(csvRef: String, bundleStart: Instant,
                      truncateDay: Boolean): Unit
  /** Checkpoint log (reference: redshift.go:266-328, bigquery.go:59-128). */
  def lastSyncPoint(): Option[Instant]
  def saveSyncPoint(bundleEnd: Instant): Unit
  /** Exactly-once healing: remove rows loaded after the last committed
    * sync point (reference: redshift.go:330-354 DELETE;
    * bigquery.go:82-104 day-rewind + partition truncate). */
  def removeOrphanedRecords(syncPoint: Instant): Unit
}

/** Day-partitioned parquet warehouse — the Spark-native analog of the
  * BigQuery date-partitioned export table (reference: bigquery.go:142-151,
  * 213-226). Loads are idempotent dynamic partition overwrites, which is
  * the Spark-native exactly-once strategy (SURVEY.md §7.4 trap 1): a
  * replayed bundle replaces, never duplicates.
  *
  * Live column order is tracked in a `_columns.json` metadata object
  * (the information_schema analog); data files never rewrite on schema
  * append — readers null-fill missing trailing columns, exactly hauser's
  * append-only evolution.
  */
class ParquetWarehouse(spark: SparkSession, tablePath: String)
    extends Warehouse {

  private val storage: Storage = new HadoopStorage(tablePath)
  private val ColumnsMeta = "_columns.json"
  private val SyncTable = "_sync"
  private val dataPath = s"$tablePath/data"
  protected val syncPath = s"$tablePath/$SyncTable"

  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  private def dayOf(t: Instant): String =
    t.atOffset(ZoneOffset.UTC).toLocalDate.toString

  override def initExportTable(schema: Seq[Field]): Boolean = {
    if (storage.exists(ColumnsMeta)) false
    else {
      writeColumns(schema)
      true
    }
  }

  // _columns.json is the information_schema analog: ordered {name, type}
  // objects (type = Spark catalogString). Legacy metadata was a bare name
  // array — still readable, with types surfacing as NullType ("unknown").
  private def writeColumns(fields: Seq[Field]): Unit = {
    val json = fields.map(f =>
      s"""{"name":"${f.dbName}","type":"${f.dataType.catalogString}"}""")
      .mkString("[", ",", "]")
    storage.saveContent(ColumnsMeta, json)
    ()
  }

  /** Live ordered columns WITH types — the type-aware reconciliation input
    * (reference: warehouse/bigquery.go:163-194 reads the live table schema,
    * not just names). */
  def getExportTableFields(): Seq[Field] =
    storage.readContent(ColumnsMeta) match {
      case None => Seq.empty
      case Some(json) if json.trim.startsWith("[{") =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val arr = mapper.readTree(json)
        (0 until arr.size).map { i =>
          val n = arr.get(i)
          val dt = scala.util.Try(
            org.apache.spark.sql.types.DataType.fromDDL(
              n.get("type").asText())).getOrElse(
                org.apache.spark.sql.types.NullType)
          Field(n.get("name").asText(), "", dt)
        }
      case Some(json) => // legacy bare-name array
        json.trim.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
          .toSeq.map(c => Field(c, "", org.apache.spark.sql.types.NullType))
    }

  override def getExportTableColumns(): Seq[String] =
    getExportTableFields().map(_.dbName)

  override def applyExportSchema(schema: Seq[Field]): Unit = {
    val live = getExportTableFields()
    require(ExportSchema.isCompatibleWith(live, schema),
      s"incompatible live schema: ${live.map(f =>
        s"${f.dbName}:${f.dataType.catalogString}")} vs ${schema.map(f =>
        s"${f.dbName}:${f.dataType.catalogString}")}")
    writeColumns(schema)
  }

  override def loadToWarehouse(csvRef: String, bundleStart: Instant,
                               truncateDay: Boolean): Unit = {
    val cols = getExportTableColumns()
    // Explicit all-string schema: never infer (an empty bundle stages an
    // empty file, which has no header row to infer from).
    val stagedSchema = org.apache.spark.sql.types.StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType)))
    val staged = spark.read
      .option("header", "true").option("escape", "\"")
      .schema(stagedSchema)
      .csv(csvRef)
    // null-fill columns the staged file predates (append-only evolution)
    val aligned = staged.select(cols.map(c =>
      (if (staged.columns.contains(c)) col(c) else lit(null).cast("string"))
        .as(c)): _*)
      .na.fill("", cols.toArray)
      .withColumn("day", lit(dayOf(bundleStart)))
    val mode = if (truncateDay) SaveMode.Overwrite else SaveMode.Append
    aligned.write.mode(mode).partitionBy("day").parquet(dataPath)
  }

  def readTable(): DataFrame = spark.read.parquet(dataPath)

  override def lastSyncPoint(): Option[Instant] = {
    if (!new java.io.File(syncPath).exists() &&
        !storage.exists(SyncTable)) return None
    try {
      val row = spark.read.parquet(syncPath)
        .agg(max(col("BundleEndTime")).as("m")).collect()(0)
      Option(row.getAs[java.sql.Timestamp]("m")).map(_.toInstant)
    } catch { case _: Exception => None }
  }

  override def saveSyncPoint(bundleEnd: Instant): Unit = {
    import spark.implicits._
    // (ID=-1, Processed=now, BundleEndTime) — reference: redshift.go:275-276
    Seq((-1L, java.sql.Timestamp.from(Instant.now()),
        java.sql.Timestamp.from(bundleEnd)))
      .toDF("ID", "Processed", "BundleEndTime")
      .write.mode(SaveMode.Append).parquet(syncPath)
  }

  /** Max EventStart in the live table (reference: redshift.go:342). The
    * staged strings use Go's zero-trimmed RFC3339, which is not
    * lexicographically time-ordered — parse before comparing. */
  def maxEventStart(): Option[Instant] = {
    try {
      val row = readTable()
        .agg(max(to_timestamp(col("EventStart"))).as("m")).collect()(0)
      Option(row.getAs[java.sql.Timestamp]("m")).map(_.toInstant)
    } catch { case _: Exception => None }
  }

  /** Partition-expiration TTL: drop day partitions older than
    * `retentionDays` relative to `asOf` — the maintenance-job analog of
    * BigQuery's table partition expiration
    * (reference: warehouse/bigquery.go:213-226,343-351; SURVEY.md §4 notes
    * the TTL needs a small job, not a Catalyst rule). Partition-dir deletes
    * only; no data rewrite. */
  def expirePartitions(retentionDays: Int, asOf: Instant): Int = {
    val cutoff = asOf.atOffset(ZoneOffset.UTC).toLocalDate
      .minusDays(retentionDays).toString
    val base = new org.apache.hadoop.fs.Path(dataPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return 0
    val expired = fs.listStatus(base)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("day=") &&
          p.getName.stripPrefix("day=") < cutoff
      }
    expired.foreach(p => fs.delete(p, true))
    expired.length
  }

  override def removeOrphanedRecords(syncPoint: Instant): Unit = {
    val orphaned = maxEventStart().exists(_.isAfter(syncPoint))
    if (orphaned) {
      // Redshift-flavor healing: partition-scoped DELETE WHERE. The
      // BigQuery flavor ([[BigQueryParquetWarehouse]]) instead rewinds the
      // sync point and truncates on reload.
      // Rewrite only the affected day partitions, keeping rows at or
      // before the sync point — a partition-scoped DELETE WHERE
      // (reference: redshift.go:284-294; Spark-native per SURVEY.md §2.5).
      val day = dayOf(syncPoint)
      // Materialize survivors (localCheckpoint — Spark won't overwrite a
      // path it is reading from), drop the affected partition directories,
      // append survivors back. A dynamic partition overwrite alone cannot
      // EMPTY a partition: writing zero rows replaces nothing.
      val affectedDays = readTable().filter(col("day") >= day)
        .select(col("day").cast("string")) // partition col reads as DateType
        .distinct().collect().map(_.getString(0))
      val healed = readTable()
        .filter(col("day") >= day)
        .filter(to_timestamp(col("EventStart")) <= lit(syncPoint.toString)
          .cast("timestamp"))
        .localCheckpoint(true)
      val base = new org.apache.hadoop.fs.Path(dataPath)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      affectedDays.foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(base, s"day=$d"), true)
      }
      healed.write.mode(SaveMode.Append).partitionBy("day").parquet(dataPath)
    }
  }
}

/** BigQuery-flavor recovery on the day-partitioned parquet warehouse —
  * the reference's second exactly-once strategy, executable
  * (reference: warehouse/bigquery.go:82-104 day-rewind LastSyncPoint,
  * :147-151 WriteTruncate on the first bundle of the day, :392-405
  * removeSyncPointsAfter).
  *
  * Partitioned tables take no row-wise DELETE, so when leftover records
  * are found past the committed sync point (a load that crashed before
  * its sync write), recovery REWINDS the sync point to the start of that
  * day and removes later sync rows; the service then re-exports from the
  * day boundary and the first bundle of the day loads with
  * WriteTruncate ([[ParquetWarehouse.loadToWarehouse]] `truncateDay`),
  * replacing the partition — cleanup happens on load, not at recovery
  * time. [[removeOrphanedRecords]] is accordingly a no-op. */
class BigQueryParquetWarehouse(spark: SparkSession, tablePath: String)
    extends ParquetWarehouse(spark, tablePath) {

  override def lastSyncPoint(): Option[Instant] =
    super.lastSyncPoint().map { t =>
      if (!maxEventStart().exists(_.isAfter(t))) t
      else {
        // leftover data past the sync point: rewind to the first instant
        // of its day; the day's first reloaded bundle truncates the
        // partition (reference: bigquery.go:95-103)
        val dayStart = t.truncatedTo(java.time.temporal.ChronoUnit.DAYS)
        removeSyncPointsAfter(dayStart)
        dayStart
      }
    }

  /** Drop sync rows past the rewound point
    * (reference: bigquery.go:392-405). */
  private def removeSyncPointsAfter(t: Instant): Unit = {
    val survivors = spark.read.parquet(syncPath)
      .filter(col("BundleEndTime") <= lit(java.sql.Timestamp.from(t)))
      .localCheckpoint(true) // Spark won't overwrite a path it reads from
    survivors.write.mode(SaveMode.Overwrite).parquet(syncPath)
  }

  /** Cleanup occurs on load (WriteTruncate), never as a DELETE. */
  override def removeOrphanedRecords(syncPoint: Instant): Unit = ()
}
