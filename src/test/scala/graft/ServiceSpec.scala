package graft

import java.nio.file.{Files, Path}
import java.time.{Duration, Instant}

import org.apache.spark.sql.functions._

import graft.service.{BundleProcessed, ExportService, RetryPolicy, ServiceConfig}
import graft.sinks.{HadoopStorage, ParquetWarehouse, StorageSyncPoint}
import graft.sources.LocalFixtureSource

/** End-to-end service-loop tests: the analog of the reference's golden-file
  * e2e (internal/service_test.go TestHauser scenarios, re-derived with a
  * locally generated fixture). */
class ServiceSpec extends SparkSpec {

  private val frozenNow = Instant.parse("2020-09-01T00:00:00Z")
  private val startTime = Instant.parse("2020-08-27T00:00:00Z")

  /** 3 days x 2 records of raw export JSON, plus custom vars. */
  private def writeFixture(dir: Path): String = {
    val records = (0 until 3).flatMap { day =>
      val d = f"2020-08-${27 + day}%02d"
      Seq(
        s"""{"EventStart": "${d}T06:20:26.900Z", "EventType": "click",
           | "UserId": ${100 + day}, "PageUrl": "https://x.test/$day",
           | "evt_foo_str": "v$day"}""".stripMargin.replace("\n", ""),
        s"""{"EventStart": "${d}T18:00:00Z", "EventType": "custom",
           | "UserId": ${200 + day}, "PageUrl": "https://y.test/$day",
           | "evt_price_real": ${day}.5}""".stripMargin.replace("\n", ""))
    }
    val f = dir.resolve("raw.json")
    Files.writeString(f, records.mkString("[", ",\n", "]"))
    f.toString
  }

  private def newService(tmp: Path, storageOnly: Boolean = false,
                         saveAsJson: Boolean = false) = {
    val fixture = writeFixture(tmp)
    val storage = new HadoopStorage(tmp.resolve("stage").toString)
    val wh = if (storageOnly) None
      else Some(new ParquetWarehouse(spark, tmp.resolve("wh").toString))
    val config = ServiceConfig(startTime = startTime,
      exportDuration = Duration.ofHours(24), storageOnly = storageOnly,
      saveAsJson = saveAsJson)
    val svc = new ExportService(spark, config,
      new LocalFixtureSource(spark, fixture), storage, wh,
      pollInterval = Duration.ofMillis(1), now = () => frozenNow)
    (svc, storage, wh)
  }

  test("steady-state loop: 5 mature daily bundles, load + sync commit") {
    val tmp = Files.createTempDirectory("graft-e2e")
    val (svc, storage, Some(wh)) = newService(tmp): @unchecked
    val bundles = svc.runUntilCaughtUp()
    // watermark: now=09-01, delay 24h => windows ending up to 08-31 mature:
    // 08-27, 08-28, 08-29, 08-30, 08-31 ends => 5 bundles from start 08-27
    assert(bundles.size == 4)
    assert(bundles.head.start == startTime)
    assert(bundles.last.end == Instant.parse("2020-08-31T00:00:00Z"))
    // warehouse got all 6 records (3 days data within mature windows)
    assert(wh.readTable().count() == 6)
    // sync advanced to last mature end
    assert(wh.lastSyncPoint().contains(Instant.parse("2020-08-31T00:00:00Z")))
    // staged files were cleaned up after load (K9)
    assert(!storage.exists(s"${startTime.getEpochSecond}.csv"))
    // table contains transformed staged strings in live order
    val row = wh.readTable().filter(col("UserId") === "100").collect()(0)
    assert(row.getAs[String]("EventStart") == "2020-08-27T06:20:26.9Z")
    assert(row.getAs[String]("CustomVars").contains("\"evt_foo_str\":\"v0\""))
  }

  test("empty windows still produce bundles (header-only loads)") {
    val tmp = Files.createTempDirectory("graft-e2e-empty")
    val (svc, _, Some(wh)) = newService(tmp): @unchecked
    val bundles = svc.runUntilCaughtUp()
    // day 08-30 has no records but is still processed
    val emptyBundle = bundles.find(
      _.start == Instant.parse("2020-08-30T00:00:00Z"))
    assert(emptyBundle.exists(_.records == 0))
  }

  test("storage-only + SaveAsJson: raw JSON bundles, file sync point") {
    val tmp = Files.createTempDirectory("graft-e2e-json")
    val (svc, storage, _) = newService(tmp, storageOnly = true,
      saveAsJson = true)
    val bundles = svc.runUntilCaughtUp()
    assert(bundles.size == 4)
    val day0 = storage.readContent(s"${startTime.getEpochSecond}.json").get
    assert(day0.startsWith("[") && day0.contains("\"evt_foo_str\":\"v0\""))
    // empty bundle renders as the empty JSON array
    val empty = storage.readContent(
      s"${Instant.parse("2020-08-30T00:00:00Z").getEpochSecond}.json").get
    assert(empty == "[]")
    assert(StorageSyncPoint.read(storage)
      .contains(Instant.parse("2020-08-31T00:00:00Z")))
  }

  test("watermark gate: immature window returns a wait") {
    val tmp = Files.createTempDirectory("graft-e2e-wait")
    val (svc, _, _) = newService(tmp)
    svc.runUntilCaughtUp()
    val res = svc.processNext()
    assert(res.isInstanceOf[graft.service.WaitFor])
  }

  test("crash recovery: orphaned rows past the sync point are healed") {
    val tmp = Files.createTempDirectory("graft-e2e-heal")
    val (svc, _, Some(wh)) = newService(tmp): @unchecked
    svc.runUntilCaughtUp()
    val before = wh.readTable().count()
    // simulate a load that committed without its sync point: inject rows
    // with EventStart beyond the checkpoint
    val s = spark
    import s.implicits._
    val cols = wh.getExportTableColumns()
    val orphan = ExportSchemaRow.blankRow(spark, cols,
      "EventStart" -> "2020-08-31T09:00:00Z", "UserId" -> "999")
      .withColumn("day", lit("2020-08-31"))
    orphan.write.mode("append").partitionBy("day")
      .parquet(tmp.resolve("wh").resolve("data").toString)
    assert(wh.readTable().count() == before + 1)
    svc.recover()
    assert(wh.readTable().count() == before)
    assert(wh.readTable().filter(col("UserId") === "999").count() == 0)
  }

  test("BigQuery-flavor crash recovery: day-rewind sync point, truncate-on-reload") {
    // Mirrors "crash recovery" above, but healing happens the BigQuery way
    // (reference: bigquery.go:82-104,147-151): no DELETE — the sync point
    // rewinds to the day boundary and the day's first reloaded bundle
    // WriteTruncates the partition.
    val tmp = Files.createTempDirectory("graft-e2e-bq")
    val fixture = writeFixture(tmp)
    val storage = new HadoopStorage(tmp.resolve("stage").toString)
    val wh = new graft.sinks.BigQueryParquetWarehouse(spark,
      tmp.resolve("wh").toString)
    val config = ServiceConfig(startTime = startTime,
      exportDuration = Duration.ofHours(24))
    def svc() = new ExportService(spark, config,
      new LocalFixtureSource(spark, fixture), storage, Some(wh),
      pollInterval = Duration.ofMillis(1), now = () => frozenNow)

    // load day 1 only, then simulate a crashed day-2 load: rows landed in
    // the 08-28 partition but the sync point was never written
    svc().runUntilCaughtUp(maxBundles = 1)
    assert(wh.lastSyncPoint()
      .contains(Instant.parse("2020-08-28T00:00:00Z")))
    val dayOne = wh.readTable().count()
    val cols = wh.getExportTableColumns()
    val orphan = ExportSchemaRow.blankRow(spark, cols,
      "EventStart" -> "2020-08-28T09:00:00Z", "UserId" -> "999")
      .withColumn("day", lit("2020-08-28"))
    orphan.write.mode("append").partitionBy("day")
      .parquet(tmp.resolve("wh").resolve("data").toString)

    // the rewound sync point is the day boundary (here: unchanged, already
    // midnight) and removeOrphanedRecords deletes nothing
    wh.removeOrphanedRecords(Instant.parse("2020-08-28T00:00:00Z"))
    assert(wh.readTable().filter(col("UserId") === "999").count() == 1)

    // catch-up re-exports from the day boundary; the first bundle of the
    // day truncates the partition, so the orphan vanishes without DELETE
    val bundles = svc().runUntilCaughtUp()
    assert(bundles.nonEmpty &&
      bundles.head.start == Instant.parse("2020-08-28T00:00:00Z"))
    assert(wh.readTable().filter(col("UserId") === "999").count() == 0)
    assert(wh.readTable().count() == 6) // all fixture records, no dupes
    assert(wh.lastSyncPoint()
      .contains(Instant.parse("2020-08-31T00:00:00Z")))
    assert(wh.readTable().count() >= dayOne)

    // mid-day rewind: a sync point at 12:00 with leftover rows past it
    // rewinds to the day start and drops the later sync row
    wh.saveSyncPoint(Instant.parse("2020-08-31T12:00:00Z"))
    val leftover = ExportSchemaRow.blankRow(spark, cols,
      "EventStart" -> "2020-08-31T15:00:00Z", "UserId" -> "998")
      .withColumn("day", lit("2020-08-31"))
    leftover.write.mode("append").partitionBy("day")
      .parquet(tmp.resolve("wh").resolve("data").toString)
    assert(wh.lastSyncPoint()
      .contains(Instant.parse("2020-08-31T00:00:00Z")))
    // idempotent: the rewound point is stable across calls
    assert(wh.lastSyncPoint()
      .contains(Instant.parse("2020-08-31T00:00:00Z")))
  }

  test("warehouse metadata is type-aware: retype rejected, legacy names upgraded") {
    val tmp = Files.createTempDirectory("graft-e2e-types")
    val wh = new graft.sinks.ParquetWarehouse(spark,
      tmp.resolve("wh").toString)
    val schema = graft.schema.ExportSchema.baseFields
    assert(wh.initExportTable(schema))
    // live metadata now carries types per ordinal
    val live = wh.getExportTableFields()
    assert(live.map(_.dbName) == schema.map(_.dbName))
    assert(live.find(_.dbName == "EventStart")
      .exists(_.dataType == org.apache.spark.sql.types.TimestampType))
    // append-only evolution still works
    wh.applyExportSchema(schema :+ graft.schema.Field("Extra", "Extra",
      org.apache.spark.sql.types.StringType))
    assert(wh.getExportTableColumns().last == "Extra")
    // a retyped live column is rejected, not silently reconciled
    val retyped = wh.getExportTableFields().map(f =>
      if (f.dbName == "EventStart")
        f.copy(dataType = org.apache.spark.sql.types.StringType) else f)
    intercept[IllegalArgumentException] { wh.applyExportSchema(retyped) }
    // legacy name-only metadata reads with unknown types and stays usable
    val storage = new graft.sinks.HadoopStorage(tmp.resolve("wh").toString)
    storage.saveContent("_columns.json", """["IndvId","UserId"]""")
    val legacy = wh.getExportTableFields()
    assert(legacy.map(_.dbName) == Seq("IndvId", "UserId"))
    assert(legacy.forall(_.dataType == org.apache.spark.sql.types.NullType))
    wh.applyExportSchema(schema) // name-prefix compatible -> upgrades format
    assert(wh.getExportTableFields().head.dataType ==
      org.apache.spark.sql.types.LongType) // IndvId, typed again
  }

  test("DSv2-backed source drives the same pipeline (pushdown into the scan)") {
    val tmp = Files.createTempDirectory("graft-e2e-dsv2")
    writeFixture(tmp)
    val storage = new HadoopStorage(tmp.resolve("stage").toString)
    val wh = new ParquetWarehouse(spark, tmp.resolve("wh").toString)
    val config = ServiceConfig(startTime = startTime,
      exportDuration = Duration.ofHours(24))
    val svc = new ExportService(spark, config,
      new graft.sources.Dsv2ExportSource(spark, tmp.resolve("raw.json").toString),
      storage, Some(wh),
      pollInterval = Duration.ofMillis(1), now = () => frozenNow)
    val bundles = svc.runUntilCaughtUp()
    assert(bundles.size == 4)
    assert(wh.readTable().count() == 6)
    val row = wh.readTable().filter(col("UserId") === "100").collect()(0)
    assert(row.getAs[String]("EventStart") == "2020-08-27T06:20:26.9Z")
    assert(row.getAs[String]("CustomVars").contains("\"evt_foo_str\":\"v0\""))
  }

  test("golden-file byte parity: staged CSV matches the pinned golden") {
    // the reference's primary e2e style (byte-equality of every uploaded
    // bundle against goldens, internal/service_test.go:179-191) — one
    // pinned bundle covering Go timestamp trim, RFC4180 quote doubling,
    // newline sanitization, empty cells, custom-var JSON
    val tmp = Files.createTempDirectory("graft-golden")
    val records = Seq(
      """{"EventStart": "2020-08-27T06:20:26.900Z", "EventType": "click",
        | "UserId": 100, "PageUrl": "https://x.test/a,b",
        | "EventTargetText": "line1\nline2", "evt_foo_str": "bar"}"""
        .stripMargin.replace("\n ", ""),
      """{"EventStart": "2020-08-27T18:00:00Z", "EventType": "custom",
        | "UserId": 200, "PageUrl": "https://y.test/q",
        | "evt_price_real": 0.5}""".stripMargin.replace("\n ", ""))
    Files.writeString(tmp.resolve("raw.json"), records.mkString("[", ",\n", "]"))
    val storage = new HadoopStorage(tmp.resolve("stage").toString)
    val config = ServiceConfig(startTime = startTime,
      exportDuration = Duration.ofHours(24), storageOnly = true)
    val svc = new ExportService(spark, config,
      new LocalFixtureSource(spark, tmp.resolve("raw.json").toString),
      storage, None, pollInterval = Duration.ofMillis(1),
      now = () => frozenNow)
    svc.runUntilCaughtUp()
    val got = storage.readContent("1598486400.csv").get
    val golden = new String(
      getClass.getResourceAsStream("/golden/1598486400.csv").readAllBytes(),
      "UTF-8")
    assert(got.stripLineEnd == golden.stripLineEnd)
  }

  test("ConfigLoader: reference defaults, deprecations, constraint checks") {
    val cfg = graft.service.ConfigLoader.parse(
      """# hauser-style config
        |StartTime = "2020-08-26T00:00:00Z"
        |GroupFilesByDay = true
        |StorageOnly = true
        |SaveAsJson = true
        |Backoff = "30s"
        |""".stripMargin)
    assert(cfg.effectiveDuration == Duration.ofHours(24)) // legacy alias
    assert(cfg.exportDelay == Duration.ofHours(24))       // default
    assert(cfg.backoffStepsMax == 8)                      // default
    assert(cfg.saveAsJson && cfg.storageOnly)
    // SaveAsJson without StorageOnly violates config/config.go:247-249
    intercept[IllegalArgumentException] {
      graft.service.ConfigLoader.parse("SaveAsJson = true")
    }
    // sub-15m or non-divisor durations are rejected (config.go:181-187)
    intercept[IllegalArgumentException] {
      graft.service.ConfigLoader.parse("ExportDuration = \"10m\"")
    }
    intercept[IllegalArgumentException] {
      graft.service.ConfigLoader.parse("ExportDuration = \"7h\"")
    }
  }

  test("UseStartTime resets the storage sync point at init") {
    val tmp = Files.createTempDirectory("graft-usestart")
    writeFixture(tmp)
    val storage = new HadoopStorage(tmp.resolve("stage").toString)
    StorageSyncPoint.write(storage, Instant.parse("2020-08-30T00:00:00Z"))
    val config = ServiceConfig(startTime = startTime,
      exportDuration = Duration.ofHours(24), storageOnly = true,
      useStartTime = true)
    val svc = new ExportService(spark, config,
      new LocalFixtureSource(spark, tmp.resolve("raw.json").toString),
      storage, None, pollInterval = Duration.ofMillis(1),
      now = () => frozenNow)
    val bundles = svc.runUntilCaughtUp()
    // restarted from StartTime (08-27), not the stale sync (08-30)
    assert(bundles.head.start == startTime)
    assert(bundles.size == 4)
  }

  test("partition TTL expires old day partitions without touching recent ones") {
    val tmp = Files.createTempDirectory("graft-ttl")
    val (svc, _, Some(wh)) = newService(tmp): @unchecked
    svc.runUntilCaughtUp()
    assert(wh.readTable().count() == 6) // days 08-27..29
    val n = wh.expirePartitions(retentionDays = 3,
      asOf = Instant.parse("2020-08-31T00:00:00Z")) // cutoff 08-28
    assert(n == 1) // only day=2020-08-27 expired
    assert(wh.readTable().count() == 4)
    assert(wh.readTable().filter(col("day") === "2020-08-27").count() == 0)
  }

  test("multi-tenant: independent pipelines share one session (multi-hauser)") {
    import graft.service.MultiTenant
    def mkTenant(name: String): MultiTenant.Tenant = {
      val tmp = Files.createTempDirectory(s"graft-mt-$name")
      writeFixture(tmp)
      MultiTenant.Tenant(name,
        ServiceConfig(startTime = startTime,
          exportDuration = Duration.ofHours(24)),
        new LocalFixtureSource(spark, tmp.resolve("raw.json").toString),
        new HadoopStorage(tmp.resolve("stage").toString),
        Some(new ParquetWarehouse(spark, tmp.resolve("wh").toString)))
    }
    val results = MultiTenant.runAll(spark,
      Seq(mkTenant("a"), mkTenant("b"), mkTenant("c")),
      parallelism = 3, now = () => frozenNow)
    assert(results.size == 3)
    assert(results.values.forall(_.isRight))
    assert(results.values.forall(_.toOption.get.size == 4))
  }

  test("retry policy: 429/5xx retryable with exponential backoff, 4xx fatal") {
    import RetryPolicy._
    assert(retryInfo(Retryable(429, None)).isDefined)
    assert(retryInfo(Retryable(503, None)).isDefined)
    // only a non-429 sub-500 HTTP status is fatal; any non-HTTP failure
    // (storage timeout, connection reset) is retryable, like the
    // reference's getRetryInfo (internal/service.go:158-171)
    assert(retryInfo(Retryable(404, None)).isEmpty)
    assert(retryInfo(new RuntimeException("boom")).isDefined)
    assert(nextBackoff(Retryable(500, None), 0, Duration.ofSeconds(30), 8)
      .contains(Duration.ofSeconds(30)))
    assert(nextBackoff(Retryable(500, None), 3, Duration.ofSeconds(30), 8)
      .contains(Duration.ofSeconds(240)))
    assert(nextBackoff(Retryable(500, None), 8, Duration.ofSeconds(30), 8)
      .isEmpty)
    // Retry-After honored when longer than the computed backoff
    assert(nextBackoff(Retryable(429, Some(Duration.ofSeconds(120))), 0,
      Duration.ofSeconds(30), 8).contains(Duration.ofSeconds(120)))
  }

  test("storage timeout: a hung write fails the bundle, retries, then fatal") {
    // reference semantics: `[s3] Timeout` bounds every storage I/O
    // (warehouse/s3.go:38-80) — a hung upload must fail the bundle after
    // the bound (not block the loop), be retried with backoff, and exit
    // through the fatal path once BackoffStepsMax is exhausted
    val tmp = Files.createTempDirectory("graft-e2e-timeout")
    val fixture = writeFixture(tmp)
    val saves = new java.util.concurrent.atomic.AtomicInteger(0)
    // healthy staging paths (the bundle CSV is a distributed Spark write
    // through getFileReference), but the sync-point saveContent — the
    // object-store PUT — hangs forever
    val real = new HadoopStorage(tmp.resolve("stage").toString)
    val hung = new graft.sinks.Storage {
      override def saveContent(name: String, content: String): String = {
        saves.incrementAndGet()
        Thread.sleep(600000) // a dead object store: never completes
        "unreachable"
      }
      override def readContent(name: String) = real.readContent(name)
      override def deleteFile(name: String): Unit = real.deleteFile(name)
      override def exists(name: String): Boolean = real.exists(name)
      override def getFileReference(name: String) = real.getFileReference(name)
    }
    val storage =
      new graft.sinks.TimeoutStorage(hung, Duration.ofMillis(150))
    val config = ServiceConfig(startTime = startTime,
      exportDuration = Duration.ofHours(24), storageOnly = true,
      backoff = Duration.ofMillis(1), backoffStepsMax = 2)
    val svc = new ExportService(spark, config,
      new LocalFixtureSource(spark, fixture), storage, None,
      pollInterval = Duration.ofMillis(1), now = () => frozenNow)
    val t0 = System.nanoTime()
    val e = intercept[java.io.IOException](svc.runUntilCaughtUp())
    assert(e.getMessage.contains("timed out"))
    // initial attempt + 2 backed-off retries, each cut off at the bound
    assert(saves.get() == 3)
    // failed BY the timeout, not by waiting out the hang
    assert((System.nanoTime() - t0) / 1e9 < 60)
  }
}

/** Helper to build a single staged-strings row matching live columns. */
object ExportSchemaRow {
  def blankRow(spark: org.apache.spark.sql.SparkSession, cols: Seq[String],
               overrides: (String, String)*): org.apache.spark.sql.DataFrame = {
    val m = overrides.toMap
    val row = org.apache.spark.sql.Row.fromSeq(cols.map(c => m.getOrElse(c, "")))
    spark.createDataFrame(
      java.util.List.of(row),
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType))))
  }
}
