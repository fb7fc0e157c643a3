package graft

import java.nio.file.Files
import java.time.{Duration, Instant}

import graft.schema.{ExportSchema, Field}
import graft.sinks.{DerbySql, HadoopStorage, JdbcWarehouse, RedshiftSql}
import graft.service.{ExportService, ServiceConfig}
import graft.sources.LocalFixtureSource

/** Executes the warehouse statement cycle — CREATE, ALTER, stage-then-load,
  * sync-point log, orphan heal — against a LIVE embedded Derby connection
  * (the execution analog of warehouse/redshift.go:150-163, 195-354; Derby
  * ships on the Spark classpath). */
class JdbcWarehouseSpec extends SparkSpec {

  private def newDb(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-derby-$tag")
    s"jdbc:derby:${dir.resolve("db")};create=true"
  }

  test("DDL create + type-aware introspection + append-only evolution") {
    val wh = new JdbcWarehouse(spark, newDb("ddl"))
    val schema = ExportSchema.baseFields
    assert(wh.initExportTable(schema))
    assert(!wh.initExportTable(schema)) // second init: table exists

    // JDBC metadata round-trips names AND types, ordinal-ordered
    val live = wh.getExportTableFields()
    assert(live.map(_.dbName) == schema.map(_.dbName))
    assert(live.find(_.dbName == "EventStart")
      .exists(_.dataType == org.apache.spark.sql.types.TimestampType))
    assert(live.find(_.dbName == "IndvId")
      .exists(_.dataType == org.apache.spark.sql.types.LongType))

    // append-only evolution executes one ALTER per missing column
    val extended = schema ++ Seq(
      Field("AppName", "AppName", org.apache.spark.sql.types.StringType))
    wh.applyExportSchema(extended)
    assert(wh.getExportTableColumns().last == "AppName")

    // a retyped live column is rejected by the same type-aware check
    val retyped = extended.map(f =>
      if (f.dbName == "EventStart")
        f.copy(dataType = org.apache.spark.sql.types.StringType) else f)
    intercept[IllegalArgumentException] { wh.applyExportSchema(retyped) }
  }

  test("sync-point log and orphan heal execute real DELETEs") {
    val wh = new JdbcWarehouse(spark, newDb("sync"))
    wh.initExportTable(ExportSchema.baseFields)
    assert(wh.lastSyncPoint().isEmpty)
    val end = Instant.parse("2020-08-28T00:00:00Z")
    wh.saveSyncPoint(end)
    wh.saveSyncPoint(end.plus(Duration.ofDays(1)))
    assert(wh.lastSyncPoint().contains(end.plus(Duration.ofDays(1))))
  }

  test("full service loop: stage, distributed JDBC load, heal, resume") {
    val tmp = Files.createTempDirectory("graft-jdbc-e2e")
    val records = (0 until 3).flatMap { day =>
      val d = s"2020-08-2${7 + day}"
      Seq(
        s"""{"EventStart": "${d}T06:00:00Z", "EventType": "click",
           | "UserId": ${100 + day}, "PageUrl": "https://x.test/$day",
           | "evt_foo_str": "v$day"}""".stripMargin.replace("\n", ""))
    }
    Files.writeString(tmp.resolve("raw.json"),
      records.mkString("[", ",\n", "]"))
    val url = newDb("e2e")
    val wh = new JdbcWarehouse(spark, url)
    val storage = new HadoopStorage(tmp.resolve("stage").toString)
    val startTime = Instant.parse("2020-08-27T00:00:00Z")
    val svc = new ExportService(spark,
      ServiceConfig(startTime = startTime,
        exportDuration = Duration.ofHours(24)),
      new LocalFixtureSource(spark, tmp.resolve("raw.json").toString),
      storage, Some(wh), pollInterval = Duration.ofMillis(1),
      now = () => Instant.parse("2020-09-01T00:00:00Z"))
    val bundles = svc.runUntilCaughtUp()
    assert(bundles.size == 4) // 08-27..08-30 mature under the 24h delay
    assert(wh.lastSyncPoint().contains(Instant.parse("2020-08-31T00:00:00Z")))

    // the rows actually landed, typed
    val loaded = spark.read.jdbc(url, "\"export\"",
      new java.util.Properties())
    assert(loaded.count() == 3)
    assert(loaded.schema("EventStart").dataType ==
      org.apache.spark.sql.types.TimestampType)

    // orphan heal: inject a row past the sync point, then recover()
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        """INSERT INTO "export" ("EventStart", "EventType", "UserId")
          | VALUES ({ts '2020-09-02 09:00:00'}, 'orphan', 999)"""
          .stripMargin.replace("\n", ""))
      st.close()
    } finally c.close()
    assert(wh.maxEventStart().contains(Instant.parse("2020-09-02T09:00:00Z")))
    svc.recover()
    val healed = spark.read.jdbc(url, "\"export\"",
      new java.util.Properties())
    assert(healed.count() == 3)
    assert(healed.filter(org.apache.spark.sql.functions
      .col("UserId") === 999).count() == 0)
  }

  test("truncate-day load is idempotent: replaying a bundle replaces it") {
    val url = newDb("trunc")
    val wh = new JdbcWarehouse(spark, url)
    wh.initExportTable(ExportSchema.baseFields)
    val tmp = Files.createTempDirectory("graft-jdbc-trunc")
    val cols = wh.getExportTableColumns()
    val df = ExportSchemaRow.blankRow(spark, cols,
      "EventStart" -> "2020-08-27T06:00:00Z", "EventType" -> "click",
      "UserId" -> "1")
      .union(ExportSchemaRow.blankRow(spark, cols,
        "EventStart" -> "2020-08-27T07:00:00Z", "EventType" -> "click",
        "UserId" -> "2"))
    val storage = new HadoopStorage(tmp.toString)
    val ref = graft.sinks.CsvStage.writeBundleCsv(df, storage, "b.csv")
    val start = Instant.parse("2020-08-27T00:00:00Z")
    wh.loadToWarehouse(ref, start, truncateDay = true)
    wh.loadToWarehouse(ref, start, truncateDay = true) // replay
    val n = spark.read.jdbc(url, "\"export\"", new java.util.Properties())
      .count()
    assert(n == 2) // replaced, not duplicated
  }

  test("Redshift COPY path builds the reference statement for the staged ref") {
    // no live Redshift in the sandbox: assert the statement the
    // copyCredentials path would execute (reference: redshift.go:241-246)
    val stmt = RedshiftSql.copyFrom(Some("analytics"), "export",
      "s3://bucket/1598486400.csv", "aws_iam_role=arn:aws:iam::1:role/r")
    assert(stmt.startsWith("COPY \"analytics\".\"export\" FROM 's3://bucket/"))
    assert(stmt.contains("IGNOREHEADER 1"))
    // and the Derby dialect emits a comparable TIMESTAMP literal
    assert(DerbySql.timestampLiteral(Instant.parse("2020-08-31T00:00:00Z"))
      == "{ts '2020-08-31 00:00:00.000000'}")
  }
}
