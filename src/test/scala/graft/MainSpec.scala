package graft

import java.nio.file.Files

/** CLI lifecycle e2e: config file -> provider wiring -> incremental loop,
  * exercising the config-selected JDBC warehouse path end to end
  * (reference lifecycle: main.go:18-39, provider factory core/core.go). */
class MainSpec extends SparkSpec {

  test("config-driven run: fixture source into the JDBC warehouse") {
    spark // materialize the shared session BEFORE Main so it embeds
    val tmp = Files.createTempDirectory("graft-main-e2e")
    val records = (0 until 2).map { day =>
      val d = s"2020-08-2${7 + day}"
      s"""{"EventStart": "${d}T06:00:00Z", "EventType": "click",
         | "UserId": ${100 + day}}""".stripMargin.replace("\n", "")
    }
    Files.writeString(tmp.resolve("raw.json"),
      records.mkString("[", ",\n", "]"))
    val url = s"jdbc:derby:${tmp.resolve("db")};create=true"
    val cfg = tmp.resolve("graft.toml")
    Files.writeString(cfg,
      s"""# graft CLI config
         |StartTime = "2020-08-27T00:00:00Z"
         |ExportDuration = "24h"
         |ExportDelay = "24h"
         |Source = "fixture"
         |FixturePath = "${tmp.resolve("raw.json")}"
         |StageDir = "${tmp.resolve("stage")}"
         |WarehouseJdbcUrl = "$url"
         |MaxBundles = "5"
         |""".stripMargin)
    Main.main(Array(cfg.toString))
    // the shared session survives Main's cleanup...
    assert(!spark.sparkContext.isStopped)
    // ...and the bundles landed through the JDBC warehouse
    val loaded = spark.read.jdbc(url, "\"export\"",
      new java.util.Properties())
    assert(loaded.count() == 2)
    val wh = new graft.sinks.JdbcWarehouse(spark, url)
    assert(wh.lastSyncPoint().isDefined)
  }

  test("TOML sections scope same-named keys; deprecations warn like the reference") {
    import graft.service.ConfigLoader
    // the reference config has Timeout/Bucket/ExportTable in several
    // sections — they must land under distinct dotted keys, not collide
    val doc = ConfigLoader.parseDoc(
      """FilePrefix = "top"   # trailing comment
        |[s3]
        |Bucket = "stage-bucket"
        |Timeout = "5m"
        |[gcs]
        |Bucket = "gcs-bucket"
        |Timeout = "9m"
        |[redshift]
        |ExportTable = "fsexport"
        |""".stripMargin)
    assert(doc("FilePrefix") == "top")
    assert(doc("s3.Timeout") == "5m" && doc("gcs.Timeout") == "9m")
    assert(doc("s3.Bucket") == "stage-bucket" && doc("gcs.Bucket") == "gcs-bucket")
    assert(doc("redshift.ExportTable") == "fsexport")

    // deprecated Warehouse -> Provider mapping warns (config.go:206-223)
    val (cfgW, warnW) = ConfigLoader.parseWithWarnings(
      """StartTime = "2020-08-27T00:00:00Z"
        |Warehouse = "local"
        |""".stripMargin)
    assert(warnW.exists(_.contains("\"Warehouse\" option is deprecated")))
    // ...and the local provider forces StorageOnly with its own warning
    assert(cfgW.storageOnly)
    assert(warnW.exists(_.contains("only supports \"StorageOnly")))

    // GroupFilesByDay deprecation warns only when ExportDuration is unset;
    // an explicit duration wins silently (config.go:172-180)
    val (cfgG, warnG) = ConfigLoader.parseWithWarnings(
      """StartTime = "2020-08-27T00:00:00Z"
        |GroupFilesByDay = true
        |""".stripMargin)
    assert(cfgG.effectiveDuration == java.time.Duration.ofHours(24))
    assert(warnG.exists(_.contains("\"GroupFilesByDay\" option is deprecated")))
    val (cfgD, warnD) = ConfigLoader.parseWithWarnings(
      """StartTime = "2020-08-27T00:00:00Z"
        |GroupFilesByDay = true
        |ExportDuration = "1h"
        |""".stripMargin)
    assert(cfgD.effectiveDuration == java.time.Duration.ofHours(1))
    assert(!warnD.exists(_.contains("GroupFilesByDay")))

    // deprecated per-section S3Only raises the main-level StorageOnly
    val (cfgS, _) = ConfigLoader.parseWithWarnings(
      """StartTime = "2020-08-27T00:00:00Z"
        |Provider = "aws"
        |[s3]
        |S3Only = true
        |""".stripMargin)
    assert(cfgS.storageOnly)

    // StartTime default: 30 days before "now", with the INFO notice
    val fixed = java.time.Instant.parse("2021-01-31T00:00:00Z")
    val (cfgT, warnT) = ConfigLoader.parseWithWarnings(
      "ExportDuration = \"1h\"", now = () => fixed)
    assert(cfgT.startTime == java.time.Instant.parse("2021-01-01T00:00:00Z"))
    assert(warnT.exists(_.contains("\"StartTime\" not set")))
  }
}
