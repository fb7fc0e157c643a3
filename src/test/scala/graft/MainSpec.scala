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
}
