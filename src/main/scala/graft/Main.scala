package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.service.{ConfigLoader, ExportService}
import graft.sinks.{HadoopStorage, ParquetWarehouse}
import graft.sources.{Dsv2ExportSource, LocalFixtureSource}

/** CLI entry point — the reference's main.go:18-39 lifecycle: load config,
  * wire provider (source/storage/warehouse per core/core.go:18-51), run the
  * incremental loop until caught up.
  *
  * Usage: runMain graft.Main <config-file>
  * Config keys beyond ServiceConfig (see ConfigLoader): FixturePath (raw
  * export JSON), StageDir (staging storage), WarehouseDir (omit with
  * StorageOnly), Source = "fixture" | "dsv2".
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Main <config-file>")
    val text = Files.readString(Paths.get(args(0)))
    val config = ConfigLoader.parse(text)
    val kv = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"") }.toMap
    def need(k: String) = kv.getOrElse(k,
      throw new IllegalArgumentException(s"missing config key $k"))

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val source = kv.getOrElse("Source", "fixture") match {
      case "dsv2" => new Dsv2ExportSource(spark, need("FixturePath"))
      case _ => new LocalFixtureSource(spark, need("FixturePath"))
    }
    val storage = new HadoopStorage(need("StageDir"))
    val warehouse = if (config.storageOnly) None
      else Some(new ParquetWarehouse(spark, need("WarehouseDir")))

    val svc = new ExportService(spark, config, source, storage, warehouse)
    // MaxBundles bounds one invocation (cron-style runs); default unlimited
    val maxBundles = kv.get("MaxBundles").map(_.toInt).getOrElse(Int.MaxValue)
    val bundles = svc.runUntilCaughtUp(maxBundles)
    bundles.foreach(b => println(
      s"[graft] bundle ${b.start} .. ${b.end}: ${b.records} records -> ${b.ref}"))
    println(s"[graft] caught up after ${bundles.size} bundles")
    spark.stop()
  }
}
