package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DSv2 connector tests: schema, record split, and that projection +
  * time-range predicates actually reach the scan (S1 pushdown). */
class DataSourceSpec extends SparkSpec {

  private lazy val fixture: String = {
    val dir = Files.createTempDirectory("graft-dsv2")
    val json =
      """[
        |{"EventStart": "2020-08-27T06:20:26.9Z", "EventType": "click",
        | "UserId": 7, "PageUrl": "https://x/a", "evt_foo_str": "bar"},
        |{"EventStart": "2020-08-28T10:00:00Z", "EventType": "navigate",
        | "userid": 8, "pagenumevents": 3, "evt_n_real": 1.5},
        |{"EventStart": "2020-08-29T00:00:00Z", "EventType": "custom",
        | "UserId": 9},
        |{"not_a_record": true},
        |{"EventStart": "2020-08-30T12:00:00Z", "EventType": "load",
        | "UserId": 10}
        |]""".stripMargin
    Files.writeString(dir.resolve("bundle.json"), json)
    dir.toString
  }

  private def load = spark.read.format("graft-export").load(fixture)

  test("exposes the canonical 59-column typed schema") {
    assert(load.schema.length == 59)
    assert(load.schema("EventStart").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(load.schema.fieldNames.last == "CustomVars")
  }

  test("reads records: case-insensitive fields, custom-var spillover, bad-record skip") {
    val rows = load.orderBy("EventStart").collect()
    assert(rows.length == 4) // the field-less record is dropped
    val r0 = rows(0)
    assert(r0.getAs[Long]("UserId") == 7L)
    assert(r0.getAs[String]("CustomVars") == """{"evt_foo_str":"bar"}""")
    val r1 = rows(1)
    assert(r1.getAs[Long]("UserId") == 8L)   // matched case-insensitively
    assert(r1.getAs[Int]("PageNumEvents") == 3)
    assert(r1.getAs[String]("CustomVars").contains("evt_n_real"))
    assert(rows(2).getAs[String]("CustomVars") == "{}")
  }

  test("time-range predicate is pushed into the scan") {
    val q = load.filter(col("EventStart") >= "2020-08-28" &&
      col("EventStart") < "2020-08-30")
    val rows = q.collect()
    assert(rows.length == 2)
    val scanDesc = q.queryExecution.executedPlan.toString
    assert(scanDesc.contains("graft-export"))
    // the v2 scan's pushed filters survive into the physical plan
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("EventStart"))
  }

  test("gzipped bundles decompress transparently (S4)") {
    // the wire format is gzipped JSON; Spark's JSON reader (used by
    // LocalFixtureSource) auto-decompresses .gz
    val dir = Files.createTempDirectory("graft-gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("bundle.json.gz")))
    gz.write(
      """[{"EventStart": "2020-08-27T06:00:00Z", "EventType": "click",
        | "UserId": 1}]""".stripMargin.getBytes("UTF-8"))
    gz.close()
    val src = new graft.sources.LocalFixtureSource(spark,
      dir.resolve("bundle.json.gz").toString)
    val op = src.createExport(
      java.time.Instant.parse("2020-08-27T00:00:00Z"),
      java.time.Instant.parse("2020-08-28T00:00:00Z"),
      Seq("EventStart", "EventType", "UserId"))
    val df = src.getExport(src.getExportProgress(op)._2.get)
    assert(df.count() == 1)
    assert(df.collect()(0).getAs[String]("EventType") == "click")
  }

  test("projection pushdown prunes the read schema") {
    val q = load.select("EventType", "UserId")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scan.contains("PageUrl"))
    assert(q.collect().map(_.getAs[String]("EventType")).sorted.toSeq ==
      Seq("click", "custom", "load", "navigate"))
  }
}
