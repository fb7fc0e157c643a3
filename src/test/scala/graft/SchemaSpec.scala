package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{ExportSchema, Field}

/** Schema-system parity tests (mirroring the scenarios of the reference's
  * warehouse/schema_test.go:56-280, re-derived — not copied). */
class SchemaSpec extends AnyFunSuite {

  test("canonical base schema has 59 ordered fields ending in CustomVars") {
    assert(ExportSchema.baseFields.size == 59)
    assert(ExportSchema.baseFields.last.dbName == "CustomVars")
    assert(ExportSchema.baseFields.head.dbName == "IndvId")
    assert(ExportSchema.canonical(includeMobile = true).size == 67)
  }

  test("typed fields carry the reference's types") {
    val byName = ExportSchema.baseFields.map(f => f.dbName -> f.dataType).toMap
    assert(byName("EventStart") == TimestampType)
    assert(byName("PageNumEvents") == IntegerType)          // int32 in ref
    assert(byName("EventCumulativeLayoutShift") == DoubleType)
    assert(byName("IndvId") == LongType)
    assert(byName("PageUrl") == StringType)
  }

  test("reconcile: live order wins, missing fields append in canonical order") {
    val live = Seq("EventStart", "PageUrl", "IndvId")
    val rec = ExportSchema.reconcileWithExisting(live)
    assert(rec.take(3).map(_.dbName) == live)
    // appended fields preserve canonical relative order
    val appended = rec.drop(3).map(_.dbName)
    assert(appended.head == "IndvId" == false)
    assert(appended.contains("CustomVars"))
    assert(rec.size == 59)
  }

  test("reconcile: legacy PageAgent rename maps to PageUserAgent source") {
    val rec = ExportSchema.reconcileWithExisting(Seq("PageAgent", "EventStart"))
    val pa = rec.head
    assert(pa.dbName == "PageAgent")
    assert(pa.sourceName == "PageUserAgent")
    // PageUserAgent must NOT be appended again
    assert(rec.count(_.sourceName == "PageUserAgent") == 1)
  }

  test("reconcile: unknown live columns preserved as DB-only") {
    val rec = ExportSchema.reconcileWithExisting(
      Seq("EventStart", "CustomColumn"))
    val cc = rec(1)
    assert(cc.dbName == "CustomColumn" && cc.isDbOnly)
    assert(rec.size == 60) // 58 appended + 2 live
  }

  test("reconcile is case-insensitive") {
    val rec = ExportSchema.reconcileWithExisting(Seq("eventstart", "PAGEURL"))
    assert(rec.head.sourceName == "EventStart")
    assert(rec(1).sourceName == "PageUrl")
    assert(rec.size == 59)
  }

  test("reconcile is idempotent") {
    val once = ExportSchema.reconcileWithExisting(
      Seq("PageAgent", "CustomColumn", "EventStart"))
    val twice = ExportSchema.reconcileWithExisting(once.map(_.dbName))
    assert(once.map(_.dbName) == twice.map(_.dbName))
  }

  test("compatibility is an ordered prefix check") {
    val target = ExportSchema.baseFields
    assert(ExportSchema.isCompatibleWith(target.take(10), target))
    assert(!ExportSchema.isCompatibleWith(target.take(10).reverse, target))
    assert(ExportSchema.missingFields(target.take(10), target).size == 49)
  }

  test("compatibility is type-aware: retype rejected, rename accepted, unknown passes") {
    val target = ExportSchema.baseFields
    // a live column whose type changed must be rejected per ordinal
    // (reference: warehouse/bigquery.go:163-194)
    val retyped = target.take(10).map(f =>
      if (f.dbName == "EventStart") f.copy(dataType = StringType) else f)
    assert(!ExportSchema.isCompatibleWith(retyped, target))
    // a case-renamed column with the same type is fine (names match
    // case-insensitively, schema.go:162-174)
    val renamed = target.take(10).map(f =>
      if (f.dbName == "PageId") f.copy(dbName = "PAGEID") else f)
    assert(ExportSchema.isCompatibleWith(renamed, target))
    // NullType = unknown (legacy name-only metadata) keeps the name-only
    // behavior rather than rejecting every legacy table
    val untyped = target.take(10).map(_.copy(dataType = NullType))
    assert(ExportSchema.isCompatibleWith(untyped, target))
  }

  test("source field list excludes CustomVars/DB-only, appends wildcards") {
    val rec = ExportSchema.reconcileWithExisting(Seq("CustomColumn"))
    val fields = ExportSchema.sourceFieldList(rec)
    assert(!fields.contains("CustomVars"))
    assert(!fields.contains("CustomColumn"))
    assert(fields.takeRight(3) == Seq("user_*", "evt_*", "page_*"))
    assert(fields.contains("PageUserAgent"))
  }

  test("struct type: only EventStart/EventType non-nullable") {
    val st = ExportSchema.toStructType(ExportSchema.baseFields)
    assert(!st("EventStart").nullable && !st("EventType").nullable)
    assert(st("PageUrl").nullable)
  }
}
