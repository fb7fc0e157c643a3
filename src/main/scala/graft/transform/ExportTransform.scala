package graft.transform

import java.time.{Duration, Instant}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.{ExportSchema, Field}

/** Per-sink value rendering strategy (reference: warehouse/warehouse.go:54-71
  * default; warehouse/redshift.go:101-116 Redshift variant). All output is
  * strings — the staging format is CSV.
  */
sealed trait ValueFormat {
  /** Render one typed column to its staged string form. */
  def render(c: Column, f: Field): Column
}

object ValueFormat {

  /** Strip newline/CR to space and drop NUL bytes
    * (reference: warehouse/warehouse.go:66-69). */
  def sanitize(c: Column): Column =
    regexp_replace(regexp_replace(c, "[\n\r]", " "), "\u0000", "")

  /** RFC3339 with microsecond precision and Go's trailing-zero trim:
    * `2020-08-27T06:20:26.900000Z` renders as `2020-08-27T06:20:26.9Z`, and
    * a whole-second time drops the fraction entirely
    * (reference: warehouse/warehouse.go:59-65, format RFC3339Micro
    * `2006-01-02T15:04:05.999999Z07:00`). */
  def goRfc3339Micro(c: Column): Column = {
    val raw = date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    regexp_replace(regexp_replace(raw, "(\\.\\d*?)0+(Z|[+-])", "$1$2"),
      "\\.(Z|[+-])", "$1")
  }

  /** Go renders float64 via %v: whole doubles print without ".0". */
  def goNumber(c: Column): Column =
    regexp_replace(c.cast(StringType), "\\.0$", "")

  /** Default (storage / BigQuery) strategy
    * (reference: warehouse/warehouse.go:54-71). */
  case object Default extends ValueFormat {
    def render(c: Column, f: Field): Column = f.dataType match {
      case TimestampType => sanitize(goRfc3339Micro(c))
      case DoubleType    => sanitize(goNumber(c))
      case _             => sanitize(c.cast(StringType))
    }
  }

  /** Redshift strategy: Go `t.String()` timestamp format and strings
    * truncated to VarCharMax-1 (reference: warehouse/redshift.go:101-116). */
  final case class Redshift(varCharMax: Int = 65535) extends ValueFormat {
    def render(c: Column, f: Field): Column = f.dataType match {
      case TimestampType =>
        // Go time.String(): "2020-08-27 06:20:26.9 +0000 UTC"
        val raw = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSSSSS")
        val trimmed = regexp_replace(
          regexp_replace(raw, "(\\.\\d*?)0+$", "$1"), "\\.$", "")
        sanitize(concat(trimmed, lit(" +0000 UTC")))
      case DoubleType => sanitize(goNumber(c))
      case _ =>
        substring(sanitize(c.cast(StringType)), 0, varCharMax - 1)
    }
  }
}

/** The core record pipeline, as one declarative DataFrame stage.
  *
  * Reference equivalent: `transformExportJSONRecord`
  * (internal/service.go:72-119) runs per record; here the same semantics are
  * a single `select` so Catalyst pipelines it inside one codegen stage:
  *   - case-insensitive matching of input columns to schema fields
  *     (internal/service.go:77-96),
  *   - column reorder + rename + null-fill to the live table order
  *     (internal/service.go:99-102),
  *   - spillover of all non-schema columns into one CustomVars JSON map,
  *     original key case preserved (internal/service.go:86-96,104-109),
  *   - per-sink cast/sanitize/truncate (warehouse/warehouse.go:54-71).
  */
object ExportTransform {

  /** Split an input DataFrame's columns into (schema-matched, custom-var)
    * per the case-insensitive membership rule (P4). Returns the live-order
    * staged projection (P5/P6): all columns rendered to string, one column
    * per schema field plus the CustomVars JSON spillover. */
  def toStagedStrings(df: DataFrame, schema: Seq[Field],
                      fmt: ValueFormat = ValueFormat.Default): DataFrame = {
    val inputByLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val schemaLower = schema.flatMap(f =>
      if (f.isDbOnly) None else Some(f.sourceName.toLowerCase)).toSet

    // Custom vars: every input column not matched by the schema, original
    // case preserved, serialized to one JSON object; {} when none. An input
    // that already carries a folded CustomVars column (e.g. the graft-export
    // DSv2 connector folds at scan time) passes it through instead.
    val customCols = df.columns.filterNot(c => schemaLower.contains(c.toLowerCase))
    val preFolded = df.columns.find(_.equalsIgnoreCase("CustomVars"))
    val customVars: Column = preFolded match {
      case Some(cv) => coalesce(col(cv).cast(StringType), lit("{}"))
      case None if customCols.isEmpty => lit("{}")
      case None => to_json(map_filter(
        map(customCols.toIndexedSeq
          .flatMap(c => Seq(lit(c), col(c).cast(StringType))): _*),
        (_, v) => v.isNotNull))
    }

    val staged = schema.map { f =>
      if (f.sourceName == "CustomVars") customVars.as(f.dbName)
      else inputByLower.get(f.sourceName.toLowerCase) match {
        case Some(in) if !f.isDbOnly =>
          coalesce(fmt.render(col(in).cast(f.dataType), f), lit(""))
            .as(f.dbName)
        case _ => lit("").as(f.dbName) // DB-only or absent source field
      }
    }
    df.select(staged: _*)
  }

  /** Typed (non-stringified) projection into the canonical schema — the
    * engine-internal form used by analytic queries: schema columns keep
    * their Spark types, custom vars stay a MapType column. */
  def toTyped(df: DataFrame, schema: Seq[Field]): DataFrame = {
    val inputByLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val schemaLower = schema.flatMap(f =>
      if (f.isDbOnly) None else Some(f.sourceName.toLowerCase)).toSet
    val customCols = df.columns.filterNot(c => schemaLower.contains(c.toLowerCase))
    val customVars: Column =
      if (customCols.isEmpty)
        map().cast(MapType(StringType, StringType))
      else map_filter(
        map(customCols.toIndexedSeq
          .flatMap(c => Seq(lit(c), col(c).cast(StringType))): _*),
        (_, v) => v.isNotNull)

    val cols = schema.map { f =>
      if (f.sourceName == "CustomVars") customVars.as(f.dbName)
      else inputByLower.get(f.sourceName.toLowerCase) match {
        case Some(in) if !f.isDbOnly => col(in).cast(f.dataType).as(f.dbName)
        case _ => lit(null).cast(
          if (f.dataType == NullType) StringType else f.dataType).as(f.dbName)
      }
    }
    df.select(cols: _*)
  }

  /** Tumbling-window alignment (P8): next bundle end is
    * `truncate(last + dur, dur)` in UTC
    * (reference: internal/service.go:280-284). */
  def nextEndTime(lastSync: Instant, dur: Duration): Instant = {
    val advanced = lastSync.plus(dur)
    val n = dur.toMillis
    Instant.ofEpochMilli(advanced.toEpochMilli / n * n)
  }

  /** Column-level tumbling bucket for the same alignment: maps an event time
    * to the start of its window. */
  def windowStart(ts: Column, dur: Duration): Column =
    timestamp_millis((unix_millis(ts) / dur.toMillis) * dur.toMillis)
}
