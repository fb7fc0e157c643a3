package graft.sinks

import org.apache.spark.sql.types._

import graft.schema.Field

/** SQL generation for warehouse targets — the statement-building half of
  * the reference's Redshift/BigQuery connectors, kept pure so it is
  * testable without a live warehouse. Execution is a thin JDBC/API call on
  * top (a stage-then-COPY sink: `CsvStage` writes the object, these
  * statements load it).
  */
object RedshiftSql {

  /** Type map (reference: warehouse/redshift.go:24-31). Total over the
    * schema's types — unknown types are an error, not a silent VARCHAR. */
  def ddlType(dt: DataType, varCharMax: Int = 65535): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "FLOAT"
    case StringType => s"VARCHAR(max)"
    case TimestampType => "TIMESTAMP"
    case NullType => s"VARCHAR(max)" // DB-only legacy columns
    case other => throw new IllegalArgumentException(
      s"no Redshift mapping for ${other.catalogString}")
  }

  /** Schema-qualified name honoring an optional search-path-style schema
    * (reference: warehouse/redshift.go qualified names, tested at
    * redshift_test.go:94-200). */
  def qualifiedName(schema: Option[String], table: String): String =
    schema.map(s => s""""$s"."$table"""").getOrElse(s""""$table"""")

  /** CREATE TABLE from the ordered field list
    * (reference: warehouse/redshift.go:195-212). */
  def createTable(schema: Option[String], table: String,
                  fields: Seq[Field]): String = {
    val cols = fields.map(f => s""""${f.dbName}" ${ddlType(f.dataType)}""")
    s"CREATE TABLE IF NOT EXISTS ${qualifiedName(schema, table)} (${cols.mkString(", ")})"
  }

  /** One ALTER per appended column — Redshift only supports single-column
    * ADD (reference: warehouse/redshift.go:214-238). */
  def addColumns(schema: Option[String], table: String,
                 missing: Seq[Field]): Seq[String] =
    missing.map(f =>
      s"""ALTER TABLE ${qualifiedName(schema, table)} ADD COLUMN "${f.dbName}" ${ddlType(f.dataType)}""")

  /** Bulk load of a staged CSV object
    * (reference: warehouse/redshift.go:241-246 CopyInData). */
  def copyFrom(schema: Option[String], table: String, objectRef: String,
               credentials: String): String =
    s"COPY ${qualifiedName(schema, table)} FROM '$objectRef' " +
      s"CREDENTIALS '$credentials' DELIMITER ',' REGION 'us-east-1' " +
      "FORMAT AS CSV IGNOREHEADER 1 ACCEPTINVCHARS TRUNCATECOLUMNS"

  /** Anti-duplicate delete for crash recovery
    * (reference: warehouse/redshift.go:284-294). */
  def deleteOrphans(schema: Option[String], table: String,
                    syncPointIso: String): String =
    s"DELETE FROM ${qualifiedName(schema, table)} " +
      s"WHERE EventStart > '$syncPointIso'"
}

object BigQuerySql {

  /** Type map (reference: warehouse/bigquery.go:16-23). */
  def ddlType(dt: DataType): String = dt match {
    case LongType | IntegerType => "INTEGER"
    case DoubleType => "FLOAT"
    case StringType => "STRING"
    case TimestampType => "TIMESTAMP"
    case NullType => "STRING"
    case other => throw new IllegalArgumentException(
      s"no BigQuery mapping for ${other.catalogString}")
  }

  /** Day-partition decorator targeting one partition of a date-partitioned
    * table (reference: warehouse/bigquery.go:142,147 `table$YYYYMMDD`). */
  def partitionDecorator(table: String, day: java.time.LocalDate): String =
    s"$table$$${day.toString.replace("-", "")}"
}
