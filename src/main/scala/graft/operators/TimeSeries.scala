package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping over the event stream: gap filling with linear
  * interpolation (the densification monitoring/forecasting consumers
  * need — a missing hour must read as an explicit zero-count row with an
  * interpolated level, not silently vanish) and SCD2 history building
  * (the slowly-changing-dimension form a warehouse keeps entity state
  * in; reference behavior scope: hauser's warehouse loads land exactly
  * such per-day entity tables, `warehouse.go` day-partitioned loads).
  *
  * Scale shape: both operators key every exchange on the series/entity
  * id. Windows are PARTITIONED (never global): per-series hour counts
  * are calendar-bounded regardless of corpus size, per-entity change
  * rows are entity-bounded; the hourly pre-aggregation partial-combines
  * map-side, so the raw event stream shuffles once at hour granularity.
  */
object TimeSeries {

  /** Hourly-bucketed, gap-filled, linearly interpolated series per key.
    *
    * Raw points (keyCol, tsCol, valCol) are bucketed to the hour
    * (partial-combined count + DECIMAL(38,6) mean); each key's series is
    * densified over `sequence(min_hour, max_hour)` — the spine explodes
    * map-side off the tiny per-key extent aggregate — and bucket gaps get
    * `n = 0` and the linear interpolation between the neighboring known
    * levels (exact epoch-second ratio, one IEEE op order, round(6); the
    * series endpoints are known buckets by construction, so every gap is
    * interior). Returns (key, hour, n, level, filled).
    */
  def gapFillHourly(points: DataFrame, keyCol: String, tsCol: String,
                    valCol: String): DataFrame = {
    val base = points
      .groupBy(col(keyCol).as("key"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valCol).cast("decimal(38,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("v"))
    val spine = base.groupBy(col("key"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("key"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
    val prevF = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ep = (c: Column) => unix_timestamp(c).cast("double")
    val joined = spine.join(base, Seq("key", "hour"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(prevF))
      .withColumn("ph", last(when(col("v").isNotNull, col("hour")),
        ignoreNulls = true).over(prevF))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(nextF))
      .withColumn("nh", first(when(col("v").isNotNull, col("hour")),
        ignoreNulls = true).over(nextF))
    joined.select(col("key"), col("hour"),
      coalesce(col("n"), lit(0L)).as("n"),
      when(col("v").isNotNull, col("v")).otherwise(
        round(col("pv") + (col("nv") - col("pv"))
          * (ep(col("hour")) - ep(col("ph")))
          / (ep(col("nh")) - ep(col("ph"))), 6)).as("level"),
      col("v").isNull.as("filled"))
  }

  /** SCD2 (type-2 slowly-changing-dimension) history from a change feed:
    * per entity, collapse the (tsCol, tieCol)-ordered state stream into
    * its change points and emit one validity interval per state run —
    * (key, state, valid_from, valid_to, is_current, version), where
    * `valid_to` is the next change's `valid_from` (NULL while current)
    * and `version` counts an entity's intervals from 1. `tieCol` breaks
    * same-timestamp ties deterministically (a changelog offset / event
    * id), so replays produce identical history. Both windows ride ONE
    * entity-keyed exchange; no global sort.
    */
  def scd2History(changes: DataFrame, keyCol: String, tsCol: String,
                  stateCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val marked = changes
      .withColumn("prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("prev_state").isNull
        || !(col("prev_state") <=> col(stateCol)))
    marked
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("int"))
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("version"))
  }
}
