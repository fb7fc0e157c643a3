package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decision-grade summary statistics over the corpus: the two-sample
  * experiment readout and the per-column data profile — the numbers a
  * data-quality gate or an A/B-tested pipeline change is actually
  * approved on.
  *
  * Scale shape: both operators are single-pass partial-combined
  * aggregations — conditional sums for the experiment arms, a
  * multi-count-distinct (Expand) pass for the profile — so the corpus
  * shuffles compact partial states, never rows.
  */
object Stats {

  /** Two-proportion z-test over per-unit experiment outcomes
    * (unit, arm 'A'|'B', converted 0|1): the standard pooled-variance
    * readout `z = (pA - pB) / sqrt(p̂(1-p̂)(1/nA + 1/nB))` an
    * experimentation pipeline publishes per metric. Input rows are one
    * per unit (dedupe upstream — a unit must not vote twice); output is
    * ONE row (n_a, n_b, conv_a, conv_b, p_a, p_b, z), rates and z
    * round(6), counts exact. One conditional partial-combined aggregate;
    * nothing shuffles but 7 numbers. */
  def abZTest(outcomes: DataFrame, armCol: String, convCol: String)
      : DataFrame = {
    val isA = col(armCol) === lit("A")
    val agg = outcomes.agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
      sum(when(isA, col(convCol).cast("long")).otherwise(0L)).as("conv_a"),
      sum(when(!isA, col(convCol).cast("long")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      round((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a").cast("double")
          + lit(1.0) / col("n_b").cast("double"))), 6).as("z"))
  }

  /** One-pass column profile — the pre-publish data-quality card: for
    * each requested column, row count, null count, EXACT distinct count,
    * and min/max (computed in the column's NATIVE order, then rendered
    * through the caller's portable string rendering — cast
    * timestamps/doubles explicitly; engine-default float formatting is
    * not comparable). Returns (col_name, n_rows, n_null, n_distinct,
    * min_s, max_s), one row per column, ordered by col_name.
    *
    * The multiple exact count-distincts compile to ONE scan with an
    * Expand (factor = |cols|) — the deliberate trade for exactness;
    * profiles wanting estimate-grade distincts at lower cost swap in
    * approx_count_distinct (the q19/q126 sketch contract). */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    render: (String, Column) => Column): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        count_distinct(col(c)).as(s"${c}__nd"),
        render(c, min(col(c))).as(s"${c}__mn"),
        render(c, max(col(c))).as(s"${c}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nnull").as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_s"), col(s"${c}__mx").as("max_s"))
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Equi-depth histogram boundaries for numeric columns — the
    * distribution card a data profile ships beyond min/max: the interior
    * `buckets - 1` exact percentile boundaries per column (linear
    * interpolation at rank (n-1)·q, the q51-pinned Spark/DuckDB
    * equivalence), all columns in ONE scan (one multi-percentile
    * aggregate). Returns (col_name, pct, boundary) with pct the integer
    * percent rank and boundary round(6), ordered. At 100 TB swap the
    * exact percentile for approx_percentile — the documented estimator
    * substitution. */
  def equiDepthHistogram(df: DataFrame, cols: Seq[String], buckets: Int)
      : DataFrame = {
    require(cols.nonEmpty && buckets >= 2 && 100 % buckets == 0)
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val aggs = cols.map(c =>
      expr(s"percentile($c, array(${qs.mkString(", ")}))").as(s"${c}__q"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.flatMap { c =>
      (1 until buckets).map { i =>
        struct(lit(c).as("col_name"),
          lit(i * 100 / buckets).as("pct"),
          round(element_at(col(s"${c}__q"), i), 6).as("boundary"))
      }
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
      .orderBy(col("col_name"), col("pct"))
  }
}
