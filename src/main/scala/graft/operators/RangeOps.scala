package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL-style range/instant analytics over the canonical samples
  * schema — the query surface a reference user reaches through
  * Prometheus/Grafana on top of the adapter (reference: README.md:89-140
  * shows the Grafana forms: `runningDifference(max_0)/runningDifference(t)`
  * per-second rates, bucketed `max(value)` per series, and
  * `arrayFilter` label projections).
  *
  * Scale design: every op shuffles on the series key (metric, labels)
  * — cardinality of SERIES, never of samples. Window functions
  * partition by series; bucketed aggs do one partial-agg shuffle.
  * All expressions are native `functions._` (codegen'd, no UDFs).
  */
object RangeOps {

  private val seriesKey: Seq[Column] = Seq(col("metric"), col("labels_str"))

  /** Collapse sub-second duplicates exactly like the reference's
    * GROUP BY (metric, labels, t[DateTime seconds]) → max(value)
    * (read.go:58). Output: metric, labels, t_sec, value. */
  def dedupPerSecond(samples: DataFrame): DataFrame =
    samples
      .withColumn("t_sec", Downsample.bucketSec("ts_us", 1L))
      .withColumn("labels_str", array_join(col("labels"), ","))
      .groupBy(col("metric"), col("labels_str"), col("t_sec"))
      .agg(max(col("value")).as("value"))

  /** Per-series per-second rate between consecutive points —
    * `runningDifference(max_0) / runningDifference(t)` with the
    * negative-difference guard (README.md:127: counter reset → nan;
    * we emit NULL, which survives parquet/oracle comparison).
    * Input must be per-second deduped. Output adds `rate`. */
  def ratePerSecond(deduped: DataFrame): DataFrame = {
    val w = Window.partitionBy(seriesKey: _*).orderBy(col("t_sec"))
    deduped
      .withColumn("dv", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dt", col("t_sec") - lag(col("t_sec"), 1).over(w))
      .filter(col("dt").isNotNull && col("dt") > 0)
      .withColumn("rate",
        when(col("dv") < 0, lit(null).cast("double"))
          .otherwise(round(col("dv") / col("dt").cast("double"), 6)))
      .drop("dv", "dt")
  }

  /** Bucketed per-series aggregates (the *_over_time family).
    * One shuffle on (metric, labels, bucket); map-side partials. */
  def overTime(deduped: DataFrame, intervalSec: Long, aggs: Seq[Column]): DataFrame =
    deduped
      .withColumn("bucket", expr(s"t_sec DIV $intervalSec * $intervalSec"))
      .groupBy(col("metric"), col("labels_str"), col("bucket"))
      .agg(aggs.head, aggs.tail: _*)

  /** Counter increase per bucket: last-first, clamped at 0 (PromQL
    * increase ignores decreases absent resets); delta is the raw
    * last-first for gauges. Deterministic because input is per-second
    * deduped (unique t_sec per series). */
  def increaseDelta(deduped: DataFrame, intervalSec: Long): DataFrame =
    overTime(deduped, intervalSec, Seq(
      round(greatest(max_by(col("value"), col("t_sec")) - min_by(col("value"), col("t_sec")), lit(0.0)), 6).as("increase"),
      round(max_by(col("value"), col("t_sec")) - min_by(col("value"), col("t_sec")), 6).as("delta"),
      count(lit(1)).as("n_points")))

  /** Top-k series per (metric, bucket) by rounded sum(value).
    * Rounding before ranking keeps the order stable across engines;
    * labels digest breaks exact ties deterministically. */
  def topK(deduped: DataFrame, intervalSec: Long, k: Int): DataFrame = {
    val bucketed = overTime(deduped, intervalSec,
      Seq(round(sum(col("value")), 6).as("sum_value")))
    val w = Window.partitionBy(col("metric"), col("bucket"))
      .orderBy(col("sum_value").desc, col("labels_str").asc)
    bucketed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Latest point per series (instant vector). Input deduped. */
  def lastPoint(deduped: DataFrame): DataFrame =
    deduped
      .groupBy(col("metric"), col("labels_str"))
      .agg(max(col("t_sec")).as("last_t"),
           max_by(col("value"), col("t_sec")).as("last_value"))

  /** Dense per-series time grid with previous-value carry-forward
    * (staleness fill). Grid = every `intervalSec` bucket between each
    * series' first and last sample. The grid explode is linear in
    * output size and the carry is a per-series window — both scale
    * with series-count × buckets, independent of raw sample count. */
  def gapFill(deduped: DataFrame, intervalSec: Long): DataFrame = {
    val bucketed = overTime(deduped, intervalSec,
      Seq(round(avg(col("value")), 6).as("avg_value")))
    val grid = bucketed
      .groupBy(col("metric"), col("labels_str"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("metric"), col("labels_str"),
        explode(sequence(col("b0"), col("b1"), lit(intervalSec))).as("bucket"))
    val w = Window.partitionBy(seriesKey: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq("metric", "labels_str", "bucket"), "left")
      .withColumn("filled_value", last(col("avg_value"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("avg_value").isNull)
      .drop("avg_value")
  }

  /** Grafana label projection (README.md:100-104):
    * `arrayFilter(x -> x LIKE 'name=%', labels)` + value scaling. */
  def labelProject(samples: DataFrame, labelPrefix: String, scale: Double): DataFrame =
    samples.select(
      col("ts_us"),
      col("metric"),
      array_join(filter(col("labels"), _.startsWith(labelPrefix)), ",").as("labels_str"),
      round(col("value") * scale, 6).as("scaled_value"))

  /** Exact bucketed quantile per metric (quantile_over_time shape,
    * aggregated across a metric's series). Exact `percentile` with
    * linear interpolation — matches DuckDB quantile_cont. */
  def quantileOverTime(deduped: DataFrame, intervalSec: Long, q: Double): DataFrame =
    deduped
      .withColumn("bucket", expr(s"t_sec DIV $intervalSec * $intervalSec"))
      .groupBy(col("metric"), col("bucket"))
      .agg(round(percentile(col("value"), lit(q)), 6).as("q_value"),
           count(lit(1)).as("n_points"))
}
