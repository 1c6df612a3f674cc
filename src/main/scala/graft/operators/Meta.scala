package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Series-metadata queries — the Prometheus `/api/v1/label/<k>/values`
  * and series-count surface a TSDB front-end issues constantly
  * against the store (the reference delegates these to PromQL over
  * its adapter; here they are first-class scans).
  *
  * Scale shape: explode(labels) is a narrow per-row transform; the
  * single shuffle is the value-keyed aggregate whose cardinality is
  * the label's value domain (tiny next to the sample count), with
  * map-side partial aggregation in front. On the day-partitioned
  * store the same query prunes to the queried time range first.
  */
object Meta {

  /** Distinct values of one label key with per-value footprint:
    * n_metrics = distinct metric names carrying the value,
    * n_samples = samples carrying it. */
  def labelValues(samples: DataFrame, labelKey: String): DataFrame =
    samples
      .select(col("metric"), explode(col("labels")).as("l"))
      .filter(col("l").startsWith(labelKey + "="))
      .select(expr(s"substring(l, ${labelKey.length + 2})").as("label_value"), col("metric"))
      .groupBy(col("label_value"))
      .agg(countDistinct(col("metric")).as("n_metrics"),
           count(lit(1)).as("n_samples"))

  /** The `/api/v1/series` twin: the distinct series (metric + full
    * label set) matching a selector inside a time window, with
    * per-series footprint (sample count, first/last second). One
    * aggregate keyed on the series — output cardinality is the
    * series domain, not the sample count; time bounds and matchers
    * compile through the same scan-level predicate path as the read
    * pipeline (metric equality and time reach parquet pushed). */
  def series(samples: DataFrame, q: graft.operators.ReadQuery,
             ignoreLabel: Option[String] = Some("remote=clickhouse")): DataFrame = {
    SeriesRead.timeBound(samples, q.startMs, q.endMs)
      .filter(Matchers.compilePromQL(q.matchers, ignoreLabel))
      .groupBy(col("metric"), col("labels"))
      .agg(count(lit(1)).as("n_samples"),
           min(expr("ts_us DIV 1000000")).as("first_t"),
           max(expr("ts_us DIV 1000000")).as("last_t"))
      .select(col("metric"), array_join(col("labels"), ",").as("labels_str"),
              col("n_samples"), col("first_t"), col("last_t"))
  }

  /** The `/api/v1/labels` twin of [[labelValues]]: distinct label
    * KEYS with the same per-key footprint. Same plan shape — narrow
    * explode, one aggregate whose cardinality is the label-key domain
    * (tiny: tens of keys against billions of samples). */
  def labelNames(samples: DataFrame): DataFrame =
    samples
      .select(col("metric"), explode(col("labels")).as("l"))
      .select(substring_index(col("l"), "=", 1).as("label_name"), col("metric"))
      .groupBy(col("label_name"))
      .agg(countDistinct(col("metric")).as("n_metrics"),
           count(lit(1)).as("n_samples"))

  /** Series churn per day — the cardinality-debugging view every
    * TSDB operator eventually needs ("what exploded on Tuesday?"):
    * each series' lifetime collapses to (first_day, last_day) in ONE
    * series-keyed aggregate, then two tiny day-keyed counts union:
    * n_born = series whose first sample landed that day, n_died =
    * series whose last sample did (a "death" only becomes final as
    * the store's edge moves on — it means "not seen since", exactly
    * what the debugging question asks).
    *
    * Scale shape: the series aggregate is the plan's one real
    * exchange (output = series domain, not samples); the day counts
    * aggregate series-domain rows down to ≤ days×2. */
  def seriesChurn(samples: DataFrame): DataFrame = {
    val lifetimes = samples
      .groupBy(col("metric"), col("labels"))
      .agg(min(expr("ts_us DIV 1000000 DIV 86400 * 86400")).as("first_day"),
           max(expr("ts_us DIV 1000000 DIV 86400 * 86400")).as("last_day"))
    val born = lifetimes.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_born"))
    val died = lifetimes.groupBy(col("last_day").as("day"))
      .agg(count(lit(1)).as("n_died"))
    born.join(died, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_born"), lit(0L)).as("n_born"),
        coalesce(col("n_died"), lit(0L)).as("n_died"))
  }

  /** The `/api/v1/status/tsdb` head-stats twin: series count per
    * metric name, top-N — Prometheus's seriesCountByMetricName, the
    * first chart anyone opens in a cardinality incident. One
    * series-keyed aggregate then a metric-keyed count. */
  def seriesCountByMetric(samples: DataFrame, topN: Int = 10): DataFrame =
    samples
      .select(col("metric"), col("labels")).distinct()
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n_series"))
      .orderBy(col("n_series").desc, col("metric").asc)
      .limit(topN)

  /** [[seriesCountByMetric]] plus the EXACT grand total in the SAME
    * single aggregate: rollup(metric) emits every per-metric row AND
    * one null-metric total row from one pass over the distinct-series
    * set. The total sorts first (it is ≥ every per-metric count, and
    * NULL wins the ascending tie-break), so a capped collect can
    * never truncate it away — the `/api/v1/status/tsdb` backing
    * query, immune to the undercount a summed-top-N view would
    * silently report on a store with more metrics than the cap. */
  def seriesStats(samples: DataFrame): DataFrame =
    samples
      .select(col("metric"), col("labels")).distinct()
      .rollup(col("metric"))
      .agg(count(lit(1)).as("n_series"))
      .orderBy(col("n_series").desc, col("metric").asc_nulls_first)
}
