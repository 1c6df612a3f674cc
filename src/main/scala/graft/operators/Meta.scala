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
}
