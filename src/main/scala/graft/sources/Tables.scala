package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables plus the canonical
  * `samples` view — the Spark-side equivalent of the reference's
  * ClickHouse table `metrics.samples(updated_at, metric_name, labels,
  * value)` (reference: README.md:17-28, internal/clickhouse/write.go:34-58).
  *
  * Canonical samples schema (column names are load-bearing — the
  * operator library keys on them):
  *   ts_us  BIGINT        epoch microseconds (exact integer time axis)
  *   ts     TIMESTAMP     same instant, for streaming/watermark use
  *   metric STRING        ≙ metric_name (from __name__)
  *   labels ARRAY<STRING> sorted "k=v" strings ≙ ClickHouse labels
  *   value  DOUBLE
  *
  * The test mapping derives samples from `events.parquet`:
  * metric=event_type, labels=sort([user=<user_id>, k=<props.k>]).
  * `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark only
  * reads with spark.sql.legacy.parquet.nanosAsLong=true (session must
  * set it); ns DIV 1000 truncation matches DuckDB's ns→µs read.
  */
object Tables {
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")

  /** events → canonical samples. Mirrors write.go:34-46 label
    * normalization (sorted "k=v" strings, name split out). */
  def samples(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      expr("ts DIV 1000").as("ts_us"),
      timestamp_micros(expr("ts DIV 1000")).as("ts"),
      col("event_type").as("metric"),
      array_sort(array(
        concat(lit("k="), regexp_extract(col("props"), "[0-9]+", 0)),
        concat(lit("user="), col("user_id").cast("string"))
      )).as("labels"),
      col("value"))

  /** DuckDB CTE computing the identical samples view — prefix for
    * every oracle SQL. DuckDB reads the ns parquet column as
    * TIMESTAMP (µs, truncated), so epoch_us(ts) equals ts DIV 1000. */
  val samplesCte: String =
    """WITH samples AS (
      |  SELECT epoch_us(ts) AS ts_us,
      |         event_type AS metric,
      |         list_sort(['k=' || regexp_extract(props, '[0-9]+'),
      |                    'user=' || user_id]) AS labels,
      |         value
      |  FROM events
      |)""".stripMargin
}
