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
  * `events.ts` has shipped in two parquet generations — INT64
  * TIMESTAMP(NANOS) (readable only as raw longs via
  * spark.sql.legacy.parquet.nanosAsLong=true) and a native µs
  * timestamp — so [[eventsNorm]] dispatches on the read schema and
  * both normalize to the same epoch-µs BIGINT axis DuckDB's
  * epoch_us(ts) yields on either file.
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

  /** events with the time axis normalized to epoch-µs BIGINT
    * `ts_us`, whichever parquet generation produced the file: INT64
    * TIMESTAMP(NANOS) arrives as raw nano longs (nanosAsLong) and
    * truncates, a native (NTZ) µs timestamp converts under the UTC
    * session. The canonical staging schema for streaming sources. */
  def eventsNorm(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val tsUs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    ev.select(col("event_id"), tsUs.as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  /** events → canonical samples. Mirrors write.go:34-46 label
    * normalization (sorted "k=v" strings, name split out). */
  def samples(spark: SparkSession, dir: String): DataFrame =
    eventsNorm(spark, dir).select(
      col("ts_us"),
      timestamp_micros(col("ts_us")).as("ts"),
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
