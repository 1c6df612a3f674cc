package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Ingest, PromRemoteCodec, SamplesStore, StreamIngest, TsvBulk}
import graft.ingest.PromRemoteCodec.{PromLabel, PromSample, PromTimeSeries}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions shared by every query and its DuckDB oracle:
  *  - time is exact integer epoch arithmetic (ts_us BIGINT, second
  *    buckets via DIV) — no engine-dependent timestamp semantics;
  *  - label arrays leave the engine as `labels_str` (","-joined,
  *    already sorted) — scalar columns hash identically everywhere;
  *  - order-dependent float aggregates are round(x, 6);
  *  - column names are aliased identically on both sides.
  */
object SparkEntry {

  // events span 2024-01-01..2024-01-30 UTC at every SF.
  private val WinStartMs = 1704412800000L // 2024-01-05T00:00:00Z
  private val WinEndMs   = 1705708800000L // 2024-01-20T00:00:00Z

  private def samples(s: SparkSession, dir: String): DataFrame = Tables.samples(s, dir)

  /** labels ARRAY<STRING> → labels_str for oracle-safe output. */
  private def strLabels(df: DataFrame): DataFrame =
    df.withColumn("labels_str", array_join(col("labels"), ",")).drop("labels")

  /** Flagship: full remote-read pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("read_full_pipeline")(spark, "/root/testdata/sf0.001")

  /** Scratch dir for queries that exercise store/sink round-trips. */
  private def workDir(name: String, dir: String): String =
    s"/tmp/graft_work/${name}_${new java.io.File(dir).getName}"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 ingestion / data model -------------------------------
    "ingest_remote_write" -> ((s, dir) =>
      strLabels(Ingest.decodeWriteRequestBlobs(Ingest.toWriteRequestBlobs(samples(s, dir))))
        .select(expr("ts_us DIV 1000").as("ts_ms"), col("metric"), col("labels_str"), col("value"))),

    "ingest_label_normalize" -> ((s, dir) =>
      strLabels(Ingest.roundTripUnsorted(samples(s, dir)))
        .select(expr("ts_us DIV 1000").as("ts_ms"), col("metric"), col("labels_str"), col("value"))),

    "ingest_samples_sink" -> ((s, dir) => {
      val path = workDir("sink", dir)
      SamplesStore.write(samples(s, dir), path)
      SamplesStore.read(s, path)
        .groupBy(col("metric"), col("date").cast("long").as("date"))
        .agg(count(lit(1)).as("n_samples"), round(sum(col("value")), 6).as("sum_value"))
    }),

    "ingest_bulk_tsv" -> ((s, dir) => {
      val path = workDir("tsv", dir)
      TsvBulk.export(samples(s, dir), path)
      strLabels(TsvBulk.importTsv(s, path))
        .groupBy(col("metric"), col("labels_str"))
        .agg(count(lit(1)).as("n_samples"), round(sum(col("value")), 6).as("sum_value"),
             min(expr("ts_us DIV 1000000")).as("first_t"), max(expr("ts_us DIV 1000000")).as("last_t"))
    }),

    "ingest_streaming" -> ((s, dir) => {
      val src = workDir("stream_src", dir)
      Tables.events(s, dir).write.mode("overwrite").parquet(src)
      StreamIngest.runToMemory(s, src, s"stream_${new java.io.File(dir).getName.replace(".", "_")}")
    }),

    "ingest_delete_range" -> ((s, dir) => {
      val path = workDir("delstore", dir)
      SamplesStore.write(samples(s, dir), path)
      // delete [2024-01-10T12:00Z, 2024-01-14T06:00Z): partial day,
      // three whole days, partial day
      SamplesStore.deleteRange(s, path, 1704888000000000L, 1705212000000000L)
      SamplesStore.read(s, path)
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n_samples"), round(sum(col("value")), 6).as("sum_value"))
    }),

    "read_response_encode" -> ((s, dir) => {
      import s.implicits._
      val asm = SeriesRead.assemble(SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs, Seq(Matchers.eq("__name__", "view")))))
      asm.select(col("metric").as("_1"), col("labels").as("_2"),
          col("points").as("_3").cast("array<struct<_1:bigint,_2:double>>"))
        .as[(String, Seq[String], Seq[(Long, Double)])]
        .map { case (m, ls, pts) =>
          val promLabels = PromLabel("__name__", m) +: ls.map { kv =>
            val i = kv.indexOf('='); PromLabel(kv.substring(0, i), kv.substring(i + 1))
          }
          PromRemoteCodec.encodeReadResponse(Seq(
            PromTimeSeries(promLabels, pts.map(p => PromSample(p._2, p._1 * 1000L)))))
        }
        .flatMap { blob =>
          PromRemoteCodec.decodeReadResponse(blob).flatMap { ts =>
            val metric = ts.labels.find(_.name == "__name__").map(_.value).getOrElse("")
            val rest = ts.labels.filter(_.name != "__name__")
              .map(l => s"${l.name}=${l.value}").sorted.mkString(",")
            ts.samples.map(sm => (metric, rest, sm.timestampMs, sm.value))
          }
        }
        .toDF("metric", "labels_str", "t_ms", "max_value")
    }),

    // ---- §2.2 remote-read path -------------------------------------
    "read_time_range" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs, Nil)))),

    "read_name_eq" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs,
          Seq(Matchers.eq("__name__", "purchase"), Matchers.neq("__name__", "error")))))),

    "read_name_regex" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs,
          Seq(Matchers.re("__name__", "p[a-z]+chase|view"), Matchers.nre("__name__", "vi.w")))))),

    "read_label_eq" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs,
          Seq(Matchers.eq("user", "3"), Matchers.neq("k", "7")))))),

    "read_label_regex" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs,
          Seq(Matchers.re("user", "1[0-2]"), Matchers.nre("k", "4.*")))))),

    "read_ignore_label" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs,
          Seq(Matchers.eq("remote", "clickhouse"), Matchers.eq("user", "5")))))),

    "read_downsample_hint" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir),
        ReadQuery(WinStartMs, WinEndMs,
          Seq(Matchers.eq("__name__", "click")), stepMs = 120000L)))),

    "read_series_agg" -> ((s, dir) => strLabels(
      SeriesRead.select(samples(s, dir), ReadQuery(0L, 0L, Nil)))),

    "read_series_assembly" -> ((s, dir) =>
      SeriesRead.assembleSummary(
        SeriesRead.select(samples(s, dir),
          ReadQuery(WinStartMs, WinEndMs, Seq(Matchers.eq("__name__", "signup")))))),

    "read_full_pipeline" -> ((s, dir) =>
      SeriesRead.assembleSummary(
        SeriesRead.select(samples(s, dir),
          ReadQuery(WinStartMs, WinEndMs,
            Seq(Matchers.re("__name__", "p[a-z]+chase|click"),
                Matchers.eq("user", "7")),
            stepMs = 600000L)))),

    // ---- §2.3 TSDB analytics ---------------------------------------
    "ts_rate_per_second" -> ((s, dir) => strLabels(
      RangeOps.ratePerSecond(RangeOps.dedupPerSecond(samples(s, dir))))),

    "ts_increase" -> ((s, dir) => strLabels(
      RangeOps.increaseDelta(RangeOps.dedupPerSecond(samples(s, dir)), 3600L))),

    "ts_avg_over_time" -> ((s, dir) => strLabels(
      RangeOps.overTime(RangeOps.dedupPerSecond(samples(s, dir)), 3600L,
        Seq(round(avg(col("value")), 6).as("avg_value"))))),

    "ts_minmax_over_time" -> ((s, dir) => strLabels(
      RangeOps.overTime(RangeOps.dedupPerSecond(samples(s, dir)), 3600L,
        Seq(min(col("value")).as("min_value"), max(col("value")).as("max_value"))))),

    "ts_sum_count_over_time" -> ((s, dir) => strLabels(
      RangeOps.overTime(RangeOps.dedupPerSecond(samples(s, dir)), 3600L,
        Seq(round(sum(col("value")), 6).as("sum_value"), count(lit(1)).as("n_points"))))),

    "ts_topk" -> ((s, dir) => strLabels(
      RangeOps.topK(RangeOps.dedupPerSecond(samples(s, dir)), 86400L, 3))),

    "ts_quantile_over_time" -> ((s, dir) =>
      RangeOps.quantileOverTime(RangeOps.dedupPerSecond(samples(s, dir)), 86400L, 0.5)),

    "ts_label_project" -> ((s, dir) =>
      RangeOps.labelProject(samples(s, dir), "user=", 8.0)),

    "ts_last_point" -> ((s, dir) => strLabels(
      RangeOps.lastPoint(RangeOps.dedupPerSecond(samples(s, dir))))),

    "ts_gap_fill" -> ((s, dir) => strLabels(
      RangeOps.gapFill(RangeOps.dedupPerSecond(samples(s, dir)), 3600L))),
  )

  // ---- DuckDB oracles ----------------------------------------------

  private val S = Tables.samplesCte
  private val WinStartSec = WinStartMs / 1000
  private val WinEndSec   = WinEndMs / 1000

  /** SELECT of the reference read SQL shape over a WHERE clause. */
  private def readAgg(where: String, interval: Long = 1L): String =
    s"""$S
       |SELECT metric, array_to_string(labels, ',') AS labels_str,
       |       ts_us // 1000000 // $interval * $interval AS t_sec,
       |       max(value) AS max_value
       |FROM samples
       |WHERE $where
       |GROUP BY 1, 2, 3""".stripMargin

  private val inWin =
    s"ts_us // 1000000 >= $WinStartSec AND ts_us // 1000000 <= $WinEndSec"

  private val dedupCte =
    s"""$S, deduped AS (
       |  SELECT metric, labels, ts_us // 1000000 AS t_sec, max(value) AS value
       |  FROM samples GROUP BY 1, 2, 3
       |)""".stripMargin

  private def summarySql(where: String, interval: Long): String =
    s"""$S, sel AS (
       |  SELECT metric, labels,
       |         ts_us // 1000000 // $interval * $interval AS t_sec,
       |         max(value) AS max_value
       |  FROM samples WHERE $where GROUP BY 1, 2, 3
       |)
       |SELECT metric, array_to_string(labels, ',') AS labels_str,
       |       count(*) AS n_points,
       |       min(t_sec) AS first_t, max(t_sec) AS last_t,
       |       string_agg(t_sec || ':' || printf('%.2f', max_value), ';' ORDER BY t_sec) AS points_str
       |FROM sel GROUP BY 1, 2""".stripMargin

  private val sampleMs =
    s"""$S
       |SELECT ts_us // 1000 AS ts_ms, metric,
       |       array_to_string(labels, ',') AS labels_str, value
       |FROM samples""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ingest_remote_write" -> sampleMs,

    "ingest_label_normalize" -> sampleMs,

    "ingest_samples_sink" ->
      s"""$S
         |SELECT metric, ts_us // 1000000 // 86400 * 86400 AS date,
         |       count(*) AS n_samples, round(sum(value), 6) AS sum_value
         |FROM samples GROUP BY 1, 2""".stripMargin,

    "ingest_bulk_tsv" ->
      s"""$S
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       count(*) AS n_samples, round(sum(value), 6) AS sum_value,
         |       min(ts_us // 1000000) AS first_t, max(ts_us // 1000000) AS last_t
         |FROM samples GROUP BY 1, 2""".stripMargin,

    "ingest_streaming" ->
      s"""$S
         |SELECT metric, count(*) AS n_samples, round(sum(value), 6) AS sum_value
         |FROM samples GROUP BY 1""".stripMargin,

    "ingest_delete_range" ->
      s"""$S
         |SELECT metric, count(*) AS n_samples, round(sum(value), 6) AS sum_value
         |FROM samples
         |WHERE ts_us < 1704888000000000 OR ts_us >= 1705212000000000
         |GROUP BY 1""".stripMargin,

    "read_response_encode" ->
      s"""$S
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       ts_us // 1000000 * 1000 AS t_ms, max(value) AS max_value
         |FROM samples
         |WHERE $inWin AND metric = 'view'
         |GROUP BY 1, 2, 3""".stripMargin,

    "read_time_range" -> readAgg(inWin),

    "read_name_eq" -> readAgg(s"$inWin AND metric = 'purchase' AND metric != 'error'"),

    "read_name_regex" -> readAgg(
      s"$inWin AND regexp_matches(metric, '^p[a-z]+chase|view$$') AND NOT regexp_matches(metric, '^vi.w$$')"),

    "read_label_eq" -> readAgg(
      s"$inWin AND list_contains(labels, 'user=3') AND NOT list_contains(labels, 'k=7')"),

    "read_label_regex" -> readAgg(
      s"$inWin AND len(list_filter(labels, x -> regexp_matches(x, '^user=1[0-2]$$'))) > 0" +
      s" AND NOT len(list_filter(labels, x -> regexp_matches(x, '^k=4.*$$'))) > 0"),

    "read_ignore_label" -> readAgg(s"$inWin AND list_contains(labels, 'user=5')"),

    "read_downsample_hint" -> readAgg(s"$inWin AND metric = 'click'", interval = 60L),

    "read_series_agg" -> readAgg("ts_us // 1000000 >= 0"),

    "read_series_assembly" -> summarySql(s"$inWin AND metric = 'signup'", 1L),

    "read_full_pipeline" -> summarySql(
      s"$inWin AND regexp_matches(metric, '^p[a-z]+chase|click$$') AND list_contains(labels, 'user=7')",
      300L),

    "ts_rate_per_second" ->
      s"""$dedupCte, diffed AS (
         |  SELECT metric, labels, t_sec, value,
         |         value - lag(value) OVER w AS dv,
         |         t_sec - lag(t_sec) OVER w AS dt
         |  FROM deduped
         |  WINDOW w AS (PARTITION BY metric, labels ORDER BY t_sec)
         |)
         |SELECT metric, array_to_string(labels, ',') AS labels_str, t_sec, value,
         |       CASE WHEN dv < 0 THEN NULL ELSE round(dv / dt, 6) END AS rate
         |FROM diffed WHERE dt IS NOT NULL AND dt > 0""".stripMargin,

    "ts_increase" ->
      s"""$dedupCte
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       t_sec // 3600 * 3600 AS bucket,
         |       round(greatest(arg_max(value, t_sec) - arg_min(value, t_sec), 0.0), 6) AS increase,
         |       round(arg_max(value, t_sec) - arg_min(value, t_sec), 6) AS delta,
         |       count(*) AS n_points
         |FROM deduped GROUP BY 1, 2, 3""".stripMargin,

    "ts_avg_over_time" ->
      s"""$dedupCte
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       t_sec // 3600 * 3600 AS bucket,
         |       round(avg(value), 6) AS avg_value
         |FROM deduped GROUP BY 1, 2, 3""".stripMargin,

    "ts_minmax_over_time" ->
      s"""$dedupCte
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       t_sec // 3600 * 3600 AS bucket,
         |       min(value) AS min_value, max(value) AS max_value
         |FROM deduped GROUP BY 1, 2, 3""".stripMargin,

    "ts_sum_count_over_time" ->
      s"""$dedupCte
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       t_sec // 3600 * 3600 AS bucket,
         |       round(sum(value), 6) AS sum_value, count(*) AS n_points
         |FROM deduped GROUP BY 1, 2, 3""".stripMargin,

    "ts_topk" ->
      s"""$dedupCte, bucketed AS (
         |  SELECT metric, labels, t_sec // 86400 * 86400 AS bucket,
         |         round(sum(value), 6) AS sum_value
         |  FROM deduped GROUP BY 1, 2, 3
         |), ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY metric, bucket
         |    ORDER BY sum_value DESC, array_to_string(labels, ',') ASC) AS rk
         |  FROM bucketed
         |)
         |SELECT metric, array_to_string(labels, ',') AS labels_str, bucket, sum_value, rk
         |FROM ranked WHERE rk <= 3""".stripMargin,

    "ts_quantile_over_time" ->
      s"""$dedupCte
         |SELECT metric, t_sec // 86400 * 86400 AS bucket,
         |       round(quantile_cont(value, 0.5), 6) AS q_value,
         |       count(*) AS n_points
         |FROM deduped GROUP BY 1, 2""".stripMargin,

    "ts_label_project" ->
      s"""$S
         |SELECT ts_us, metric,
         |       array_to_string(list_filter(labels, x -> starts_with(x, 'user=')), ',') AS labels_str,
         |       round(value * 8.0, 6) AS scaled_value
         |FROM samples""".stripMargin,

    "ts_last_point" ->
      s"""$dedupCte
         |SELECT metric, array_to_string(labels, ',') AS labels_str,
         |       max(t_sec) AS last_t, arg_max(value, t_sec) AS last_value
         |FROM deduped GROUP BY 1, 2""".stripMargin,

    "ts_gap_fill" ->
      s"""$dedupCte, bucketed AS (
         |  SELECT metric, labels, t_sec // 3600 * 3600 AS bucket,
         |         round(avg(value), 6) AS avg_value
         |  FROM deduped GROUP BY 1, 2, 3
         |), grid AS (
         |  SELECT metric, labels, unnest(generate_series(min(bucket), max(bucket), 3600)) AS bucket
         |  FROM bucketed GROUP BY metric, labels
         |)
         |SELECT g.metric, array_to_string(g.labels, ',') AS labels_str, g.bucket,
         |       last_value(b.avg_value IGNORE NULLS) OVER (
         |         PARTITION BY g.metric, g.labels ORDER BY g.bucket
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
         |       b.avg_value IS NULL AS is_gap
         |FROM grid g LEFT JOIN bucketed b
         |  ON g.metric = b.metric AND g.labels = b.labels AND g.bucket = b.bucket""".stripMargin,
  )
}
