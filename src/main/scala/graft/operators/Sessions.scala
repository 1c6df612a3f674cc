package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the classic
  * clickstream operator (a session breaks when a user goes quiet for
  * longer than the gap). The reference's engine has no analogue; this
  * is the events-table counterpart of the TSDB operators, built on
  * the normalized `Tables.eventsNorm` schema (event_id, ts_us,
  * user_id, event_type, value, props).
  *
  * Scale shape: [[assign]] is ONE exchange — the per-user window's
  * hash partition — and two window passes over it (lag + running
  * sum), never a self-join. [[stats]] adds one more, lean exchange:
  * the (user_id, session_seq) aggregate re-partitions rows that are
  * already one-per-event with only id/time/value columns. Skewed
  * users (bot traffic) are the 100 TB hazard: the window is
  * per-user sequential, so a user with 10⁸ events serializes —
  * cap or pre-split such users upstream (the same knob the
  * stratified sampler documents).
  */
object Sessions {

  /** Each event with its user-local 1-based `session_seq`: a new
    * session starts at the user's first event and whenever the gap
    * to the previous event exceeds `gapSec`. Deterministic: events
    * order by (ts_us, event_id), so same-µs events tie-break
    * stably. */
  def assign(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "is_new")
  }

  /** One row per session: event count, extent, whole-second duration,
    * and the value sum as PER-EVENT e2-snapped integers summed — the
    * same arithmetic the streaming twin's state fold runs, so the
    * two layers agree for EVERY input, not just values already on
    * the centi-unit lattice (snap-then-sum and sum-then-snap differ
    * once inputs carry more than two decimals). */
  def stats(events: DataFrame, gapSec: Long = 1800L): DataFrame =
    assign(events, gapSec)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        expr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)")
          .as("sum_value_e2"))
      .withColumn("duration_sec", expr("(end_us - start_us) DIV 1000000"))

  /** Earliest-anchor conversion funnel — ClickHouse windowFunnel's
    * deterministic sibling: t₀ = the user's FIRST `steps(0)` event,
    * tₖ = the first `steps(k)` event strictly after tₖ₋₁, and the
    * funnel `level` is the deepest k+1 whose tₖ lands within
    * `windowSec` of t₀ (timestamps increase along the chain, so a
    * deep step in-window implies every intermediate one is too).
    * Documented deviation: windowFunnel searches ALL candidate
    * anchors (a later first-step can sometimes reach deeper); the
    * earliest-anchor form is one-pass, deterministic, and answers
    * the usual product question — time-to-convert from first
    * exposure. One row per user seen in the stream, level 0 when
    * step 1 never fired.
    *
    * Scale shape: ONE exchange (the user hash partition) feeding n
    * chained window passes — each step's min-timestamp window reuses
    * the same partitioning, and the final DISTINCT collapses rows
    * that are already identical per user on that same exchange. */
  def funnel(events: DataFrame, steps: Seq[String],
             windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("user_id"))
    var df = events.select(col("user_id"), col("ts_us"), col("event_type"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val hit =
        if (i == 0) col("event_type") === s
        else col("event_type") === s && col(s"t${i - 1}").isNotNull &&
          col("ts_us") > col(s"t${i - 1}")
      df = df.withColumn(s"t$i", min(when(hit, col("ts_us"))).over(w))
    }
    val wUs = windowSec * 1000000L
    val level = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t$i").isNotNull && col(s"t$i") - col("t0") <= wUs,
        lit(i + 1)).otherwise(acc)
    }
    df.select(col("user_id") +: steps.indices.map(i => col(s"t$i")) :+
      level.cast("long").as("level"): _*).distinct()
  }

  /** Daily cohort retention: each user's cohort is their first active
    * day; the curve counts distinct users active `day_offset` days
    * later. Two lean exchanges — the per-user first-day window, then
    * the (cohort, offset) count over (user, day) rows already
    * reduced to one per pair. */
  def retention(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col("user_id"), expr("ts_us DIV 1000000 DIV 86400").as("day"))
      .distinct()
      .withColumn("cohort_day", min(col("day")).over(w))
      .select(col("user_id"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
