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
    * and the e2-snapped value sum (the store's exact-decimal
    * convention, so the oracle hash-matches). */
  def stats(events: DataFrame, gapSec: Long = 1800L): DataFrame =
    assign(events, gapSec)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        expr("CAST(floor(sum(value) * 100 + 0.5) AS BIGINT)").as("sum_value_e2"))
      .withColumn("duration_sec", expr("(end_us - start_us) DIV 1000000"))
}
