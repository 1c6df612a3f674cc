package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Step/range-hint downsampling — the Spark twin of the reference's
  * `toStartOfInterval(updated_at, INTERVAL n second)` time-field
  * rewrite (reference: internal/clickhouse/read.go:36-56).
  *
  * Interval derivation preserved exactly: hints apply only when
  * stepMs > 2000 (read.go:13 minStepHintMs); interval =
  * min(stepMs, rangeMs>0 ? rangeMs : stepMs) / 2 / 1000 seconds,
  * clamped to ≥ 1s ("the hints seem optimistic, return more
  * datapoints than asked for").
  */
object Downsample {
  val MinStepHintMs = 2000L // read.go:13

  /** 0 = no downsampling (group at native 1s DateTime resolution). */
  def hintIntervalSec(stepMs: Long, rangeMs: Long, ignoreHints: Boolean = false): Long =
    if (ignoreHints || stepMs <= MinStepHintMs) 0L
    else {
      var interval = stepMs
      if (rangeMs > 0 && rangeMs < stepMs) interval = rangeMs
      interval /= 2
      interval /= 1000
      math.max(interval, 1L)
    }

  /** Epoch-second bucket start for an epoch-µs column. Pure integer
    * arithmetic (BIGINT DIV) so Spark and any SQL oracle agree
    * bit-for-bit; stays inside whole-stage codegen. */
  def bucketSec(tsUsCol: String, intervalSec: Long): Column = {
    require(intervalSec >= 1, s"intervalSec must be >= 1, got $intervalSec")
    expr(s"$tsUsCol DIV 1000000 DIV $intervalSec * $intervalSec")
  }
}
