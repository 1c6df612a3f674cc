package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessions

/** Gap-based sessionization semantics (operators/Sessions.scala):
  * break exactly past the gap, per-user locality, deterministic
  * same-µs tie-breaks, exact session stats. */
class SessionsSpec extends SparkSpecBase {

  private def ev(rows: (Long, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "value")
      .withColumn("event_type", lit("e"))
      .withColumn("props", lit("{}"))
  }

  test("sessions break strictly past the gap; boundaries are per-user") {
    val gap = 60L // seconds
    val events = ev(
      (1L, 0L, 7L, 1.0),
      (2L, 60000000L, 7L, 2.0),  // exactly gap → SAME session (> only)
      (3L, 120000001L, 7L, 3.0), // 60.000001s after #2 → new session
      (4L, 1000000L, 9L, 4.0)    // other user: own first session
    )
    val out = Sessions.assign(events, gap)
      .select("event_id", "user_id", "session_seq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((7L, 1L)))
    assert(out(2L) === ((7L, 1L)), "a gap of exactly gapSec must NOT break")
    assert(out(3L) === ((7L, 2L)))
    assert(out(4L) === ((9L, 1L)), "session numbering is user-local")
  }

  test("stats aggregate each session exactly") {
    val events = ev(
      (1L, 0L, 7L, 1.25),
      (2L, 30000000L, 7L, 2.50),
      (3L, 200000000L, 7L, 0.125) // new session after 170 s (gap 60)
    )
    val out = Sessions.stats(events, 60L)
      .orderBy("session_seq").collect()
    assert(out.length === 2)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") === 2L)
    assert(s1.getAs[Long]("start_us") === 0L)
    assert(s1.getAs[Long]("end_us") === 30000000L)
    assert(s1.getAs[Long]("duration_sec") === 30L)
    assert(s1.getAs[Long]("sum_value_e2") === 375L) // 1.25 + 2.50
    val s2 = out(1)
    assert(s2.getAs[Long]("n_events") === 1L)
    assert(s2.getAs[Long]("duration_sec") === 0L)
    assert(s2.getAs[Long]("sum_value_e2") === 13L) // 0.125 e2-snaps half-up
  }

  test("same-microsecond events tie-break on event_id deterministically") {
    val events = ev(
      (5L, 1000L, 7L, 1.0),
      (4L, 1000L, 7L, 1.0), // same ts — must order 4 before 5
      (6L, 70000000L + 1000L + 1L, 7L, 1.0))
    val out = Sessions.assign(events, 60L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(4L) === 1L && out(5L) === 1L && out(6L) === 2L)
  }

  test("funnel levels: in-order, out-of-order, out-of-window, absent steps") {
    import spark.implicits._
    val min = 60L * 1000000L
    def e(id: Long, user: Long, tMin: Long, typ: String) =
      (id, tMin * min, user, typ, 1.0, "{}")
    val events = Seq(
      // user 1: full funnel inside the window
      e(1, 1, 0, "view"), e(2, 1, 5, "click"), e(3, 1, 10, "purchase"),
      // user 2: click BEFORE view — only the view counts (level 1)
      e(4, 2, 0, "click"), e(5, 2, 5, "view"),
      // user 3: purchase after the window → level 2
      e(6, 3, 0, "view"), e(7, 3, 5, "click"), e(8, 3, 200, "purchase"),
      // user 4: never saw step 1 → level 0
      e(9, 4, 0, "purchase"),
      // user 5: same-µs click and view — strict > demands click AFTER
      e(10, 5, 0, "view"), e(11, 5, 0, "click")
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val out = graft.operators.Sessions.funnel(events,
        Seq("view", "click", "purchase"), 60L * 60) // 1h window
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("level")).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L))
    // one row per user
    assert(out.size === 5)
  }

  test("retention counts distinct users per cohort/offset") {
    import spark.implicits._
    val day = 86400L * 1000000L
    def e(id: Long, user: Long, d: Long) =
      (id, d * day + id, user, "view", 1.0, "{}")
    val events = Seq(
      e(1, 1, 0), e(2, 1, 0), e(3, 1, 2), // user1: cohort 0, days 0 & 2
      e(4, 2, 0), e(5, 2, 1),             // user2: cohort 0, days 0 & 1
      e(6, 3, 2)                          // user3: cohort 2, day 2
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val out = graft.operators.Sessions.retention(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, // users 1, 2 on their cohort day
      (0L, 1L) -> 1L, // user 2 back next day
      (0L, 2L) -> 1L, // user 1 back on day 2
      (2L, 0L) -> 1L  // user 3's own cohort
    ))
  }

  test("as-of join: latest at-or-before per key, NULL before first, no join operator") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 7L), (2L, 200L, 7L), (3L, 50L, 7L), // 50 precedes any right row
      (4L, 100L, 9L)                                  // other key
    ).toDF("event_id", "ts_us", "user_id")
    val right = Seq(
      (7L, 100L, 1.5), // ties with event 1's ts → ≤ matches
      (7L, 150L, 2.5),
      (9L, 90L, 9.0)
    ).toDF("user_id", "ts_us", "v")
    val out = graft.operators.Joins.asof(left, right, "user_id", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> Some(1.5), // same-µs right row is visible (≤, not <)
      2L -> Some(2.5),
      3L -> None,      // nothing at or before 50
      4L -> Some(9.0)))
    // the plan is a union + window: ONE exchange, ZERO join operators
    val p = graft.operators.Joins.asof(left, right, "user_id", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must compile join-free:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"as-of must shuffle exactly once (the per-key window):\n$p")
    // multi-column payloads are ROW-ATOMIC: a NULL inside the as-of
    // row answers as NULL, never backfilled from an older right row
    val right2 = Seq(
      (7L, 5L, Some(0.5), Some(7.0)),
      (7L, 10L, Some(1.5), Option.empty[Double])
    ).toDF("user_id", "ts_us", "a", "b")
    val atomic = graft.operators.Joins.asof(
        Seq((9L, 20L, 7L)).toDF("event_id", "ts_us", "user_id"),
        right2, "user_id", Seq("a", "b"))
      .collect().head
    assert(atomic.getDouble(3) === 1.5)
    assert(atomic.isNullAt(4),
      "the as-of row's own NULL must not tear to an older row's value")
    // duplicate right (key, ts_us) rows: the answer is DETERMINISTIC
    // (greatest payload struct), not partition-order luck — repeated
    // runs over a shuffled right side always agree
    val dupRight = Seq((7L, 100L, 2.0), (7L, 100L, 1.0), (7L, 100L, 3.0))
      .toDF("user_id", "ts_us", "v").repartition(8)
    val one = Seq((1L, 150L, 7L)).toDF("event_id", "ts_us", "user_id")
    (1 to 3).foreach { _ =>
      val got = graft.operators.Joins.asof(one, dupRight, "user_id", Seq("v"))
        .collect().head.getDouble(3)
      assert(got === 3.0, "tied right rows must answer the greatest payload")
    }
  }

  test("range join: exact containment across bucket boundaries, inner semantics") {
    import spark.implicits._
    val pts = Seq(
      (1L, 500L, 7L),      // inside iv A
      (2L, 1000L, 7L),     // == A.end (exclusive) → only iv B (starts at 1000)
      (3L, 2999L, 7L),     // inside B, last µs
      (4L, 3000L, 7L),     // == B.end → unmatched, drops
      (5L, 500L, 9L)       // other key, no interval → drops
    ).toDF("event_id", "ts_us", "user_id")
    val ivs = Seq(
      (7L, "A", 0L, 1000L),
      (7L, "B", 1000L, 3000L)
    ).toDF("user_id", "iv", "start_us", "end_us")
    // bucketSec=1 (µs buckets of 1e6): intervals span several buckets
    // — the explode must cover every overlapped bucket
    val out = graft.operators.Joins.range(pts, ivs, "user_id", 1L)
      .select("event_id", "iv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "A", 2L -> "B", 3L -> "B"))
    // a coarse bucket (everything in bucket 0) answers identically
    val coarse = graft.operators.Joins.range(pts, ivs, "user_id", 3600L)
      .select("event_id", "iv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(coarse === out, "bucket width must never change the answer")
    // an inverted interval (bad data) is dropped before the bucket
    // explode — no descending sequence, no spurious rows
    val bad = ivs.union(Seq((7L, "X", 3600000000L, 0L))
      .toDF("user_id", "iv", "start_us", "end_us"))
    val guarded = graft.operators.Joins.range(pts, bad, "user_id", 1L)
      .select("event_id", "iv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(guarded === out)
    // an absurdly LONG interval (bogus far-future end) would explode
    // sequence() toward 2^31 buckets and fail the job — the span cap
    // drops it instead, leaving the sane intervals' answers intact
    val far = ivs.union(Seq((7L, "Y", 0L, Long.MaxValue / 2))
      .toDF("user_id", "iv", "start_us", "end_us"))
    val capped = graft.operators.Joins.range(pts, far, "user_id", 1L)
      .select("event_id", "iv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(capped === out)
    // …and BOTH sanity drops are observable, never silent: the two
    // filtered intervals (inverted X, runaway Y) land on the ops
    // counter via the in-plan observe metric (listener fires on
    // action completion — poll briefly, it is async)
    val ctr = graft.OpsMetrics(spark).rangeDroppedIntervals
    val before = ctr.value
    graft.operators.Joins.range(pts, bad.union(
        Seq((7L, "Y", 0L, Long.MaxValue / 2))
          .toDF("user_id", "iv", "start_us", "end_us")),
      "user_id", 1L).count()
    val deadline = System.nanoTime() + 10000000000L
    while (ctr.value < before + 2 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(ctr.value >= before + 2,
      s"dropped intervals not counted: ${ctr.value} vs $before")
  }

  test("the real events table sessionizes consistently at both layers") {
    val events = graft.sources.Tables.eventsNorm(spark, Sf)
    val assigned = Sessions.assign(events)
    // session_seq is dense 1..max per user
    val bad = assigned.groupBy("user_id")
      .agg(max("session_seq").as("mx"), countDistinct("session_seq").as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad === 0L, "session_seq must be dense per user")
    // stats reconcile with the assignment
    val statsN = Sessions.stats(events)
      .agg(sum("n_events")).first().getLong(0)
    assert(statsN === events.count())
  }
}
