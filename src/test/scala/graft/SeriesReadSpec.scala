package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

class SeriesReadSpec extends SparkSpecBase {

  private lazy val samples = Tables.samples(spark, Sf).cache()

  test("samples view maps events to canonical schema") {
    val row = samples.orderBy("ts_us").first()
    assert(row.getAs[String]("metric") == "error")
    assert(row.getAs[scala.collection.Seq[String]]("labels").toSeq == Seq("k=87", "user=13"))
    assert(samples.count() == 1000)
  }

  test("time range filter matches ms/1000 truncation semantics") {
    val q = ReadQuery(1704412800000L, 1705708800000L, Nil)
    val sel = SeriesRead.select(samples, q)
    val bounds = sel.agg(min("t_sec"), max("t_sec")).first()
    assert(bounds.getLong(0) >= 1704412800L)
    assert(bounds.getLong(1) <= 1705708800L)
  }

  test("name and label matchers follow reference semantics") {
    val eqSel = SeriesRead.select(samples,
      ReadQuery(0, 0, Seq(Matchers.eq("__name__", "purchase"))))
    assert(eqSel.select("metric").distinct().collect().map(_.getString(0)).toSet == Set("purchase"))

    val reSel = SeriesRead.select(samples,
      ReadQuery(0, 0, Seq(Matchers.re("__name__", "p[a-z]+chase|view"),
                          Matchers.nre("__name__", "vi.w"))))
    assert(reSel.select("metric").distinct().collect().map(_.getString(0)).toSet == Set("purchase"))

    val labSel = SeriesRead.selectKeyed(samples,
      ReadQuery(0, 0, Seq(Matchers.eq("user", "3"))))
    assert(labSel.filter(!array_contains(col("labels"), "user=3")).count() == 0)
    assert(labSel.count() > 0)
  }

  test("ignore-label drops the configured EQ matcher only") {
    val withIgnored = SeriesRead.select(samples,
      ReadQuery(0, 0, Seq(Matchers.eq("remote", "clickhouse"), Matchers.eq("user", "5"))))
    val without = SeriesRead.select(samples,
      ReadQuery(0, 0, Seq(Matchers.eq("user", "5"))))
    assert(withIgnored.count() == without.count())
    // but a non-ignored remote matcher filters everything (no such label)
    val strict = SeriesRead.select(samples,
      ReadQuery(0, 0, Seq(Matchers.eq("remote", "clickhouse"))), ignoreLabel = None)
    assert(strict.count() == 0)
  }

  test("downsample hint derives reference interval") {
    assert(Downsample.hintIntervalSec(0, 0) == 0)
    assert(Downsample.hintIntervalSec(2000, 0) == 0)        // <= minStepHint
    assert(Downsample.hintIntervalSec(120000, 0) == 60)     // step/2/1000
    assert(Downsample.hintIntervalSec(120000, 30000) == 15) // range < step wins
    assert(Downsample.hintIntervalSec(2001, 0) == 1)        // clamp to 1s
    assert(Downsample.hintIntervalSec(120000, 0, ignoreHints = true) == 0)
  }

  test("downsampled buckets align to interval starts") {
    val sel = SeriesRead.select(samples,
      ReadQuery(1704412800000L, 1705708800000L, Nil, stepMs = 120000L))
    assert(sel.filter(expr("t_sec % 60 != 0")).count() == 0)
  }

  test("assembly yields one row per series with ordered points") {
    val sel = SeriesRead.selectKeyed(samples, ReadQuery(0, 0, Nil))
    val asm = SeriesRead.assemble(sel)
    assert(asm.count() == sel.select("metric", "labels").distinct().count())
    val pts = asm.filter(size(col("points")) > 1)
      .select(col("points.t_sec")).first().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(pts == pts.sorted)
  }

  test("selector parser covers the PromQL matcher surface and rejects malformed input") {
    import MatcherType._
    assert(Matchers.parseSelector("click") ===
      Some(Seq(LabelMatcher(Eq, "__name__", "click"))))
    assert(Matchers.parseSelector("""click{user="3",k=~"v.*",a!="b",c!~"d"}""") ===
      Some(Seq(
        LabelMatcher(Eq, "__name__", "click"),
        LabelMatcher(Eq, "user", "3"),
        LabelMatcher(Re, "k", "v.*"),
        LabelMatcher(Neq, "a", "b"),
        LabelMatcher(Nre, "c", "d"))))
    assert(Matchers.parseSelector("""{__name__=~"click|view"}""") ===
      Some(Seq(LabelMatcher(Re, "__name__", "click|view"))))
    // escapes in quoted values
    assert(Matchers.parseSelector("""{k="a\"b\\c"}""") ===
      Some(Seq(LabelMatcher(Eq, "k", """a"b\c"""))))
    // malformed: empty, bare braces, unbalanced, junk between pairs
    for (bad <- Seq("", "{}", "{k=\"v\"", "click{k=\"v\" x}", "{k=v}", "1metric"))
      assert(Matchers.parseSelector(bad) === None, s"should reject: $bad")
  }

  test("label_replace gates on a full match, rewrites dst, leaves non-matches untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "m", Seq("shard=old", "user=42"), 1.0),  // match → shard rewritten to 4
      (2L, "m", Seq("user=x9"), 2.0),               // regex does not FULL-match "x9"
      (3L, "m", Seq("k=1"), 3.0)                    // no user label → unchanged
    ).toDF("ts_us", "metric", "labels", "value")
    val out = RangeOps.labelReplace(rows, "shard", "user", "([0-9])[0-9]*")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "shard=4,user=42")
    assert(out(2L) == "user=x9")
    assert(out(3L) == "k=1")
  }

  test("binary op: sum-by-label ratio matches hand computation, zero denominator yields NULL") {
    import spark.implicits._
    val deduped = Seq(
      ("a", Seq("k=1", "user=7"), 100L, 2.0),
      ("a", Seq("k=2", "user=7"), 200L, 4.0),   // same user+bucket as above
      ("b", Seq("k=9", "user=7"), 300L, 8.0),
      ("a", Seq("k=1", "user=8"), 100L, 1.0),
      ("b", Seq("k=1", "user=8"), 100L, 0.0),   // zero denominator
      ("a", Seq("k=1", "user=9"), 100L, 5.0)    // no matching b side
    ).toDF("metric", "labels", "t_sec", "value")
    val out = RangeOps.binaryOpByLabel(deduped, "a", "b", "user", 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(out == Set(
      // user=7: a = 2.0 + 4.0 = 6.0 → 600, b = 8.0 → 800, ratio 0.75
      ("user=7", 0L, 600L, 800L, Some(750000L)),
      // user=8: denominator sums to zero → NULL ratio
      ("user=8", 0L, 100L, 0L, None)))
  }

  test("offset compare: the shifted point comes from exactly offset seconds back") {
    import spark.implicits._
    val deduped = Seq(
      ("m", Seq("user=1"), 0L, 1.0),        // bucket 0
      ("m", Seq("user=1"), 86400L, 3.0),    // bucket 86400 → prev = bucket 0
      ("m", Seq("user=1"), 90000L, 5.0),    // bucket 90000 → 3600 back is empty → NULL
      ("m", Seq("user=2"), 86400L, 7.0)     // other series, no day-old point → NULL
    ).toDF("metric", "labels", "t_sec", "value")
    val out = RangeOps.offsetCompare(deduped, 3600L, 86400L)
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    assert(out == Set(
      ("user=1", 0L, None, None),
      ("user=1", 86400L, Some(100000L), Some(200000L)),  // 3.0 vs 1.0 → +2.0
      ("user=1", 90000L, None, None),
      ("user=2", 86400L, None, None)))
  }

  test("rate guard: negative differences become NULL, dt>0 enforced") {
    val rated = RangeOps.ratePerSecond(RangeOps.dedupPerSecond(samples))
    assert(rated.filter(col("rate_e6") < 0).count() == 0)
    assert(rated.count() > 0)
  }

  test("gap fill produces dense grid with carried values") {
    val gf = RangeOps.gapFill(RangeOps.dedupPerSecond(samples), 3600L)
    assert(gf.filter(col("filled_value").isNull).count() == 0)
    assert(gf.filter(col("is_gap")).count() > 0) // synthetic data is sparse hourly
  }

  test("histogram_quantile estimates are bounded and monotone in q") {
    val q50 = RangeOps.histogramQuantile(samples, 86400L, 0.5)
      .select(col("metric"), col("t_sec"), col("q_est_e6").as("e50"))
    val q90 = RangeOps.histogramQuantile(samples, 86400L, 0.9)
      .select(col("metric"), col("t_sec"), col("q_est_e6").as("e90"))
    val joined = q50.join(q90, Seq("metric", "t_sec")).cache()
    try {
      assert(joined.count() > 0)
      assert(joined.filter(col("e50") < 0 ||
        col("e90") > RangeOps.DefaultLes.last * 1e6).count() == 0)
      assert(joined.filter(col("e50") > col("e90")).count() == 0, "quantile must be monotone in q")
    } finally joined.unpersist()
  }

  test("irate takes the bucket's last two points, handles resets, NULLs singletons") {
    import spark.implicits._
    val deduped = Seq(
      ("m", Seq("user=1"), 100L, 10.0),   // dropped: only last TWO points rate
      ("m", Seq("user=1"), 200L, 20.0),
      ("m", Seq("user=1"), 300L, 26.0),   // irate = (26-20)/100 = 0.06
      ("m", Seq("user=2"), 100L, 5.0),    // singleton bucket → NULL
      ("m", Seq("user=3"), 100L, 50.0),
      ("m", Seq("user=3"), 200L, 3.0)     // reset: delta = post-reset value 3.0
    ).toDF("metric", "labels", "t_sec", "value")
    val out = RangeOps.irate(deduped, 3600L)
      .collect().map(r => (r.getString(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))).toSet
    assert(out == Set(
      ("user=1", Some(60000L), 2L),
      ("user=2", None, 1L),
      ("user=3", Some(30000L), 2L)))
  }

  test("changes counts value differences into the later bucket, first point free") {
    import spark.implicits._
    val deduped = Seq(
      ("m", Seq("u=1"), 100L, 1.0),
      ("m", Seq("u=1"), 200L, 1.0),      // no change
      ("m", Seq("u=1"), 300L, 2.0),      // change
      ("m", Seq("u=1"), 21700L, 3.0)     // change, lands in SECOND bucket
    ).toDF("metric", "labels", "t_sec", "value")
    val out = RangeOps.changes(deduped, 21600L)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out == Map(0L -> 1L, 21600L -> 1L))
  }

  test("clamp bounds values both ways and one-sided") {
    val out = RangeOps.clamp(RangeOps.dedupPerSecond(samples), 50.0, 300.0)
    assert(out.filter(col("clamped") < 50.0 || col("clamped") > 300.0).count() == 0)
    assert(out.filter(col("clamped_min") < 50.0).count() == 0)
    assert(out.filter(col("clamped_max") > 300.0).count() == 0)
    assert(out.count() == RangeOps.dedupPerSecond(samples).count())
  }

  test("bottomk is topk's mirror: k quietest series, deterministic ties") {
    val bot = RangeOps.bottomK(RangeOps.dedupPerSecond(samples), 86400L, 3)
    val top = RangeOps.topK(RangeOps.dedupPerSecond(samples), 86400L, 3)
    assert(bot.filter(col("rk") > 3).count() == 0)
    // on any (metric, bucket) with >3 series the sets differ
    val botMin = bot.groupBy("metric", "bucket").agg(min("sum_value").as("b"))
    val topMax = top.groupBy("metric", "bucket").agg(max("sum_value").as("t"))
    val j = botMin.join(topMax, Seq("metric", "bucket"))
    assert(j.filter(col("b") > col("t")).count() == 0)
  }

  test("absent_over_time grid covers every metric × bucket; absent ⇔ zero points") {
    val deduped = RangeOps.dedupPerSecond(samples)
    val out = RangeOps.absentOverTime(deduped, 86400L, 1704412800L, 1705708800L)
    val nMetrics = deduped.select("metric").distinct().count()
    val nBuckets = (1705708800L - 1704412800L) / 86400L
    assert(out.count() == nMetrics * nBuckets)
    assert(out.filter(col("absent") && col("n_points") > 0).count() == 0)
    assert(out.filter(!col("absent") && col("n_points") === 0).count() == 0)
  }

  test("chunked serving splits a long series into capped, contiguous frames") {
    import graft.ingest.PromRemoteCodec
    import graft.serve.RemoteRead
    import spark.implicits._
    // a DENSE fixture: two series × 500 samples → 5 chunks each (the
    // 120-sample chunk split), enough for the frame cap to bite
    val dense = (0 until 500).flatMap(i => Seq(
      ((1704412800L + i * 15) * 1000000L, "click", Seq("k=a"), i.toDouble),
      ((1704412800L + i * 15) * 1000000L, "click", Seq("k=b"), i * 2.0)))
      .toDF("ts_us", "metric", "labels", "value")
    val q = ReadQuery(1704412800000L, 1704412800000L + 500L * 15000L,
      Seq(Matchers.eq("__name__", "click")))
    val blob = PromRemoteCodec.encodeReadRequestWithTypes(Seq(q), Seq(1))
    def seriesOf(body: Array[Byte]) = PromRemoteCodec.decodeChunkedFrames(body)
      .flatMap(_._2).map(cs => (cs.labels, cs.chunks))
    val whole = seriesOf(RemoteRead.serveChunked(dense, blob))
    assert(whole.size === 2 && whole.forall(_._2.size === 5),
      s"fixture shape: ${whole.map(_._2.size)}")
    // a tiny frame cap splits series across CONSECUTIVE frames that
    // repeat the labels (Prometheus's maxBytesInFrame behavior); the
    // concatenation reassembles exactly and ordering survives
    val capped = seriesOf(RemoteRead.serveChunked(dense, blob,
      maxFrameBytes = 256))
    assert(capped.size > whole.size, "the cap must split frames")
    capped.foreach { case (_, chunks) =>
      assert(chunks.map(c => c.data.length + 24).sum <= 256 || chunks.size == 1,
        "each multi-chunk frame respects the cap")
    }
    def flat(ss: Seq[(Seq[PromRemoteCodec.PromLabel], Seq[PromRemoteCodec.PromChunk])]) =
      ss.flatMap { case (ls, cs) => cs.map(c => (ls, c.minTimeMs,
        c.data.toSeq)) }
    assert(flat(capped) === flat(whole), "reassembly must be exact")
    // contiguity: a series' frames are adjacent, never interleaved
    val order = capped.map(_._1)
    assert(order.distinct.size === order.foldLeft((List.empty[Seq[PromRemoteCodec.PromLabel]], 0)) {
      case ((seen, n), ls) =>
        if (seen.headOption.contains(ls)) (seen, n) else (ls :: seen, n + 1)
    }._2, "split frames must stay contiguous per series")
  }

  test("every declared query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
