package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.ingest.SamplesStore
import graft.sources.Tables

/** SamplesStore invariants: day partitioning, and the within-file
  * (metric, labels, ts_us) sort order surviving boundary-day rewrites
  * in deleteRange (row-group min/max pruning depends on it). */
class StoreSpec extends SparkSpecBase {

  private def sortedWithinFiles(path: String): Boolean = {
    val dayDirs = new File(path).listFiles().filter(f => f.isDirectory && f.getName.startsWith("date="))
    // a store that silently wrote nothing must NOT satisfy the sort
    // invariant vacuously: require day dirs, each with parquet files
    dayDirs.nonEmpty && dayDirs.forall { day =>
      val files = day.listFiles().filter(_.getName.endsWith(".parquet"))
      files.nonEmpty && files.forall { f =>
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select(col("metric"), array_join(col("labels"), ",").as("ls"), col("ts_us"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        rows.sameElements(rows.sortBy(identity))
      }
    }
  }

  test("write day-partitions and sorts within files") {
    val path = "/tmp/graft_test/store_sort"
    SamplesStore.write(Tables.samples(spark, Sf), path)
    assert(sortedWithinFiles(path))
  }

  test("deleteRange drops whole days and keeps boundary files sorted") {
    val path = "/tmp/graft_test/store_delete"
    val samples = Tables.samples(spark, Sf)
    SamplesStore.write(samples, path)
    val total = samples.count()
    // delete [2024-01-10T12:00Z, 2024-01-14T06:00Z): two boundary days
    // rewrite, three whole days drop as directories.
    val startUs = 1704888000000000L
    val endUs = 1705212000000000L
    SamplesStore.deleteRange(spark, path, startUs, endUs)

    val back = SamplesStore.read(spark, path)
    val expected = samples.filter(col("ts_us") < startUs || col("ts_us") >= endUs).count()
    assert(back.count() == expected && expected < total)
    assert(back.filter(col("ts_us") >= startUs && col("ts_us") < endUs).count() == 0)

    // whole days inside the range are gone as directories
    val dayNames = new File(path).listFiles().map(_.getName).filter(_.startsWith("date=")).toSet
    assert(!dayNames.contains("date=1704931200")) // 2024-01-11, fully inside
    assert(dayNames.contains("date=1704844800"))  // 2024-01-10, boundary rewrite

    assert(sortedWithinFiles(path))
  }

  test("compact folds fragmented appends into one sorted file per day") {
    val path = "/tmp/graft_test/store_compact"
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    SamplesStore.append(samples.filter(expr("ts_us % 2 = 0")), path)
    SamplesStore.append(samples.filter(expr("ts_us % 2 = 1")), path)

    def filesPerDay: Map[String, Int] =
      new File(path).listFiles().filter(f => f.isDirectory && f.getName.startsWith("date="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerDay.nonEmpty && filesPerDay.values.exists(_ >= 2),
      "two appends must fragment at least one day")

    val before = SamplesStore.read(spark, path)
      .select("ts_us", "metric", "labels", "value").collect().toSet
    SamplesStore.compact(spark, path)
    val after = filesPerDay
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction must leave one file per day, got $after")
    val rows = SamplesStore.read(spark, path)
      .select("ts_us", "metric", "labels", "value").collect().toSet
    assert(rows == before, "compaction must be result-invariant")
    assert(sortedWithinFiles(path))
  }

  test("appendBatch is idempotent per batchId and survives compaction") {
    val path = "/tmp/graft_test/store_batch"
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    val b0 = samples.filter(expr("ts_us % 2 = 0"))
    val b1 = samples.filter(expr("ts_us % 2 = 1"))
    SamplesStore.appendBatch(b0, path, 0L)
    val afterB0 = SamplesStore.read(spark, path).count()
    assert(afterB0 == b0.count())
    // a checkpoint-replayed batch must be a no-op
    SamplesStore.appendBatch(b0, path, 0L)
    assert(SamplesStore.read(spark, path).count() == afterB0,
      "replaying a committed batchId must not duplicate rows")
    SamplesStore.appendBatch(b1, path, 1L)
    assert(SamplesStore.read(spark, path).count() == samples.count())
    assert(sortedWithinFiles(path))
    // commit markers survive a compaction, so replays stay no-ops
    SamplesStore.compact(spark, path)
    SamplesStore.appendBatch(b1, path, 1L)
    assert(SamplesStore.read(spark, path).count() == samples.count(),
      "replay after compaction must still short-circuit")
  }

  test("sustained appends keep per-day file counts bounded via auto-compaction") {
    val path = "/tmp/graft_test/store_autocompact"
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    val batch = Tables.samples(spark, Sf).limit(200).cache()
    val perBatch = batch.count()
    def maxFilesPerDay: Int =
      new File(path).listFiles().filter(f => f.isDirectory && f.getName.startsWith("date="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    for (i <- 0 until 6) {
      SamplesStore.appendBatch(batch, path, i.toLong, autoCompactFilesPerDay = 2)
      assert(maxFilesPerDay <= 3,
        s"append $i: auto-compaction must keep per-day file counts bounded")
    }
    assert(SamplesStore.read(spark, path).count() == 6 * perBatch,
      "auto-compaction must not lose or duplicate rows")
    assert(sortedWithinFiles(path))
  }

  test("a crashed compaction swap is repaired by the next mutation, never lost") {
    val path = "/tmp/graft_test/store_swapcrash"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(path), true); fs.delete(p(path + ".old"), true); fs.delete(p(path + ".compacting"), true)
    val samples = Tables.samples(spark, Sf).cache()
    val b0 = samples.filter(expr("ts_us % 2 = 0"))
    val b1 = samples.filter(expr("ts_us % 2 = 1"))
    SamplesStore.appendBatch(b0, path, 0L)
    val rowsBefore = SamplesStore.read(spark, path).count()

    // crash state 1: between the two swap renames — `.old` holds the
    // ONLY copy, the live path is gone, a stale rewrite sits in
    // `.compacting`. An unaware append would re-create an empty store
    // and the next compact would delete `.old` — total data loss.
    assert(fs.rename(p(path), p(path + ".old")))
    fs.mkdirs(p(path + ".compacting"))
    SamplesStore.appendBatch(b1, path, 1L) // must recover FIRST
    assert(SamplesStore.read(spark, path).count() == samples.count(),
      "recovery must restore the stranded .old copy before appending")
    assert(!fs.exists(p(path + ".old")) && !fs.exists(p(path + ".compacting")))
    // the restored markers still short-circuit replays
    SamplesStore.appendBatch(b0, path, 0L)
    assert(SamplesStore.read(spark, path).count() == samples.count())

    // crash state 2: after the swap, before the marker carry — the
    // live path has data but no _commits; `.old` still holds them.
    // Losing the markers would re-append every batch on replay.
    assert(fs.mkdirs(p(path + ".old")))
    assert(fs.rename(p(s"$path/_commits"), p(s"$path.old/_commits")))
    SamplesStore.appendBatch(b1, path, 1L) // replay: must see carried markers
    assert(SamplesStore.read(spark, path).count() == samples.count(),
      "carried markers must keep the replay a no-op")
    assert(!fs.exists(p(path + ".old")))
    assert(rowsBefore < samples.count())
  }

  test("compactFragmentedDays rewrites only the fragmented day, splitting by size") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_selective"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L // 2024-01-05
    val day1 = day0 + 86400
    def rowsFor(daySec: Long, off: Int) =
      (0 until 40).map(i =>
        (daySec * 1000000L + (off * 40 + i) * 1000000L, s"m${i % 7}", Seq(s"k=v$i"), i.toDouble))
        .toDF("ts_us", "metric", "labels", "value")
    for (i <- 0 until 4) SamplesStore.append(rowsFor(day0, i), path) // day0: 4 files
    SamplesStore.append(rowsFor(day1, 0), path)                      // day1: 1 file
    def files(dayName: String): Set[String] =
      new File(path, dayName).listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val day1Before = files(s"date=$day1")
    val before = SamplesStore.read(spark, path)
      .select("ts_us", "metric", "labels", "value").collect().toSet

    // a tiny target size forces the fragmented day to split into
    // multiple metric-range files — the hot-day shape at 100 TB
    val n = SamplesStore.compactFragmentedDays(spark, path,
      maxFilesPerDay = 2, targetFileBytes = 2048L)
    assert(n == 1, "only the over-threshold day must be rewritten")
    assert(files(s"date=$day1") == day1Before,
      "a healthy day's files must be byte-identical (same names, never rewritten)")
    assert(files(s"date=$day0").size > 1,
      "a day larger than targetFileBytes must fold into multiple range files")
    // at the default target the same day folds all the way to one file
    assert(SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 1) == 1)
    assert(files(s"date=$day0").size == 1)
    assert(files(s"date=$day1") == day1Before)
    val rows = SamplesStore.read(spark, path)
      .select("ts_us", "metric", "labels", "value").collect().toSet
    assert(rows == before, "selective compaction must be result-invariant")
    assert(sortedWithinFiles(path))
    // idempotent: nothing left over threshold
    assert(SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 2) == 0)
  }

  test("an append landing during compaction staging is never lost") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_stage_race"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      (0 until 30).map(i => (day0 * 1000000L + (off * 30 + i) * 1000000L,
        s"m${i % 5}", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    for (i <- 0 until 3) SamplesStore.append(rowsFor(i), path)
    val baseCount = SamplesStore.read(spark, path).count()

    // the test seam fires between STAGE and SWAP — exactly the window
    // where a /write can add files to a day being compacted
    var appended = false
    val n = SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 2,
      afterStage = () => { SamplesStore.append(rowsFor(3), path); appended = true })
    assert(appended)
    assert(n == 0, "a day that gained files during staging must NOT be swapped")
    assert(SamplesStore.read(spark, path).count() == baseCount + 30,
      "neither the staged rows nor the concurrent append may be lost")
    // nothing in flight anymore: the next probe folds the day
    assert(SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 2) == 1)
    assert(SamplesStore.read(spark, path).count() == baseCount + 30)
    assert(sortedWithinFiles(path))
  }

  test("a crashed day swap is repaired by the next mutation") {
    val path = "/tmp/graft_test/store_dayswapcrash"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    SamplesStore.write(samples, path)
    val total = samples.count()
    val day = new File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("date=")).head.getName

    // crash state: between swapDay's two renames — the aside copy is
    // the ONLY copy of the day, plus a stale half-written rewrite dir
    assert(fs.rename(p(s"$path/$day"), p(s"$path/.old_$day")))
    fs.mkdirs(p(s"$path/.rewrite_$day"))
    // day-level miss: the live listing no longer has the day
    assert(SamplesStore.read(spark, path).count() < total)

    // ANY mutation repairs first — restore the day, drop the remnant
    SamplesStore.maybeCompact(spark, path)
    assert(SamplesStore.read(spark, path).count() == total,
      "recovery must restore the stranded day from its aside copy")
    assert(!fs.exists(p(s"$path/.old_$day")) && !fs.exists(p(s"$path/.rewrite_$day")))

    // completed-swap crash state: live day present, aside copy stale
    assert(fs.mkdirs(p(s"$path/.old_$day")))
    SamplesStore.maybeCompact(spark, path)
    assert(!fs.exists(p(s"$path/.old_$day")), "a stale aside copy is dropped")
    assert(SamplesStore.read(spark, path).count() == total)
  }

  test("readLocked reads never observe a half-swapped store during compaction") {
    val path = "/tmp/graft_test/store_readlock"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    SamplesStore.write(samples, path)
    val total = samples.count()
    val extra = samples.limit(50).cache(); extra.count()

    // reader thread: hammer locked reads. The visibility contract is
    // NOT snapshot isolation (an append's samples may appear
    // gradually — remote-write has no atomicity contract) but it IS
    // no-day-loss: counts never dip below the seeded total and never
    // go backwards (appends only add; compaction is result-invariant;
    // a half-swapped day would violate both — the crashed-day-swap
    // test above demonstrates exactly that state).
    @volatile var stop = false
    val bad = new java.util.concurrent.atomic.AtomicLong(0)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() => {
      var lastSeen = 0L
      while (!stop) {
        val n = SamplesStore.readLocked(path)(SamplesStore.read(spark, path).count())
        seen.incrementAndGet()
        if (n < total || n < lastSeen) bad.incrementAndGet()
        lastSeen = n
      }
    })
    reader.start()
    try {
      // mutate continuously: append small batches into the hot day,
      // compact selectively once fragmented — many swap windows
      for (i <- 0 until 6) {
        SamplesStore.append(extra, path)
        SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 1)
      }
    } finally { stop = true; reader.join(30000) }
    assert(seen.get() > 0, "the reader must have completed observations")
    assert(bad.get() == 0,
      s"locked reads must never lose committed data (${bad.get()} regressing reads)")
    assert(SamplesStore.read(spark, path).count() == total + 6 * 50)
  }

  test("maybeCompact stages lock-free: a concurrent append completes while staging is parked") {
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val path = "/tmp/graft_test/store_stage_unlocked"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      (0 until 30).map(i => (day0 * 1000000L + (off * 30 + i) * 1000000L,
        s"m${i % 5}", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    for (i <- 0 until 3) SamplesStore.append(rowsFor(i), path)
    val baseCount = SamplesStore.read(spark, path).count()

    // park the compaction between STAGE and SWAP via the seam, THROUGH
    // the serving-path entry point maybeCompact — the regression this
    // guards is maybeCompact (or its appendBatch caller) holding the
    // store mutation lock across the distributed STAGE rewrite, which
    // would block every concurrent /write for the rewrite's duration
    val staged = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    var rewrote = false
    val compactor = new Thread(() => {
      rewrote = SamplesStore.maybeCompact(spark, path, maxFilesPerDay = 2,
        afterStage = () => { staged.countDown(); release.await(60, TimeUnit.SECONDS); () })
    }, "spec-compactor")
    compactor.start()
    assert(staged.await(60, TimeUnit.SECONDS), "compaction must reach the staging seam")

    // the append runs on its own thread with a timeout so a relocking
    // regression fails the assert instead of deadlocking the suite
    // (releasing the seam would unblock phase 3, which needs the very
    // lock the blocked append would be queued on)
    val appendDone = new CountDownLatch(1)
    val appender = new Thread(() => {
      SamplesStore.append(rowsFor(3), path); appendDone.countDown()
    }, "spec-appender")
    appender.start()
    val appendedInFlight = appendDone.await(30, TimeUnit.SECONDS)
    release.countDown()
    compactor.join(60000); appender.join(60000)
    assert(appendedInFlight,
      "an append must complete while compaction staging is in flight — the mutation " +
      "lock may only be held for the ms-scale SNAPSHOT and SWAP phases")
    // the append raced the staged day, so the swap correctly deferred;
    // nothing lost, and the next probe folds it
    assert(!rewrote, "a day that gained files during staging must defer its swap")
    assert(SamplesStore.read(spark, path).count() == baseCount + 30)
    assert(SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 2) == 1)
    assert(SamplesStore.read(spark, path).count() == baseCount + 30)
    assert(sortedWithinFiles(path))
  }

  test("a long-running reader defers the compaction swap instead of being stalled by it") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_swap_defer"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      (0 until 30).map(i => (day0 * 1000000L + (off * 30 + i) * 1000000L,
        s"m${i % 5}", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    for (i <- 0 until 3) SamplesStore.append(rowsFor(i), path)
    val before = SamplesStore.read(spark, path).count()

    // a reader holding the visibility read lock for its whole query —
    // the slow-dashboard shape. The swap's bounded tryLock must give
    // up and defer the day rather than queue on the fair lock (where
    // it would block every NEW reader behind this one for the whole
    // read duration). Same-thread read→write upgrade can never
    // acquire, so a missing timeout would deadlock here — the spec
    // would hang, not just fail.
    SamplesStore.readLocked(path) {
      val t0 = System.nanoTime()
      val n = SamplesStore.compactFragmentedDays(spark, path,
        maxFilesPerDay = 2, swapLockTimeoutMs = 250L)
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(n == 0, "the swap must defer while a reader holds the visibility lock")
      assert(SamplesStore.read(spark, path).count() == before,
        "a deferred swap must leave the store untouched")
      assert(elapsedMs < 30000, s"deferral must be prompt, took ${elapsedMs}ms")
    }
    // lock released: the next probe folds the day as usual
    assert(SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 2) == 1)
    assert(SamplesStore.read(spark, path).count() == before)
    assert(sortedWithinFiles(path))
  }

  test("lock maps key scheme-insensitively: qualified and raw store paths share one lock") {
    // deleteRange's boundary-day swap locks via a path derived from
    // fs.listStatus (scheme-qualified, file:/…), while serving readers
    // lock via the caller's raw string (/…) — these MUST resolve to
    // the same lock object or the swap excludes nobody
    assert(SamplesStore.visibilityLockHandle("/tmp/graft_test/lockkey") eq
           SamplesStore.visibilityLockHandle("file:/tmp/graft_test/lockkey"))
    assert(SamplesStore.lockKey("file:///tmp/graft_test/lockkey") ==
           SamplesStore.lockKey("/tmp/graft_test/lockkey"))
  }

  test("a readLocked reader is excluded from deleteRange's boundary-day swap window") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_delete_visibility"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    val rows = (0 until 120).map(i =>
      (day0 * 1000000L + i * 600L * 1000000L, s"m${i % 5}", Seq("k=v"), i.toDouble))
      .toDF("ts_us", "metric", "labels", "value")
    SamplesStore.write(rows, path)
    // delete a 6h slice INSIDE day0 — a boundary rewrite + swap, no
    // whole-day drops
    val startUs = (day0 + 6 * 3600L) * 1000000L
    val endUs = (day0 + 12 * 3600L) * 1000000L
    val liveDay = new org.apache.hadoop.fs.Path(path, s"date=$day0")
    val rewriteDay = new org.apache.hadoop.fs.Path(path, s".rewrite_date=$day0")

    val deleteDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val deleter = new Thread(() => {
      SamplesStore.deleteRange(spark, path, startUs, endUs)
      deleteDone.set(true)
    }, "spec-deleter")
    // hold the visibility READ lock on the caller's RAW path — exactly
    // what the serving /read does — across the whole delete attempt
    SamplesStore.readLocked(path) {
      val before = SamplesStore.read(spark, path).count()
      deleter.start()
      // wait until the boundary rewrite is staged: the delete's next
      // step is the swap, which must now block on OUR read lock (the
      // historical bug: swapDay keyed its lock on the fs-qualified
      // path, a DIFFERENT key, and swapped right through the reader)
      val t0 = System.nanoTime()
      while (!fs.exists(rewriteDay) && !deleteDone.get &&
             (System.nanoTime() - t0) < 60e9) Thread.sleep(10)
      Thread.sleep(300) // give a buggy swap time to complete wrongly
      assert(!deleteDone.get,
        "the boundary-day swap must wait for the in-flight reader")
      assert(fs.exists(liveDay), "the live day must never vanish under a read lock")
      assert(SamplesStore.read(spark, path).count() == before,
        "a reader holding the visibility lock must see the pre-delete store")
    }
    deleter.join(60000)
    assert(deleteDone.get, "the delete must proceed once the reader releases")
    assert(SamplesStore.read(spark, path)
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs).count() == 0)
    assert(SamplesStore.read(spark, path).count() ==
      rows.filter(col("ts_us") < startUs || col("ts_us") >= endUs).count())
    assert(sortedWithinFiles(path))
  }

  test("TSV bulk round-trips labels containing tabs, quotes, newlines") {
    import spark.implicits._
    import graft.ingest.TsvBulk
    val path = "/tmp/graft_test/tsv_adversarial"
    // Prometheus label values are arbitrary UTF-8 — the TabSeparated
    // framing characters must survive an export → import round-trip
    val rows = Seq(
      (1704412800000000L, "m\twith\ttabs", Seq("k='quoted'", "q=a','b"), 1.5),
      (1704412801000000L, "m\nnewline", Seq("s=back\\slash", "t=tab\tval"), -2.25),
      (1704412802000000L, "plain", Seq.empty[String], Double.MaxValue),
      (1704412803000000L, "uni", Seq("u=日本語"), 1e-7))
    TsvBulk.export(rows.toDF("ts_us", "metric", "labels", "value"), path)
    val back = TsvBulk.importTsv(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toList, r.getDouble(3))).toSet
    assert(back == rows.map(t => (t._1, t._2, t._3.toList, t._4)).toSet)
  }

  test("compact refuses a crashed batch's uncommitted files; maybeCompact skips them") {
    val path = "/tmp/graft_test/store_orphan"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    val b0 = samples.filter(expr("ts_us % 2 = 0"))
    val b1 = samples.filter(expr("ts_us % 2 = 1"))
    SamplesStore.appendBatch(b0, path, 0L)
    // simulate a crash mid-appendBatch of batch 1: a b1- prefixed file
    // in a day partition with NO _commits/1 marker
    val day = new File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("date=")).head
    val orphan = new org.apache.hadoop.fs.Path(day.getAbsolutePath, "b1-orphan.parquet")
    fs.create(orphan, true).close()
    // folding the orphan into unprefixed files would strand the replay
    // sweep and duplicate batch 1 — compact must refuse
    intercept[IllegalStateException](SamplesStore.compact(spark, path))
    // the serving path's opportunistic variant skips the orphan's day
    // (its files, orphan included, stay exactly as they are — the
    // replay sweep still finds them) while healthy days still fold
    val orphanDayBefore = day.listFiles().map(_.getName).toSet
    SamplesStore.maybeCompact(spark, path, maxFilesPerDay = 0)
    assert(day.listFiles().map(_.getName).toSet == orphanDayBefore,
      "the day carrying uncommitted batch files must not be rewritten")
    assert(fs.exists(orphan))
    // the checkpoint replay of batch 1 sweeps the orphan and commits;
    // compaction is then legal again and result-invariant
    SamplesStore.appendBatch(b1, path, 1L)
    SamplesStore.compact(spark, path)
    assert(SamplesStore.read(spark, path).count() == samples.count())
    assert(sortedWithinFiles(path))
  }
}
