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

  test("the hist sibling is a full store citizen: manifests, compaction, retention") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_hist_sibling"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rows(i: Int) = Seq(
      (day0 * 1000000L + i * 1000000L, "hm", Seq("k=v"),
        Array[Byte](1, 2, i.toByte)),
      ((day0 + 86400L) * 1000000L + i * 1000000L, "hm", Seq("k=w"),
        Array[Byte](9, i.toByte)))
      .toDF("ts_us", "metric", "labels", "hist")
    // manifest-committed appends: each lands atomically, generations
    // advance, and the read plans from the snapshot's explicit list
    for (i <- 0 until 6) SamplesStore.append(rows(i), path)
    assert(SamplesStore.currentGen(spark, path).exists(_ >= 6L),
      "hist appends must commit manifest generations")
    val back = SamplesStore.read(spark, path)
    assert(back.columns.toSet === Set("ts_us", "metric", "labels", "hist", "date"))
    assert(back.count() === 12)
    // the binary column survives the day-selective fold byte-for-byte
    val folded = SamplesStore.compactFragmentedDays(spark, path,
      maxFilesPerDay = 2, gcGraceMs = 0L)
    assert(folded === 2, s"both fragmented days must fold, got $folded")
    val after = SamplesStore.read(spark, path)
      .select(col("ts_us"), col("hist")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1)
    assert(after.length === 12)
    assert(after.take(6).map(_._2) ===
      (0 until 6).map(i => Seq[Byte](1, 2, i.toByte)))
    // retention: deleteRange (what retentionPass issues) drops the
    // old day wholesale and the snapshot read reflects it atomically
    SamplesStore.deleteRange(spark, path, Long.MinValue,
      (day0 + 86400L) * 1000000L, gcGraceMs = 0L)
    assert(SamplesStore.read(spark, path).count() === 6)
    assert(SamplesStore.read(spark, path)
      .agg(min(col("ts_us"))).first().getLong(0) >= (day0 + 86400L) * 1000000L)
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

    // deleted days left the SNAPSHOT atomically; their files (and the
    // boundary days' superseded originals) are retained on disk for
    // the grace window, then a forced expiry reclaims them and drains
    // the empty day directories
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    val dayNames = new File(path).listFiles().map(_.getName).filter(_.startsWith("date=")).toSet
    assert(!dayNames.contains("date=1704931200")) // 2024-01-11, fully inside
    assert(dayNames.contains("date=1704844800"))  // 2024-01-10, boundary rewrite
    assert(SamplesStore.read(spark, path).count() == expected,
      "expiry must only reclaim unreferenced files, never data")

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
    // the manifest's batch ledger survives a compaction, so replays
    // stay no-ops
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
    // the LIVE file count — what every read plans over — comes from
    // the manifest; superseded files awaiting grace-expiry GC are not
    // part of any read's footprint
    def maxLiveFilesPerDay: Int = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SamplesStore.latestSnapshot(fs, new org.apache.hadoop.fs.Path(path))
        .map(_.byDay.values.map(_.size).max).getOrElse(0)
    }
    for (i <- 0 until 6) {
      SamplesStore.appendBatch(batch, path, i.toLong, autoCompactFilesPerDay = 2)
      assert(maxLiveFilesPerDay <= 3,
        s"append $i: auto-compaction must keep per-day live-file counts bounded")
    }
    assert(SamplesStore.read(spark, path).count() == 6 * perBatch,
      "auto-compaction must not lose or duplicate rows")
    // after a forced expiry the PHYSICAL footprint matches the live
    // set, so disk usage is bounded too
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    def maxPhysicalFilesPerDay: Int =
      new File(path).listFiles().filter(f => f.isDirectory && f.getName.startsWith("date="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxPhysicalFilesPerDay <= 3,
      "expiry must reclaim every superseded file")
    assert(SamplesStore.read(spark, path).count() == 6 * perBatch)
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

    // crash state 2: after the swap, before the cleanup — the live
    // path is a complete store (its manifests, batch ledger included,
    // were written into the rebuilt tree BEFORE the swap) and a stale
    // `.old` copy lingers. Recovery just drops the remnant, and the
    // ledger keeps replays no-ops.
    assert(fs.mkdirs(p(path + ".old")))
    SamplesStore.appendBatch(b1, path, 1L) // replay: ledger short-circuits
    assert(SamplesStore.read(spark, path).count() == samples.count(),
      "the manifest batch ledger must keep the replay a no-op")
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
    // multiple metric-range files — the hot-day shape at 100 TB.
    // gcGraceMs = 0: no readers in flight, so superseded files are
    // reclaimed eagerly and the physical tree equals the live set
    val n = SamplesStore.compactFragmentedDays(spark, path,
      maxFilesPerDay = 2, targetFileBytes = 2048L, gcGraceMs = 0L)
    assert(n == 1, "only the over-threshold day must be rewritten")
    assert(files(s"date=$day1") == day1Before,
      "a healthy day's files must be byte-identical (same names, never rewritten)")
    assert(files(s"date=$day0").size > 1,
      "a day larger than targetFileBytes must fold into multiple range files")
    // at the default target the same day folds all the way to one file
    assert(SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 1,
      gcGraceMs = 0L) == 1)
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

    // the test seam fires between STAGE and PUBLISH — exactly the
    // window where a /write can add files to a day being compacted
    var appended = false
    val n = SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 2,
      afterStage = () => { SamplesStore.append(rowsFor(3), path); appended = true },
      gcGraceMs = 0L)
    assert(appended)
    assert(n == 1,
      "the fold must publish even when the day gained files during staging " +
      "— compaction never loses the race to a busy write frontier")
    assert(SamplesStore.read(spark, path).count() == baseCount + 30,
      "neither the staged rows nor the concurrent append may be lost")
    // the live day now holds the compacted file + the raced append
    val fs2 = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDay0 = SamplesStore.latestSnapshot(fs2, new org.apache.hadoop.fs.Path(path))
      .get.byDay(s"date=$day0")
    assert(liveDay0.size == 2, s"compacted + raced-append files expected, got $liveDay0")
    assert(SamplesStore.read(spark, path).count() == baseCount + 30)
    assert(sortedWithinFiles(path))
  }

  test("a crashed day rewrite leaves only invisible garbage, reclaimed by expiry") {
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

    // crash state: a day-level rewrite died after moving some staged
    // files into the live day dir but BEFORE its manifest commit.
    // Under the snapshot protocol those files are simply unreferenced
    // — readers keep planning the committed manifest, so nothing is
    // ever missing or doubled — and a stale rewrite staging dir is
    // equally invisible.
    val crashed = p(s"$path/$day/c999-crashed-attempt.parquet")
    fs.create(crashed, true).close()
    fs.mkdirs(p(s"$path/.rewrite_$day"))
    assert(SamplesStore.read(spark, path).count() == total,
      "uncommitted rewrite remnants must be invisible to readers")
    SamplesStore.maybeCompact(spark, path) // mutations don't trip on remnants
    assert(SamplesStore.read(spark, path).count() == total)

    // snapshot expiry reclaims both remnants by age (grace 0 = now)
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    assert(!fs.exists(crashed), "expiry must reclaim the crashed attempt's file")
    assert(!fs.exists(p(s"$path/.rewrite_$day")), "expiry must sweep stale staging dirs")
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

    // reader thread: hammer locked reads. Under the snapshot protocol
    // every read plans one committed manifest, so the contract is
    // full snapshot isolation: counts never dip below the seeded
    // total and never go backwards (appends commit atomically,
    // compaction is result-invariant, and superseded files outlive
    // any in-flight plan via the GC grace).
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
      "lock may only be held for the ms-scale SNAPSHOT and PUBLISH phases")
    // the fold publishes regardless of the raced append: the recorded
    // files fold, the append's file rides along in the live set
    assert(rewrote, "the fold must publish despite the concurrent append")
    assert(SamplesStore.read(spark, path).count() == baseCount + 30)
    assert(sortedWithinFiles(path))
  }

  test("a long-running reader defers only the GC — the compaction fold never waits") {
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
    // the slow-dashboard shape. The FOLD itself proceeds regardless
    // (its publish is one atomic manifest commit, no reader exclusion
    // needed); only the eager GC of the superseded files must defer,
    // via its bounded tryLock — a same-thread read→write upgrade can
    // never acquire, so a blocking lock here would deadlock the spec,
    // not just fail it.
    val day0Dir = new File(path, s"date=$day0")
    def physicalFiles: Int = day0Dir.listFiles().count(_.getName.endsWith(".parquet"))
    SamplesStore.readLocked(path) {
      val preDf = SamplesStore.read(spark, path) // plans the pre-fold snapshot
      assert(preDf.count() == before)
      val n = SamplesStore.compactFragmentedDays(spark, path,
        maxFilesPerDay = 2, gcGraceMs = 0L)
      assert(n == 1, "the fold must proceed — a reader never delays compaction")
      assert(physicalFiles > 1,
        "GC must defer while a reader holds the visibility lock")
      // the reader's already-planned snapshot stays fully scannable
      assert(preDf.count() == before,
        "a pre-fold plan must keep scanning its superseded files")
      assert(SamplesStore.read(spark, path).count() == before)
    }
    // lock released: expiry reclaims the superseded files
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    assert(physicalFiles == 1)
    assert(SamplesStore.read(spark, path).count() == before)
    assert(sortedWithinFiles(path))
  }

  test("time travel: a pinned generation reads its exact corpus across append+compact+delete") {
    val path = "/tmp/graft_test/store_timetravel"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    val even = samples.filter(expr("ts_us % 2 = 0"))
    val odd = samples.filter(expr("ts_us % 2 = 1"))
    SamplesStore.write(even, path)
    val pinned = SamplesStore.currentGen(spark, path).get
    val pinnedSet = even.select("ts_us", "metric", "value").collect().toSet

    // the live store moves on: append, compact (rewrites the pinned
    // files into new ones), delete a slice
    SamplesStore.append(odd, path)
    SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 1)
    SamplesStore.deleteRange(spark, path, 1704888000000000L, 1705212000000000L)
    assert(SamplesStore.readAt(spark, path, pinned)
      .select("ts_us", "metric", "value").collect().toSet == pinnedSet,
      "the pinned snapshot must read exactly its corpus, bit-for-bit")
    assert(SamplesStore.read(spark, path).count() ==
      samples.filter(col("ts_us") < 1704888000000000L || col("ts_us") >= 1705212000000000L).count())
    // a generation that never existed fails loudly
    intercept[IllegalArgumentException](SamplesStore.readAt(spark, path, 99999L).count())
    // snapshot expiry reclaims the pinned generation — after it, the
    // pin fails loudly instead of returning partial data
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    intercept[IllegalArgumentException](SamplesStore.readAt(spark, path, pinned).count())
    assert(SamplesStore.read(spark, path).count() > 0)
  }

  test("rollup v6 moments serve stdvar exactly at the store's extreme magnitudes") {
    import graft.ingest.RollupStore
    import graft.serve.PromQL
    val path = "/tmp/graft_test/store_rollup_bigmom"
    val rpath = "/tmp/graft_test/store_rollup_bigmom_roll"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(path, rpath))
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    import spark.implicits._
    // 24 samples/hour at the |v|≤1e7 bound across two hours: each
    // hour bucket's Σv_e2² ≈ 2.4e19 — past int64 — so the v6
    // DECIMAL(38,0) writer column and its window re-aggregation are
    // both in the wrap regime. Rollup-served must equal raw-served.
    val t0 = 1704412800L
    val big = (0 until 48).map { i =>
      ((t0 + i * 150) * 1000000L, "big", Seq("host=x"),
        if (i % 2 == 0) 9999999.00 else 9999990.00)
    }.toDF("ts_us", "metric", "labels", "value")
    SamplesStore.write(big, path)
    RollupStore.rollup(spark, path, rpath, 3600L)
    val q = PromQL.parse("stdvar_over_time(big[2h])").toOption.get
    def vals(rollup: Option[PromQL.RollupGrid]) =
      PromQL.eval(SamplesStore.read(spark, path), q,
          t0 + 7200, t0 + 7200, 7200L, rollup = rollup)
        .select("t", "v_e6").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = graft.OpsMetrics(spark)
    val before = m.readsFromRollup.value
    val served = vals(Some(PromQL.RollupGrid(path, rpath, 3600L)))
    assert(m.readsFromRollup.value === before + 1,
      "the aligned query must actually route to the rollup")
    assert(served === vals(None), "rollup-served stdvar must equal raw")
    // alternating ±4.5 around the mean → population variance 20.25
    assert(served === Set((t0 + 7200, 20250000L)))
  }

  test("rollup maintains per-day aggregates incrementally and result-invariantly") {
    import graft.ingest.RollupStore
    val path = "/tmp/graft_test/store_rollup"
    val rpath = "/tmp/graft_test/store_rollup_roll"
    val fullPath = "/tmp/graft_test/store_rollup_full"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(path, rpath, fullPath))
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    val samples = Tables.samples(spark, Sf).cache()
    val nDays = samples.select(expr("ts_us DIV 1000000 DIV 86400")).distinct().count().toInt

    SamplesStore.write(samples.filter(expr("ts_us % 2 = 0")), path)
    assert(RollupStore.rollup(spark, path, rpath) == nDays, "first rollup builds every day")
    assert(RollupStore.rollup(spark, path, rpath) == 0, "an idle store is a metadata no-op")

    // an append invalidates exactly the days it touched
    val day0End = samples.agg(min(expr("ts_us DIV 1000000 DIV 86400 * 86400"))).first().getLong(0) + 86400
    SamplesStore.append(
      samples.filter(expr("ts_us % 2 = 1") && expr("ts_us DIV 1000000") < day0End), path)
    assert(RollupStore.rollup(spark, path, rpath) == 1, "append to one day rebuilds one day")

    // compaction rewrites files (same rows): touched days re-digest
    // and re-aggregate, and the rollup result must not change
    val before = RollupStore.read(spark, rpath)
      .select("metric", "bucket", "n_points").collect().toSet
    SamplesStore.compactFragmentedDays(spark, path, maxFilesPerDay = 1)
    assert(RollupStore.rollup(spark, path, rpath) >= 1, "rewritten days re-aggregate")
    assert(RollupStore.read(spark, rpath)
      .select("metric", "bucket", "n_points").collect().toSet == before,
      "compaction must not change rollup results")

    // append the rest everywhere; incremental must equal a fresh
    // full rollup of an identical store
    SamplesStore.append(
      samples.filter(expr("ts_us % 2 = 1") && expr("ts_us DIV 1000000") >= day0End), path)
    RollupStore.rollup(spark, path, rpath)
    SamplesStore.write(samples, fullPath)
    val fullR = fullPath + "_roll"
    RollupStore.rollup(spark, fullPath, fullR)
    def rows(p: String) = RollupStore.read(spark, p)
      .select(col("metric"), array_join(col("labels"), ",").as("ls"), col("bucket"),
        col("min_value"), col("max_value"),
        expr("CAST(floor(sum_value * 100 + 0.5) AS BIGINT)"), col("n_points"))
      .collect().map(_.toSeq).toSet
    assert(rows(rpath) == rows(fullR), "incremental rollup must equal full recompute")

    // a deleted day leaves the rollup in the same commit
    val cut = day0End * 1000000L
    SamplesStore.deleteRange(spark, path, Long.MinValue, cut)
    RollupStore.rollup(spark, path, rpath)
    assert(RollupStore.read(spark, rpath)
      .filter(col("bucket") < day0End).count() == 0, "dropped day must leave the rollup")

    // rollup-served reads match the raw read path at a coarse interval
    val q = graft.operators.ReadQuery(
      day0End * 1000L, (day0End + 10 * 86400) * 1000L,
      Seq(graft.operators.Matchers.eq("__name__", "click")))
    val raw = graft.operators.SeriesRead.selectKeyed(
        SamplesStore.read(spark, path), q, ignoreHints = true)
      .withColumn("t_sec", expr("t_sec DIV 7200 * 7200"))
      .groupBy(col("metric"), col("labels"), col("t_sec"))
      .agg(max("max_value").as("max_value"))
    val rolled = RollupStore.selectKeyed(RollupStore.read(spark, rpath), q, 7200L)
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("metric"), array_join(col("labels"), ",").as("ls"),
        col("t_sec"), col("max_value")).collect().map(_.toSeq).toSet
    assert(keyed(rolled) == keyed(raw),
      "rollup-served coarse reads must equal the raw read path")
  }

  test("the rollup ladder re-aggregates exactly, incrementally, and gates freshness") {
    import graft.ingest.RollupStore
    val path = "/tmp/graft_test/store_ladder"
    val fine = "/tmp/graft_test/store_ladder_fine"
    val coarse = "/tmp/graft_test/store_ladder_coarse"
    val direct = "/tmp/graft_test/store_ladder_direct"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(path, fine, coarse, direct))
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    val samples = Tables.samples(spark, Sf).cache()
    val nDays = samples.select(expr("ts_us DIV 1000000 DIV 86400")).distinct().count().toInt

    SamplesStore.write(samples, path)
    RollupStore.rollup(spark, path, fine, 900L)
    assert(RollupStore.rollupLadder(spark, fine, coarse, 3600L) == nDays,
      "first ladder builds every day")
    assert(RollupStore.rollupLadder(spark, fine, coarse, 3600L) == 0,
      "an idle fine rollup is a metadata no-op")
    // EXACT: the ladder-built coarse equals a direct raw→3600 rollup,
    // every v6 field (edges, penultimate, moments, argmax stamps)
    RollupStore.rollup(spark, path, direct, 3600L)
    def rows(p: String) = RollupStore.read(spark, p)
      .select(col("metric"), array_join(col("labels"), ",").as("ls"),
        col("bucket"), col("min_value"), col("max_value"),
        expr("CAST(floor(sum_value * 100 + 0.5) AS BIGINT)"), col("n_points"),
        col("t_first"), col("v_first"), col("t_last"), col("v_last"),
        col("t_penult"), col("v_penult"), col("sy_e2"), col("syy_e4"),
        col("t_vmax"), col("t_vmin"))
      .collect().map(_.toSeq).toSet
    assert(rows(coarse) == rows(direct),
      "ladder coarse must equal a direct raw rollup field-for-field")
    assert(RollupStore.freshLadder(spark, fine, coarse, 3600L, 0L, 0L))

    // an append invalidates exactly the touched day end-to-end:
    // raw → fine rebuilds one day → ladder rebuilds one day
    val day0End = samples.agg(min(expr("ts_us DIV 1000000 DIV 86400 * 86400")))
      .first().getLong(0) + 86400
    SamplesStore.append(
      samples.filter(expr(s"ts_us DIV 1000000 < $day0End")).limit(1), path)
    assert(RollupStore.rollup(spark, path, fine, 900L) == 1)
    assert(!RollupStore.freshLadder(spark, fine, coarse, 3600L, 0L, 0L),
      "a rebuilt fine day must read stale until the ladder pass")
    assert(RollupStore.freshLadder(spark, fine, coarse, 3600L,
      day0End + 86400L, 0L),
      "days OUTSIDE the invalidated one still gate fresh")
    assert(RollupStore.rollupLadder(spark, fine, coarse, 3600L) == 1,
      "one changed fine day rebuilds one coarse day")
    assert(RollupStore.freshLadder(spark, fine, coarse, 3600L, 0L, 0L))
    // still exact after the incremental pass
    fs.delete(new org.apache.hadoop.fs.Path(direct), true)
    RollupStore.rollup(spark, path, direct, 3600L)
    assert(rows(coarse) == rows(direct),
      "incremental ladder must equal full recompute")

    // DEPTH 3 (the classic 5m → 1h → 1d retention shape): the day
    // level builds FROM the hour level and must still equal a direct
    // raw→86400 rollup field-for-field — exactness compounds through
    // the chain because every v6 field re-aggregates exactly
    val day = "/tmp/graft_test/store_ladder_day"
    val directDay = "/tmp/graft_test/store_ladder_directday"
    for (p <- Seq(day, directDay))
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    assert(RollupStore.rollupLadder(spark, coarse, day, 86400L) == nDays,
      "first day-ladder builds every day")
    RollupStore.rollup(spark, path, directDay, 86400L)
    assert(rows(day) == rows(directDay),
      "depth-3 ladder must equal a direct raw rollup field-for-field")
    // one appended raw row invalidates exactly ONE day at EVERY level
    // of the chain, and each level reads stale until its own pass
    SamplesStore.append(
      samples.filter(expr(s"ts_us DIV 1000000 < $day0End")).limit(1), path)
    assert(RollupStore.rollup(spark, path, fine, 900L) == 1)
    assert(RollupStore.rollupLadder(spark, fine, coarse, 3600L) == 1)
    assert(!RollupStore.freshLadder(spark, coarse, day, 86400L, 0L, 0L),
      "the day level must gate stale until its own ladder pass")
    assert(RollupStore.rollupLadder(spark, coarse, day, 86400L) == 1,
      "one changed hour day rebuilds one day-level day")
    assert(RollupStore.freshLadder(spark, coarse, day, 86400L, 0L, 0L))
    fs.delete(new org.apache.hadoop.fs.Path(directDay), true)
    RollupStore.rollup(spark, path, directDay, 86400L)
    assert(rows(day) == rows(directDay),
      "incremental depth-3 ladder must equal full recompute")
  }

  test("an interval or schema change always overtakes the stale manifest generation") {
    import graft.ingest.RollupStore
    val path = "/tmp/graft_test/store_rollup_regen"
    val rpath = "/tmp/graft_test/store_rollup_regen_roll"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(path, rpath)) fs.delete(new org.apache.hadoop.fs.Path(p), true)
    val samples = Tables.samples(spark, Sf)
    SamplesStore.write(samples, path)
    // grow the 3600s twin through several generations
    RollupStore.rollup(spark, path, rpath, 3600L)
    SamplesStore.append(samples.limit(1), path)
    RollupStore.rollup(spark, path, rpath, 3600L)
    SamplesStore.append(samples.limit(1), path)
    RollupStore.rollup(spark, path, rpath, 3600L)
    def maxGen(): Long = fs.listStatus(
        new org.apache.hadoop.fs.Path(rpath, "_manifests"))
      .map(_.getPath.getName).collect { case n if n.startsWith("m-") =>
        n.stripPrefix("m-").toLong }.max
    val genBefore = maxGen()
    assert(genBefore >= 2L)
    // an interval CHANGE reads the previous snapshot as absent — the
    // rebuild must still commit ABOVE the live max generation, or the
    // stale 3600s manifest shadows the new state forever (the bug the
    // schema-v2 rollout exposed)
    RollupStore.rollup(spark, path, rpath, 7200L)
    assert(maxGen() > genBefore, "the interval-change rebuild must win gens.max")
    assert(RollupStore.freshFor(spark, path, rpath, 7200L, 0L, 0L),
      "the live twin must be the fresh new-interval one")
    // and its rows answer at the new interval
    val buckets = RollupStore.read(spark, rpath)
      .select((col("bucket") % 7200L).as("m")).distinct().collect().map(_.getLong(0))
    assert(buckets.toSet === Set(0L), "live rollup rows must be 7200-bucketed")
  }

  test("a fully-emptied source leaves an empty rollup with a stable schema") {
    import graft.ingest.RollupStore
    import spark.implicits._
    val path = "/tmp/graft_test/store_rollup_empty"
    val rpath = path + "_roll"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.delete(new org.apache.hadoop.fs.Path(rpath), true)
    val day0 = 1704412800L
    val rows = (0 until 10).map(i => (day0 * 1000000L + i * 1000000L,
      "m", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    SamplesStore.write(rows, path)
    RollupStore.rollup(spark, path, rpath)
    val populated = RollupStore.read(spark, rpath).schema
    SamplesStore.deleteRange(spark, path, Long.MinValue, Long.MaxValue)
    RollupStore.rollup(spark, path, rpath)
    val empty = RollupStore.read(spark, rpath)
    assert(empty.count() == 0, "every rollup day must follow its deleted source day")
    assert(empty.schema == populated,
      s"empty-rollup schema ${empty.schema} must equal populated $populated")
  }

  test("an empty snapshot reads with the same schema as a populated one") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_empty"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    val rows = (0 until 10).map(i => (day0 * 1000000L + i * 1000000L,
      "m", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    SamplesStore.write(rows, path)
    val populated = SamplesStore.read(spark, path).schema
    // delete EVERYTHING: the manifest goes empty, and the read must
    // keep the exact schema (a downstream select/filter chain built
    // against a populated store must not break on an emptied one)
    SamplesStore.deleteRange(spark, path, Long.MinValue, Long.MaxValue)
    val empty = SamplesStore.read(spark, path)
    assert(empty.count() == 0)
    assert(empty.schema == populated,
      s"empty-snapshot schema ${empty.schema} must equal populated $populated")
  }

  test("snapshot parsing is cached per generation and invalidated by any commit") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_snapcache"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val root = new org.apache.hadoop.fs.Path(path)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      (0 until 10).map(i => (day0 * 1000000L + (off * 10 + i) * 1000000L,
        "m", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    SamplesStore.append(rowsFor(0), path)
    // a manifest generation is immutable, so repeat resolutions reuse
    // the parsed instance — at 100 TB the manifest is megabytes of
    // file list, and re-parsing it per read request would dominate
    // planning
    val s1 = SamplesStore.latestSnapshot(fs, root).get
    val s2 = SamplesStore.latestSnapshot(fs, root).get
    assert(s1 eq s2, "an unchanged generation must resolve to the cached instance")
    SamplesStore.append(rowsFor(1), path)
    val s3 = SamplesStore.latestSnapshot(fs, root).get
    assert(s3.gen > s1.gen, "a commit must advance the resolved generation")
    assert(s3.files.size > s1.files.size)
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

  test("a reader's planned snapshot survives a concurrent boundary-day delete") {
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
    // delete a 6h slice INSIDE day0 — a boundary rewrite, no whole-day
    // drops
    val startUs = (day0 + 6 * 3600L) * 1000000L
    val endUs = (day0 + 12 * 3600L) * 1000000L
    val expectedAfter = rows.filter(col("ts_us") < startUs || col("ts_us") >= endUs).count()

    val deleteDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val deleter = new Thread(() => {
      SamplesStore.deleteRange(spark, path, startUs, endUs)
      deleteDone.set(true)
    }, "spec-deleter")
    // hold the visibility READ lock on the caller's RAW path — exactly
    // what the serving /read does — across the whole delete
    SamplesStore.readLocked(path) {
      val preDf = SamplesStore.read(spark, path) // plans the pre-delete snapshot
      val before = preDf.count()
      deleter.start()
      // the delete COMPLETES while the reader is in flight — its
      // publish is an atomic manifest commit, and only its eager GC
      // defers on the reader's lock (bounded tryLock, the historical
      // bug keyed that lock on the fs-qualified path and deleted
      // right through the reader)
      deleter.join(60000)
      assert(deleteDone.get, "a delete must never stall behind a reader")
      // the reader's in-flight plan still scans its snapshot in full:
      // the boundary day's superseded files are grace-retained
      assert(preDf.count() === before,
        "a pre-delete plan must keep scanning its superseded files")
      // a FRESH read inside the same lock sees the post-delete snapshot
      assert(SamplesStore.read(spark, path).count() === expectedAfter)
    }
    assert(SamplesStore.read(spark, path)
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs).count() == 0)
    assert(SamplesStore.read(spark, path).count() === expectedAfter)
    // quiesced: expiry reclaims the superseded boundary files
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    assert(SamplesStore.read(spark, path).count() === expectedAfter)
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

  test("append commit bytes are O(touched files), independent of store size") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_delta_manifest"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      (0 until 5).map(i => (day0 * 1000000L + (off * 5 + i) * 1000000L,
        "m", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    def manifests: Seq[(Long, Long)] = // (gen, bytes), ascending
      new File(path, "_manifests").listFiles().toSeq
        .filter(_.getName.startsWith("m-"))
        .map(f => (f.getName.stripPrefix("m-").toLong, f.length())).sortBy(_._1)

    // cross a checkpoint boundary: 30 appends, each landing one new
    // file in the same day, with generations climbing through
    // CheckpointEvery (25)
    val n = SamplesStore.CheckpointEvery.toInt + 5
    for (i <- 0 until n) SamplesStore.append(rowsFor(i), path)
    val byGen = manifests.toMap
    val gens = manifests.map(_._1)
    // n appends = n delta commits on top of the gen-1 bootstrap adopt
    assert(gens.size == n + 1 && gens.last >= SamplesStore.CheckpointEvery,
      s"expected ${n + 1} generations crossing the checkpoint cadence, got $gens")

    // THE scale property: a delta commit's size does not grow with the
    // number of unrelated live files. The store holds ~5x more files
    // at the last delta than at the first, so compare them directly.
    val deltaGens = gens.filter(_ % SamplesStore.CheckpointEvery != 0).filter(_ > 1)
    val (early, late) = (byGen(deltaGens.head), byGen(deltaGens.last))
    assert(late <= early + 32,
      s"delta at gen ${deltaGens.last} ($late B) must not grow with store size " +
      s"(gen ${deltaGens.head} wrote $early B)")
    // while the periodic checkpoint DOES carry the full list — it must
    // dwarf its neighbouring deltas (that contrast is what proves the
    // deltas are deltas)
    val ckpt = gens.find(_ % SamplesStore.CheckpointEvery == 0).get
    assert(byGen(ckpt) > 4 * late,
      s"checkpoint gen $ckpt (${byGen(ckpt)} B) should carry the full file list")
    assert(byGen(ckpt + 1) <= early + 32,
      "the commit after a checkpoint must drop back to delta size")

    // resolution correctness, warm (cached ancestor) and cold (readAt
    // walks the chain from scratch): both equal the appended corpus
    val expected = (0 until n).map(rowsFor).reduce(_ union _)
      .select("ts_us", "value").collect().toSet
    assert(SamplesStore.read(spark, path).select("ts_us", "value")
      .collect().toSet == expected)
    val pin = SamplesStore.currentGen(spark, path).get
    assert(SamplesStore.readAt(spark, path, pin).select("ts_us", "value")
      .collect().toSet == expected,
      "cold chain resolution (checkpoint + deltas) must replay to the same corpus")

    // expiry on a quiesced store rolls the live delta chain into a
    // standalone checkpoint and drops the stale chain — reads survive
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    assert(SamplesStore.read(spark, path).select("ts_us", "value")
      .collect().toSet == expected)
    assert(manifests.size <= 2,
      s"expiry must drop the superseded chain, kept ${manifests.map(_._1)}")
  }

  test("a crashed batch's uncommitted files are invisible and never folded") {
    val path = "/tmp/graft_test/store_orphan"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val samples = Tables.samples(spark, Sf).cache()
    val b0 = samples.filter(expr("ts_us % 2 = 0"))
    val b1 = samples.filter(expr("ts_us % 2 = 1"))
    SamplesStore.appendBatch(b0, path, 0L)
    val committed = SamplesStore.read(spark, path).count()
    // simulate a crash mid-appendBatch of batch 1: a moved b1- file
    // whose manifest commit never happened. Under the snapshot
    // protocol it is unreferenced — no reader sees it, no compaction
    // folds it, so the eventual replay of batch 1 can never
    // double-count its rows.
    val day = new File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("date=")).head
    val orphan = new org.apache.hadoop.fs.Path(day.getAbsolutePath, "b1-orphan.parquet")
    fs.create(orphan, true).close()
    assert(SamplesStore.read(spark, path).count() == committed,
      "an uncommitted batch file must be invisible to readers")
    // selective compaction folds from the manifest only — the orphan
    // is neither an input nor a fragmentation signal
    SamplesStore.maybeCompact(spark, path, maxFilesPerDay = 0, gcGraceMs = 0L)
    assert(SamplesStore.read(spark, path).count() == committed)
    // the replay of batch 1 stages fresh files and commits; the stale
    // orphan ages out via snapshot expiry
    SamplesStore.appendBatch(b1, path, 1L)
    assert(SamplesStore.read(spark, path).count() == samples.count())
    SamplesStore.expireSnapshots(spark, path, graceMs = 0L)
    assert(!fs.exists(orphan), "expiry must reclaim the crashed batch's file")
    // whole-store compact remains result-invariant
    SamplesStore.compact(spark, path)
    assert(SamplesStore.read(spark, path).count() == samples.count())
    assert(sortedWithinFiles(path))
  }

  test("the max-gen hint accelerates snapshot resolution and is never load-bearing") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_maxgen_hint"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      Seq((day0 * 1000000L + off * 1000000L, "m", Seq("k=v"), off.toDouble))
        .toDF("ts_us", "metric", "labels", "value")
    for (i <- 0 until 5) SamplesStore.append(rowsFor(i), path)
    val gen = SamplesStore.currentGen(spark, path).get
    val hint = new org.apache.hadoop.fs.Path(path, "_manifests/.maxgen")
    def hintSays: String = {
      val in = fs.open(hint)
      try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    }
    assert(fs.exists(hint) && hintSays == gen.toString,
      "every commit must refresh the hint to the committed generation")
    def freshRead(): Set[(Long, Double)] = {
      SamplesStore.invalidateSnapshotCache(path)
      SamplesStore.read(spark, path).select("ts_us", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    }
    val expectedT = freshRead()

    // hint BEHIND (the crash-between-rename-and-hint window): forward
    // probe must still find the real latest
    val out = fs.create(hint, true)
    out.write("1".getBytes("UTF-8")); out.close()
    assert(freshRead() == expectedT)
    assert(SamplesStore.currentGen(spark, path).contains(gen))

    // corrupt hint → full-listing fallback
    val out2 = fs.create(hint, true)
    out2.write("not-a-number".getBytes("UTF-8")); out2.close()
    assert(freshRead() == expectedT)

    // missing hint (pre-hint store) → full-listing fallback, and the
    // next commit restores it
    fs.delete(hint, false)
    assert(freshRead() == expectedT)
    SamplesStore.append(rowsFor(99), path)
    assert(fs.exists(hint) && hintSays == (gen + 1).toString)
  }

  test("a concurrent-writer manifest collision fails loudly, store unchanged") {
    import spark.implicits._
    val path = "/tmp/graft_test/store_second_writer"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val day0 = 1704412800L
    def rowsFor(off: Int) =
      (0 until 3).map(i => (day0 * 1000000L + (off * 3 + i) * 1000000L,
        "m", Seq("k=v"), i.toDouble)).toDF("ts_us", "metric", "labels", "value")
    SamplesStore.append(rowsFor(0), path)
    val gen = SamplesStore.currentGen(spark, path).get
    val before = SamplesStore.read(spark, path)
      .select("ts_us", "value").collect().toSet

    // simulate a second writer process winning the race: its commit
    // lands in the next generation slot INSIDE this append's
    // resolve→rename window (a copy of the current manifest stands in
    // for the other writer's valid commit)
    val mdir = new org.apache.hadoop.fs.Path(path, "_manifests")
    val cur = new org.apache.hadoop.fs.Path(mdir, f"m-$gen%020d")
    val next = new org.apache.hadoop.fs.Path(mdir, f"m-${gen + 1}%020d")
    SamplesStore.onAppendSnapshotResolved = () => {
      org.apache.hadoop.fs.FileUtil.copy(fs, cur, fs, next, false,
        spark.sparkContext.hadoopConfiguration); ()
    }

    // this JVM's commit must abort — NOT bump past the foreign
    // generation (which would orphan it from the delta chain)
    val e =
      try intercept[IllegalStateException] { SamplesStore.append(rowsFor(1), path) }
      finally SamplesStore.onAppendSnapshotResolved = () => ()
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // the other writer's generation survives untouched and remains
    // the latest; the aborted append's rows never became visible
    assert(SamplesStore.currentGen(spark, path).contains(gen + 1))
    assert(SamplesStore.read(spark, path)
      .select("ts_us", "value").collect().toSet == before,
      "an aborted commit must leave the visible corpus unchanged")
    // no half-committed temp manifest litter
    val litter = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(_.startsWith(".tmp-"))
    assert(litter.isEmpty, s"aborted commit left temp files: ${litter.toSeq}")
  }
}
