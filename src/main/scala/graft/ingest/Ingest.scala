package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PromRemoteCodec._

/** DataFrame-level ingestion — the write half of the reference
  * (reference: main.go:126-141 `/write`, internal/clickhouse/write.go)
  * re-expressed as distributed transforms: request blobs live in a
  * binary column and are decoded inside executors (flatMap over the
  * partition), never on the driver. At 100 TB the decode parallelism
  * is the partition count; the reference's single-process HTTP loop
  * is the analogue of exactly one partition.
  */
object Ingest {

  /** Canonical samples → remote-write request blobs, shaped like the
    * real wire: one TimeSeries per (series, chunkSec window), MANY
    * series batched into each WriteRequest (a Prometheus client
    * ships hundreds of series per request, never one). Chunking
    * bounds the collect_list — a hot series at 100 TB never
    * materializes all its points in one row — and batching bounds
    * the per-request framing cost (one snappy+proto frame per
    * seriesPerRequest series instead of per series-day; on a
    * sparse-series corpus that is ~250× fewer frames). */
  def toWriteRequestBlobs(samples: DataFrame, chunkSec: Long = 86400L,
                          seriesPerRequest: Int = 256): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .groupBy(col("metric"), col("labels"), expr(s"ts_us DIV 1000000 DIV $chunkSec").as("chunk"))
      .agg(sort_array(collect_list(struct(col("ts_us").as("_1"), col("value").as("_2")))).as("points"))
      .select(col("metric").as("_1"), col("labels").as("_2"), col("points").as("_3"))
      .as[(String, Seq[String], Seq[(Long, Double)])]
      .mapPartitions { rows =>
        rows.grouped(seriesPerRequest).map { batch =>
          val series = batch.map { case (metric, labels, points) =>
            val promLabels = PromLabel("__name__", metric) +:
              labels.map { kv =>
                val i = kv.indexOf('=')
                PromLabel(kv.substring(0, i), kv.substring(i + 1))
              }
            PromTimeSeries(promLabels, points.map(p => PromSample(p._2, p._1 / 1000L)))
          }
          encodeWriteRequest(PromWriteRequest(series))
        }
      }
      .toDF("body")
  }

  /** Binary remote-write blobs → canonical samples (ts at ms
    * precision, as on the wire). Distributed decode. Counter wiring
    * mirrors the reference's `/write` handler (main.go:125-141):
    * every blob counts as a write request, a malformed blob counts an
    * error and is skipped (the reference 500s that one request and
    * keeps serving), decoded samples count as written. */
  def decodeWriteRequestBlobs(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val m = graft.OpsMetrics(spark)
    val (reqs, errs, written) = (m.writeRequests, m.writeErrors, m.samplesWritten)
    blobs.select(col("body")).as[Array[Byte]]
      .flatMap { b =>
        reqs.add(1)
        try {
          val out = toSamples(decodeWriteRequest(b)).toVector
          written.add(out.size.toLong)
          out
        } catch {
          case scala.util.control.NonFatal(_) => errs.add(1); Vector.empty
        }
      }
      .toDF()
      .select(col("ts_us"), col("metric"), col("labels"), col("value"))
  }

  /** Exercise the decode-side normalization on label sets that arrive
    * unsorted with __name__ mid-list (the remote-write spec sorts
    * them, write.go handles either) — builds raw label pairs from the
    * samples view in reverse order, round-trips, and yields the
    * canonical (sorted) form. Rows are batched [[RoundTripBatch]] per
    * WriteRequest (each row its own one-sample TimeSeries), matching
    * the wire's real shape — remote-write bodies carry many series —
    * and amortizing the per-request snappy+proto framing that made the
    * one-blob-per-sample version ~10× the work. */
  val RoundTripBatch = 512

  def roundTripUnsorted(samples: DataFrame): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .select(col("metric").as("_1"), reverse(col("labels")).as("_2"),
              col("ts_us").as("_3"), col("value").as("_4"))
      .as[(String, Seq[String], Long, Double)]
      .mapPartitions { rows =>
        rows.grouped(RoundTripBatch).flatMap { batch =>
          val series = batch.map { case (metric, labels, tsUs, value) =>
            val promLabels = labels.map { kv =>
              val i = kv.indexOf('=')
              PromLabel(kv.substring(0, i), kv.substring(i + 1))
            } :+ PromLabel("__name__", metric)
            PromTimeSeries(promLabels, Seq(PromSample(value, tsUs / 1000L)))
          }
          toSamples(decodeWriteRequest(encodeWriteRequest(PromWriteRequest(series))))
        }
      }
      .toDF()
      .select(col("ts_us"), col("metric"), col("labels"), col("value"))
  }
}

/** The samples store — the Spark twin of the ClickHouse MergeTree
  * table (reference: README.md:17-28). Day-partitioned parquet
  * (`date=<epoch day-start sec>`), rows sorted within files by
  * (metric, labels, ts_us) ≙ `ORDER BY (metric_name, labels,
  * updated_at)`: time predicates prune partitions, metric/label
  * predicates ride parquet row-group min/max + dictionary pages.
  * Time-ranged delete (README.md:166 `ALTER TABLE … DELETE WHERE`)
  * is partition-level: whole days drop as directories, boundary days
  * rewrite — never a full-table scan.
  */
object SamplesStore {
  private val DaySec = 86400L

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Auto-compaction threshold: once any day partition holds more
    * parquet files than this, the serving append paths fold the store
    * (the ClickHouse background-merge analogue — without it a
    * long-running server fragments until an operator intervenes).
    * ~64 files/day keeps the per-request listing cheap and bounds the
    * read-side footer fan-out; at 100 TB you would tune this per
    * store alongside the per-day target file size. */
  val AutoCompactFilesPerDay = 64

  /** Target compacted-file size per day. A fragmented day folds into
    * `ceil(dayBytes / TargetFileBytes)` metric-range-partitioned files,
    * so a hot day at 100 TB compacts into many well-sized sorted files
    * instead of one unwritable monolith, and row-group pruning still
    * sees contiguous (metric, labels, ts_us) runs per file. */
  val TargetFileBytes: Long = 512L * 1024 * 1024

  /** Two locks per store path, with distinct jobs:
    *
    * MUTATION lock — one exclusive lock per store: the HTTP front
    * door serves handlers concurrently, and two Spark jobs appending
    * into the same directory tree race their FileOutputCommitter
    * `_temporary` staging; compaction's swap must never overlap an
    * append at all. Mutations serialize per store within this JVM
    * (the serving process is one JVM, like the reference's one Go
    * process in front of ClickHouse).
    *
    * VISIBILITY lock — a fair read-write lock held in WRITE mode only
    * around the ms-scale metadata events that make the store LOSE
    * data transiently from a reader's viewpoint: day/store swap
    * renames and delete's day drops (crash-recovery restores need no
    * exclusion — they only bring back what a reader already could
    * not see). Readers
    * ([[readLocked]], the serving `/read`) hold its READ side for
    * their whole query execution: they run concurrently with each
    * other AND with append/rewrite jobs (a remote-write request's
    * samples have no atomic-visibility contract — gradual appearance
    * is fine), but can never interleave a swap's two renames, which
    * would silently drop a whole day from partition discovery. Lock
    * order is always mutation → visibility, and readers take only
    * the visibility side, so no cycle exists. Bare [[read]] stays
    * lock-free — it returns a lazy DataFrame, and out-of-process
    * readers can't take an in-JVM lock anyway (they retry the loud
    * transient miss instead). */
  /** EVERY lock map keys through this normalization. Store paths
    * reach the lock sites in two spellings — the caller's raw string
    * (`/tmp/store`, what `readLocked` sees) and filesystem-qualified
    * (`file:/tmp/store`, what `fs.listStatus` children report via
    * `.getParent`) — and `new Path(path).toString` preserves that
    * difference, so keying on it hands the two spellings DIFFERENT
    * locks: a swap "excluding" readers then excludes nobody and a
    * concurrent read can observe the day mid-rename. Keying on the
    * URI path component collapses both spellings (two stores on
    * different filesystems with the same path would share a lock —
    * harmless over-locking, and a serving JVM fronts one filesystem). */
  private[graft] def lockKey(path: String): String = {
    val p = new Path(path).toUri.getPath
    if (p == null || p.isEmpty) new Path(path).toString else p
  }

  private val storeLocks = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.locks.ReentrantLock]
  private def locked[T](path: String)(f: => T): T = {
    val l = storeLocks.getOrElseUpdate(lockKey(path),
      new java.util.concurrent.locks.ReentrantLock)
    l.lock()
    try f finally l.unlock()
  }

  private val visibilityLocks = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.locks.ReentrantReadWriteLock]
  private def visibilityFor(path: String) =
    visibilityLocks.getOrElseUpdate(lockKey(path),
      new java.util.concurrent.locks.ReentrantReadWriteLock(true))

  /** Test seam: the visibility lock instance backing `path` — lets
    * specs assert the qualified and raw spellings of one store
    * resolve to ONE lock object. */
  private[graft] def visibilityLockHandle(path: String) = visibilityFor(path)

  /** Wrap a transient-invisibility window (swap renames, day drops)
    * — excludes [[readLocked]] readers for its ms-scale duration.
    * Always entered while holding the mutation lock. The lock is
    * FAIR, so a waiting swap blocks new readers behind the longest
    * in-flight read — deferrable callers (the background compaction)
    * use [[visibleTry]] to bound that coupling. */
  private def visible[T](path: String)(f: => T): T = {
    val l = visibilityFor(path).writeLock()
    l.lock()
    try f finally l.unlock()
  }

  /** How long a DEFERRABLE swap waits for the visibility write lock
    * before giving up (the day is left intact for the next probe).
    * Bounds the fair-lock coupling: a queued swap blocks new readers
    * and mutations behind the longest in-flight /read, so an
    * unbounded wait would let one slow dashboard query stall every
    * concurrent reader for its whole duration — with the timeout the
    * stall is capped and the rewrite work is simply retried later. */
  val SwapLockTimeoutMs: Long = 5000L

  /** [[visible]] with a bounded wait: returns false WITHOUT running
    * `f` when the write lock cannot be taken inside `timeoutMs` (a
    * long-running reader has it parked). */
  private def visibleTry(path: String, timeoutMs: Long)(f: => Unit): Boolean = {
    val l = visibilityFor(path).writeLock()
    if (!l.tryLock(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)) false
    else { try f finally l.unlock(); true }
  }

  /** Run `f` (a read's full plan-to-action execution) holding the
    * store's visibility read lock: concurrent with other reads and
    * with append/compaction REWRITE jobs, excluded only from the
    * ms-scale swap windows. In-JVM serving reads can thus never
    * observe a half-swapped store, and their latency is decoupled
    * from concurrent write jobs. Must never wrap anything that
    * mutates the same store (read→write upgrade deadlocks). */
  def readLocked[T](path: String)(f: => T): T = {
    val l = visibilityFor(path).readLock()
    l.lock()
    try f finally l.unlock()
  }

  private val BatchFilePattern = "^b(\\d+)-.*".r

  /** Repair a store left inside [[compact]]'s swap window by a crash —
    * run at the start of EVERY mutation (under the store lock), because
    * auto-compaction makes the window a routine serving event, and an
    * unaware writer would otherwise re-create an empty live path while
    * a later compact's cleanup deletes `.old`, the only complete copy:
    *  - live path missing, `.old` present → the crash hit between the
    *    two swap renames; restore `.old` (the rewrite in `.compacting`
    *    is redone later).
    *  - live path AND `.old` present → the crash hit after the swap
    *    but before the marker carry / cleanup; carry `_commits` into
    *    the new layout if it lacks them (losing the marker set would
    *    turn the next checkpoint replay into wholesale duplication),
    *    then drop `.old`.
    *  - `.compacting` remnants are an incomplete rewrite — disposable.
    *
    * Deliberately NOT under the visibility lock: every recovery
    * transition either restores data a reader already could not see
    * (the crash left it missing) or touches dot/underscore-hidden
    * paths — readers can only gain from it, and taking the visibility
    * write lock here would make every mutation's (almost always
    * no-op) recovery probe drain in-flight reads first. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val dst = new Path(path)
    val tmp = new Path(dst.getParent, dst.getName + ".compacting")
    val old = new Path(dst.getParent, dst.getName + ".old")
    if (fs.exists(old)) {
      if (!fs.exists(dst)) {
        if (!fs.rename(old, dst))
          throw new java.io.IOException(s"recoverSwap: restore $old -> $dst failed")
      } else {
        val oldCommits = new Path(old, "_commits")
        if (fs.exists(oldCommits) && !fs.exists(new Path(dst, "_commits")) &&
            !fs.rename(oldCommits, new Path(dst, "_commits")))
          throw new java.io.IOException(
            s"recoverSwap: marker carry $oldCommits -> $dst/_commits failed")
        fs.delete(old, true)
      }
    }
    fs.delete(tmp, true)
    recoverDaySwaps(fs, dst)
  }

  private val OldDayPrefix = ".old_"      // rename-aside copy of one day dir
  private val RewriteDayPrefix = ".rewrite_" // in-progress per-day rewrite

  /** Repair per-day swap remnants left by a crash inside [[swapDay]]
    * (day-level compaction / boundary-day delete): an `.old_date=X`
    * whose live `date=X` is missing means the crash hit between the
    * two renames — restore it; with the live dir present the swap
    * completed — drop the aside copy. `.rewrite_date=X` dirs are
    * incomplete rewrites — disposable (the dot prefix hides them from
    * the parquet reader either way). */
  private def recoverDaySwaps(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    val children = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
    children.filter(_.getName.startsWith(OldDayPrefix)).foreach { oldDay =>
      val live = new Path(root, oldDay.getName.stripPrefix(OldDayPrefix))
      if (!fs.exists(live)) {
        if (!fs.rename(oldDay, live))
          throw new java.io.IOException(s"recoverDaySwaps: restore $oldDay -> $live failed")
      } else fs.delete(oldDay, true)
    }
    children.filter(_.getName.startsWith(RewriteDayPrefix))
      .foreach(p => fs.delete(p, true))
    // a crashed appendBatch's staging dir is replay-swept IF the batch
    // replays; a stream that is never restarted would leak it forever.
    // Safe to sweep here: this runs under the store's write lock, so
    // no appendBatch can be mid-staging concurrently.
    children.filter(_.getName.startsWith(".staging-"))
      .foreach(p => fs.delete(p, true))
  }

  /** Replace one day partition with its rewritten copy via rename-aside
    * (crash-safe at every step, see [[recoverDaySwaps]]; NOT atomically
    * visible). Visibility caveat, stronger than [[compact]]'s: between
    * the two renames the day dir is absent, so a reader that LISTS the
    * store inside that window silently omits the day (a reader that
    * already listed and then scans gets a loud FileNotFound). In-JVM
    * serving reads are excluded from the window entirely via
    * [[readLocked]]; out-of-process readers retry loud misses and
    * tolerate the ms-scale listing window. At 100 TB you would close
    * it for everyone by fronting the store with a manifest (snapshot
    * file listing à la Iceberg/Delta) so the swap becomes a single
    * manifest commit — the per-day job shape stays identical.
    * `rewrite` must already hold the new parquet files for the day.
    *
    * `lockTimeoutMs` < 0 blocks for the visibility lock (delete's
    * boundary rewrite: the delete MUST happen); >= 0 bounds the wait
    * and returns false with the live day untouched when a
    * long-running reader keeps the lock parked (compaction: the fold
    * is opportunistic, the next probe retries). */
  private def swapDay(fs: org.apache.hadoop.fs.FileSystem, root: Path,
                      dayName: String, rewrite: Path,
                      lockTimeoutMs: Long = -1L): Boolean = {
    def doSwap(): Unit = {
      val live = new Path(root, dayName)
      val aside = new Path(root, OldDayPrefix + dayName)
      if (!fs.rename(live, aside))
        throw new java.io.IOException(s"swapDay: rename $live -> $aside failed")
      if (!fs.rename(rewrite, live)) {
        fs.rename(aside, live) // roll back so the day stays readable
        throw new java.io.IOException(s"swapDay: rename $rewrite -> $live failed")
      }
      fs.delete(aside, true)
    }
    if (lockTimeoutMs < 0) { visible(root.toString)(doSwap()); true }
    else visibleTry(root.toString, lockTimeoutMs)(doSwap())
  }

  private def fsFor(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Batch ids that have `b<id>-` files in some day partition but no
    * `_commits/<id>` marker — a crash mid-[[appendBatch]]. Their files
    * belong to the checkpoint replay's sweep; folding them into
    * unprefixed compacted files would strand that sweep and duplicate
    * the whole batch on replay. */
  private def uncommittedBatchIds(fs: org.apache.hadoop.fs.FileSystem,
                                  root: Path): Seq[Long] = {
    if (!fs.exists(root)) Nil
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .flatMap(day => fs.listStatus(day.getPath).map(_.getPath.getName)
        .collect { case BatchFilePattern(id) => id.toLong })
      .distinct
      .filterNot(id => fs.exists(new Path(root, s"_commits/$id")))
      .toSeq
  }

  /** `date` leads the within-partition sort so the dynamic-partition
    * writer's required ordering (partition columns first) is already
    * satisfied and it does NOT inject its own partition-column-only
    * sort — which would destroy the (metric, labels, ts_us) file
    * order this store's row-group pruning depends on. */
  def write(samples: DataFrame, path: String): Unit = locked(path) {
    recoverSwap(fsFor(samples.sparkSession, path), path)
    layout(samples).write.mode("overwrite").partitionBy("date").parquet(path)
  }

  /** Append with the same layout/sort — the serving write path
    * (each remote-write request lands as new files in its day
    * partitions, the MergeTree-insert analogue; ClickHouse merges
    * parts in the background, here a periodic compaction rewrite
    * would play that role). */
  def append(samples: DataFrame, path: String): Unit = locked(path) {
    recoverSwap(fsFor(samples.sparkSession, path), path)
    layout(samples).write.mode("append").partitionBy("date").parquet(path)
  }

  /** Exactly-once batch append for checkpointed streams. A bare
    * [[append]] inside foreachBatch is only at-least-once: a crash
    * between the append and the checkpoint commit re-delivers the
    * batch on restart and duplicates its rows. This variant makes the
    * replay a no-op: the batch is staged to a shadow dir, its files
    * moved into the day partitions under batchId-stamped names, and a
    * commit marker written last. On re-delivery the marker short-
    * circuits; on a crash mid-move the next attempt first sweeps any
    * `b<id>-` orphans (the marker is absent, so the move redoes from
    * a clean slate). Layout (day dirs, sorted files) is identical to
    * [[append]]'s. */
  def appendBatch(samples: DataFrame, path: String, batchId: Long,
                  autoCompactFilesPerDay: Int = AutoCompactFilesPerDay): Unit = {
    val spark = samples.sparkSession
    val fs = fsFor(spark, path)
    val maxTouchedDayFiles = locked(path) {
      recoverSwap(fs, path)
      val marker = new Path(path, s"_commits/$batchId")
      if (!fs.exists(marker)) appendBatchUncommitted(samples, path, batchId, fs)
      else 0
    }
    // ClickHouse merges parts in the background; here the writer
    // itself folds the store once fragmentation crosses the
    // threshold. The probe costs only the TOUCHED days' listings
    // (already paid by the move above) — never an O(all days) scan
    // per microbatch. Runs AFTER this batch's commit marker lands, so
    // the orphan check inside sees only committed files — and AFTER
    // the mutation lock above releases: compaction's expensive STAGE
    // phase runs unlocked (it takes the lock itself only for the
    // ms-scale SNAPSHOT and SWAP phases), so a concurrent /write or
    // the stream's own next microbatch proceeds during the rewrite
    // instead of stalling behind it.
    if (maxTouchedDayFiles > autoCompactFilesPerDay)
      maybeCompact(spark, path, autoCompactFilesPerDay)
  }

  /** Stage + move + commit one batch; returns the max parquet-file
    * count across the day partitions this batch touched (the
    * fragmentation signal for the auto-compaction probe). */
  private def appendBatchUncommitted(samples: DataFrame, path: String, batchId: Long,
                                     fs: org.apache.hadoop.fs.FileSystem): Int = {
    val marker = new Path(path, s"_commits/$batchId")
    val prefix = s"b$batchId-"
    // sweep a partial prior attempt of this batch
    if (fs.exists(new Path(path))) {
      fs.listStatus(new Path(path)).filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
        .foreach { day =>
          fs.listStatus(day.getPath).filter(_.getPath.getName.startsWith(prefix))
            .foreach(f => fs.delete(f.getPath, false))
        }
    }
    val staging = new Path(path, s".staging-$batchId")
    fs.delete(staging, true)
    layout(samples).write.mode("overwrite").partitionBy("date").parquet(staging.toString)
    var maxDayFiles = 0
    fs.listStatus(staging).filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .foreach { day =>
        val dstDay = new Path(path, day.getPath.getName)
        fs.mkdirs(dstDay)
        fs.listStatus(day.getPath).filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            if (!fs.rename(f.getPath, new Path(dstDay, prefix + f.getPath.getName)))
              throw new java.io.IOException(s"appendBatch: move ${f.getPath} failed")
          }
        maxDayFiles = math.max(maxDayFiles,
          fs.listStatus(dstDay).count(_.getPath.getName.endsWith(".parquet")))
      }
    fs.delete(staging, true)
    fs.mkdirs(new Path(path, "_commits"))
    fs.create(marker, true).close()
    maxDayFiles
  }

  private def layout(samples: DataFrame): DataFrame =
    samples
      .withColumn("date", expr("ts_us DIV 1000000 DIV 86400 * 86400"))
      .repartition(col("date"))
      .sortWithinPartitions(col("date"), col("metric"), col("labels"), col("ts_us"))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compaction — the ClickHouse background-merge analogue
    * (README.md:17-28: MergeTree merges its parts; here every
    * serving-path [[append]] lands new small files in its day
    * partitions, and compaction folds them back into one sorted file
    * per day). One distributed job: read everything, re-establish the
    * layout (repartition by day + within-file (metric, labels, ts_us)
    * sort, so row-group pruning survives), write to a shadow dir,
    * atomically swap. This whole-store rewrite is the deterministic
    * full-rebuild tool (schema/layout migrations, the oracle query);
    * the serving path compacts through [[compactFragmentedDays]],
    * which rewrites only the days that actually fragmented. */
  def compact(spark: SparkSession, path: String): Unit = locked(path) {
    val fs = fsFor(spark, path)
    val dst = new Path(path)
    // first repair any prior crashed swap — restores a stranded `.old`
    // copy and its markers instead of deleting them below
    recoverSwap(fs, path)
    // Refuse to fold a crashed appendBatch's uncommitted files: they
    // belong to the replay sweep (which matches only the b<id>- prefix),
    // and compacting them into unprefixed files would make the replay
    // re-append the whole batch — duplicated rows. The replay (stream
    // restart) clears the orphans; compact after that.
    val orphans = uncommittedBatchIds(fs, dst)
    if (orphans.nonEmpty)
      throw new IllegalStateException(
        s"compact: uncommitted batch files present (batch ids ${orphans.mkString(",")}) " +
        "— replay the batch (restart the stream) before compacting")
    val tmp = new Path(dst.getParent, dst.getName + ".compacting")
    val old = new Path(dst.getParent, dst.getName + ".old")
    // `date` is re-derived from ts_us inside layout(), so the rewrite
    // cannot drift from the read-side partition values.
    write(read(spark, path).drop("date"), tmp.toString)
    // Swap via rename-aside (never delete-then-rename): this is a
    // CRASH-safety guarantee — a crash mid-swap leaves a complete copy
    // at `path` or `path.old`, never only in the shadow dir. It is NOT
    // an atomic-visibility guarantee: between the two renames the live
    // path briefly does not exist, so a concurrent reader can see a
    // transient miss and must retry (in-JVM writers are excluded by
    // the store lock; readers are not).
    visible(path) {
      if (!fs.rename(dst, old))
        throw new java.io.IOException(s"compact: rename $dst -> $old failed")
      if (!fs.rename(tmp, dst)) {
        fs.rename(old, dst) // roll back so the store stays readable
        throw new java.io.IOException(s"compact: rename $tmp -> $dst failed")
      }
    }
    // carry the appendBatch commit markers across the rewrite, so a
    // stream replay after a compaction still short-circuits; a silent
    // rename failure here would drop every marker and turn the next
    // checkpoint replay into wholesale row duplication
    val oldCommits = new Path(old, "_commits")
    if (fs.exists(oldCommits) && !fs.rename(oldCommits, new Path(dst, "_commits")))
      throw new java.io.IOException(
        s"compact: rename $oldCommits -> $dst/_commits failed — commit markers would be lost")
    fs.delete(old, true)
    val m = graft.OpsMetrics(spark)
    m.compactions.add(1)
    m.daysRewritten.add(
      fs.listStatus(dst).count(s => s.isDirectory && s.getPath.getName.startsWith("date=")).toLong)
  }

  /** Shadow dir for the staged compaction rewrite. NOT under
    * [[RewriteDayPrefix]]: recovery sweeps `.rewrite_*` at every
    * mutation, and the staging here runs OUTSIDE the store lock —
    * a concurrent append's recovery pass must not delete it. Stale
    * copies (crash mid-staging) are swept by the next compaction's
    * own snapshot phase, which cannot race an active staging thanks
    * to the single-flight guard. */
  private val StageDirName = ".stage_compact"

  /** One compaction in flight per store: concurrent probes return
    * immediately instead of queueing rewrites. */
  private val compacting = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicBoolean]
  private def compactingFlag(path: String) =
    compacting.getOrElseUpdate(lockKey(path),
      new java.util.concurrent.atomic.AtomicBoolean(false))

  /** Selective compaction — the 100 TB shape of [[compact]]: rewrite
    * ONLY the day partitions whose parquet-file count exceeds
    * `maxFilesPerDay`, leaving every healthy day's files untouched.
    * On a store with years of history only the hot write frontier
    * ever fragments, so the rewrite cost is O(fragmented days), not
    * O(store) — ONE distributed job over exactly those days' bytes
    * (not a job per day: F small sequential jobs would pay F×
    * scheduling overhead), range-partitioned on (date, metric,
    * labels, ts_us) into `max(F, ceil(bytes / targetFileBytes))`
    * tasks so a hot day folds into several well-sized sorted files
    * and row-group pruning keeps its contiguous metric runs.
    *
    * Locking follows the ClickHouse background-merge contract — the
    * expensive rewrite never blocks serving:
    *  1. SNAPSHOT (write lock, ms): record each fragmented day's
    *     exact file set.
    *  2. STAGE (no lock): rewrite the RECORDED files into a shadow
    *     dir while appends and reads proceed.
    *  3. SWAP (write lock, ms): per day, swap only if the live
    *     listing still equals the snapshot; a day that gained files
    *     meanwhile is left intact for the next probe — concurrent
    *     appends can defer a day's fold but never lose data. The
    *     visibility write lock is taken with a BOUNDED wait
    *     (`swapLockTimeoutMs`): a long-running reader parking the
    *     fair lock defers the day instead of stalling every new
    *     reader and mutation queued behind the swap.
    * Single-flight per store; `afterStage` is a test seam invoked
    * between phases 2 and 3. Returns the number of days rewritten. */
  def compactFragmentedDays(spark: SparkSession, path: String,
                            maxFilesPerDay: Int = AutoCompactFilesPerDay,
                            targetFileBytes: Long = TargetFileBytes,
                            afterStage: () => Unit = () => (),
                            swapLockTimeoutMs: Long = SwapLockTimeoutMs): Int = {
    val flag = compactingFlag(path)
    if (!flag.compareAndSet(false, true)) return 0 // single-flight
    try {
      val fs = fsFor(spark, path)
      val root = new Path(path)
      val shadow = new Path(root, StageDirName)

      // Phase 1 — SNAPSHOT under the write lock: repair crash
      // remnants, then record each fragmented day's exact parquet
      // file set (names are immutable once written — appends only ADD
      // files). Days carrying a crashed batch's uncommitted `b<id>-`
      // files are deferred: those files belong to the replay sweep,
      // and folding them would duplicate the batch on replay.
      val targets: Seq[(String, Set[String], Long)] = locked(path) {
        recoverSwap(fs, path)
        fs.delete(shadow, true)
        if (!fs.exists(root)) Seq.empty
        else {
          val orphanIds = uncommittedBatchIds(fs, root).toSet
          val fragmented = fs.listStatus(root)
            .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
            .map(day => day.getPath ->
              fs.listStatus(day.getPath).filter(_.getPath.getName.endsWith(".parquet")))
            .filter(_._2.length > maxFilesPerDay)
          val (deferred, ok) = fragmented.partition { case (_, files) =>
            files.exists(f => f.getPath.getName match {
              case BatchFilePattern(id) => orphanIds.contains(id.toLong)
              case _                    => false
            })
          }
          deferred.foreach { case (day, _) =>
            log.warn(s"compactFragmentedDays($path): skipping ${day.getName}" +
              " — uncommitted batch files present (replay the batch first)")
          }
          ok.toSeq.map { case (day, files) =>
            (day.getName, files.map(_.getPath.getName).toSet, files.map(_.getLen).sum)
          }
        }
      }
      if (targets.isEmpty) return 0

      // Phase 2 — STAGE with NO lock held: the rewrite job reads the
      // RECORDED files (never the live day dirs, so files appended
      // meanwhile neither leak into the rewrite nor get lost by the
      // swap) while concurrent /write appends and /read queries
      // proceed — the ClickHouse background-merge contract. `date` is
      // re-derived from ts_us (as in layout()) and leads both the
      // range partitioning and the within-partition sort so the
      // dynamic-partition writer splits cleanly per day.
      val totalBytes = targets.map(_._3).sum
      val nTasks = math.max(targets.length.toLong,
        (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val stagedFiles = targets.flatMap { case (dayName, files, _) =>
        files.map(f => new Path(new Path(root, dayName), f).toString)
      }
      spark.read.parquet(stagedFiles: _*)
        .withColumn("date", expr("ts_us DIV 1000000 DIV 86400 * 86400"))
        .repartitionByRange(nTasks, col("date"), col("metric"), col("labels"), col("ts_us"))
        .sortWithinPartitions(col("date"), col("metric"), col("labels"), col("ts_us"))
        .write.mode("overwrite").partitionBy("date").parquet(shadow.toString)
      afterStage()

      // Phase 3 — SWAP under the write lock, held only for metadata
      // renames: each target day swaps ONLY if its live listing still
      // equals the snapshot (a day that gained files meanwhile is
      // left intact — nothing lost, the next probe folds it).
      var rewritten = 0
      locked(path) {
        targets.foreach { case (dayName, recorded, _) =>
          val live = new Path(root, dayName)
          val newDay = new Path(shadow, dayName)
          val unchanged = fs.exists(live) &&
            fs.listStatus(live).filter(_.getPath.getName.endsWith(".parquet"))
              .map(_.getPath.getName).toSet == recorded
          if (unchanged && fs.exists(newDay)) {
            // bounded wait: a parked long-running reader defers this
            // day to the next probe instead of stalling every new
            // reader and mutation behind the fair lock's queue
            if (swapDay(fs, root, dayName, newDay, swapLockTimeoutMs)) rewritten += 1
            else log.info(s"compactFragmentedDays($path): $dayName swap deferred — " +
              "visibility lock held by a long-running reader; next probe retries")
          } else if (!unchanged) {
            log.info(s"compactFragmentedDays($path): $dayName changed during " +
              "staging — leaving it for the next probe")
          }
        }
        fs.delete(shadow, true)
      }
      val m = graft.OpsMetrics(spark)
      m.compactions.add(1)
      m.daysRewritten.add(rewritten.toLong)
      rewritten
    } finally flag.set(false)
  }

  /** Opportunistic compaction for the serving append paths: folds any
    * day partition whose parquet-file count exceeds `maxFilesPerDay`
    * via [[compactFragmentedDays]] (day-selective — a serving store
    * never pays an O(all history) rewrite, and a crashed batch's
    * orphan files only defer their own day, not the whole store).
    * Deliberately takes NO lock of its own: the compaction locks only
    * its SNAPSHOT and SWAP phases internally, so the distributed
    * STAGE rewrite runs while concurrent appends and reads proceed —
    * wrapping this in `locked(path)` would hold the mutation lock
    * across the whole rewrite and stall every concurrent /write for
    * its duration, the exact failure the snapshot/stage/swap design
    * exists to prevent. `afterStage` is the same phase-2/3 test seam
    * as [[compactFragmentedDays]]'s. Returns whether any day was
    * rewritten. */
  def maybeCompact(spark: SparkSession, path: String,
                   maxFilesPerDay: Int = AutoCompactFilesPerDay,
                   afterStage: () => Unit = () => ()): Boolean =
    compactFragmentedDays(spark, path, maxFilesPerDay, afterStage = afterStage) > 0

  /** Delete samples with startUs <= ts_us < endUs. */
  def deleteRange(spark: SparkSession, path: String, startUs: Long, endUs: Long): Unit = locked(path) {
    val fs = fsFor(spark, path)
    recoverSwap(fs, path)
    val dirs = fs.listStatus(new Path(path)).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("date="))
    dirs.foreach { dir =>
      val dayStartUs = dir.getName.stripPrefix("date=").toLong * 1000000L
      val dayEndUs = dayStartUs + DaySec * 1000000L
      val fullyInside = dayStartUs >= startUs && dayEndUs <= endUs
      val overlaps = dayStartUs < endUs && dayEndUs > startUs
      if (fullyInside) {
        // a whole-day drop is itself a visibility event: without the
        // exclusion a reader mid-scan gets FileNotFound on the day's
        // files rather than the intended clean disappearance
        visible(path)(fs.delete(dir, true))
      } else if (overlaps) {
        // boundary day: rewrite the partition without the deleted rows,
        // re-sorted so the rewrite keeps the store's within-file
        // (metric, labels, ts_us) order — the row-group min/max pruning
        // `write` established must survive deletes. Swapped in via the
        // same rename-aside as compaction (a delete-then-rename here
        // would lose the whole day to a crash between the two steps;
        // a crash mid-swap instead restores the day and the caller
        // re-runs the delete — at-least-once, never data loss).
        val remaining = spark.read.parquet(dir.toString)
          .filter(col("ts_us") < startUs || col("ts_us") >= endUs)
          .sortWithinPartitions(col("metric"), col("labels"), col("ts_us"))
        val rewrite = new Path(dir.getParent, RewriteDayPrefix + dir.getName)
        fs.delete(rewrite, true)
        remaining.write.mode("overwrite").parquet(rewrite.toString)
        swapDay(fs, dir.getParent, dir.getName, rewrite)
      }
    }
  }
}

/** TSV bulk import/export — the promtool-dump → `INSERT … FORMAT
  * TabSeparated` path (reference: README.md:142-161). Line format
  * mirrors ClickHouse TabSeparated for the samples table:
  * `epoch_sec \t metric \t ['k=v','k=v'] \t value`, including its
  * backslash escaping (`\t \n \r \\` in any string, plus `\'` inside
  * array elements) — Prometheus label values are arbitrary UTF-8, so
  * an unescaped quote/tab/newline must not break framing. Encode and
  * parse run inside executors via mapPartitions: this is a wire codec
  * (like [[PromRemoteCodec]]), and unescaping needs a single-pass
  * scanner — chained regexp substitutions mis-handle sequences like
  * `\'` followed by a real element boundary. */
object TsvBulk {

  private[graft] def escape(s: String, quote: Boolean): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\'' => if (quote) b.append("\\'") else b.append('\'')
      case c    => b.append(c)
    }
    b.toString
  }

  private[graft] def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't'   => b.append('\t')
          case 'n'   => b.append('\n')
          case 'r'   => b.append('\r')
          case other => b.append(other) // covers \\ and \'
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** `['el','el']` with `\`-escaped content → elements. A plain split
    * on `','` is wrong: content `a','b` encodes as `a\',\'b`, whose
    * char sequence contains `','`. Malformed input (truncated line,
    * unterminated element) fails with IllegalArgumentException — a
    * bulk-import codec must never leak index-class errors on garbage
    * (same contract as [[PromRemoteCodec]]'s wire decode). */
  private[graft] def parseArray(s: String): Seq[String] = {
    if (s.length < 2 || s.charAt(0) != '[' || s.charAt(s.length - 1) != ']')
      throw new IllegalArgumentException(s"malformed TabSeparated array: $s")
    val out = Seq.newBuilder[String]
    var i = 1 // skip [
    val end = s.length - 1
    while (i < end) {
      if (s.charAt(i) == '\'') {
        val b = new StringBuilder
        i += 1
        var open = true
        while (open) {
          if (i >= end)
            throw new IllegalArgumentException(
              s"malformed TabSeparated array (unterminated element): $s")
          val c = s.charAt(i)
          if (c == '\\') {
            if (i + 1 >= end)
              throw new IllegalArgumentException(
                s"malformed TabSeparated array (dangling escape): $s")
            s.charAt(i + 1) match {
              case 't'   => b.append('\t')
              case 'n'   => b.append('\n')
              case 'r'   => b.append('\r')
              case other => b.append(other)
            }
            i += 2
          } else if (c == '\'') { open = false; i += 1 }
          else { b.append(c); i += 1 }
        }
        out += b.toString
      } else i += 1 // separator comma
    }
    out.result()
  }

  def export(samples: DataFrame, path: String): Unit = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      // value goes through the SAME double→string cast the engine uses
      // everywhere else, so export→import round-trips bit-exactly
      .select(expr("ts_us DIV 1000000").as("_1"), col("metric").as("_2"),
              col("labels").as("_3"), col("value").cast("string").as("_4"))
      .as[(Long, String, Seq[String], String)]
      .mapPartitions(_.map { case (sec, metric, labels, value) =>
        val arr = labels.map(l => "'" + escape(l, quote = true) + "'").mkString("[", ",", "]")
        s"$sec\t${escape(metric, quote = false)}\t$arr\t$value"
      })
      .toDF("line")
      .write.mode("overwrite").text(path)
  }

  def importTsv(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .as[String]
      .mapPartitions(_.map { line =>
        // real tabs are structural (content tabs are escaped \t)
        val f = line.split('\t')
        if (f.length != 4)
          throw new IllegalArgumentException(
            s"malformed TabSeparated line (${f.length} fields): $line")
        // toLong/parseDouble throw NumberFormatException, an
        // IllegalArgumentException — same clean failure class
        (f(0).toLong * 1000000L, unescape(f(1)), parseArray(f(2)),
          java.lang.Double.parseDouble(f(3)))
      })
      .toDF("ts_us", "metric", "labels", "value")
  }
}

/** Structured Streaming ingestion (reference main.go serves a
  * continuous write stream; here: file-source stream → canonical
  * samples → stateful aggregation, memory sink for tests, the same
  * transform chain writes to SamplesStore in production). */
object StreamIngest {

  import org.apache.spark.sql.types._

  /** events parquet schema with ts as raw INT64 nanos (nanosAsLong). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Stream srcDir's events files → per-metric totals, synchronously
    * (availableNow semantics via processAllAvailable). */
  def runToMemory(spark: SparkSession, srcDir: String, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(eventsSchema).parquet(srcDir)
      .select(
        expr("ts DIV 1000").as("ts_us"),
        col("event_type").as("metric"),
        array_sort(array(
          concat(lit("k="), regexp_extract(col("props"), "[0-9]+", 0)),
          concat(lit("user="), col("user_id").cast("string")))).as("labels"),
        col("value"))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n_samples"), round(sum(col("value")), 6).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Event-time tumbling-window ingestion: per-(metric, hour window)
    * counts/sums with a declared watermark — the Structured Streaming
    * shape of a continuously-aggregating write path. Complete output
    * keeps the result deterministic under processAllAvailable (append
    * mode would hold back the final, still-open window); on a real
    * cluster the same plan runs append mode with the watermark
    * expiring state. Output: metric, bucket (epoch sec), n_samples,
    * sum_value. */
  def runWindowedToMemory(spark: SparkSession, srcDir: String, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(eventsSchema).parquet(srcDir)
      .select(
        timestamp_micros(expr("ts DIV 1000")).as("event_ts"),
        col("event_type").as("metric"),
        col("value"))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("metric"))
      .agg(count(lit(1)).as("n_samples"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("metric"), unix_timestamp(col("window.start")).as("bucket"),
              col("n_samples"), col("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Continuous ingestion INTO the day-partitioned store — the
    * reference's actual serving write path as a stream (main.go's
    * accept-loop ≙ the file source; each ClickHouse INSERT ≙ one
    * microbatch append). foreachBatch gives the sink the full
    * DataFrame writer surface; the checkpoint alone only makes the
    * sink at-least-once (a crash between append and checkpoint commit
    * re-delivers the batch), so the write goes through
    * [[SamplesStore.appendBatch]], whose batchId commit markers turn
    * replays into no-ops — end-to-end exactly-once. At 100 TB the
    * same query runs unmodified with a durable checkpoint dir;
    * appendBatch itself folds the per-batch files once a day
    * partition fragments past its threshold (in-path, after the
    * commit marker lands — never a concurrent background job racing
    * the stream's renames). Returns the store read-back. */
  def runToStore(spark: SparkSession, srcDir: String, storePath: String,
                 checkpointDir: String): DataFrame = {
    val stream = spark.readStream.schema(eventsSchema).parquet(srcDir)
      .select(
        expr("ts DIV 1000").as("ts_us"),
        col("event_type").as("metric"),
        array_sort(array(
          concat(lit("k="), regexp_extract(col("props"), "[0-9]+", 0)),
          concat(lit("user="), col("user_id").cast("string")))).as("labels"),
        col("value"))
    val appendBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, id) => SamplesStore.appendBatch(batch, storePath, id)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(appendBatch)
      .start()
    q.processAllAvailable()
    q.stop()
    SamplesStore.read(spark, storePath)
  }

  /** The production-bounded variant of [[runDedupToMemory]]'s state
    * (SURVEY §5.11): watermark + EventTimeTimeout expire each seen
    * key `horizonMs` past its newest event, so the state store tracks
    * the replay horizon, not the key universe — at 100 TB the
    * NoTimeout form above would grow one entry per event forever.
    * Within the horizon a replayed event_id is dropped; once the
    * watermark passes a key's expiry its state is removed and a LATER
    * replay is re-admitted (the correct trade: at-least-once clients
    * retry within the horizon, and bounded state is what survives at
    * scale). Returns the STREAMING deduped rows — the caller owns the
    * sink; StreamSpec drives microbatch boundaries to exercise the
    * expiry path. */
  def dedupWithWatermark(spark: SparkSession, srcDir: String,
                         horizonMs: Long = 3600L * 1000): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    spark.readStream.schema(eventsSchema).parquet(srcDir)
      .select(col("event_id"), timestamp_micros(expr("ts DIV 1000")).as("event_ts"),
              col("event_type").as("metric"), col("value"))
      .withWatermark("event_ts", s"$horizonMs milliseconds")
      .as[(Long, java.sql.Timestamp, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Double)],
         state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toVector
            val out = if (state.exists) Iterator.empty
                      else { state.update(true); rs.iterator.take(1) }
            // (re)arm expiry at horizon past this key's newest event;
            // rows below the watermark never reach here, so this is
            // always ahead of the current watermark
            state.setTimeoutTimestamp(rs.map(_._2.getTime).max + horizonMs)
            out
          })
      .toDF("event_id", "event_ts", "metric", "value")
  }

  /** Stateful streaming exact-dedup: first occurrence of each
    * event_id passes, every replay is dropped — the at-least-once
    * ingestion guard (a remote-write client retries on timeout, so
    * the same request body can arrive twice; reference ingestion is
    * idempotent only through ClickHouse's ReplacingMergeTree-style
    * dedup at merge time — here it's exact and online).
    *
    * Custom state via flatMapGroupsWithState (Append): one boolean
    * per seen key. The built-in dropDuplicates would compose the same
    * plan; the explicit GroupState form is the extension point for
    * richer per-key ingest state (last-seen ts, out-of-order
    * counters). At 100 TB the state store shards by key across
    * executors; a production stream bounds it with
    * [[dedupWithWatermark]]'s EventTimeTimeout + watermark so keys
    * expire after the replay horizon — NoTimeout here keeps the test
    * deterministic (the synthetic replay arrives in-batch).
    *
    * The stream emits deduped ROWS (append mode); the per-metric
    * report is a batch aggregate over the sink table. */
  def runDedupToMemory(spark: SparkSession, srcDir: String, queryName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = spark.readStream.schema(eventsSchema).parquet(srcDir)
      .select(col("event_id"), expr("ts DIV 1000").as("ts_us"),
              col("event_type").as("metric"), col("value"))
      .as[(Long, Long, String, Double)]
    val deduped = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long, String, Double)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) })
      .toDF("event_id", "ts_us", "metric", "value")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n_samples"), round(sum(col("value")), 6).as("sum_value"))
  }
}
