package graft.serve

import org.apache.spark.sql.SparkSession

/** Validated serving configuration — the twin of the reference's flag
  * surface + adapter config (reference: main.go:76-95, conn.go:13-14 +
  * conn.go:39-46). The ClickHouse address/database/table flags
  * collapse into the store path (the Spark engine owns its storage
  * layout); the identifier-regex check conn.go applies to the table
  * name applies here to the store path and the ignore-label, so a
  * malformed flag fails at startup, not mid-request.
  */
final case class ServeConfig(
    listen: String = "9131",
    storePath: String = "",
    readIgnoreLabel: String = "remote=clickhouse",
    readIgnoreHints: Boolean = false,
    maxReadSamples: Long = RemoteRead.DefaultMaxReadSamples,
    compactIntervalMs: Long = 10000L,
    compactFilesPerDay: Int = graft.ingest.SamplesStore.AutoCompactFilesPerDay,
    retentionDays: Int = 0,
    rollupIntervalSec: Long = 0L,
    rollupLadderIntervalSec: Long = 0L,
    recordRules: Seq[String] = Nil,
    alertRules: Seq[String] = Nil,
    nativeHistogramQuantile: Boolean = false,
    ctZeroIngestion: Boolean = false,
    otlpPromoteScope: Boolean = false,
    debug: Boolean = false) {

  /** [address:]port → port int (main.go:93-95 prefixes ":" when no
    * host given; the JDK server binds all interfaces either way). */
  def port: Int = {
    val p = listen.substring(listen.lastIndexOf(':') + 1)
    p.toIntOption.filter(v => v >= 0 && v <= 65535).getOrElse(
      throw new IllegalArgumentException(s"invalid listen port: $listen"))
  }

  def validated: ServeConfig = {
    if (storePath.isEmpty || storePath.exists(c => c.isWhitespace || c.isControl))
      throw new IllegalArgumentException(
        s"invalid store path '$storePath': must be a non-empty path without whitespace")
    if (readIgnoreLabel.nonEmpty) {
      val i = readIgnoreLabel.indexOf('=')
      if (i <= 0 || i == readIgnoreLabel.length - 1)
        throw new IllegalArgumentException(
          s"invalid read.ignore-label '$readIgnoreLabel': must be name=value")
    }
    if (maxReadSamples <= 0)
      throw new IllegalArgumentException(
        s"invalid read.max-samples $maxReadSamples: must be positive")
    if (compactIntervalMs < 0)
      throw new IllegalArgumentException(
        s"invalid store.compact-interval-ms $compactIntervalMs: must be >= 0")
    if (compactFilesPerDay <= 0)
      throw new IllegalArgumentException(
        s"invalid store.compact-files-per-day $compactFilesPerDay: must be positive")
    if (retentionDays < 0)
      throw new IllegalArgumentException(
        s"invalid store.retention-days $retentionDays: must be >= 0 (0 disables)")
    if (rollupIntervalSec < 0 || (rollupIntervalSec > 0 && 86400L % rollupIntervalSec != 0))
      throw new IllegalArgumentException(
        s"invalid store.rollup-interval-sec $rollupIntervalSec: must divide a day (0 disables)")
    if (rollupLadderIntervalSec < 0 ||
        (rollupLadderIntervalSec > 0 &&
          (86400L % rollupLadderIntervalSec != 0 ||
           rollupIntervalSec <= 0 ||
           rollupLadderIntervalSec % rollupIntervalSec != 0 ||
           rollupLadderIntervalSec <= rollupIntervalSec)))
      throw new IllegalArgumentException(
        s"invalid store.rollup-ladder-interval-sec $rollupLadderIntervalSec: " +
          "must divide a day and be a proper multiple of " +
          s"store.rollup-interval-sec (=$rollupIntervalSec; 0 disables)")
    parsedRules // validates every -rule.record at startup
    parsedAlertRules // and every -rule.alert
    port // validates listen
    this
  }

  def ignoreLabelOpt: Option[String] =
    if (readIgnoreLabel.isEmpty) None else Some(readIgnoreLabel)

  /** `-rule.record <stepSec>|<name>|<expr>` → eagerly-parsed rules
    * (a malformed rule fails at startup, like every other flag). The
    * expression is everything after the second '|', so regex
    * alternation inside it stays intact. */
  def parsedRules: Seq[Recording.Rule] = recordRules.map { raw =>
    raw.split("\\|", 3) match {
      case Array(step, name, expr) =>
        val stepSec = step.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"invalid -rule.record step '$step' in '$raw'"))
        Recording.Rule(name, expr, stepSec)
      case _ => throw new IllegalArgumentException(
        s"invalid -rule.record '$raw': want <stepSec>|<name>|<expr>")
    }
  }

  /** `-rule.alert <stepSec>|<forSec>|<name>|<expr>`, parsed eagerly
    * like the recording rules. */
  def parsedAlertRules: Seq[Alerting.AlertRule] = alertRules.map { raw =>
    raw.split("\\|", 4) match {
      case Array(step, forS, name, expr) =>
        val stepSec = step.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"invalid -rule.alert step '$step' in '$raw'"))
        val forSec = forS.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"invalid -rule.alert for-duration '$forS' in '$raw'"))
        Alerting.AlertRule(name, expr, forSec, stepSec)
      case _ => throw new IllegalArgumentException(
        s"invalid -rule.alert '$raw': want <stepSec>|<forSec>|<name>|<expr>")
    }
  }
}

/** Runnable service: parse flags, validate, build the session, bind
  * the HTTP front door, block — `main.go` end to end. A user of the
  * reference starts this the same way they start the Go binary:
  *
  *   spark-submit --class graft.serve.Main graft.jar \
  *     -http 9131 -store /data/graft_store
  */
object Main {

  def parseArgs(args: Seq[String]): ServeConfig = {
    def loop(rest: List[String], c: ServeConfig): ServeConfig = rest match {
      case "-http" :: v :: t => loop(t, c.copy(listen = v))
      case "-store" :: v :: t => loop(t, c.copy(storePath = v))
      case "-read.ignore-label" :: v :: t => loop(t, c.copy(readIgnoreLabel = v))
      case "-read.ignore-hints" :: t => loop(t, c.copy(readIgnoreHints = true))
      case "-read.max-samples" :: v :: t => loop(t, c.copy(maxReadSamples = v.toLong))
      case "-store.compact-interval-ms" :: v :: t => loop(t, c.copy(compactIntervalMs = v.toLong))
      case "-store.compact-files-per-day" :: v :: t => loop(t, c.copy(compactFilesPerDay = v.toInt))
      case "-store.retention-days" :: v :: t => loop(t, c.copy(retentionDays = v.toInt))
      case "-store.rollup-interval-sec" :: v :: t => loop(t, c.copy(rollupIntervalSec = v.toLong))
      case "-store.rollup-ladder-interval-sec" :: v :: t =>
        loop(t, c.copy(rollupLadderIntervalSec = v.toLong))
      case "-promql.native-histogram-quantile" :: t =>
        loop(t, c.copy(nativeHistogramQuantile = true))
      case "-write.ct-zero-ingestion" :: t =>
        loop(t, c.copy(ctZeroIngestion = true))
      case "-write.otlp-promote-scope" :: t =>
        loop(t, c.copy(otlpPromoteScope = true))
      case "-rule.record" :: v :: t => loop(t, c.copy(recordRules = c.recordRules :+ v))
      case "-rule.alert" :: v :: t => loop(t, c.copy(alertRules = c.alertRules :+ v))
      // main.go:89's -debug (zap debug logging) — here it lifts the
      // Spark log level so request handling and store jobs trace
      case "-debug" :: t => loop(t, c.copy(debug = true))
      case Nil => c
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown flag: $other")
    }
    loop(args.toList, ServeConfig()).validated
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args.toIndexedSeq)
    val spark = SparkSession.builder()
      .appName("graft-serve")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    if (cfg.debug) spark.sparkContext.setLogLevel("DEBUG")
    // background-merge knobs (the reference exposes its ops knobs as
    // flags too; these bound the write path's compaction probe)
    RemoteWrite.compactCheckIntervalMs = cfg.compactIntervalMs
    RemoteWrite.autoCompactFilesPerDay = cfg.compactFilesPerDay
    RemoteWrite.retentionDays = cfg.retentionDays
    RemoteWrite.recordingRules = cfg.parsedRules
    HttpServe.alertRules = cfg.parsedAlertRules
    RemoteWrite.rollupIntervalSec = cfg.rollupIntervalSec
    RemoteWrite.rollupLadderIntervalSec = cfg.rollupLadderIntervalSec
    RemoteWrite.nativeHistogramQuantile = cfg.nativeHistogramQuantile
    RemoteWrite.ctZeroIngestion = cfg.ctZeroIngestion
    RemoteWrite.otlpPromoteScope = cfg.otlpPromoteScope
    val server = HttpServe.start(spark, cfg.storePath, cfg.port,
      cfg.ignoreLabelOpt, cfg.readIgnoreHints, cfg.maxReadSamples)
    // main.go:157-162's "listening" log line, then serve forever.
    println(s"graft-serve listening on :${server.port} store=${cfg.storePath}")
    Thread.currentThread.join()
  }
}
