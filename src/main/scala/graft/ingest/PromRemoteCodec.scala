package graft.ingest

import org.xerial.snappy.Snappy

import graft.operators.{LabelMatcher, MatcherType, ReadQuery}

/** Prometheus remote-storage protocol model + codec — the twin of the
  * reference's prompb handling (reference: codec.go:28-78 for the
  * snappy+proto framing, main.go:126-155 for the endpoints).
  *
  * Wire messages (public prometheus/prompb field numbers):
  *   Label        {1: name, 2: value}
  *   Sample       {1: value double, 2: timestamp int64 ms}
  *   TimeSeries   {1: labels*, 2: samples*}
  *   WriteRequest {1: timeseries*}
  *   LabelMatcher {1: type enum(EQ NEQ RE NRE), 2: name, 3: value}
  *   ReadHints    {1: step_ms, 2: func, 3: start_ms, 4: end_ms, 7: range_ms}
  *   Query        {1: start_ms, 2: end_ms, 3: matchers*, 4: hints}
  *   ReadRequest  {1: queries*}
  *   QueryResult  {1: timeseries*}
  *   ReadResponse {1: results*}
  */
object PromRemoteCodec {

  final case class PromLabel(name: String, value: String)
  final case class PromSample(value: Double, timestampMs: Long)
  /** One exemplar (prompb TimeSeries field 3 / PRW 2.0 field 4):
    * the traced observation Grafana links from histogram panels. */
  final case class PromExemplar(labels: Seq[PromLabel], value: Double,
                                timestampMs: Long)
  /** Per-series metric metadata (PRW 2.0 TimeSeries field 5 —
    * io.prometheus.write.v2.Metadata {1: type enum, 3: help_ref,
    * 4: unit_ref}; help/unit resolve through the request's symbol
    * table). `mtype` keeps the wire enum; [[typeName]] renders the
    * lowercase text /api/v1/metadata serves. */
  final case class PromMetadata(mtype: Int, help: String, unit: String) {
    def typeName: String = PromMetadata.typeName(mtype)
  }
  object PromMetadata {
    /** The public MetricType enum's names, lowercased — what the
      * Prometheus metadata API answers (0/unknown included). */
    def typeName(t: Int): String = t match {
      case 1 => "counter"
      case 2 => "gauge"
      case 3 => "histogram"
      case 4 => "gaugehistogram"
      case 5 => "summary"
      case 6 => "info"
      case 7 => "stateset"
      case _ => "unknown"
    }
    def typeCode(name: String): Int = name match {
      case "counter"        => 1
      case "gauge"          => 2
      case "histogram"      => 3
      case "gaugehistogram" => 4
      case "summary"        => 5
      case "info"           => 6
      case "stateset"       => 7
      case _                => 0
    }
  }
  final case class PromTimeSeries(labels: Seq[PromLabel],
                                  samples: Seq[PromSample],
                                  histograms: Seq[NativeHistogram.Hist] = Nil,
                                  exemplars: Seq[PromExemplar] = Nil,
                                  metadata: Option[PromMetadata] = None,
                                  /** PRW 2.0 TimeSeries field 6 (ms):
                                    * when the series' counter was
                                    * created/reset — 0 = unset. Lets
                                    * a receiver inject a zero sample
                                    * at creation (Prometheus's
                                    * created-timestamp-zero-ingestion
                                    * feature) so rate over a young
                                    * counter sees its true start. */
                                  createdTimestampMs: Long = 0L)
  /** Native-histogram samples (prompb TimeSeries field 4 / PRW 2.0
    * TimeSeries field 3) DECODE and convert to classic
    * _bucket/_sum/_count series (see [[NativeHistogram]]) — the
    * float64 store serves them through the whole existing query
    * surface. `skippedHistograms` ledgers only what CANNOT convert
    * (non-standard schema) — counted, never silent. */
  final case class PromWriteRequest(timeseries: Seq[PromTimeSeries],
                                    skippedHistograms: Long = 0L,
                                    /** PRW 1.0 family-level metadata
                                      * (prompb WriteRequest field 3,
                                      * MetricMetadata): (family name,
                                      * type/help/unit) — the 1.x
                                      * sender's periodic metadata
                                      * push; v2 carries metadata
                                      * per series instead. */
                                    familyMetadata: Seq[(String, PromMetadata)] = Nil) {
    /** Histogram samples that decoded AND convert (standard schema). */
    def histogramCount: Long =
      timeseries.iterator.map(_.histograms.size.toLong).sum
    /** Float samples on the request (the sender's own count). */
    def sampleCount: Long =
      timeseries.iterator.map(_.samples.size.toLong).sum
    /** Exemplars on the request. */
    def exemplarCount: Long =
      timeseries.iterator.map(_.exemplars.size.toLong).sum
  }

  /** One flat ingested sample — reference write.go:34-46 label
    * normalization applied: __name__ split out, remaining labels as
    * sorted "k=v" strings. */
  final case class IngestedSample(ts_us: Long, metric: String, labels: Seq[String], value: Double)

  /** Prometheus's explicit staleness marker: a NaN with THIS exact
    * payload (prometheus/pkg/value StaleNaN). A scrape loop appends
    * one when a target vanishes or a series stops being exposed; a
    * PromQL engine must treat it as SERIES END (the instant lookback
    * stops, the sample itself is never returned), and remote read
    * passes it through verbatim. The bit pattern is the ONLY
    * distinction from an ordinary NaN sample (summary quantiles
    * expose those legitimately), so detection happens HERE in the
    * wire codec — Spark's UnsafeRow canonicalizes NaN payloads, so
    * the marker cannot survive a DataFrame double column. */
  val StaleNaNBits: Long = 0x7ff0000000000002L

  def isStaleMarker(v: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(v) == StaleNaNBits

  /** The marker value with its exact payload — longBitsToDouble /
    * doubleToRawLongBits round-trip bit-exactly on the JVM (both are
    * intrinsified register moves; CodecFuzzSpec pins it). */
  def staleNaN: Double = java.lang.Double.longBitsToDouble(StaleNaNBits)

  // ---- decode ------------------------------------------------------

  def decodeWriteRequest(snappyBody: Array[Byte]): PromWriteRequest = {
    val r = ProtoWire.reader(Snappy.uncompress(snappyBody))
    val series = Seq.newBuilder[PromTimeSeries]
    val meta = Seq.newBuilder[(String, PromMetadata)]
    val hist = new Count
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      if (field == 1 && wire == 2)
        series += readTimeSeries(r.readMessage(), hist)
      else if (field == 3 && wire == 2) {
        // prompb.MetricMetadata {1: type enum, 2: metric_family_name,
        // 4: help, 5: unit} — 1.x senders push these periodically
        val mr = r.readMessage()
        var t = 0; var fam = ""; var help = ""; var unit = ""
        while (mr.hasMore) {
          val (mf, mw) = mr.readTag()
          (mf, mw) match {
            case (1, 0) => t = mr.readVarint().toInt
            case (2, 2) => fam = mr.readString()
            case (4, 2) => help = mr.readString()
            case (5, 2) => unit = mr.readString()
            case _      => mr.skip(mw)
          }
        }
        if (fam.nonEmpty) meta += ((fam, PromMetadata(t, help, unit)))
      }
      else r.skip(wire)
    }
    PromWriteRequest(series.result(), hist.n, meta.result())
  }

  private final class Count { var n = 0L }

  private def readTimeSeries(r: ProtoWire.Reader,
                             skipped: Count = new Count): PromTimeSeries = {
    val labels = Seq.newBuilder[PromLabel]
    val samples = Seq.newBuilder[PromSample]
    val hists = Seq.newBuilder[NativeHistogram.Hist]
    val exemplars = Seq.newBuilder[PromExemplar]
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 2) => labels += readLabel(r.readMessage())
        case (2, 2) => samples += readSample(r.readMessage())
        case (3, 2) => exemplars += readExemplar(r.readMessage())
        case (4, 2) => // native histogram: convertible ones ride along
          val h = NativeHistogram.decode(r.readMessage())
          if (NativeHistogram.convertible(h)) hists += h
          else skipped.n += 1
        case _      => r.skip(wire)
      }
    }
    PromTimeSeries(labels.result(), samples.result(), hists.result(),
      exemplars.result())
  }

  private def readExemplar(r: ProtoWire.Reader): PromExemplar = {
    val labels = Seq.newBuilder[PromLabel]
    var value = 0.0d; var tsMs = 0L
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 2) => labels += readLabel(r.readMessage())
        case (2, 1) => value = r.readDouble()
        case (3, 0) => tsMs = r.readVarint()
        case _      => r.skip(wire)
      }
    }
    PromExemplar(labels.result(), value, tsMs)
  }

  private def readLabel(r: ProtoWire.Reader): PromLabel = {
    var name = ""; var value = ""
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 2) => name = r.readString()
        case (2, 2) => value = r.readString()
        case _      => r.skip(wire)
      }
    }
    PromLabel(name, value)
  }

  private def readSample(r: ProtoWire.Reader): PromSample = {
    var value = 0.0; var ts = 0L
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 1) => value = r.readDouble()
        case (2, 0) => ts = r.readVarint()
        case _      => r.skip(wire)
      }
    }
    PromSample(value, ts)
  }

  /** A series' canonical store key: metric name + sorted "k=v"
    * labels (write.go's normalization) — the split every row stream
    * here shares. */
  private def seriesKey(ts: PromTimeSeries): (String, Seq[String]) = {
    var metric = ""
    val labels = Seq.newBuilder[String]
    ts.labels.foreach { l =>
      if (l.name == "__name__") metric = l.value
      else labels += s"${l.name}=${l.value}"
    }
    (metric, labels.result().sorted)
  }

  /** Created-timestamp zero rows (PRW 2.0): one synthetic 0 sample
    * AT the series' creation time when it precedes the batch's
    * earliest REAL sample — rate over a young counter then sees its
    * true start (Prometheus's created-timestamp-zero-ingestion
    * flag). Stale markers are excluded from the "earliest" test: a
    * death-notice-only batch must never re-zero the series. The
    * CALLER owns once-per-series suppression — a steady 2.0 sender
    * repeats the CT on every request, and Prometheus's TSDB dedups
    * the repeat appends; RemoteWrite's process-lifetime memo plays
    * that role here. */
  def toCtZeroRows(req: PromWriteRequest): Iterator[IngestedSample] =
    req.timeseries.iterator.flatMap { ts =>
      val real = ts.samples.filterNot(s => isStaleMarker(s.value))
      if (ts.createdTimestampMs > 0L && real.nonEmpty &&
          real.iterator.map(_.timestampMs).min > ts.createdTimestampMs) {
        val (metric, sorted) = seriesKey(ts)
        Iterator.single(IngestedSample(
          ts.createdTimestampMs * 1000L, metric, sorted, 0.0))
      } else Iterator.empty
    }

  /** WriteRequest → flat samples with reference label normalization
    * (write.go: __name__ → metric_name, others appended "k=v"; label
    * names arrive sorted per the remote-write spec — we sort anyway
    * to be canonical). ctZero folds in [[toCtZeroRows]] for callers
    * without their own dedup memo (specs, one-shot replays). */
  def toSamples(req: PromWriteRequest,
                ctZero: Boolean = false): Iterator[IngestedSample] =
    (if (ctZero) toCtZeroRows(req) else Iterator.empty) ++
      req.timeseries.iterator.flatMap { ts =>
        val (metric, sorted) = seriesKey(ts)
        // stale markers route to the `_stale` sibling (toStaleRows):
        // stored in the main table they'd be indistinguishable from
        // ordinary NaN samples after Spark's NaN canonicalization, and
        // range windows must never see them (Prometheus's matrix
        // selection drops StaleNaN samples)
        ts.samples.iterator.filterNot(s => isStaleMarker(s.value)).map(s =>
          IngestedSample(s.timestampMs * 1000L, metric, sorted, s.value)) ++
          // native histograms land as classic _bucket/_sum/_count rows
          // (decode already filtered to standard schemas, so the
          // conversion is total here)
          ts.histograms.iterator.flatMap(h =>
            NativeHistogram.toClassicSamples(metric, sorted, h)
              .getOrElse(Seq.empty))
      }

  /** Staleness markers → rows for the sibling stale store
    * (`<store>_stale`): the usual (ts_us, metric, sorted "k=v"
    * labels) key with a constant value 1.0 — the marker's VALUE is
    * by definition [[StaleNaNBits]], so nothing beyond presence
    * needs storing (and a double column couldn't hold the payload
    * anyway). The query path suppresses the instant lookback from
    * these rows; /read re-materializes the exact wire bits. */
  def toStaleRows(req: PromWriteRequest): Iterator[IngestedSample] =
    req.timeseries.iterator
      .filter(_.samples.exists(s => isStaleMarker(s.value)))
      .flatMap { ts =>
        val (metric, sorted) = seriesKey(ts)
        ts.samples.iterator.filter(s => isStaleMarker(s.value)).map(s =>
          IngestedSample(s.timestampMs * 1000L, metric, sorted, 1.0))
      }

  /** Exemplars → store rows for the sibling exemplar store: series
    * labels ride as the usual sorted "k=v" strings, EXEMPLAR labels
    * as "__x_k=v" entries in the same array (the prefix keeps the
    * two label spaces apart; matchers on series labels can never
    * collide with a "__x_"-prefixed entry). */
  def toExemplarRows(req: PromWriteRequest): Iterator[IngestedSample] =
    req.timeseries.iterator.filter(_.exemplars.nonEmpty).flatMap { ts =>
      var metric = ""
      val labels = Seq.newBuilder[String]
      ts.labels.foreach { l =>
        if (l.name == "__name__") metric = l.value
        else labels += s"${l.name}=${l.value}"
      }
      val base = labels.result()
      ts.exemplars.iterator.map { e =>
        IngestedSample(e.timestampMs * 1000L, metric,
          (base ++ e.labels.map(l => s"__x_${l.name}=${l.value}")).sorted,
          e.value)
      }
    }

  /** Native-histogram samples → rows for the sibling histogram store
    * (`<store>_hist`): the raw prompb Histogram bytes ride as a
    * binary column next to the usual (ts_us, metric, sorted "k=v"
    * labels) key. The CLASSIC expansion still lands in the main
    * store for the whole float query surface; this sibling is the
    * store-and-forward leg — a chunked remote read answers
    * native-histogram series as HISTOGRAM/FLOAT_HISTOGRAM chunks
    * re-encoded from these bytes (graft.serve.HistChunks). */
  def toHistRows(req: PromWriteRequest)
      : Iterator[(Long, String, Seq[String], Array[Byte])] =
    req.timeseries.iterator.filter(_.histograms.nonEmpty).flatMap { ts =>
      var metric = ""
      val labels = Seq.newBuilder[String]
      ts.labels.foreach { l =>
        if (l.name == "__name__") metric = l.value
        else labels += s"${l.name}=${l.value}"
      }
      val sorted = labels.result().sorted
      ts.histograms.iterator
        // span/bucket consistency gates at INGEST: a histogram whose
        // span lengths disagree with its bucket count is the
        // sender's malformed message — storing it would poison the
        // series' chunked federation (the classic conversion already
        // truncates it silently; the sibling simply skips it)
        .filter(h => NativeHistogram.spansConsistent(h))
        .map(h =>
          (h.timestampMs * 1000L, metric, sorted, NativeHistogram.encode(h)))
    }

  /** Metric metadata → store rows for the sibling metadata store,
    * reusing the samples layout (day partitioning, compaction,
    * manifest all come free): metric = the series' __name__, labels
    * carry the three text fields as "__help=", "__type=", "__unit="
    * entries (already in sorted order), value = 1, ts = the series'
    * newest sample/histogram timestamp so "latest metadata wins" is
    * well-defined on read. One row per series; identical re-sends
    * at the same timestamp collapse in the store's per-second dedup,
    * and the read side takes the newest row per (metric, entry). */
  def toMetadataRows(req: PromWriteRequest): Iterator[IngestedSample] = {
    val perSeries = req.timeseries.iterator.filter(_.metadata.isDefined).map { ts =>
      val metric =
        ts.labels.find(_.name == "__name__").map(_.value).getOrElse("")
      val md = ts.metadata.get
      val tsUs = (ts.samples.iterator.map(_.timestampMs) ++
        ts.histograms.iterator.map(_.timestampMs)).maxOption.getOrElse(0L) * 1000L
      IngestedSample(tsUs, metric,
        Seq(s"__help=${md.help}", s"__type=${md.typeName}",
          s"__unit=${md.unit}"), 1.0)
    }
    // v1 family-level metadata has no series of its own to stamp
    // from — it rides on the request's newest sample so latest-wins
    // stays well-defined (a metadata-only request stamps 0)
    lazy val reqTsUs = req.timeseries.iterator.flatMap(ts =>
      ts.samples.iterator.map(_.timestampMs) ++
        ts.histograms.iterator.map(_.timestampMs))
      .maxOption.getOrElse(0L) * 1000L
    val perFamily = req.familyMetadata.iterator.map { case (fam, md) =>
      IngestedSample(reqTsUs, fam,
        Seq(s"__help=${md.help}", s"__type=${md.typeName}",
          s"__unit=${md.unit}"), 1.0)
    }
    perSeries ++ perFamily
  }

  /** Max read-request body, compressed or inflated (reference:
    * codec.go:23-24 `decodeReadLimit`, applied via io.LimitReader).
    * Checking the snappy header's declared uncompressed length BEFORE
    * inflating also closes the decompression-bomb hole the reference's
    * compressed-side-only limit leaves open. */
  val DecodeReadLimit: Int = 32 * 1024 * 1024

  def decodeReadRequest(snappyBody: Array[Byte]): Seq[ReadQuery] = {
    if (snappyBody.length > DecodeReadLimit)
      throw new ProtoWire.WireFormatException(
        s"read request body ${snappyBody.length} bytes exceeds limit $DecodeReadLimit")
    val inflated = Snappy.uncompressedLength(snappyBody)
    if (inflated > DecodeReadLimit)
      throw new ProtoWire.WireFormatException(
        s"read request inflates to $inflated bytes, exceeds limit $DecodeReadLimit")
    val r = ProtoWire.reader(Snappy.uncompress(snappyBody))
    val queries = Seq.newBuilder[ReadQuery]
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      if (field == 1 && wire == 2) queries += readQuery(r.readMessage())
      else r.skip(wire)
    }
    queries.result()
  }

  private def readQuery(r: ProtoWire.Reader): ReadQuery = {
    var start = 0L; var end = 0L; var step = 0L; var range = 0L
    val matchers = Seq.newBuilder[LabelMatcher]
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 0) => start = r.readVarint()
        case (2, 0) => end = r.readVarint()
        case (3, 2) => matchers += readMatcher(r.readMessage())
        case (4, 2) =>
          val h = r.readMessage()
          while (h.hasMore) {
            val (hf, hw) = h.readTag()
            (hf, hw) match {
              case (1, 0) => step = h.readVarint()
              case (7, 0) => range = h.readVarint()
              case _      => h.skip(hw)
            }
          }
        case _ => r.skip(wire)
      }
    }
    ReadQuery(start, end, matchers.result(), step, range)
  }

  private def readMatcher(r: ProtoWire.Reader): LabelMatcher = {
    var t = 0; var name = ""; var value = ""
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 0) => t = r.readVarint().toInt
        case (2, 2) => name = r.readString()
        case (3, 2) => value = r.readString()
        case _      => r.skip(wire)
      }
    }
    val mt = t match {
      case 0 => MatcherType.Eq
      case 1 => MatcherType.Neq
      case 2 => MatcherType.Re
      case 3 => MatcherType.Nre
      case o => throw new IllegalArgumentException(s"unsupported LabelMatcher_Type $o")
    }
    LabelMatcher(mt, name, value)
  }

  // ---- remote-write 2.0 (io.prometheus.write.v2.Request) -----------

  /** Content-Type `proto=` parameter values from the public PRW 2.0
    * content-negotiation table. v1 is the default when the parameter
    * is absent (every 1.x sender). */
  val ProtoV1 = "prometheus.WriteRequest"
  val ProtoV2 = "io.prometheus.write.v2.Request"

  /** Decode `io.prometheus.write.v2.Request` (public spec; Prometheus
    * 3.x negotiates it): a string symbol table (field 4, ref 0 = "")
    * with each series carrying `labels_refs` — alternating
    * (name, value) indexes — instead of inline label strings
    * (field 5; Sample keeps v1's numbers: value=1, timestamp=2 ms).
    * Fields can arrive in any proto order, so series sub-readers are
    * collected first and resolved after the table is complete.
    * Histograms (field 3) convert to classic series, exemplars
    * (field 4) land in the sibling exemplar store, and METADATA
    * (field 5: type/help_ref/unit_ref) decodes through the symbol
    * table for the sibling metadata store — the 2.0 spec says
    * senders attach it to every series. Malformed refs (out of
    * range, odd count) throw the clean wire-format failure class. */
  def decodeWriteRequestV2(snappyBody: Array[Byte]): PromWriteRequest = {
    val r = ProtoWire.reader(Snappy.uncompress(snappyBody))
    val symbols = Vector.newBuilder[String]
    val rawSeries = Seq.newBuilder[ProtoWire.Reader]
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (4, 2) => symbols += r.readString()
        case (5, 2) => rawSeries += r.readMessage()
        case _      => r.skip(wire)
      }
    }
    val syms = symbols.result()
    if (syms.nonEmpty && syms(0).nonEmpty)
      throw new ProtoWire.WireFormatException(
        "v2 symbol table must start with the empty string")
    def sym(ref: Long): String = {
      if (ref < 0L || ref >= syms.length)
        throw new ProtoWire.WireFormatException(
          s"symbol ref $ref out of range (${syms.length} symbols)")
      syms(ref.toInt)
    }
    val hist = new Count
    val series = rawSeries.result().map(readTimeSeriesV2(_, sym, hist))
    PromWriteRequest(series, hist.n)
  }

  private def readTimeSeriesV2(r: ProtoWire.Reader,
                               sym: Long => String,
                               skipped: Count): PromTimeSeries = {
    val refs = Seq.newBuilder[Long]
    val samples = Seq.newBuilder[PromSample]
    val hists = Seq.newBuilder[NativeHistogram.Hist]
    val rawExemplars = Seq.newBuilder[ProtoWire.Reader]
    var meta: Option[PromMetadata] = None
    var createdTs = 0L
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        // labels_refs: packed (the proto3 default for repeated
        // uint32) or unpacked — both legal on the wire
        case (1, 2) =>
          val pr = r.readMessage()
          while (pr.hasMore) refs += pr.readVarint()
        case (1, 0) => refs += r.readVarint()
        case (2, 2) => samples += readSample(r.readMessage())
        case (3, 2) => // native histogram (same message as prompb)
          val h = NativeHistogram.decode(r.readMessage())
          if (NativeHistogram.convertible(h)) hists += h
          else skipped.n += 1
        case (4, 2) => rawExemplars += r.readMessage()
        case (6, 0) => createdTs = r.readVarint()
        case (5, 2) => // Metadata {1: type, 3: help_ref, 4: unit_ref}
          val mm = r.readMessage()
          var t = 0; var helpRef = 0L; var unitRef = 0L
          while (mm.hasMore) {
            val (mf, mw) = mm.readTag()
            (mf, mw) match {
              case (1, 0) => t = mm.readVarint().toInt
              case (3, 0) => helpRef = mm.readVarint()
              case (4, 0) => unitRef = mm.readVarint()
              case _      => mm.skip(mw)
            }
          }
          meta = Some(PromMetadata(t, sym(helpRef), sym(unitRef)))
        case _      => r.skip(wire)
      }
    }
    val rs = refs.result()
    if (rs.length % 2 != 0)
      throw new ProtoWire.WireFormatException(
        s"labels_refs length ${rs.length} is odd (must be name/value pairs)")
    val labels = rs.grouped(2).map { p =>
      PromLabel(sym(p(0)), sym(p(1)))
    }.toSeq
    val exemplars = rawExemplars.result().map(readExemplarV2(_, sym))
    PromTimeSeries(labels, samples.result(), hists.result(), exemplars, meta,
      createdTs)
  }

  /** PRW 2.0 Exemplar: symbol-table labels_refs + value + ms ts. */
  private def readExemplarV2(r: ProtoWire.Reader,
                             sym: Long => String): PromExemplar = {
    val refs = Seq.newBuilder[Long]
    var value = 0.0d; var tsMs = 0L
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      (field, wire) match {
        case (1, 2) =>
          val pr = r.readMessage()
          while (pr.hasMore) refs += pr.readVarint()
        case (1, 0) => refs += r.readVarint()
        case (2, 1) => value = r.readDouble()
        case (3, 0) => tsMs = r.readVarint()
        case _      => r.skip(wire)
      }
    }
    val rs = refs.result()
    if (rs.length % 2 != 0)
      throw new ProtoWire.WireFormatException(
        s"exemplar labels_refs length ${rs.length} is odd")
    PromExemplar(rs.grouped(2).map(p => PromLabel(sym(p(0)), sym(p(1)))).toSeq,
      value, tsMs)
  }

  /** Encode the v2 form (the client leg, for round-trip tests and
    * graft-to-graft federation): interns every label name/value once
    * in appearance order behind the mandatory "" at ref 0, emits the
    * symbol table before the series as senders are asked to. The
    * WHOLE series encodes — samples, native histograms (field 3),
    * exemplars (field 4, their labels through the same table), and
    * metadata (field 5) — a federation leg that dropped any of them
    * would silently lose data. */
  def encodeWriteRequestV2(req: PromWriteRequest): Array[Byte] = {
    val index = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def ref(s: String): Int = index.getOrElseUpdate(s, index.size)
    val seriesRefs = req.timeseries.map { ts =>
      ts.labels.flatMap(l => Seq(ref(l.name), ref(l.value)))
    }
    // exemplar labels and metadata help/unit intern into the SAME
    // table (spec: all strings ride the symbol table); resolve refs
    // before the table is emitted, like the label refs above
    val exRefs = req.timeseries.map(_.exemplars.map(e =>
      e.labels.flatMap(l => Seq(ref(l.name), ref(l.value)))))
    val metaRefs = req.timeseries.map(_.metadata.map(md =>
      (md.mtype, ref(md.help), ref(md.unit))))
    val w = new ProtoWire.Writer
    index.keys.foreach(s => w.writeStringField(4, s))
    req.timeseries.zipWithIndex.foreach { case (ts, i) =>
      val tw = new ProtoWire.Writer
      val pw = new ProtoWire.Writer
      seriesRefs(i).foreach(r0 => pw.writeVarint(r0.toLong))
      tw.writeBytesField(1, pw.toBytes) // packed labels_refs
      ts.samples.foreach { s =>
        val sw = new ProtoWire.Writer
        sw.writeDoubleField(1, s.value)
        sw.writeVarintField(2, s.timestampMs)
        tw.writeMessageField(2, sw)
      }
      ts.histograms.foreach(h =>
        tw.writeBytesField(3, NativeHistogram.encode(h)))
      ts.exemplars.zip(exRefs(i)).foreach { case (e, ers) =>
        val ew = new ProtoWire.Writer
        val epw = new ProtoWire.Writer
        ers.foreach(r0 => epw.writeVarint(r0.toLong))
        ew.writeBytesField(1, epw.toBytes) // packed labels_refs
        ew.writeDoubleField(2, e.value)
        ew.writeVarintField(3, e.timestampMs)
        tw.writeMessageField(4, ew)
      }
      metaRefs(i).foreach { case (t, h, u) =>
        val mw = new ProtoWire.Writer
        mw.writeVarintField(1, t.toLong)
        mw.writeVarintField(3, h.toLong)
        mw.writeVarintField(4, u.toLong)
        tw.writeMessageField(5, mw)
      }
      if (ts.createdTimestampMs > 0L)
        tw.writeVarintField(6, ts.createdTimestampMs)
      w.writeMessageField(5, tw)
    }
    Snappy.compress(w.toBytes)
  }

  /** The negotiated decode: dispatch on the Content-Type `proto=`
    * parameter (PRW 2.0 content negotiation), defaulting to v1 when
    * absent — a 1.x sender never sends the parameter. An unknown
    * value answers Left (the HTTP layer's 415). */
  def decodeNegotiated(contentType: Option[String],
                       snappyBody: Array[Byte]): Either[String, PromWriteRequest] =
    protoParam(contentType) match {
      case None | Some(ProtoV1) => Right(decodeWriteRequest(snappyBody))
      case Some(ProtoV2)        => Right(decodeWriteRequestV2(snappyBody))
      case Some(other)          => Left(other)
    }

  private[graft] def protoParam(contentType: Option[String]): Option[String] =
    contentType.flatMap(_.split(';').iterator.map(_.trim)
      .collectFirst { case p if p.startsWith("proto=") =>
        p.stripPrefix("proto=") })

  // ---- encode ------------------------------------------------------

  def encodeWriteRequest(req: PromWriteRequest): Array[Byte] = {
    val w = new ProtoWire.Writer
    req.timeseries.foreach(ts => w.writeMessageField(1, writeTimeSeries(ts)))
    req.familyMetadata.foreach { case (fam, md) =>
      val mw = new ProtoWire.Writer
      mw.writeVarintField(1, md.mtype.toLong)
      mw.writeStringField(2, fam)
      if (md.help.nonEmpty) mw.writeStringField(4, md.help)
      if (md.unit.nonEmpty) mw.writeStringField(5, md.unit)
      w.writeMessageField(3, mw)
    }
    Snappy.compress(w.toBytes)
  }

  private def writeTimeSeries(ts: PromTimeSeries): ProtoWire.Writer = {
    val w = new ProtoWire.Writer
    ts.labels.foreach { l =>
      val lw = new ProtoWire.Writer
      lw.writeStringField(1, l.name)
      lw.writeStringField(2, l.value)
      w.writeMessageField(1, lw)
    }
    ts.samples.foreach { s =>
      val sw = new ProtoWire.Writer
      sw.writeDoubleField(1, s.value)
      sw.writeVarintField(2, s.timestampMs)
      w.writeMessageField(2, sw)
    }
    // exemplars ride TimeSeries field 3 (prompb Exemplar: labels 1,
    // value 2, timestamp 3) — the exact inverse of readExemplar
    ts.exemplars.foreach { e =>
      val ew = new ProtoWire.Writer
      e.labels.foreach { l =>
        val lw = new ProtoWire.Writer
        lw.writeStringField(1, l.name)
        lw.writeStringField(2, l.value)
        ew.writeMessageField(1, lw)
      }
      ew.writeDoubleField(2, e.value)
      ew.writeVarintField(3, e.timestampMs)
      w.writeMessageField(3, ew)
    }
    // native histograms ride TimeSeries field 4 (prompb) — the
    // SAMPLES read-response leg for native series; the decode side
    // (readTimeSeries) already consumes them
    ts.histograms.foreach(h => w.writeBytesField(4, NativeHistogram.encode(h)))
    w
  }

  /** ReadRequest{queries: [Query{start, end, matchers, hints}]} — the
    * client side of the read endpoint, for building requests that
    * [[decodeReadRequest]] / the serving loop consume. */
  def encodeReadRequest(queries: Seq[ReadQuery]): Array[Byte] = {
    val w = new ProtoWire.Writer
    queries.foreach { q =>
      val qw = new ProtoWire.Writer
      qw.writeVarintField(1, q.startMs)
      qw.writeVarintField(2, q.endMs)
      q.matchers.foreach { m =>
        val mw = new ProtoWire.Writer
        val t = m.mtype match {
          case MatcherType.Eq => 0; case MatcherType.Neq => 1
          case MatcherType.Re => 2; case MatcherType.Nre => 3
        }
        mw.writeVarintField(1, t.toLong)
        mw.writeStringField(2, m.name)
        mw.writeStringField(3, m.value)
        qw.writeMessageField(3, mw)
      }
      if (q.stepMs > 0 || q.rangeMs > 0) {
        val hw = new ProtoWire.Writer
        hw.writeVarintField(1, q.stepMs)
        hw.writeVarintField(7, q.rangeMs)
        qw.writeMessageField(4, hw)
      }
      w.writeMessageField(1, qw)
    }
    Snappy.compress(w.toBytes)
  }

  /** ReadResponse{results: [QueryResult{timeseries}]} — the encode
    * side of the read endpoint (codec.go:69-78). One result set. */
  def encodeReadResponse(series: Seq[PromTimeSeries]): Array[Byte] =
    encodeReadResponseResults(Seq(series))

  /** Multi-query form: one QueryResult per request query, in request
    * order (read.go:16-20 appends one QueryResult per q). */
  def encodeReadResponseResults(results: Seq[Seq[PromTimeSeries]]): Array[Byte] = {
    val w = new ProtoWire.Writer
    results.foreach { series =>
      val qr = new ProtoWire.Writer
      series.foreach(ts => qr.writeMessageField(1, writeTimeSeries(ts)))
      w.writeMessageField(1, qr)
    }
    Snappy.compress(w.toBytes)
  }

  // ---- STREAMED_XOR_CHUNKS (remote-read response type 1) ----------

  /** One encoded chunk: wire-ms bounds + chunk data. `ctype` is
    * prompb Chunk.Encoding — XOR=1 (Gorilla float chunks),
    * HISTOGRAM=2, FLOAT_HISTOGRAM=3 (native-histogram chunks, see
    * graft.serve.HistChunks for the body layout). */
  final case class PromChunk(minTimeMs: Long, maxTimeMs: Long,
                             data: Array[Byte], ctype: Int = 1)
  final case class PromChunkedSeries(labels: Seq[PromLabel],
                                     chunks: Seq[PromChunk])

  /** ReadRequest.accepted_response_types (field 2, repeated enum:
    * 0 = SAMPLES, 1 = STREAMED_XOR_CHUNKS) — packed and unpacked
    * encodings both accepted, like any proto3 parser. Absent list
    * means SAMPLES only (the protocol default). */
  def decodeAcceptedResponseTypes(snappyBody: Array[Byte]): Seq[Int] = {
    val r = ProtoWire.reader(Snappy.uncompress(snappyBody))
    val types = Seq.newBuilder[Int]
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      if (field == 2 && wire == 0) types += r.readVarint().toInt
      else if (field == 2 && wire == 2) {
        val m = r.readMessage()
        while (m.hasMore) types += m.readVarint().toInt
      } else r.skip(wire)
    }
    types.result()
  }

  /** The request side: ReadRequest with accepted_response_types —
    * what a streaming-capable client (Prometheus itself) sends. */
  def encodeReadRequestWithTypes(queries: Seq[ReadQuery],
                                 acceptedTypes: Seq[Int]): Array[Byte] = {
    val plain = Snappy.uncompress(encodeReadRequest(queries))
    val w = new ProtoWire.Writer
    // re-emit the queries, then the packed accepted types
    val r = ProtoWire.reader(plain)
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      if (field == 1 && wire == 2) w.writeBytesField(1, r.readBytes())
      else r.skip(wire)
    }
    if (acceptedTypes.nonEmpty) {
      val tw = new ProtoWire.Writer
      acceptedTypes.foreach(t => tw.writeVarint(t.toLong))
      w.writeMessageField(2, tw)
    }
    Snappy.compress(w.toBytes)
  }

  /** One ChunkedReadResponse message (NOT snappy-compressed — the
    * streamed protocol frames raw messages). */
  def encodeChunkedReadResponse(series: Seq[PromChunkedSeries],
                                queryIndex: Long): Array[Byte] = {
    val w = new ProtoWire.Writer
    series.foreach { s =>
      val sw = new ProtoWire.Writer
      s.labels.foreach { l =>
        val lw = new ProtoWire.Writer
        lw.writeStringField(1, l.name)
        lw.writeStringField(2, l.value)
        sw.writeMessageField(1, lw)
      }
      s.chunks.foreach { c =>
        val cw = new ProtoWire.Writer
        cw.writeVarintField(1, c.minTimeMs)
        cw.writeVarintField(2, c.maxTimeMs)
        cw.writeVarintField(3, c.ctype.toLong) // Chunk.Encoding
        cw.writeBytesField(4, c.data)
        sw.writeMessageField(2, cw)
      }
      w.writeMessageField(1, sw)
    }
    if (queryIndex != 0L) w.writeVarintField(2, queryIndex)
    w.toBytes
  }

  /** util/httputil ChunkedWriter frame: uvarint(length) + big-endian
    * CRC32-Castagnoli of the message + the message bytes. */
  def chunkedFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(msg.length + 9)
    var x = msg.length.toLong
    while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7fL) | 0x80L).toInt); x >>>= 7 }
    out.write(x.toInt)
    val crc = new java.util.zip.CRC32C
    crc.update(msg)
    val c = crc.getValue.toInt
    out.write((c >>> 24) & 0xff); out.write((c >>> 16) & 0xff)
    out.write((c >>> 8) & 0xff); out.write(c & 0xff)
    out.write(msg, 0, msg.length)
    out.toByteArray
  }

  /** Decode a concatenation of frames back to
    * (query_index, chunked series) per frame — the client side, and
    * the spec's round-trip leg. CRC mismatches throw. */
  def decodeChunkedFrames(bytes: Array[Byte])
      : Seq[(Long, Seq[PromChunkedSeries])] = {
    val out = Seq.newBuilder[(Long, Seq[PromChunkedSeries])]
    var pos = 0
    while (pos < bytes.length) {
      var shift = 0
      var len = 0L
      var cont = true
      while (cont) {
        if (pos >= bytes.length)
          throw new ProtoWire.WireFormatException("truncated frame length")
        val b = bytes(pos); pos += 1
        len |= (b & 0x7fL) << shift
        cont = (b & 0x80) != 0
        shift += 7
      }
      if (len < 0L || pos + 4 + len > bytes.length)
        throw new ProtoWire.WireFormatException(s"bad frame length $len")
      val stored = ((bytes(pos) & 0xffL) << 24) | ((bytes(pos + 1) & 0xffL) << 16) |
        ((bytes(pos + 2) & 0xffL) << 8) | (bytes(pos + 3) & 0xffL)
      pos += 4
      val msg = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      val crc = new java.util.zip.CRC32C
      crc.update(msg)
      if (crc.getValue != stored)
        throw new ProtoWire.WireFormatException("chunked frame CRC mismatch")
      out += readChunkedReadResponse(msg)
    }
    out.result()
  }

  private def readChunkedReadResponse(msg: Array[Byte])
      : (Long, Seq[PromChunkedSeries]) = {
    val r = ProtoWire.reader(msg)
    var qi = 0L
    val series = Seq.newBuilder[PromChunkedSeries]
    while (r.hasMore) {
      val (f, w0) = r.readTag()
      (f, w0) match {
        case (1, 2) =>
          val sr = r.readMessage()
          val labels = Seq.newBuilder[PromLabel]
          val chunks = Seq.newBuilder[PromChunk]
          while (sr.hasMore) {
            val (sf, sw) = sr.readTag()
            (sf, sw) match {
              case (1, 2) => labels += readLabel(sr.readMessage())
              case (2, 2) =>
                val cr = sr.readMessage()
                var mn = 0L; var mx = 0L; var tpe = 0L
                var data = Array.empty[Byte]
                while (cr.hasMore) {
                  val (cf, cw) = cr.readTag()
                  (cf, cw) match {
                    case (1, 0) => mn = cr.readVarint()
                    case (2, 0) => mx = cr.readVarint()
                    case (3, 0) => tpe = cr.readVarint()
                    case (4, 2) => data = cr.readBytes()
                    case _      => cr.skip(cw)
                  }
                }
                // the three spec'd encodings decode; anything else
                // is skipped field-safe, like the ingest codecs'
                // counted drops
                if (tpe >= 1L && tpe <= 3L)
                  chunks += PromChunk(mn, mx, data, tpe.toInt)
              case _ => sr.skip(sw)
            }
          }
          series += PromChunkedSeries(labels.result(), chunks.result())
        case (2, 0) => qi = r.readVarint()
        case _      => r.skip(w0)
      }
    }
    (qi, series.result())
  }

  def decodeReadResponse(snappyBody: Array[Byte]): Seq[PromTimeSeries] =
    decodeReadResponsePerQuery(snappyBody).flatten

  /** Per-query decode: one series list per QueryResult, in response
    * order — the shape a multi-query client consumes (each request
    * query must be answered by its own QueryResult, read.go:16-20). */
  def decodeReadResponsePerQuery(snappyBody: Array[Byte]): Seq[Seq[PromTimeSeries]] = {
    val r = ProtoWire.reader(Snappy.uncompress(snappyBody))
    val results = Seq.newBuilder[Seq[PromTimeSeries]]
    while (r.hasMore) {
      val (field, wire) = r.readTag()
      if (field == 1 && wire == 2) {
        val qr = r.readMessage()
        val series = Seq.newBuilder[PromTimeSeries]
        while (qr.hasMore) {
          val (qf, qw) = qr.readTag()
          if (qf == 1 && qw == 2) series += readTimeSeries(qr.readMessage())
          else qr.skip(qw)
        }
        results += series.result()
      } else r.skip(wire)
    }
    results.result()
  }
}
