package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.ingest.PromRemoteCodec._
import graft.ingest.{Ingest, ProtoWire}
import graft.operators.MatcherType
import graft.sources.Tables

class PromCodecSpec extends SparkSpecBase {

  private val series = PromTimeSeries(
    Seq(PromLabel("__name__", "http_requests_total"),
        PromLabel("job", "api"), PromLabel("instance", "a:9100")),
    Seq(PromSample(1.5, 1704067200000L), PromSample(-2.25, 1704067260000L)))

  test("WriteRequest round-trips through snappy+proto wire format") {
    val blob = encodeWriteRequest(PromWriteRequest(Seq(series)))
    val back = decodeWriteRequest(blob)
    assert(back == PromWriteRequest(Seq(series)))
  }

  test("remote-write 2.0: symbol-table round-trip, unpacked refs, malformed refs") {
    // round trip: interning is lossless
    val req = PromWriteRequest(Seq(series,
      PromTimeSeries(Seq(PromLabel("__name__", "http_requests_total"),
        PromLabel("job", "api")), Seq(PromSample(7.0, 1704067320000L)))))
    val blob = encodeWriteRequestV2(req)
    assert(decodeWriteRequestV2(blob) == req)
    // the v2 client leg carries the WHOLE series: exemplars (their
    // labels through the symbol table) and native histograms
    // round-trip too — a federation encode that dropped them would
    // silently lose data
    val rich = PromWriteRequest(Seq(series.copy(
      histograms = Seq(graft.ingest.NativeHistogram.Hist(
        1704067200000L, 6.0, 4.5, 0, 0.001, 1.0,
        Seq((0, 2)), Seq(2L, 1L), Nil, Nil, Nil, Nil)),
      exemplars = Seq(PromExemplar(
        Seq(PromLabel("trace_id", "abc")), 1.25, 1704067200500L)))))
    assert(decodeWriteRequestV2(encodeWriteRequestV2(rich)) === rich)
    // the shared strings intern ONCE: v2's wire body is smaller
    // (pre-snappy — compression would blur the comparison)
    assert(org.xerial.snappy.Snappy.uncompress(blob).length <
      org.xerial.snappy.Snappy.uncompress(encodeWriteRequest(req)).length)
    // negotiation dispatch: v1 default, v2 by proto=, unknown → Left
    assert(decodeNegotiated(None, encodeWriteRequest(req)) == Right(req))
    assert(decodeNegotiated(
      Some(s"application/x-protobuf;proto=$ProtoV2"), blob) == Right(req))
    assert(decodeNegotiated(
      Some("application/x-protobuf; proto=prometheus.WriteRequest"),
      encodeWriteRequest(req)) == Right(req))
    assert(decodeNegotiated(
      Some("application/x-protobuf;proto=io.prometheus.write.v3.Request"),
      blob) == Left("io.prometheus.write.v3.Request"))
    // UNPACKED labels_refs are legal proto3 wire too
    val w = new ProtoWire.Writer
    Seq("", "n", "v").foreach(s => w.writeStringField(4, s))
    val tw = new ProtoWire.Writer
    tw.writeVarintField(1, 1L) // name ref, unpacked
    tw.writeVarintField(1, 2L) // value ref, unpacked
    val sw = new ProtoWire.Writer
    sw.writeDoubleField(1, 3.5); sw.writeVarintField(2, 1000L)
    tw.writeMessageField(2, sw)
    w.writeMessageField(5, tw)
    val unpacked = decodeWriteRequestV2(
      org.xerial.snappy.Snappy.compress(w.toBytes))
    assert(unpacked == PromWriteRequest(Seq(PromTimeSeries(
      Seq(PromLabel("n", "v")), Seq(PromSample(3.5, 1000L))))))
    // malformed: out-of-range ref and odd ref count both throw clean
    val bad = new ProtoWire.Writer
    bad.writeStringField(4, "")
    val bt = new ProtoWire.Writer
    bt.writeVarintField(1, 9L)
    bt.writeVarintField(1, 9L)
    bad.writeMessageField(5, bt)
    intercept[ProtoWire.WireFormatException](
      decodeWriteRequestV2(org.xerial.snappy.Snappy.compress(bad.toBytes)))
    val odd = new ProtoWire.Writer
    odd.writeStringField(4, "")
    val ot = new ProtoWire.Writer
    ot.writeVarintField(1, 0L)
    odd.writeMessageField(5, ot)
    intercept[ProtoWire.WireFormatException](
      decodeWriteRequestV2(org.xerial.snappy.Snappy.compress(odd.toBytes)))
    // a symbol table not starting with "" is malformed per the spec
    val ns = new ProtoWire.Writer
    ns.writeStringField(4, "oops")
    intercept[ProtoWire.WireFormatException](
      decodeWriteRequestV2(org.xerial.snappy.Snappy.compress(ns.toBytes)))
  }

  test("remote-write 2.0: per-series metadata decodes through the symbol table") {
    // round trip: type enum + help/unit refs intern into the SAME
    // symbol table as the labels
    val md = PromMetadata(1, "Total HTTP requests.", "seconds")
    val req = PromWriteRequest(Seq(
      series.copy(metadata = Some(md)),
      PromTimeSeries(Seq(PromLabel("__name__", "up")),
        Seq(PromSample(1.0, 1704067200000L)),
        metadata = Some(PromMetadata(2, "", "")))))
    val back = decodeWriteRequestV2(encodeWriteRequestV2(req))
    assert(back == req)
    assert(back.timeseries.head.metadata.get.typeName === "counter")
    assert(back.timeseries(1).metadata.get.typeName === "gauge")
    // hand-written wire: Metadata {1: type, 3: help_ref, 4: unit_ref}
    // inside TimeSeries field 5, any field order
    val w = new ProtoWire.Writer
    Seq("", "__name__", "m", "Help text.", "bytes")
      .foreach(s => w.writeStringField(4, s))
    val tw = new ProtoWire.Writer
    val pw = new ProtoWire.Writer
    pw.writeVarint(1L); pw.writeVarint(2L)
    tw.writeBytesField(1, pw.toBytes)
    val mw = new ProtoWire.Writer
    mw.writeVarintField(4, 4L) // unit_ref first — order-free
    mw.writeVarintField(1, 3L) // histogram
    mw.writeVarintField(3, 3L) // help_ref
    tw.writeMessageField(5, mw)
    w.writeMessageField(5, tw)
    val dec = decodeWriteRequestV2(org.xerial.snappy.Snappy.compress(w.toBytes))
    assert(dec.timeseries.head.metadata ===
      Some(PromMetadata(3, "Help text.", "bytes")))
    // out-of-range help/unit refs fail like label refs
    val bad = new ProtoWire.Writer
    bad.writeStringField(4, "")
    val bt = new ProtoWire.Writer
    val bmw = new ProtoWire.Writer
    bmw.writeVarintField(3, 9L)
    bt.writeMessageField(5, bmw)
    bad.writeMessageField(5, bt)
    intercept[ProtoWire.WireFormatException](
      decodeWriteRequestV2(org.xerial.snappy.Snappy.compress(bad.toBytes)))
    // toMetadataRows: the sibling-store encoding, newest-sample stamp
    val rows = toMetadataRows(req).toList
    assert(rows === List(
      IngestedSample(1704067260000000L, "http_requests_total",
        Seq("__help=Total HTTP requests.", "__type=counter",
          "__unit=seconds"), 1.0),
      IngestedSample(1704067200000000L, "up",
        Seq("__help=", "__type=gauge", "__unit="), 1.0)))
    // the unknown enum value renders "unknown", round-trips as 0
    assert(PromMetadata(0, "", "").typeName === "unknown")
    assert(PromMetadata.typeCode("unknown") === 0)
    assert((1 to 7).forall(t =>
      PromMetadata.typeCode(PromMetadata.typeName(t)) == t))
    // PRW 1.0: family-level MetricMetadata (WriteRequest field 3)
    // round-trips through the v1 codec and lands metadata rows
    // stamped with the request's newest sample
    val v1 = PromWriteRequest(Seq(series), familyMetadata = Seq(
      "http_requests_total" -> PromMetadata(1, "Total requests.", ""),
      "up" -> PromMetadata(2, "", "")))
    assert(decodeWriteRequest(encodeWriteRequest(v1)) === v1)
    val v1rows = toMetadataRows(v1).toList
    assert(v1rows === List(
      IngestedSample(1704067260000000L, "http_requests_total",
        Seq("__help=Total requests.", "__type=counter", "__unit="), 1.0),
      IngestedSample(1704067260000000L, "up",
        Seq("__help=", "__type=gauge", "__unit="), 1.0)))
  }

  test("native-histogram chunk codec round-trips both forms and splits correctly") {
    import graft.ingest.NativeHistogram
    import graft.serve.HistChunks
    val intH = NativeHistogram.Hist(1000L, 6.0, 4.5, 0, 0.001, 1.0,
      Seq((0, 2)), Seq(2L, 1L), Nil, Seq((1, 1)), Seq(3L), Nil)
    val fltH = NativeHistogram.Hist(2000L, 6.5, 4.5, -2, 0.001, 0.5,
      Seq((0, 2)), Nil, Seq(2.0, 3.5), Nil, Nil, Nil, floatForm = true)
    // prompb encode is decode's exact inverse, arm preserved
    def rt(h: NativeHistogram.Hist): NativeHistogram.Hist =
      NativeHistogram.decode(graft.ingest.ProtoWire.reader(
        NativeHistogram.encode(h)))
    assert(rt(intH) === intH)
    assert(rt(fltH) === fltH)
    // a mixed series splits at the form change: one HISTOGRAM chunk,
    // one FLOAT_HISTOGRAM chunk, each decoding to its samples
    val chunks = HistChunks.encodeChunks(
      Seq(intH, intH.copy(timestampMs = 1500L), fltH))
    assert(chunks.map(_.ctype) ===
      Seq(HistChunks.TypeHistogram, HistChunks.TypeFloatHistogram))
    assert((chunks(0).minTimeMs, chunks(0).maxTimeMs) === ((1000L, 1500L)))
    // in-chunk samples past the first reconstruct reset_hint=NO from
    // the header (chunkenc's iterator rule)
    assert(HistChunks.decodeChunk(chunks(0).data, chunks(0).ctype) ===
      Seq(intH, intH.copy(timestampMs = 1500L, resetHint = 2)))
    assert(HistChunks.decodeChunk(chunks(1).data, chunks(1).ctype) === Seq(fltH))
    // the 120-sample bound splits long runs like chunkenc; a run cut
    // for size (no reset — identical counts) stamps NotCounterReset
    val many = (0 until 250).map(i => intH.copy(timestampMs = i.toLong))
    val split = HistChunks.encodeChunks(many)
    assert(split.map(c => HistChunks.decodeChunk(c.data, c.ctype).size) ===
      Seq(120, 120, 10))
    assert(split.flatMap(c => HistChunks.decodeChunk(c.data, c.ctype))
      .map(_.copy(resetHint = 0)) === many)
    assert(split.map(c => HistChunks.counterResetHeader(c.data)) ===
      Seq(HistChunks.UnknownCounterReset, HistChunks.NotCounterReset,
        HistChunks.NotCounterReset))
    // chunk types survive the ChunkedReadResponse wire round-trip
    val msg = encodeChunkedReadResponse(Seq(PromChunkedSeries(
      Seq(PromLabel("__name__", "hm")), chunks)), 0L)
    val back = decodeChunkedFrames(chunkedFrame(msg))
    assert(back.head._2.head.chunks.map(_.ctype) === Seq(2, 3))
    assert(back.head._2.head.chunks.zip(chunks).forall { case (a, b) =>
      java.util.Arrays.equals(a.data, b.data)
    })
  }

  test("toSamples applies reference label normalization") {
    val out = toSamples(PromWriteRequest(Seq(series))).toList
    assert(out.map(_.metric).distinct == List("http_requests_total"))
    assert(out.head.labels == Seq("instance=a:9100", "job=api")) // sorted, no __name__
    assert(out.map(_.ts_us) == List(1704067200000000L, 1704067260000000L))
    assert(out.map(_.value) == List(1.5, -2.25))
  }

  test("varint handles negative and large int64") {
    val w = new ProtoWire.Writer
    w.writeVarintField(1, -1L)
    w.writeVarintField(2, Long.MaxValue)
    val r = ProtoWire.reader(w.toBytes)
    assert(r.readTag() == ((1, 0)) && r.readVarint() == -1L)
    assert(r.readTag() == ((2, 0)) && r.readVarint() == Long.MaxValue)
  }

  test("corrupt lengths fail cleanly as WireFormatException") {
    // length-delimited field whose varint length exceeds the buffer
    val w = new ProtoWire.Writer
    w.writeTag(1, 2)
    w.writeVarint(0x7FFFFFFFL) // near Int.MaxValue: overflow-prone check
    intercept[ProtoWire.WireFormatException] {
      val r = ProtoWire.reader(w.toBytes)
      r.readTag(); r.readString()
    }
    // 64-bit length that would silently truncate to a small Int
    val w2 = new ProtoWire.Writer
    w2.writeTag(1, 2)
    w2.writeVarint(0x100000005L) // .toInt == 5
    w2.writeVarint(0) // some trailing bytes
    intercept[ProtoWire.WireFormatException] {
      val r = ProtoWire.reader(w2.toBytes)
      r.readTag(); r.readMessage()
    }
    // skip() takes the same validated path
    intercept[ProtoWire.WireFormatException] {
      val r = ProtoWire.reader(w2.toBytes)
      val (_, wire) = r.readTag(); r.skip(wire)
    }
  }

  test("ReadRequest decodes queries, matchers and hints") {
    // Build a ReadRequest{queries:[Query{start,end,matchers[type,name,value],hints{step,range}}]}
    val m = new ProtoWire.Writer
    m.writeVarintField(1, 2) // RE
    m.writeStringField(2, "__name__")
    m.writeStringField(3, "go_.*")
    val h = new ProtoWire.Writer
    h.writeVarintField(1, 60000) // step_ms
    h.writeVarintField(7, 300000) // range_ms
    val q = new ProtoWire.Writer
    q.writeVarintField(1, 1704067200000L)
    q.writeVarintField(2, 1704153600000L)
    q.writeMessageField(3, m)
    q.writeMessageField(4, h)
    val req = new ProtoWire.Writer
    req.writeMessageField(1, q)
    val qs = decodeReadRequest(org.xerial.snappy.Snappy.compress(req.toBytes))
    assert(qs.size == 1)
    val rq = qs.head
    assert(rq.startMs == 1704067200000L && rq.endMs == 1704153600000L)
    assert(rq.matchers == Seq(graft.operators.LabelMatcher(MatcherType.Re, "__name__", "go_.*")))
    assert(rq.stepMs == 60000L && rq.rangeMs == 300000L)
  }

  test("ReadResponse round-trips") {
    val blob = encodeReadResponse(Seq(series))
    assert(decodeReadResponse(blob) == Seq(series))
  }

  test("encodeReadRequest round-trips through decodeReadRequest") {
    import graft.operators.{Matchers, ReadQuery}
    val qs = Seq(
      ReadQuery(1704067200000L, 1704153600000L,
        Seq(Matchers.re("__name__", "go_.*"), Matchers.neq("job", "api")),
        stepMs = 60000L, rangeMs = 300000L),
      ReadQuery(0L, 1L, Seq(Matchers.eq("user", "3"))))
    assert(decodeReadRequest(encodeReadRequest(qs)) == qs)
  }

  test("oversized read request bodies are rejected before inflating") {
    // 33 MiB of zeros compresses tiny: the compressed-size check alone
    // would admit it, the declared-inflated-length check must not.
    val bomb = org.xerial.snappy.Snappy.compress(new Array[Byte](33 * 1024 * 1024))
    assert(bomb.length < DecodeReadLimit)
    val e = intercept[ProtoWire.WireFormatException](decodeReadRequest(bomb))
    assert(e.getMessage.contains("inflates"))
  }

  test("read serving loop answers a ReadRequest blob and counts requests") {
    import graft.operators.{Matchers, ReadQuery}
    val m = graft.OpsMetrics(spark)
    val (r0, e0) = (m.readRequests.value, m.readErrors.value)
    val req = encodeReadRequest(Seq(
      ReadQuery(0L, 0L, Seq(Matchers.eq("__name__", "view"))),
      ReadQuery(0L, 0L, Seq(Matchers.eq("__name__", "click")))))
    val resp = graft.serve.RemoteRead.serve(Tables.samples(spark, Sf), req)
    val back = decodeReadResponse(resp)
    assert(back.nonEmpty)
    assert(back.forall(_.labels.exists(l => l.name == "__name__" && Set("view", "click")(l.value))))
    // samples inside each series are time-ordered (assemble sorts points)
    assert(back.forall(ts => ts.samples.map(_.timestampMs) == ts.samples.map(_.timestampMs).sorted))
    assert(m.readRequests.value == r0 + 1 && m.readErrors.value == e0)
    // a corrupt request counts an error
    intercept[Throwable](graft.serve.RemoteRead.serve(
      Tables.samples(spark, Sf), Array[Byte](1, 2, 3)))
    assert(m.readErrors.value == e0 + 1)
  }

  test("write decode skips malformed blobs and advances counters") {
    val m = graft.OpsMetrics(spark)
    val (w0, e0, s0) = (m.writeRequests.value, m.writeErrors.value, m.samplesWritten.value)
    val good = encodeWriteRequest(PromWriteRequest(Seq(series)))
    val bad = org.xerial.snappy.Snappy.compress(Array[Byte](0x7f, 0x01, 0x02))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Tuple1(good), Tuple1(bad)), 1)
        .map(t => org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("body",
          org.apache.spark.sql.types.BinaryType))))
    val out = Ingest.decodeWriteRequestBlobs(df)
    assert(out.count() == 2) // two samples from the good blob, none from the bad
    assert(m.writeRequests.value == w0 + 2)
    assert(m.writeErrors.value == e0 + 1)
    assert(m.samplesWritten.value == s0 + 2)
    assert(m.render.contains("# TYPE samples_written_total counter"))
  }

  test("distributed blob decode equals source samples at ms precision") {
    import org.apache.spark.sql.functions._
    val s = Tables.samples(spark, Sf)
    val blobs = Ingest.toWriteRequestBlobs(s)
    // wire shape: many series per request, day-chunked per series —
    // far fewer frames than series, each bounded at 256 series and
    // together carrying every (series, day) chunk exactly once
    val nChunks = s.select(col("metric"), col("labels"),
      expr("ts_us DIV 1000000 DIV 86400")).distinct().count()
    val perBlob = blobs.collect().map(r =>
      decodeWriteRequest(r.getAs[Array[Byte]](0)).timeseries.size)
    assert(perBlob.length < s.select("metric", "labels").distinct().count())
    assert(perBlob.forall(_ <= 256))
    assert(perBlob.map(_.toLong).sum == nChunks)
    val decoded = Ingest.decodeWriteRequestBlobs(blobs)
    assert(decoded.count() == s.count())
    val a = decoded.select(col("metric"), expr("ts_us DIV 1000").as("t"), col("value"))
    val b = s.select(col("metric"), expr("ts_us DIV 1000").as("t"), col("value"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("exposition parser: labels, escapes, bare metrics, clean rejections") {
    import graft.ingest.Exposition.parseLine
    assert(parseLine("""m{a="1",b="x y"} 2.5 1704412800000""") ===
      ((1704412800000000L, "m", Seq("a=1", "b=x y"), 2.5)))
    // labels sort into the store's canonical order
    assert(parseLine("""m{z="1",a="2"} 1 0""")._3 === Seq("a=2", "z=1"))
    // bare metric, negative + exponent values
    assert(parseLine("m -1.5E-3 123") === ((123000L, "m", Seq(), -0.0015)))
    // the three exposition escapes round to real characters
    assert(parseLine("""m{k="a\nb\"c\\d"} 1 0""")._3 === Seq("k=a\nb\"c\\d"))
    // Prometheus 3.x QUOTED syntax: the metric as the braces' first
    // element, UTF-8 label keys quoted in place
    assert(parseLine("""{"my.metric","a.b"="x",host="a"} 1.5 1000""") ===
      ((1000000L, "my.metric", Seq("a.b=x", "host=a"), 1.5)))
    assert(parseLine("""{"m\"x"} 2 0""") === ((0L, "m\"x", Seq(), 2.0)))
    assert(parseLine("""m{"a.b"="x"} 1 0""") === ((0L, "m", Seq("a.b=x"), 1.0)))
    // renderHead is parseLine's inverse on both forms
    import graft.ingest.Exposition.renderHead
    assert(renderHead("m", Seq("a=1")) === """m{a="1"}""")
    assert(renderHead("my.metric", Seq("a.b=x", "host=a")) ===
      """{"my.metric","a.b"="x",host="a"}""")
    assert(renderHead("my.metric", Nil) === """{"my.metric"}""")
    assert(parseLine(renderHead("m\"x", Seq("k=a\nb")) + " 1 0") ===
      ((0L, "m\"x", Seq("k=a\nb"), 1.0)))
    // malformed lines throw the clean ingest failure class —
    // including escapes outside the format's \\ \" \n (a silent
    // \t → 't' would corrupt foreign dumps), and a quoted label key
    // as the braces' first element (a series with no metric name)
    for (bad <- Seq("m", "m 1", """m{k="v" 1 0""", """m{k=v} 1 0""",
                    """m{k="v"} 1 0 extra""", """{a="1"} 1 0""",
                    """m{k="a\tb"} 1 0""", "m{k=\"a\\" + "ub\"} 1 0",
                    """{"a.b"="x"} 1 0""", """{"m" 1 0""",
                    """{""} 1 0"""))
      assertThrows[IllegalArgumentException](parseLine(bad))
  }

  test("exposition export → import round-trips the samples at ms resolution") {
    val s = graft.sources.Tables.samples(spark, Sf)
    val path = "/tmp/graft_test/expo_rt"
    graft.ingest.Exposition.export(s, path)
    val back = graft.ingest.Exposition.importText(spark, path)
    assert(back.count() === s.count())
    val a = back.select(col("metric"), col("labels"),
      expr("ts_us DIV 1000").as("t"), col("value"))
    val b = s.select(col("metric"), col("labels"),
      expr("ts_us DIV 1000").as("t"), col("value"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("OTLP codec: delta sums reject, names normalize, drops count") {
    import graft.ingest.OtlpCodec
    def sumMetric(name: String, temporality: Long): Array[Byte] = {
      val point = new ProtoWire.Writer
      point.writeFixed64Field(3, 1704412800000000000L)
      point.writeDoubleField(4, 7.0)
      val sum = new ProtoWire.Writer
      sum.writeMessageField(1, point)
      sum.writeVarintField(2, temporality)
      sum.writeVarintField(3, 1L)
      val m = new ProtoWire.Writer
      m.writeStringField(1, name)
      m.writeMessageField(7, sum)
      val scope = new ProtoWire.Writer
      scope.writeMessageField(2, m)
      val rm = new ProtoWire.Writer
      rm.writeMessageField(2, scope)
      val req = new ProtoWire.Writer
      req.writeMessageField(1, rm)
      req.toBytes
    }
    // cumulative passes, with the dotted name made selector-reachable
    val ok = OtlpCodec.decodeExportMetricsCounted(sumMetric("rpc.count", 2L))
    assert(ok.samples.map(_.metric) === Seq("rpc_count"))
    assert(ok.droppedPoints === 0L)
    // delta (1) and unspecified (0) both throw the clean wire error
    for (t <- Seq(0L, 1L)) {
      val e = intercept[ProtoWire.WireFormatException](
        OtlpCodec.decodeExportMetrics(sumMetric("d.count", t)))
      assert(e.getMessage.contains("non-cumulative"), e.getMessage)
    }
    // v1 remote-write: TimeSeries histogram fields (4) DECODE — the
    // standard-schema one converts, the non-standard one ledgers
    val w = new ProtoWire.Writer
    val ts = new ProtoWire.Writer
    val lb = new ProtoWire.Writer
    lb.writeStringField(1, "__name__"); lb.writeStringField(2, "h")
    ts.writeMessageField(1, lb)
    val sm = new ProtoWire.Writer
    sm.writeDoubleField(1, 2.0); sm.writeVarintField(2, 1704412800000L)
    ts.writeMessageField(2, sm)
    ts.writeMessageField(4, new ProtoWire.Writer) // schema 0: converts
    val badH = new ProtoWire.Writer
    badH.writeVarintField(4, 253L) // zigzag(-127): unsupported schema
    ts.writeMessageField(4, badH)
    w.writeMessageField(1, ts)
    val req = decodeWriteRequest(org.xerial.snappy.Snappy.compress(w.toBytes))
    assert(req.timeseries.head.samples.map(_.value) === Seq(2.0))
    assert(req.timeseries.head.histograms.size === 1)
    assert(req.skippedHistograms === 1L)
  }

  test("OTLP codec: delta sums convert to monotone cumulative under the flag") {
    import graft.ingest.OtlpCodec
    // one DELTA Sum metric, two series interleaved out of timestamp
    // order: s1 deltas (5, 3, 2), s2 deltas (10, -1)
    def point(tUs: Long, v: Double, attr: (String, String)): ProtoWire.Writer = {
      val p = new ProtoWire.Writer
      p.writeFixed64Field(3, tUs * 1000L)
      p.writeDoubleField(4, v)
      val kv = new ProtoWire.Writer
      kv.writeStringField(1, attr._1)
      val av = new ProtoWire.Writer
      av.writeStringField(1, attr._2)
      kv.writeMessageField(2, av)
      p.writeMessageField(7, kv)
      p
    }
    val sum = new ProtoWire.Writer
    Seq(point(30L, 2.0, "s" -> "1"), point(10L, 5.0, "s" -> "1"),
      point(10L, 10.0, "s" -> "2"), point(20L, 3.0, "s" -> "1"),
      point(20L, -1.0, "s" -> "2"))
      .foreach(sum.writeMessageField(1, _))
    sum.writeVarintField(2, 1L) // AGGREGATION_TEMPORALITY_DELTA
    val m = new ProtoWire.Writer
    m.writeStringField(1, "req_total")
    m.writeMessageField(7, sum)
    val scope = new ProtoWire.Writer
    scope.writeMessageField(2, m)
    val rm = new ProtoWire.Writer
    rm.writeMessageField(2, scope)
    val req = new ProtoWire.Writer
    req.writeMessageField(1, rm)
    // default: reject-by-default unchanged
    intercept[ProtoWire.WireFormatException](
      OtlpCodec.decodeExportMetricsCounted(req.toBytes))
    // flagged: per-series prefix sums in timestamp order — monotone
    // cumulative levels a scrape would have seen
    val out = OtlpCodec.decodeExportMetricsCounted(req.toBytes,
      convertDelta = true)
    assert(out.droppedPoints === 0L)
    val rows = out.samples.map(s => (s.labels, s.ts_us, s.value)).toSet
    assert(rows === Set(
      (Seq("s=1"), 10L, 5.0), (Seq("s=1"), 20L, 8.0), (Seq("s=1"), 30L, 10.0),
      (Seq("s=2"), 10L, 10.0), (Seq("s=2"), 20L, 9.0)))
    // UNSPECIFIED temporality still rejects even under the flag
    val badSum = new ProtoWire.Writer
    badSum.writeMessageField(1, point(10L, 1.0, "s" -> "1"))
    badSum.writeVarintField(2, 0L)
    val bm = new ProtoWire.Writer
    bm.writeStringField(1, "u_total")
    bm.writeMessageField(7, badSum)
    val bscope = new ProtoWire.Writer
    bscope.writeMessageField(2, bm)
    val brm = new ProtoWire.Writer
    brm.writeMessageField(2, bscope)
    val breq = new ProtoWire.Writer
    breq.writeMessageField(1, brm)
    intercept[ProtoWire.WireFormatException](
      OtlpCodec.decodeExportMetricsCounted(breq.toBytes, convertDelta = true))
  }

  test("OTLP codec: delta histograms convert under the flag, both shapes") {
    import graft.ingest.OtlpCodec
    // -- explicit-bounds: raw protobuf for full control over the
    // optional sum field --
    def histPoint(tUs: Long, count: Long, sum: Option[Double],
                  bounds: Seq[Double], counts: Seq[Long]): ProtoWire.Writer = {
      val p = new ProtoWire.Writer
      p.writeFixed64Field(3, tUs * 1000L)
      p.writeFixed64Field(4, count)
      sum.foreach(p.writeDoubleField(5, _))
      counts.foreach(p.writeFixed64Field(6, _))
      bounds.foreach(p.writeDoubleField(7, _))
      p
    }
    def histReq(points: Seq[ProtoWire.Writer],
                temporality: Long): Array[Byte] = {
      val h = new ProtoWire.Writer
      points.foreach(h.writeMessageField(1, _))
      h.writeVarintField(2, temporality)
      val m = new ProtoWire.Writer
      m.writeStringField(1, "lat")
      m.writeMessageField(9, h)
      val scope = new ProtoWire.Writer
      scope.writeMessageField(2, m)
      val rm = new ProtoWire.Writer
      rm.writeMessageField(2, scope)
      val req = new ProtoWire.Writer
      req.writeMessageField(1, rm)
      req.toBytes
    }
    val pts = Seq(
      histPoint(10L, 4L, Some(1.0), Seq(1.0, 5.0), Seq(1L, 2L)),
      histPoint(20L, 8L, Some(2.0), Seq(1.0, 5.0), Seq(3L, 4L)),
      histPoint(30L, 2L, Some(0.5), Seq(1.0, 5.0), Seq(0L, 1L)),
      // bounds change: accumulation RESETS (upstream restarts too)
      histPoint(40L, 6L, Some(9.0), Seq(2.0), Seq(5L)),
      // sum-less delta: cumulative sum unknowable from here on
      histPoint(50L, 1L, None, Seq(2.0), Seq(1L)))
    // default: still rejected without the flag; UNSPECIFIED always
    intercept[ProtoWire.WireFormatException](
      OtlpCodec.decodeExportMetricsCounted(histReq(pts, 1L)))
    intercept[ProtoWire.WireFormatException](
      OtlpCodec.decodeExportMetricsCounted(histReq(pts, 0L),
        convertDelta = true))
    val out = OtlpCodec.decodeExportMetricsCounted(histReq(pts, 1L),
      convertDelta = true)
    assert(out.droppedPoints === 0L)
    val rows = out.samples.map(s => (s.metric, s.labels, s.ts_us, s.value))
    def at(m: String, le: String, t: Long): Double =
      rows.collectFirst {
        case (`m`, ls, `t`, v) if ls.contains(s"le=$le") => v }.get
    // element-wise per-bucket prefix sums → cumulative le levels
    assert(at("lat_bucket", "1", 10L) === 1.0)
    assert(at("lat_bucket", "5", 10L) === 3.0)
    assert(at("lat_bucket", "+Inf", 10L) === 4.0)
    assert(at("lat_bucket", "1", 20L) === 4.0)
    assert(at("lat_bucket", "5", 20L) === 10.0)
    assert(at("lat_bucket", "1", 30L) === 4.0)
    assert(at("lat_bucket", "5", 30L) === 11.0)
    assert(at("lat_bucket", "+Inf", 30L) === 14.0)
    // running _sum/_count while the layout holds
    val sums = rows.filter(r => r._1 == "lat_sum").map(r => (r._3, r._4))
    assert(sums.toSet === Set((10L, 1.0), (20L, 3.0), (30L, 3.5),
      (40L, 9.0)))
    // the reset point starts a fresh run on the new bounds
    assert(at("lat_bucket", "2", 40L) === 5.0)
    assert(at("lat_bucket", "+Inf", 40L) === 6.0)
    // after the sum-less point: counts keep accumulating, sum stops
    assert(at("lat_bucket", "2", 50L) === 6.0)
    assert(at("lat_bucket", "+Inf", 50L) === 7.0)
    assert(!rows.exists(r => r._1 == "lat_sum" && r._3 == 50L))
    val counts = rows.filter(r => r._1 == "lat_count").map(r => (r._3, r._4))
    assert(counts.toSet === Set((10L, 4.0), (20L, 12.0), (30L, 14.0),
      (40L, 6.0), (50L, 7.0)))

    // -- exponential: sparse align+add running sum, sibling carries
    // the cumulative native form --
    def expPoint(tUs: Long, count: Long, sum: Double, scale: Long,
                 offset: Int, bucketCounts: Seq[Long]): ProtoWire.Writer = {
      val p = new ProtoWire.Writer
      p.writeFixed64Field(3, tUs * 1000L)
      p.writeFixed64Field(4, count)
      p.writeDoubleField(5, sum)
      p.writeVarintField(6, (scale << 1) ^ (scale >> 63)) // zigzag
      val b = new ProtoWire.Writer
      val zz = (offset.toLong << 1) ^ (offset.toLong >> 63)
      b.writeVarintField(1, zz)
      bucketCounts.foreach(b.writeVarintField(2, _))
      p.writeMessageField(8, b)
      p
    }
    def expReq(points: Seq[ProtoWire.Writer],
               temporality: Long): Array[Byte] = {
      val h = new ProtoWire.Writer
      points.foreach(h.writeMessageField(1, _))
      h.writeVarintField(2, temporality)
      val m = new ProtoWire.Writer
      m.writeStringField(1, "elat")
      m.writeMessageField(10, h)
      val scope = new ProtoWire.Writer
      scope.writeMessageField(2, m)
      val rm = new ProtoWire.Writer
      rm.writeMessageField(2, scope)
      val req = new ProtoWire.Writer
      req.writeMessageField(1, rm)
      req.toBytes
    }
    val epts = Seq(
      expPoint(10L, 2L, 1.5, 0L, 0, Seq(2L)),
      expPoint(20L, 3L, 2.5, 0L, 0, Seq(3L)))
    intercept[ProtoWire.WireFormatException](
      OtlpCodec.decodeExportMetricsCounted(expReq(epts, 1L)))
    val eout = OtlpCodec.decodeExportMetricsCounted(expReq(epts, 1L),
      convertDelta = true)
    assert(eout.droppedPoints === 0L)
    assert(eout.hists.size === 2)
    val h2 = graft.ingest.NativeHistogram.decode(
      graft.ingest.ProtoWire.reader(eout.hists.last._4))
    assert(h2.count === 5.0)
    assert(h2.sum === 4.0)
    // OTLP offset 0 → prompb index 1; counts accumulated 2 + 3
    val s2 = graft.ingest.NativeHistogram.toSparse(h2)
    assert(s2.pos === Map(1 -> 5.0))

    // MIXED scales across delta points: the align+add arithmetic
    // downscales to the coarser geometry instead of dropping. Scale 1
    // buckets (√2 base) at OTLP offsets 0,1 → prompb indexes 1,2 —
    // both inside scale-0 bucket 1 (they cover (1,√2],(√2,2]) — so
    // the cumulative sample at scale 0 holds index 1 = 2+1+3 = 6.
    val mpts = Seq(
      expPoint(10L, 3L, 2.0, 1L, 0, Seq(2L, 1L)),
      expPoint(20L, 3L, 2.5, 0L, 0, Seq(3L)))
    val mout = OtlpCodec.decodeExportMetricsCounted(expReq(mpts, 1L),
      convertDelta = true)
    assert(mout.droppedPoints === 0L)
    val mh = graft.ingest.NativeHistogram.decode(
      graft.ingest.ProtoWire.reader(mout.hists.last._4))
    assert(mh.schema === 0)
    assert(mh.count === 6.0)
    assert(graft.ingest.NativeHistogram.toSparse(mh).pos === Map(1 -> 6.0))
  }

  test("OTLP delta histogram fuzz: random interleaved series match a reference") {
    import graft.ingest.OtlpCodec
    val rnd = new scala.util.Random(99L)
    case class P(tUs: Long, attr: String, count: Long, sum: Option[Double],
                 bounds: Seq[Double], counts: Seq[Long])
    def encode(points: Seq[P]): Array[Byte] = {
      val h = new ProtoWire.Writer
      points.foreach { p =>
        val w = new ProtoWire.Writer
        w.writeFixed64Field(3, p.tUs * 1000L)
        w.writeFixed64Field(4, p.count)
        p.sum.foreach(w.writeDoubleField(5, _))
        p.counts.foreach(w.writeFixed64Field(6, _))
        p.bounds.foreach(w.writeDoubleField(7, _))
        val kv = new ProtoWire.Writer
        kv.writeStringField(1, "s")
        val av = new ProtoWire.Writer
        av.writeStringField(1, p.attr)
        kv.writeMessageField(2, av)
        w.writeMessageField(9, kv)
        h.writeMessageField(1, w)
      }
      h.writeVarintField(2, 1L) // DELTA
      val m = new ProtoWire.Writer
      m.writeStringField(1, "fz")
      m.writeMessageField(9, h)
      val scope = new ProtoWire.Writer
      scope.writeMessageField(2, m)
      val rm = new ProtoWire.Writer
      rm.writeMessageField(2, scope)
      val req = new ProtoWire.Writer
      req.writeMessageField(1, rm)
      req.toBytes
    }
    val layouts = Seq(Seq(1.0, 5.0), Seq(2.0), Seq(0.5, 1.0, 2.0))
    for (_ <- 0 until 10) {
      val pts = rnd.shuffle(for {
        attr <- Seq("0", "1")
        i <- 0 until (3 + rnd.nextInt(5))
      } yield {
        val bounds = layouts(rnd.nextInt(layouts.length))
        val counts = bounds.map(_ => rnd.nextInt(4).toLong)
        val overflow = rnd.nextInt(3).toLong
        P((i * 10 + 10).toLong, attr, counts.sum + overflow,
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(10) * 0.5),
          bounds, counts)
      })
      val out = OtlpCodec.decodeExportMetricsCounted(encode(pts),
        convertDelta = true)
      assert(out.droppedPoints === 0L)
      val got = out.samples
        .map(s => (s.metric, s.labels.mkString(","), s.ts_us, s.value)).toSet
      // reference: per series in timestamp order, element-wise prefix
      // sums with layout-change resets and sum-dropout
      val want = Set.newBuilder[(String, String, Long, Double)]
      pts.groupBy(_.attr).foreach { case (attr, series) =>
        val ls = s"s=$attr"
        var accCounts: Seq[Long] = Nil
        var accCount = 0L
        var accSum = 0.0d
        var accHasSum = false
        var prev: Seq[Double] = null
        series.sortBy(_.tUs).foreach { p =>
          if (prev == null || p.bounds != prev) {
            accCounts = p.counts; accCount = p.count
            accSum = p.sum.getOrElse(0.0); accHasSum = p.sum.isDefined
          } else {
            accCounts = accCounts.zip(p.counts).map { case (a, b) => a + b }
            accCount += p.count
            accSum += p.sum.getOrElse(0.0)
            accHasSum &&= p.sum.isDefined
          }
          prev = p.bounds
          var cum = 0L
          // Go-style le text for the finite fuzz bounds (all short
          // decimals)
          def leTxt(v: Double): String =
            if (v == v.toLong.toDouble) v.toLong.toString else v.toString
          p.bounds.zipWithIndex.foreach { case (b, i) =>
            cum += accCounts(i)
            // labels store sorted: "le=…" < "s=…"
            want += (("fz_bucket", s"le=${leTxt(b)},$ls",
              p.tUs, cum.toDouble))
          }
          want += (("fz_bucket", s"le=+Inf,$ls", p.tUs, accCount.toDouble))
          if (accHasSum) want += (("fz_sum", ls, p.tUs, accSum))
          want += (("fz_count", ls, p.tUs, accCount.toDouble))
        }
      }
      assert(got === want.result(),
        s"delta-hist fuzz mismatch on ${pts.size} points")
    }
  }

  test("OTLP codec: summary points convert to quantile series + _sum/_count") {
    import graft.ingest.OtlpCodec
    val t = 1704412800000000L // µs
    val good = OtlpCodec.SummaryPoint("http.req.latency", t, 10L, 15.0,
      Seq(0.5 -> 5.0, 0.99 -> 9.9), attrs = Seq("handler" -> "/x"))
    val out = OtlpCodec.decodeExportMetricsCounted(
      OtlpCodec.encodeExportSummaries(Seq(good), Some("svc")))
    assert(out.droppedPoints === 0L)
    val rows = out.samples.map(s => (s.metric, s.labels, s.value)).toSet
    assert(rows === Set(
      ("http_req_latency",
        Seq("handler=/x", "job=svc", "quantile=0.5"), 5.0),
      ("http_req_latency",
        Seq("handler=/x", "job=svc", "quantile=0.99"), 9.9),
      ("http_req_latency_sum", Seq("handler=/x", "job=svc"), 15.0),
      ("http_req_latency_count", Seq("handler=/x", "job=svc"), 10.0)))
    assert(out.samples.forall(_.ts_us === t))
    // malformed points land on the skip ledger WHOLE — never a
    // partial ingest: NO_RECORDED_VALUE flag, and a quantile outside
    // [0, 1] (NaN included — the spec calls both invalid)
    val flagged = good.copy(flags = 1L)
    val badQ = good.copy(quantiles = Seq(1.5 -> 2.0))
    val nanQ = good.copy(quantiles = Seq(Double.NaN -> 2.0))
    for (bad <- Seq(flagged, badQ, nanQ)) {
      val d = OtlpCodec.decodeExportMetricsCounted(
        OtlpCodec.encodeExportSummaries(Seq(bad, good), Some("svc")))
      assert(d.droppedPoints === 1L, s"$bad must drop counted")
      assert(d.samples.size === 4, "the good sibling point still lands")
    }
    // a point-level attribute literally named "quantile" must not
    // survive next to the synthesized one (unique-label canon): the
    // computed label wins, count_values' overwrite rule
    val clash = good.copy(attrs = Seq("quantile" -> "bogus"))
    val dc = OtlpCodec.decodeExportMetricsCounted(
      OtlpCodec.encodeExportSummaries(Seq(clash), Some("svc")))
    assert(dc.droppedPoints === 0L)
    val qRows = dc.samples.filter(_.metric == "http_req_latency")
    assert(qRows.forall(_.labels.count(_.startsWith("quantile=")) == 1))
    assert(qRows.map(_.labels).toSet ===
      Set(Seq("job=svc", "quantile=0.5"), Seq("job=svc", "quantile=0.99")))
    // _sum/_count keep the user's attribute untouched (no synthesized
    // quantile label there to collide with)
    assert(dc.samples.filter(_.metric == "http_req_latency_sum")
      .head.labels === Seq("job=svc", "quantile=bogus"))
  }

  test("OTLP codec: opt-in unit/type suffixing follows the 3.x translation strategy") {
    import graft.ingest.OtlpCodec
    // the pure rule table first (otlptranslator BuildCompliantMetricName)
    def sfx(n: String, u: String, counter: Boolean = false,
            gauge: Boolean = false): String =
      OtlpCodec.suffixedName(n, u, counter, gauge)
    assert(sfx("http_req_duration", "s") === "http_req_duration_seconds")
    assert(sfx("net_io", "By/s") === "net_io_bytes_per_second")
    assert(sfx("cpu_usage", "1", gauge = true) === "cpu_usage_ratio")
    assert(sfx("requests", "1", counter = true) === "requests_total")
    assert(sfx("disk", "KiBy") === "disk_kibibytes")
    assert(sfx("temp", "Cel") === "temp_celsius")
    // unknown units pass through cleaned; {annotations} carry none
    assert(sfx("x", "widgets") === "x_widgets")
    assert(sfx("x", "{packets}") === "x")
    // no double-suffix when the tokens are already present
    assert(sfx("http_seconds", "s") === "http_seconds")
    assert(sfx("reqs_total", "", counter = true) === "reqs_total")
    assert(sfx("io_bytes_per_second", "By/s") === "io_bytes_per_second")
    // end to end: the SAME wire body lands verbatim names with the
    // flag off and suffixed names (+ suffixed metadata) with it on
    val t = 1704412800000000L
    val body = OtlpCodec.encodeExportSums(
      Seq(graft.ingest.PromRemoteCodec.IngestedSample(
        t, "rpc.duration", Seq("k=v"), 3.0)),
      temporality = 2L, serviceName = Some("svc"),
      description = "RPC time.", unit = "s")
    val off = OtlpCodec.decodeExportMetricsCounted(body)
    assert(off.samples.map(_.metric) === Seq("rpc_duration"))
    val on = OtlpCodec.decodeExportMetricsCounted(body,
      translationSuffixes = true)
    assert(on.samples.map(_.metric) === Seq("rpc_duration_seconds_total"))
    assert(on.metadata.map(m => (m.metric, m.labels)) === Seq(
      ("rpc_duration_seconds_total",
        Seq("__help=RPC time.", "__type=counter", "__unit=s"))))
  }

  test("OTLP codec: non-identifying resource attributes land a target_info series") {
    import graft.ingest.OtlpCodec
    def kv(k: String, v: String): ProtoWire.Writer = {
      val any = new ProtoWire.Writer
      any.writeStringField(1, v)
      val w = new ProtoWire.Writer
      w.writeStringField(1, k)
      w.writeMessageField(2, any)
      w
    }
    def request(attrs: Seq[(String, String)], tsNanos: Seq[Long]): Array[Byte] = {
      val gauge = new ProtoWire.Writer
      tsNanos.foreach { t =>
        val p = new ProtoWire.Writer
        p.writeFixed64Field(3, t)
        p.writeDoubleField(4, 1.5)
        gauge.writeMessageField(1, p)
      }
      val m = new ProtoWire.Writer
      m.writeStringField(1, "cpu")
      m.writeMessageField(5, gauge)
      val scope = new ProtoWire.Writer
      scope.writeMessageField(2, m)
      val res = new ProtoWire.Writer
      attrs.foreach { case (k, v) => res.writeMessageField(1, kv(k, v)) }
      val rm = new ProtoWire.Writer
      rm.writeMessageField(1, res)
      rm.writeMessageField(2, scope)
      val req = new ProtoWire.Writer
      req.writeMessageField(1, rm)
      req.toBytes
    }
    val full = request(Seq("service.name" -> "svc",
      "service.instance.id" -> "i1", "k8s.cluster.name" -> "c1"),
      Seq(1704412800000000000L, 1704412860000000000L))
    val out = OtlpCodec.decodeExportMetrics(full)
    val ti = out.filter(_.metric == "target_info")
    // one info sample per resource, at its LATEST point timestamp,
    // identifying labels + normalized data labels, value 1
    assert(ti.size === 1)
    assert(ti.head.ts_us === 1704412860000000L)
    assert(ti.head.labels === Seq("instance=i1", "job=svc",
      "k8s_cluster_name=c1"))
    assert(ti.head.value === 1.0)
    assert(out.count(_.metric == "cpu") === 2)
    // identifying-only resources land NO target_info (Prometheus
    // receiver convention), and neither do point-less resources
    assert(!OtlpCodec.decodeExportMetrics(request(
      Seq("service.name" -> "svc"), Seq(1L)))
      .exists(_.metric == "target_info"))
    assert(!OtlpCodec.decodeExportMetrics(request(
      Seq("service.name" -> "svc", "k8s.cluster.name" -> "c1"), Nil))
      .exists(_.metric == "target_info"))
  }

  test("exemplars decode on both wire versions, symbol table included") {
    // v1: Exemplar = TimeSeries field 3 with inline labels
    val w = new ProtoWire.Writer
    val ts = new ProtoWire.Writer
    val lb = new ProtoWire.Writer
    lb.writeStringField(1, "__name__"); lb.writeStringField(2, "m")
    ts.writeMessageField(1, lb)
    val exm = new ProtoWire.Writer
    val xl = new ProtoWire.Writer
    xl.writeStringField(1, "trace_id"); xl.writeStringField(2, "abc")
    exm.writeMessageField(1, xl)
    exm.writeDoubleField(2, 7.5)
    exm.writeVarintField(3, 1704412800123L)
    ts.writeMessageField(3, exm)
    w.writeMessageField(1, ts)
    val v1 = decodeWriteRequest(org.xerial.snappy.Snappy.compress(w.toBytes))
    assert(v1.timeseries.head.exemplars ===
      Seq(PromExemplar(Seq(PromLabel("trace_id", "abc")), 7.5, 1704412800123L)))
    assert(v1.exemplarCount === 1L)
    // v2: Exemplar = TimeSeries field 4 with labels_refs into the
    // request's symbol table
    val w2 = new ProtoWire.Writer
    Seq("", "__name__", "m", "trace_id", "xyz").foreach(w2.writeStringField(4, _))
    val t2 = new ProtoWire.Writer
    val pr = new ProtoWire.Writer
    Seq(1L, 2L).foreach(pr.writeVarint)
    t2.writeBytesField(1, pr.toBytes)
    val ex2 = new ProtoWire.Writer
    val xr = new ProtoWire.Writer
    Seq(3L, 4L).foreach(xr.writeVarint)
    ex2.writeBytesField(1, xr.toBytes)
    ex2.writeDoubleField(2, -1.25)
    ex2.writeVarintField(3, 1704412800456L)
    t2.writeMessageField(4, ex2)
    w2.writeMessageField(5, t2)
    val v2 = decodeWriteRequestV2(org.xerial.snappy.Snappy.compress(w2.toBytes))
    assert(v2.timeseries.head.exemplars ===
      Seq(PromExemplar(Seq(PromLabel("trace_id", "xyz")), -1.25, 1704412800456L)))
    // the store-row encoding: exemplar labels as "__x_" entries next
    // to the series labels, µs timestamps
    val rows = toExemplarRows(v1).toSeq
    assert(rows === Seq(IngestedSample(1704412800123000L, "m",
      Seq("__x_trace_id=abc"), 7.5)))
  }

  test("native histogram: decode + classic conversion, golden case") {
    import graft.ingest.NativeHistogram
    // count=10, sum=-3.25, schema=-1 (base 4), zero bucket
    // (threshold 0.01, count 2), positive span offset 1 len 2 with
    // deltas [3, -2] (abs counts [3, 1] over (1,4] and (4,16]),
    // one FLOAT negative bucket idx 0 ([-1,-0.25), count 4.0)
    val h = new ProtoWire.Writer
    h.writeVarintField(1, 10L)
    h.writeDoubleField(3, -3.25)
    h.writeVarintField(4, 1L) // zigzag(-1)
    h.writeDoubleField(5, 0.01)
    h.writeVarintField(6, 2L)
    val nspan = new ProtoWire.Writer
    nspan.writeVarintField(1, 0L); nspan.writeVarintField(2, 1L)
    h.writeMessageField(8, nspan)
    h.writeDoubleField(10, 4.0) // negative_counts, unpacked
    val pspan = new ProtoWire.Writer
    pspan.writeVarintField(1, 2L) // zigzag(1): offset 1
    pspan.writeVarintField(2, 2L)
    h.writeMessageField(11, pspan)
    val deltas = new ProtoWire.Writer
    deltas.writeVarint(6L) // zigzag(3)
    deltas.writeVarint(3L) // zigzag(-2)
    h.writeBytesField(12, deltas.toBytes)
    h.writeVarintField(15, 1704412800000L)
    val hist = NativeHistogram.decode(graft.ingest.ProtoWire.reader(h.toBytes))
    assert(hist.schema === -1 && hist.count === 10.0 && hist.zeroCount === 2.0)
    assert(hist.posSpans === Seq((1, 2)) && hist.posDeltas === Seq(3L, -2L))
    assert(hist.negCounts === Seq(4.0))
    val (buckets, sum, count) = NativeHistogram.toClassic(hist).get
    // ascending le: negative idx0 le=-(4^-1)=-0.25 cum 4; zero bucket
    // le=0.01 cum 6; positive idx1 le=4 cum 9, idx2 le=16 cum 10;
    // +Inf = the count field
    assert(buckets === Seq(("-0.25", 4.0), ("0.01", 6.0), ("4", 9.0),
      ("16", 10.0), ("+Inf", 10.0)), buckets.toString)
    assert(sum === -3.25 && count === 10.0)
    // non-standard schema answers None (the caller's skip ledger)
    assert(NativeHistogram.toClassic(hist.copy(schema = 9)).isEmpty)
    // classic expansion: le labels sorted into place, µs timestamps
    val rows = NativeHistogram.toClassicSamples("lat", Seq("k=v"), hist).get
    assert(rows.count(_.metric == "lat_bucket") === 5)
    assert(rows.exists(r => r.metric == "lat_sum" && r.value == -3.25))
    assert(rows.exists(r => r.metric == "lat_count" && r.value == 10.0))
    assert(rows.forall(_.ts_us === 1704412800000000L))
    assert(rows.filter(_.metric == "lat_bucket")
      .forall(r => r.labels.contains("k=v") && r.labels.exists(_.startsWith("le="))))
    // NaN sum: the _sum row is withheld (NaN would poison the store)
    val nanRows = NativeHistogram.toClassicSamples("lat", Nil,
      hist.copy(sum = Double.NaN)).get
    assert(!nanRows.exists(_.metric == "lat_sum"))
  }

  test("skipping an unknown length-delimited field lands exactly past it") {
    // regression: `pos += readLen()` read pos BEFORE readLen advanced
    // it past the length varint, leaving the cursor short — every
    // field after an unknown message field then misparsed (the bug
    // hid because known decoders consume every field they meet)
    val w = new ProtoWire.Writer
    w.writeBytesField(99, Array[Byte](1, 2, 3, 4, 5)) // unknown field
    val tw = new ProtoWire.Writer
    tw.writeVarint(1L)
    w.writeMessageField(2, tw) // a known field AFTER the unknown one
    val r = ProtoWire.reader(w.toBytes)
    var found = -1L
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      if (f == 2 && wt == 2) found = r.readMessage().readVarint()
      else r.skip(wt)
    }
    assert(found === 1L)
  }
}
