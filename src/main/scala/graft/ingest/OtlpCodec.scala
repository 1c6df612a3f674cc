package graft.ingest

import graft.ingest.PromRemoteCodec.IngestedSample

/** OTLP metrics ingest — the OpenTelemetry protobuf wire format
  * Prometheus 3.x accepts on /api/v1/otlp/v1/metrics (public
  * opentelemetry-proto field numbers; no OTel SDK involved, the same
  * hand-rolled [[ProtoWire]] reader the prompb codec uses).
  *
  * Message shapes (only what the samples store can hold — Gauge and
  * Sum number points; histograms/summaries are skipped field-safe):
  *   ExportMetricsServiceRequest {1: resource_metrics*}
  *   ResourceMetrics  {1: resource, 2: scope_metrics*}
  *   Resource         {1: attributes* (KeyValue)}
  *   ScopeMetrics     {2: metrics*}
  *   Metric           {1: name, 5: gauge, 7: sum}
  *   Gauge/Sum        {1: data_points* (NumberDataPoint)}
  *   NumberDataPoint  {2: start fixed64 ns, 3: time fixed64 ns,
  *                     4: as_double, 6: as_int sfixed64,
  *                     7: attributes*}
  *   KeyValue         {1: key, 2: AnyValue}
  *   AnyValue         {1: string | 2: bool | 3: int | 4: double}
  *
  * Label mapping follows the documented Prometheus OTLP receiver
  * convention: resource attribute `service.name` → `job`,
  * `service.instance.id` → `instance` (other resource attributes
  * belong to target_info, which a samples store has no series for —
  * dropped, documented); data-point attributes map to labels
  * directly with scalar AnyValues rendered to strings (int/bool/
  * double via the same decimal text both engines print). Timestamps
  * truncate ns → µs, the store's resolution. */
object OtlpCodec {

  /** application/x-protobuf body → flat ingested samples. */
  def decodeExportMetrics(body: Array[Byte]): Seq[IngestedSample] = {
    val out = Seq.newBuilder[IngestedSample]
    val r = ProtoWire.reader(body)
    while (r.hasMore) {
      val (f, w) = r.readTag()
      if (f == 1 && w == 2) readResourceMetrics(r.readMessage(), out)
      else r.skip(w)
    }
    out.result()
  }

  private def readResourceMetrics(r: ProtoWire.Reader,
      out: scala.collection.mutable.Builder[IngestedSample, Seq[IngestedSample]]): Unit = {
    var resourceLabels = List.empty[String]
    val scopes = Seq.newBuilder[ProtoWire.Reader]
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => resourceLabels = readResource(r.readMessage())
        case (2, 2) => scopes += r.readMessage()
        case _      => r.skip(w)
      }
    }
    // proto fields arrive in any order: scopes buffer until the
    // resource (with its job/instance mapping) is known
    scopes.result().foreach(readScopeMetrics(_, resourceLabels, out))
  }

  private def readResource(r: ProtoWire.Reader): List[String] = {
    val ls = List.newBuilder[String]
    while (r.hasMore) {
      val (f, w) = r.readTag()
      if (f == 1 && w == 2) {
        val (k, v) = readKeyValue(r.readMessage())
        k match {
          case "service.name"        => ls += s"job=$v"
          case "service.instance.id" => ls += s"instance=$v"
          case _                     => // target_info territory — dropped
        }
      } else r.skip(w)
    }
    ls.result()
  }

  private def readScopeMetrics(r: ProtoWire.Reader, resource: List[String],
      out: scala.collection.mutable.Builder[IngestedSample, Seq[IngestedSample]]): Unit =
    while (r.hasMore) {
      val (f, w) = r.readTag()
      if (f == 2 && w == 2) readMetric(r.readMessage(), resource, out)
      else r.skip(w)
    }

  private def readMetric(r: ProtoWire.Reader, resource: List[String],
      out: scala.collection.mutable.Builder[IngestedSample, Seq[IngestedSample]]): Unit = {
    var name = ""
    val pointMsgs = Seq.newBuilder[ProtoWire.Reader]
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => name = r.readString()
        case (5, 2) | (7, 2) => // gauge | sum
          val g = r.readMessage()
          while (g.hasMore) {
            val (gf, gw) = g.readTag()
            if (gf == 1 && gw == 2) pointMsgs += g.readMessage()
            else g.skip(gw)
          }
        case _ => r.skip(w) // histogram/summary/metadata — not samples
      }
    }
    if (name.isEmpty)
      throw new ProtoWire.WireFormatException("OTLP metric without a name")
    pointMsgs.result().foreach { p =>
      readNumberPoint(p, name, resource).foreach(out += _)
    }
  }

  private def readNumberPoint(r: ProtoWire.Reader, metric: String,
                              resource: List[String]): Option[IngestedSample] = {
    var tNano = 0L
    var value = 0.0d
    var hasValue = false
    val attrs = List.newBuilder[String]
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (3, 1) => tNano = r.readFixed64()
        case (4, 1) => value = r.readDouble(); hasValue = true
        case (6, 1) => value = r.readFixed64().toDouble; hasValue = true
        case (7, 2) =>
          val (k, v) = readKeyValue(r.readMessage()); attrs += s"$k=$v"
        case _ => r.skip(w)
      }
    }
    // a point with no value (e.g. NO_RECORDED_VALUE flag senders
    // leave the oneof empty) carries no sample
    if (!hasValue) None
    else Some(IngestedSample(tNano / 1000L, metric,
      (attrs.result() ++ resource).sorted, value))
  }

  private def readKeyValue(r: ProtoWire.Reader): (String, String) = {
    var k = ""
    var v = ""
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => k = r.readString()
        case (2, 2) =>
          val a = r.readMessage()
          while (a.hasMore) {
            val (af, aw) = a.readTag()
            (af, aw) match {
              case (1, 2) => v = a.readString()
              case (2, 0) => v = if (a.readVarint() != 0L) "true" else "false"
              case (3, 0) => v = a.readVarint().toString
              case (4, 1) => v = a.readDouble().toString
              case _      => a.skip(aw)
            }
          }
        case _ => r.skip(w)
      }
    }
    (k, v)
  }

  // ---- encode (the client leg, for round-trip tests) ---------------

  /** Samples → one ExportMetricsServiceRequest: one Gauge metric per
    * metric name, labels as data-point attributes (the resource left
    * empty — senders that map job/instance do it per resource). */
  def encodeExportMetrics(samples: Seq[IngestedSample]): Array[Byte] = {
    val w = new ProtoWire.Writer
    val rm = new ProtoWire.Writer
    val sm = new ProtoWire.Writer
    samples.groupBy(_.metric).toSeq.sortBy(_._1).foreach { case (name, ss) =>
      val m = new ProtoWire.Writer
      m.writeStringField(1, name)
      val g = new ProtoWire.Writer
      ss.foreach { s =>
        val p = new ProtoWire.Writer
        p.writeFixed64Field(3, s.ts_us * 1000L)
        p.writeDoubleField(4, s.value)
        s.labels.foreach { l =>
          val i = l.indexOf('=')
          val kv = new ProtoWire.Writer
          kv.writeStringField(1, if (i < 0) l else l.take(i))
          val av = new ProtoWire.Writer
          av.writeStringField(1, if (i < 0) "" else l.drop(i + 1))
          kv.writeMessageField(2, av)
          p.writeMessageField(7, kv)
        }
        g.writeMessageField(1, p)
      }
      m.writeMessageField(5, g) // gauge
      sm.writeMessageField(2, m)
    }
    rm.writeMessageField(2, sm)
    w.writeMessageField(1, rm)
    w.toBytes
  }
}
