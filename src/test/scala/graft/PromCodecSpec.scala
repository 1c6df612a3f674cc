package graft

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

  test("distributed blob decode equals source samples at ms precision") {
    val s = Tables.samples(spark, Sf)
    val decoded = Ingest.decodeWriteRequestBlobs(Ingest.toWriteRequestBlobs(s))
    assert(decoded.count() == s.count())
    import org.apache.spark.sql.functions._
    val a = decoded.select(col("metric"), expr("ts_us DIV 1000").as("t"), col("value"))
    val b = s.select(col("metric"), expr("ts_us DIV 1000").as("t"), col("value"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
