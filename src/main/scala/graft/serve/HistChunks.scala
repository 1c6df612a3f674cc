package graft.serve

import graft.ingest.{NativeHistogram, ProtoWire}
import graft.ingest.PromRemoteCodec.PromChunk

/** Native-histogram chunks for the streamed remote read — the
  * Gorilla XOR codec's sibling. Prometheus streams native-histogram
  * series as Chunk.Encoding HISTOGRAM (2, integer buckets) /
  * FLOAT_HISTOGRAM (3, float buckets) frames next to the XOR float
  * chunks (prompb/types.proto Chunk enum; reference surface:
  * remote-read via main.go:126-155).
  *
  * Body layout: tsdb/chunkenc's universal envelope — a big-endian
  * uint16 sample count — followed by the samples as uvarint
  * length-prefixed prompb `Histogram` messages (each sample's
  * timestamp rides INSIDE its message, field 15, so the chunk needs
  * no separate time track). DOCUMENTED DEVIATION: Prometheus's own
  * chunkenc packs the samples as a varbit delta stream instead;
  * that bit layout cannot be validated here (no reference bytes in
  * a zero-egress build), so graft keeps the samples in the public
  * prompb wire form — the spans/deltas inside are already
  * zigzag-varint compressed, the content is identical, and the
  * chunk TYPE and framing match the protocol, which is what
  * negotiation and graft-to-graft federation key on.
  *
  * Chunk split points mirror chunkenc's behavior: at most
  * [[MaxSamplesPerChunk]] samples (chunkenc targets 120), and a
  * FORM change (integer ↔ float buckets) always starts a new chunk
  * — the two forms are distinct encodings on the wire, exactly why
  * Prometheus cuts a chunk there too. */
object HistChunks {

  /** prompb Chunk.Encoding values (public types.proto). */
  val TypeHistogram = 2
  val TypeFloatHistogram = 3

  /** chunkenc's target samples per chunk. */
  val MaxSamplesPerChunk = 120

  /** Ordered (by time) histogram samples of ONE series → chunks.
    * Splits on the 120-sample bound and on integer↔float form
    * changes; min/max times are wire milliseconds like the XOR
    * chunks'. */
  def encodeChunks(hists: Seq[NativeHistogram.Hist]): Seq[PromChunk] = {
    if (hists.isEmpty) return Nil
    val out = Seq.newBuilder[PromChunk]
    var run = Vector.empty[NativeHistogram.Hist]
    def flush(): Unit = if (run.nonEmpty) {
      val w = new ProtoWire.Writer
      run.foreach { h =>
        val bytes = NativeHistogram.encode(h)
        w.writeVarint(bytes.length.toLong)
        w.writeRaw(bytes)
      }
      val body = w.toBytes
      val data = new Array[Byte](2 + body.length)
      data(0) = ((run.length >> 8) & 0xff).toByte
      data(1) = (run.length & 0xff).toByte
      System.arraycopy(body, 0, data, 2, body.length)
      out += PromChunk(run.head.timestampMs, run.last.timestampMs, data,
        if (run.head.floatForm) TypeFloatHistogram else TypeHistogram)
      run = Vector.empty
    }
    hists.foreach { h =>
      if (run.nonEmpty &&
          (run.length >= MaxSamplesPerChunk ||
           run.head.floatForm != h.floatForm)) flush()
      run :+= h
    }
    flush()
    out.result()
  }

  /** Decode one HISTOGRAM / FLOAT_HISTOGRAM chunk body back to its
    * samples — the client leg and the round-trip spec's. */
  def decodeChunk(data: Array[Byte]): Seq[NativeHistogram.Hist] = {
    if (data.length < 2)
      throw new ProtoWire.WireFormatException("histogram chunk too short")
    val n = ((data(0) & 0xff) << 8) | (data(1) & 0xff)
    val r = new ProtoWire.Reader(data, 2, data.length)
    val out = Seq.newBuilder[NativeHistogram.Hist]
    var i = 0
    while (i < n) {
      out += NativeHistogram.decode(r.readMessage())
      i += 1
    }
    out.result()
  }
}
