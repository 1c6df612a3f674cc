package graft

import graft.serve.Gorilla
import graft.ingest.PromRemoteCodec
import graft.ingest.PromRemoteCodec.{PromChunk, PromChunkedSeries, PromLabel}

/** Gorilla XOR chunk codec: bit-exact round-trips across the
  * encoding's whole case space, chunk splitting, and the streamed
  * ChunkedReadResponse frame envelope. */
class GorillaSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def roundTrip(ts: Array[Long], vs: Array[Double]): Unit = {
    val enc = Gorilla.encode(ts, vs)
    val (t2, v2) = Gorilla.decode(enc)
    assert(t2.toSeq === ts.toSeq)
    // compare RAW BITS so NaN payloads and -0.0 count
    assert(v2.map(java.lang.Double.doubleToRawLongBits).toSeq ===
      vs.map(java.lang.Double.doubleToRawLongBits).toSeq)
  }

  test("round-trips a typical scrape series (regular steps, drifting values)") {
    val ts = Array.tabulate(500)(i => 1704412800000L + i * 15000L)
    val rnd = new scala.util.Random(1)
    var v = 100.0
    val vs = Array.fill(500) { v += rnd.nextGaussian(); v }
    roundTrip(ts, vs)
  }

  test("round-trips irregular timestamps spanning every dod bracket") {
    // deltas engineered to hit dod==0, 14-, 17-, 20- and 64-bit cases
    val deltas = Seq(15000L, 15000L, 15000L, 14999L, 23000L, 90000L,
      600000L, 600000L, 1L, 100000000L, 3L, 3L)
    val ts = deltas.scanLeft(1704412800000L)(_ + _).toArray
    val vs = Array.tabulate(ts.length)(i => i * 0.1)
    roundTrip(ts, vs)
  }

  test("round-trips constants, zeros, specials, and NaN payloads") {
    val ts = Array.tabulate(12)(i => 1000L + i * 1000L)
    roundTrip(ts, Array.fill(12)(42.0)) // all-repeat values (xor == 0)
    roundTrip(ts, Array(0.0, -0.0, 0.0, -0.0, 1.0, -1.0,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN,
      java.lang.Double.longBitsToDouble(0x7ff8000000000abcL), // NaN payload
      Double.MinPositiveValue, Double.MaxValue))
  }

  test("round-trips the degenerate sizes: empty, one, two samples") {
    roundTrip(Array.empty[Long], Array.empty[Double])
    roundTrip(Array(1704412800000L), Array(3.5))
    roundTrip(Array(1704412800000L, 1704412815000L), Array(3.5, -7.25))
    // negative first timestamp exercises the zigzag varint
    roundTrip(Array(-5000L, 1000L), Array(1.0, 2.0))
  }

  test("random fuzz: 200 series with adversarial deltas and value patterns") {
    val rnd = new scala.util.Random(20260815)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(300)
      var t = rnd.nextLong() % 1000000000000L
      val ts = new Array[Long](n)
      val vs = new Array[Double](n)
      for (i <- 0 until n) {
        t += (rnd.nextInt(4) match {
          case 0 => 15000L
          case 1 => 1L + rnd.nextInt(100)
          case 2 => rnd.nextInt(1 << 20).toLong
          case _ => math.abs(rnd.nextLong() % (1L << 40)) + 1L
        })
        ts(i) = t
        vs(i) = rnd.nextInt(4) match {
          case 0 => if (i > 0) vs(i - 1) else 0.0 // repeats
          case 1 => rnd.nextInt(100).toDouble     // round numbers
          case 2 => rnd.nextDouble() * 1e9
          case _ => java.lang.Double.longBitsToDouble(rnd.nextLong())
        }
      }
      roundTrip(ts, vs)
    }
  }

  test("chunk splitting at 120 samples reassembles losslessly") {
    val ts = Array.tabulate(500)(i => 1704412800000L + i * 15000L)
    val vs = Array.tabulate(500)(i => math.sin(i * 0.01) * 100)
    val chunks = Gorilla.encodeChunks(ts, vs)
    assert(chunks.length == 5) // 120*4 + 20
    assert(chunks.map(_._1).toSeq === Seq(0, 120, 240, 360, 480)
      .map(i => ts(i)))
    assert(chunks.last._2 == ts.last)
    val (t2, v2) = chunks.map(c => Gorilla.decode(c._3))
      .reduce((a, b) => (a._1 ++ b._1, a._2 ++ b._2))
    assert(t2.toSeq === ts.toSeq)
    assert(v2.toSeq === vs.toSeq)
  }

  test("XOR compresses a typical series well below raw 16 bytes/sample") {
    val ts = Array.tabulate(1000)(i => 1704412800000L + i * 15000L)
    val rnd = new scala.util.Random(3)
    val vs = Array.fill(1000)(20.0 + rnd.nextInt(5)) // few distinct values
    val bytes = Gorilla.encode(ts, vs).length
    assert(bytes < 1000 * 4,
      s"regular series must encode < 4 B/sample, got $bytes for 1000")
  }

  test("ChunkedReadResponse frames round-trip labels, chunks, query index") {
    val ts = Array.tabulate(10)(i => 1000L + i * 1000L)
    val vs = Array.tabulate(10)(_ * 1.5)
    val chunks = Gorilla.encodeChunks(ts, vs)
      .map { case (mn, mx, d) => PromChunk(mn, mx, d) }
    val series = PromChunkedSeries(
      Seq(PromLabel("__name__", "click"), PromLabel("user", "7")), chunks)
    val f1 = PromRemoteCodec.chunkedFrame(
      PromRemoteCodec.encodeChunkedReadResponse(Seq(series), 0L))
    val f2 = PromRemoteCodec.chunkedFrame(
      PromRemoteCodec.encodeChunkedReadResponse(Seq(series), 3L))
    val got = PromRemoteCodec.decodeChunkedFrames(f1 ++ f2)
    assert(got.map(_._1) === Seq(0L, 3L))
    val s0 = got.head._2.head
    assert(s0.labels === series.labels)
    val (dt, dv) = s0.chunks.map(c => Gorilla.decode(c.data))
      .reduce((a, b) => (a._1 ++ b._1, a._2 ++ b._2))
    assert(dt.toSeq === ts.toSeq && dv.toSeq === vs.toSeq)
  }

  test("a corrupted frame fails the CRC, a truncated one fails the length") {
    val msg = PromRemoteCodec.encodeChunkedReadResponse(Seq(
      PromChunkedSeries(Seq(PromLabel("__name__", "m")), Nil)), 0L)
    val frame = PromRemoteCodec.chunkedFrame(msg)
    val bad = frame.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    intercept[graft.ingest.ProtoWire.WireFormatException] {
      PromRemoteCodec.decodeChunkedFrames(bad)
    }
    intercept[graft.ingest.ProtoWire.WireFormatException] {
      PromRemoteCodec.decodeChunkedFrames(frame.dropRight(2))
    }
  }

  test("accepted_response_types parses packed and unpacked, absent means samples") {
    import graft.operators.{ReadQuery, LabelMatcher, MatcherType}
    val q = Seq(ReadQuery(0L, 1000L,
      Seq(LabelMatcher(MatcherType.Eq, "__name__", "click")), 0L, 0L))
    val plain = PromRemoteCodec.encodeReadRequest(q)
    assert(PromRemoteCodec.decodeAcceptedResponseTypes(plain) === Seq())
    val withTypes = PromRemoteCodec.encodeReadRequestWithTypes(q, Seq(0, 1))
    assert(PromRemoteCodec.decodeAcceptedResponseTypes(withTypes) === Seq(0, 1))
    // the queries survive the re-encode
    assert(PromRemoteCodec.decodeReadRequest(withTypes) === q)
  }
}
