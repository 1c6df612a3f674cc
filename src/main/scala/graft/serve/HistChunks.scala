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
  * Body layout: prometheus/tsdb/chunkenc's histogram chunk format,
  * re-derived bit-for-bit from the public source layout the same way
  * Gorilla XOR was (chunkenc/histogram.go, float_histogram.go,
  * varbit.go) so a real Prometheus federating graft's native series
  * as chunks decodes the sample bodies natively:
  *
  *  - bytes 0-1: big-endian uint16 sample count
  *  - byte 2:    counter-reset header in the top two bits
  *               (0b10=CounterReset, 0b01=NotCounterReset,
  *                0b11=GaugeType, 0b00=Unknown), rest unused
  *  - bytes 3+:  one bitstream (MSB-first, like the XOR chunk's):
  *      layout: zeroThreshold (1-or-9-byte scheme below), schema
  *              (varbit int), positive spans, negative spans (each:
  *              varbit-uint count, then per span varbit-uint length +
  *              varbit-int offset); schema 127 (custom bounds) is
  *              followed by a custom-values section (varbit-uint
  *              count, then per bound flag bit + payload — see
  *              putCustomBound)
  *      sample 1:  ts varbit-int raw; count+zeroCount varbit-uint
  *                 (HISTOGRAM) or raw 64-bit floats (FLOAT_HISTOGRAM);
  *                 sum raw 64 bits; buckets (positive then negative)
  *                 varbit-int (HISTOGRAM, the intra-sample delta form
  *                 prompb also uses) or raw 64-bit floats
  *      sample 2+: ts/count/zeroCount as delta-of-delta varbit-int
  *                 (first delta rides as dod against an implicit 0);
  *                 sum (and float-form count/zeroCount/buckets) as
  *                 Gorilla XOR against the previous sample, one
  *                 leading/trailing window per field; integer-form
  *                 buckets as varbit-int dod per bucket index
  *
  * The varbit int/uint bit bucketing is chunkenc's 9-branch scheme:
  * control prefixes 0, 10, 110, ..., 11111110, 11111111 select 0,
  * 3, 6, 9, 12, 18, 25, 56, 64 value bits (signed values use the
  * asymmetric −(2^(n−1)−1)..2^(n−1) window with the same
  * strictly-greater sign-wrap rule the XOR chunk's dod uses). The
  * zero threshold stores as one byte: 0 for 0, exp+243 for a power
  * of two 2^-243..2^10 (as 0.5·2^exp), else 255 + raw 64 bits.
  *
  * Chunk split points mirror chunkenc's appendable() discipline: at
  * most [[MaxSamplesPerChunk]] samples (chunkenc targets 120); a
  * FORM change (integer ↔ float buckets) always cuts — the two are
  * distinct encodings on the wire; a LAYOUT change (schema, zero
  * threshold, or spans) cuts because the layout is written once per
  * chunk (Prometheus sometimes widens spans in place by recoding the
  * chunk — cutting instead trades a few more chunks for the same
  * decoded content, and chunk boundaries are not part of the
  * protocol contract); a COUNTER RESET (total count dropping) cuts
  * and stamps the new chunk's header CounterReset, exactly the
  * signal chunkenc's header exists to carry.
  *
  * DOCUMENTED DEVIATION (format-valid, content-lossless for every
  * standard-schema histogram): the encoder always
  * opens a fresh leading/trailing window on the first XOR write of a
  * field (the 0xff sentinel), where Go's float-histogram bucket
  * states may reuse differently — window choice changes bits, never
  * decoded values, the same latitude every Gorilla implementation
  * has.
  *
  * GOLDEN-FIXTURE STATUS (environment-constrained): the layout is
  * re-derived from the public chunkenc source and verified by
  * self-round-trip + differential fuzzing (HistChunksSpec,
  * CodecFuzzSpec), NOT yet against chunk bytes a real Prometheus
  * produced — this build environment has no network egress, so
  * upstream fixtures cannot be fetched or generated. The moment
  * egress allows, pin real tsdb/chunkenc bytes (XOR, HISTOGRAM,
  * FLOAT_HISTOGRAM, NHCB) as test fixtures; until then the
  * deviation note above bounds the known bit-level latitude. */
object HistChunks {

  /** prompb Chunk.Encoding values (public types.proto). */
  val TypeHistogram = 2
  val TypeFloatHistogram = 3

  /** chunkenc's target samples per chunk. */
  val MaxSamplesPerChunk = 120

  /** chunkenc CounterResetHeader values (top 2 bits of byte 2). */
  val UnknownCounterReset = 0x00
  val CounterReset = 0x80
  val NotCounterReset = 0x40
  val GaugeType = 0xc0
  val CounterResetHeaderMask = 0xc0

  // ---- varbit (chunkenc/varbit.go's 9-branch bucketing) ----

  /** Signed n-bit window: −(2^(n−1)−1) ≤ x ≤ 2^(n−1). */
  private def bitRangeInt(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  private[graft] def putVarbitInt(w: Gorilla.BitWriter, v: Long): Unit =
    if (v == 0L) w.writeBit(0)
    else if (bitRangeInt(v, 3)) { w.writeBits(0x2L, 2); w.writeBits(v, 3) }
    else if (bitRangeInt(v, 6)) { w.writeBits(0x6L, 3); w.writeBits(v, 6) }
    else if (bitRangeInt(v, 9)) { w.writeBits(0xeL, 4); w.writeBits(v, 9) }
    else if (bitRangeInt(v, 12)) { w.writeBits(0x1eL, 5); w.writeBits(v, 12) }
    else if (bitRangeInt(v, 18)) { w.writeBits(0x3eL, 6); w.writeBits(v, 18) }
    else if (bitRangeInt(v, 25)) { w.writeBits(0x7eL, 7); w.writeBits(v, 25) }
    else if (bitRangeInt(v, 56)) { w.writeBits(0xfeL, 8); w.writeBits(v, 56) }
    else { w.writeBits(0xffL, 8); w.writeBits(v, 64) }

  /** Unsigned flavor — same control prefixes, full 2^n−1 windows. */
  private[graft] def putVarbitUint(w: Gorilla.BitWriter, v: Long): Unit =
    if (v == 0L) w.writeBit(0)
    else if (v > 0L && v <= 0x7L) { w.writeBits(0x2L, 2); w.writeBits(v, 3) }
    else if (v > 0L && v <= 0x3fL) { w.writeBits(0x6L, 3); w.writeBits(v, 6) }
    else if (v > 0L && v <= 0x1ffL) { w.writeBits(0xeL, 4); w.writeBits(v, 9) }
    else if (v > 0L && v <= 0xfffL) { w.writeBits(0x1eL, 5); w.writeBits(v, 12) }
    else if (v > 0L && v <= 0x3ffffL) { w.writeBits(0x3eL, 6); w.writeBits(v, 18) }
    else if (v > 0L && v <= 0x1ffffffL) { w.writeBits(0x7eL, 7); w.writeBits(v, 25) }
    else if (v > 0L && v <= 0xffffffffffffffL) { w.writeBits(0xfeL, 8); w.writeBits(v, 56) }
    else { w.writeBits(0xffL, 8); w.writeBits(v, 64) }

  /** Control prefix: count the leading 1-bits, ≤8; every prefix
    * shorter than 8 ones ends with (and consumes) a 0 bit. */
  private def readControl(r: Gorilla.BitReader): Int = {
    var ones = 0
    while (ones < 8 && r.readBit() == 1) ones += 1
    ones
  }

  private val SizeByControl = Array(0, 3, 6, 9, 12, 18, 25, 56, 64)

  private[graft] def readVarbitInt(r: Gorilla.BitReader): Long = {
    val sz = SizeByControl(readControl(r))
    if (sz == 0) 0L
    else if (sz == 64) r.readBits(64)
    else {
      val bits = r.readBits(sz)
      // strictly greater than 2^(n−1) wraps negative (Go's rule)
      if (bits > (1L << (sz - 1))) bits - (1L << sz) else bits
    }
  }

  private[graft] def readVarbitUint(r: Gorilla.BitReader): Long = {
    val sz = SizeByControl(readControl(r))
    if (sz == 0) 0L else r.readBits(sz)
  }

  // ---- zero threshold (chunkenc's putZeroThreshold) ----

  private[graft] def putZeroThreshold(w: Gorilla.BitWriter, th: Double): Unit =
    if (th == 0.0d) w.writeByte(0)
    else {
      val bits = java.lang.Double.doubleToRawLongBits(th)
      // a positive NORMAL power of two has an empty mantissa field;
      // as 0.5·2^exp its exp is getExponent+1
      val powerOfTwo = th > 0.0d && !th.isInfinite &&
        (bits & 0x000fffffffffffffL) == 0L && (bits & 0x7ff0000000000000L) != 0L
      val exp = Math.getExponent(th) + 1
      if (powerOfTwo && exp >= -242 && exp <= 11) w.writeByte(exp + 243)
      else { w.writeByte(255); w.writeBits(bits, 64) }
    }

  private[graft] def readZeroThreshold(r: Gorilla.BitReader): Double = {
    val b = r.readBits(8).toInt
    if (b == 0) 0.0d
    else if (b == 255) java.lang.Double.longBitsToDouble(r.readBits(64))
    else Math.scalb(0.5d, b - 243)
  }

  // ---- spans (putHistogramChunkLayoutSpans: count, then per span
  //      length (uint) and offset (int)) ----

  private def putSpans(w: Gorilla.BitWriter, spans: Seq[(Int, Int)]): Unit = {
    putVarbitUint(w, spans.length.toLong)
    spans.foreach { case (off, len) =>
      putVarbitUint(w, len.toLong)
      putVarbitInt(w, off.toLong)
    }
  }

  private def readSpans(r: Gorilla.BitReader): Seq[(Int, Int)] = {
    val n = readVarbitUint(r).toInt
    (0 until n).map { _ =>
      val len = readVarbitUint(r).toInt
      val off = readVarbitInt(r).toInt
      (off, len)
    }
  }

  private def countSpans(spans: Seq[(Int, Int)]): Int =
    spans.iterator.map(_._2).sum

  /** histogram.CustomBucketsSchema — the layout carries a
    * custom-values section for it: a varbit-uint count, then each
    * bound as one flag bit + payload (chunkenc's putCustomBound,
    * re-derived like the rest of the layout): flag 0 when 2·bound is
    * a whole non-negative number small enough for varbit-uint (the
    * classic-bucket .5 idiom), flag 1 + raw 64 float bits
    * otherwise. */
  private val CustomBucketsSchema = 127

  private def putCustomBound(w: Gorilla.BitWriter, f: Double): Unit = {
    val tf = f * 2
    if (tf >= 0 && tf <= 33554432.0d && math.floor(tf) == tf) {
      w.writeBit(0); putVarbitUint(w, tf.toLong)
    } else {
      w.writeBit(1); w.writeBits(rawBits(f), 64)
    }
  }

  private def readCustomBound(r: Gorilla.BitReader): Double =
    if (r.readBit() == 0) readVarbitUint(r).toDouble / 2.0d
    else java.lang.Double.longBitsToDouble(r.readBits(64))

  // ---- per-field Gorilla XOR state (chunkenc xorWrite/xorRead) ----

  private final class XorState {
    var bits: Long = 0L
    var leading: Int = 0xff // sentinel: no window yet
    var trailing: Int = 0
  }

  private def xorWrite(w: Gorilla.BitWriter, vBits: Long, st: XorState): Unit = {
    val xor = vBits ^ st.bits
    st.bits = vBits
    if (xor == 0L) { w.writeBit(0); return }
    w.writeBit(1)
    var nl = java.lang.Long.numberOfLeadingZeros(xor)
    val nt = java.lang.Long.numberOfTrailingZeros(xor)
    if (nl >= 32) nl = 31
    if (st.leading != 0xff && nl >= st.leading && nt >= st.trailing) {
      w.writeBit(0)
      w.writeBits(xor >>> st.trailing, 64 - st.leading - st.trailing)
    } else {
      st.leading = nl; st.trailing = nt
      w.writeBit(1)
      w.writeBits(nl.toLong, 5)
      val sig = 64 - nl - nt
      w.writeBits(sig.toLong & 0x3fL, 6) // 64 encodes as 0
      w.writeBits(xor >>> nt, sig)
    }
  }

  private def xorRead(r: Gorilla.BitReader, st: XorState): Long = {
    if (r.readBit() == 1) {
      if (r.readBit() == 1) {
        st.leading = r.readBits(5).toInt
        val m0 = r.readBits(6).toInt
        val m = if (m0 == 0) 64 else m0
        st.trailing = 64 - st.leading - m
      }
      val m = 64 - st.leading - st.trailing
      st.bits ^= r.readBits(m) << st.trailing
    }
    st.bits
  }

  private def rawBits(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)

  // ---- encode ----

  /** The layout a chunk is cut on: written once per chunk, so a
    * sample whose own layout differs starts a new chunk. Gauge-ness
    * (reset_hint GAUGE) is part of it — gauge samples live in
    * GaugeType-headed chunks, never mixed with counter samples. */
  private def layoutOf(h: NativeHistogram.Hist) =
    (h.schema, h.zeroThreshold, h.posSpans, h.negSpans, h.floatForm,
      h.resetHint == 3, h.customValues)

  private def bucketValues(h: NativeHistogram.Hist, pos: Boolean): Int =
    if (h.floatForm) (if (pos) h.posCounts else h.negCounts).length
    else (if (pos) h.posDeltas else h.negDeltas).length

  /** Per-bucket ABSOLUTE counts (integer deltas fold, floats are
    * already absolute) — what reset detection compares. */
  private def absVals(deltas: Seq[Long], counts: Seq[Double]): Seq[Double] =
    if (counts.nonEmpty) counts
    else deltas.scanLeft(0L)(_ + _).drop(1).map(_.toDouble)

  /** chunkenc's appendable() reset verdict for two SAME-LAYOUT
    * counter samples: the total count, the zero count, or ANY
    * individual bucket dropping means the counter reset — a restart
    * can lose bucket mass while the total still rises, and a
    * consumer trusting the chunk header would otherwise compute
    * negative bucket rates across it. */
  private def counterReset(prev: NativeHistogram.Hist,
                           h: NativeHistogram.Hist): Boolean =
    h.count < prev.count || h.zeroCount < prev.zeroCount ||
      absVals(h.posDeltas, h.posCounts)
        .zip(absVals(prev.posDeltas, prev.posCounts))
        .exists { case (cur, p) => cur < p } ||
      absVals(h.negDeltas, h.negCounts)
        .zip(absVals(prev.negDeltas, prev.negCounts))
        .exists { case (cur, p) => cur < p }

  /** Ordered (by time) histogram samples of ONE series → chunks.
    * Splits on the 120-sample bound, integer↔float form changes,
    * layout changes (gauge-ness included), and counter resets —
    * an explicit reset_hint=YES always cuts; an observed count drop
    * cuts UNLESS the samples are gauge histograms (gauge values go
    * up and down freely, exactly why the hint exists); gauge chunks
    * carry the GaugeType header whatever caused the cut. Min/max
    * times are wire milliseconds like the XOR chunks'. */
  def encodeChunks(hists: Seq[NativeHistogram.Hist]): Seq[PromChunk] = {
    if (hists.isEmpty) return Nil
    val out = Seq.newBuilder[PromChunk]
    var run = Vector.empty[NativeHistogram.Hist]
    var header = UnknownCounterReset // the first chunk's
    def flush(nextHeader: Int): Unit = if (run.nonEmpty) {
      out += encodeRun(run, header)
      run = Vector.empty
      header = nextHeader
    }
    hists.foreach { h =>
      val consistent =
        bucketValues(h, pos = true) == countSpans(h.posSpans) &&
        bucketValues(h, pos = false) == countSpans(h.negSpans)
      // a malformed wire histogram (span lengths disagreeing with
      // the bucket count) must never fail a READ: ingest already
      // skips such rows from the sibling (toHistRows), and a legacy
      // stored row is skipped here too rather than poisoning the
      // series' chunked federation forever
      if (consistent) {
        if (run.nonEmpty) {
          val prev = run.last
          val gauge = h.resetHint == 3 && prev.resetHint == 3
          val sameLayout = layoutOf(h) == layoutOf(run.head)
          if (h.resetHint == 1) flush(CounterReset)
          else if (sameLayout && !gauge && counterReset(prev, h))
            flush(CounterReset)
          else if (!sameLayout)
            // a shrinking counter across a layout change is a reset
            // too; other layout changes leave the verdict unknown
            flush(if (!gauge && h.count < prev.count) CounterReset
                  else UnknownCounterReset)
          else if (run.length >= MaxSamplesPerChunk) flush(NotCounterReset)
        }
        run :+= h
      }
    }
    flush(UnknownCounterReset)
    out.result()
  }

  /** One run (uniform layout and form) → one chunk. */
  private def encodeRun(run: Vector[NativeHistogram.Hist],
                        header: Int): PromChunk = {
    val head = run.head
    val w = new Gorilla.BitWriter
    w.writeBits(run.length.toLong, 16) // sample count
    // gauge chunks carry the GaugeType header regardless of what
    // cut them (chunkenc's rule — gauge-ness is the chunk's type)
    w.writeByte(
      (if (head.resetHint == 3) GaugeType else header) & CounterResetHeaderMask)
    putZeroThreshold(w, head.zeroThreshold)
    putVarbitInt(w, head.schema.toLong)
    putSpans(w, head.posSpans)
    putSpans(w, head.negSpans)
    if (head.schema == CustomBucketsSchema) {
      putVarbitUint(w, head.customValues.length.toLong)
      head.customValues.foreach(putCustomBound(w, _))
    }
    if (head.floatForm) encodeFloatSamples(w, run)
    else encodeIntSamples(w, run)
    PromChunk(head.timestampMs, run.last.timestampMs, w.toBytes,
      if (head.floatForm) TypeFloatHistogram else TypeHistogram)
  }

  private def encodeIntSamples(w: Gorilla.BitWriter,
                               run: Vector[NativeHistogram.Hist]): Unit = {
    val nPos = run.head.posDeltas.length
    val nNeg = run.head.negDeltas.length
    val pPrev = new Array[Long](nPos); val pDelta = new Array[Long](nPos)
    val nPrev = new Array[Long](nNeg); val nDelta = new Array[Long](nNeg)
    val sumSt = new XorState
    var prevT = 0L; var tDelta = 0L
    var prevCnt = 0L; var cntDelta = 0L
    var prevZ = 0L; var zDelta = 0L
    var i = 0
    while (i < run.length) {
      val h = run(i)
      val cnt = h.count.toLong
      val z = h.zeroCount.toLong
      if (i == 0) {
        putVarbitInt(w, h.timestampMs)
        putVarbitUint(w, cnt)
        putVarbitUint(w, z)
        w.writeBits(rawBits(h.sum), 64)
        sumSt.bits = rawBits(h.sum)
        var j = 0
        while (j < nPos) { putVarbitInt(w, h.posDeltas(j)); pPrev(j) = h.posDeltas(j); j += 1 }
        j = 0
        while (j < nNeg) { putVarbitInt(w, h.negDeltas(j)); nPrev(j) = h.negDeltas(j); j += 1 }
      } else {
        // chunkenc writes the 2ND sample's time delta as varbit UINT
        // (timestamps never regress — the same asymmetry xor.go's
        // plain-uvarint 2nd delta has); later samples are signed dods.
        // The signed and unsigned bucketings differ for values in
        // (2^(n−1), 2^n−1], so using int here would mis-size e.g. a
        // 3000 ms scrape delta against a real chunkenc decoder.
        val td = h.timestampMs - prevT
        if (i == 1) putVarbitUint(w, td)
        else putVarbitInt(w, td - tDelta)
        tDelta = td
        val cd = cnt - prevCnt
        putVarbitInt(w, cd - cntDelta); cntDelta = cd
        val zd = z - prevZ
        putVarbitInt(w, zd - zDelta); zDelta = zd
        xorWrite(w, rawBits(h.sum), sumSt)
        var j = 0
        while (j < nPos) {
          val d = h.posDeltas(j) - pPrev(j)
          putVarbitInt(w, d - pDelta(j))
          pDelta(j) = d; pPrev(j) = h.posDeltas(j); j += 1
        }
        j = 0
        while (j < nNeg) {
          val d = h.negDeltas(j) - nPrev(j)
          putVarbitInt(w, d - nDelta(j))
          nDelta(j) = d; nPrev(j) = h.negDeltas(j); j += 1
        }
      }
      prevT = h.timestampMs; prevCnt = cnt; prevZ = z
      i += 1
    }
  }

  private def encodeFloatSamples(w: Gorilla.BitWriter,
                                 run: Vector[NativeHistogram.Hist]): Unit = {
    val nPos = run.head.posCounts.length
    val nNeg = run.head.negCounts.length
    val pSt = Array.fill(nPos)(new XorState)
    val nSt = Array.fill(nNeg)(new XorState)
    val cntSt = new XorState; val zSt = new XorState; val sumSt = new XorState
    var prevT = 0L; var tDelta = 0L
    var i = 0
    while (i < run.length) {
      val h = run(i)
      if (i == 0) {
        putVarbitInt(w, h.timestampMs)
        w.writeBits(rawBits(h.count), 64); cntSt.bits = rawBits(h.count)
        w.writeBits(rawBits(h.zeroCount), 64); zSt.bits = rawBits(h.zeroCount)
        w.writeBits(rawBits(h.sum), 64); sumSt.bits = rawBits(h.sum)
        var j = 0
        while (j < nPos) { w.writeBits(rawBits(h.posCounts(j)), 64); pSt(j).bits = rawBits(h.posCounts(j)); j += 1 }
        j = 0
        while (j < nNeg) { w.writeBits(rawBits(h.negCounts(j)), 64); nSt(j).bits = rawBits(h.negCounts(j)); j += 1 }
      } else {
        // 2nd sample's time delta is varbit UINT, later ones signed
        // dods — chunkenc's float_histogram.go layout (see the
        // integer form's note)
        val td = h.timestampMs - prevT
        if (i == 1) putVarbitUint(w, td)
        else putVarbitInt(w, td - tDelta)
        tDelta = td
        xorWrite(w, rawBits(h.count), cntSt)
        xorWrite(w, rawBits(h.zeroCount), zSt)
        xorWrite(w, rawBits(h.sum), sumSt)
        var j = 0
        while (j < nPos) { xorWrite(w, rawBits(h.posCounts(j)), pSt(j)); j += 1 }
        j = 0
        while (j < nNeg) { xorWrite(w, rawBits(h.negCounts(j)), nSt(j)); j += 1 }
      }
      prevT = h.timestampMs
      i += 1
    }
  }

  // ---- decode ----

  /** The counter-reset header of an encoded chunk body. */
  def counterResetHeader(data: Array[Byte]): Int = {
    if (data.length < 3)
      throw new ProtoWire.WireFormatException("histogram chunk too short")
    data(2) & CounterResetHeaderMask
  }

  /** Decode one HISTOGRAM / FLOAT_HISTOGRAM chunk body back to its
    * samples — the client leg and the round-trip spec's. `ctype`
    * picks the bucket encoding (the two forms share the envelope
    * and layout but differ per sample). Per-sample reset hints
    * reconstruct from the chunk header, chunkenc's iterator rule:
    * a GaugeType chunk yields GAUGE on every sample; otherwise the
    * FIRST sample carries the header's verdict (CounterReset→YES,
    * NotCounterReset→NO, Unknown→UNKNOWN) and every later sample is
    * NO — non-reset by chunk construction. The original per-sample
    * hints live in the sibling store's prompb bytes (the SAMPLES
    * federation leg), not in the chunk body — same lossiness as
    * chunkenc's. */
  def decodeChunk(data: Array[Byte], ctype: Int): Seq[NativeHistogram.Hist] = {
    if (data.length < 3)
      throw new ProtoWire.WireFormatException("histogram chunk too short")
    val n = ((data(0) & 0xff) << 8) | (data(1) & 0xff)
    if (n == 0) return Nil
    val header = data(2) & CounterResetHeaderMask
    def hintFor(i: Int): Int =
      if (header == GaugeType) 3
      else if (i > 0) 2
      else if (header == CounterReset) 1
      else if (header == NotCounterReset) 2
      else 0
    val r = new Gorilla.BitReader(data)
    r.readBits(24) // sample count + header byte
    val zeroTh = readZeroThreshold(r)
    val schema = readVarbitInt(r).toInt
    val posSpans = readSpans(r)
    val negSpans = readSpans(r)
    val customValues =
      if (schema != CustomBucketsSchema) Seq.empty[Double]
      else Seq.fill(readVarbitUint(r).toInt)(readCustomBound(r))
    val floatForm = ctype match {
      case TypeHistogram      => false
      case TypeFloatHistogram => true
      case other => throw new ProtoWire.WireFormatException(
        s"not a histogram chunk encoding: $other")
    }
    val nPos = countSpans(posSpans)
    val nNeg = countSpans(negSpans)
    val out = Seq.newBuilder[NativeHistogram.Hist]
    if (!floatForm) {
      val pPrev = new Array[Long](nPos); val pDelta = new Array[Long](nPos)
      val nPrev = new Array[Long](nNeg); val nDelta = new Array[Long](nNeg)
      val sumSt = new XorState
      var t = 0L; var tDelta = 0L
      var cnt = 0L; var cntDelta = 0L
      var z = 0L; var zDelta = 0L
      var sum = 0.0d
      var i = 0
      while (i < n) {
        if (i == 0) {
          t = readVarbitInt(r)
          cnt = readVarbitUint(r)
          z = readVarbitUint(r)
          sumSt.bits = r.readBits(64)
          sum = java.lang.Double.longBitsToDouble(sumSt.bits)
          var j = 0
          while (j < nPos) { pPrev(j) = readVarbitInt(r); j += 1 }
          j = 0
          while (j < nNeg) { nPrev(j) = readVarbitInt(r); j += 1 }
        } else {
          // 2nd sample: unsigned time delta; later samples: signed dod
          if (i == 1) tDelta = readVarbitUint(r)
          else tDelta += readVarbitInt(r)
          t += tDelta
          cntDelta += readVarbitInt(r); cnt += cntDelta
          zDelta += readVarbitInt(r); z += zDelta
          sum = java.lang.Double.longBitsToDouble(xorRead(r, sumSt))
          var j = 0
          while (j < nPos) { pDelta(j) += readVarbitInt(r); pPrev(j) += pDelta(j); j += 1 }
          j = 0
          while (j < nNeg) { nDelta(j) += readVarbitInt(r); nPrev(j) += nDelta(j); j += 1 }
        }
        out += NativeHistogram.Hist(t, cnt.toDouble, sum, schema, zeroTh,
          z.toDouble, posSpans, pPrev.toSeq, Nil, negSpans, nPrev.toSeq, Nil,
          resetHint = hintFor(i), customValues = customValues)
        i += 1
      }
    } else {
      val pSt = Array.fill(nPos)(new XorState)
      val nSt = Array.fill(nNeg)(new XorState)
      val cntSt = new XorState; val zSt = new XorState; val sumSt = new XorState
      var t = 0L; var tDelta = 0L
      var i = 0
      while (i < n) {
        if (i == 0) {
          t = readVarbitInt(r)
          cntSt.bits = r.readBits(64)
          zSt.bits = r.readBits(64)
          sumSt.bits = r.readBits(64)
          var j = 0
          while (j < nPos) { pSt(j).bits = r.readBits(64); j += 1 }
          j = 0
          while (j < nNeg) { nSt(j).bits = r.readBits(64); j += 1 }
        } else {
          if (i == 1) tDelta = readVarbitUint(r)
          else tDelta += readVarbitInt(r)
          t += tDelta
          xorRead(r, cntSt); xorRead(r, zSt); xorRead(r, sumSt)
          var j = 0
          while (j < nPos) { xorRead(r, pSt(j)); j += 1 }
          j = 0
          while (j < nNeg) { xorRead(r, nSt(j)); j += 1 }
        }
        def d(b: Long) = java.lang.Double.longBitsToDouble(b)
        out += NativeHistogram.Hist(t, d(cntSt.bits), d(sumSt.bits), schema,
          zeroTh, d(zSt.bits), posSpans, Nil, pSt.map(s => d(s.bits)).toSeq,
          negSpans, Nil, nSt.map(s => d(s.bits)).toSeq, floatForm = true,
          resetHint = hintFor(i), customValues = customValues)
        i += 1
      }
    }
    out.result()
  }
}
