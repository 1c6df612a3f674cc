package graft.ingest

/** Native-histogram ingestion by NATIVE → CLASSIC conversion.
  *
  * Prometheus 3.x senders put native (sparse exponential) histograms
  * on the remote-write wire — prompb `TimeSeries.histograms`
  * (field 4) and the PRW 2.0 twin (field 3; same public Histogram
  * field numbers). The reference's float64 samples schema
  * (README.md:17-28) has no histogram shape, and graft keeps that
  * schema — so instead of dropping the data (silently or countedly),
  * each native histogram sample converts to the CLASSIC series the
  * whole existing query surface already serves:
  *
  *   name_bucket{le="<upper>"}  cumulative count per populated bucket
  *   name_bucket{le="+Inf"}     the histogram's total count
  *   name_sum                   the sum field (skipped when NaN)
  *   name_count                 the total count
  *
  * Bucket geometry (public exponential-histogram spec): with
  * base = 2^(2^-schema), positive bucket index i covers
  * (base^(i-1), base^i] → le = base^i; negative bucket index i
  * covers [-base^i, -base^(i-1)) → le = -base^(i-1); the zero bucket
  * covers [-zero_threshold, zero_threshold] → le = zero_threshold.
  * Only POPULATED buckets emit (the sparse representation's whole
  * point); cumulative counts ascend over (negatives by descending
  * index, zero bucket, positives by ascending index).
  *
  * Documented deviations/limits:
  * - `le` boundary text comes from Java's Double.toString of the
  *   computed bound — the bounds are DATA (labels), never recomputed
  *   at query time, so libm pow here carries no cross-engine hazard.
  * - Standard schemas −4..8 convert; anything else (e.g. the newer
  *   custom-bounds sentinel 127) is counted on the skipped ledger —
  *   observable, never silent.
  * - Classic `le` is inclusive where the native positive bucket's
  *   upper bound is too (exact match); the negative bucket's lower
  *   bound is exclusive in native and inclusive under classic `le`
  *   at −base^(i−1) — a boundary-measure-zero difference.
  * - A float histogram's counts are absolute doubles; an integer
  *   histogram's are zigzag DELTAS (first absolute). Both convert.
  */
object NativeHistogram {

  /** One decoded native histogram sample (prompb.Histogram / PRW 2.0
    * Histogram — same public field numbers). */
  final case class Hist(
      timestampMs: Long,
      count: Double,
      sum: Double,
      schema: Int,
      zeroThreshold: Double,
      zeroCount: Double,
      posSpans: Seq[(Int, Int)],
      posDeltas: Seq[Long],
      posCounts: Seq[Double],
      negSpans: Seq[(Int, Int)],
      negDeltas: Seq[Long],
      negCounts: Seq[Double],
      /** Which prompb arm the sample arrived on (float fields
        * 2/7/10/13 vs integer 1/6/9/12) — [[encode]] re-emits the
        * same arm so a store-and-forward leg is byte-faithful. */
      floatForm: Boolean = false,
      /** prompb Histogram.reset_hint (field 14): 0 UNKNOWN, 1 YES
        * (this sample is a counter reset), 2 NO, 3 GAUGE (not a
        * counter at all — values may go up AND down). Round-tripped
        * through the sibling store so federation keeps the sender's
        * semantics; [[graft.serve.HistChunks]] maps it onto the
        * chunk counter-reset header and the gauge cut rules. */
      resetHint: Int = 0,
      /** prompb Histogram.custom_values (field 16): the sorted upper
        * bucket bounds of a CUSTOM-bounds histogram (NHCB, schema
        * 127 — what Prometheus 3.x converts classic histograms to).
        * Positive bucket index i counts observations in
        * (custom_values[i-1], custom_values[i]] (i = 0 from the
        * bottom); index len(custom_values) is the +Inf overflow.
        * Empty for exponential schemas. */
      customValues: Seq[Double] = Nil)

  /** The NHCB schema sentinel (histogram.CustomBucketsSchema). */
  val CustomBucketsSchema: Int = 127

  /** Whether graft can carry this histogram: standard exponential
    * schemas −4..8, or custom bounds (schema 127) actually CARRYING
    * bounds. Anything else rides the skipped ledger. */
  def convertible(h: Hist): Boolean =
    (h.schema >= -4 && h.schema <= 8) ||
      (h.schema == CustomBucketsSchema && h.customValues.nonEmpty)

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def readSpan(r: ProtoWire.Reader): (Int, Int) = {
    var off = 0; var len = 0
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 0) => off = zigzag(r.readVarint()).toInt
        case (2, 0) => len = r.readVarint().toInt
        case _      => r.skip(w)
      }
    }
    (off, len)
  }

  private def readPackedSint(r: ProtoWire.Reader): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    while (r.hasMore) out += zigzag(r.readVarint())
    out.result()
  }

  private def readPackedDouble(r: ProtoWire.Reader): Seq[Double] = {
    val out = Seq.newBuilder[Double]
    while (r.hasMore) out += r.readDouble()
    out.result()
  }

  /** Decode one Histogram message (the caller has read the tag). */
  def decode(r: ProtoWire.Reader): Hist = {
    var tsMs = 0L
    var count = 0.0d; var sum = 0.0d
    var schema = 0; var zeroTh = 0.0d; var zeroCount = 0.0d
    val posSpans = Seq.newBuilder[(Int, Int)]
    val negSpans = Seq.newBuilder[(Int, Int)]
    var posDeltas = Seq.empty[Long]; var posCounts = Seq.empty[Double]
    var negDeltas = Seq.empty[Long]; var negCounts = Seq.empty[Double]
    var floatForm = false
    var resetHint = 0
    var customValues = Seq.empty[Double]
    while (r.hasMore) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 0)  => count = r.readVarint().toDouble    // count_int
        case (2, 1)  => count = r.readDouble(); floatForm = true
        case (3, 1)  => sum = r.readDouble()
        case (4, 0)  => schema = zigzag(r.readVarint()).toInt
        case (5, 1)  => zeroTh = r.readDouble()
        case (6, 0)  => zeroCount = r.readVarint().toDouble
        case (7, 1)  => zeroCount = r.readDouble(); floatForm = true
        case (8, 2)  => negSpans += readSpan(r.readMessage())
        case (9, 2)  => negDeltas = negDeltas ++ readPackedSint(r.readMessage())
        case (9, 0)  => negDeltas = negDeltas :+ zigzag(r.readVarint())
        case (10, 2) => negCounts = negCounts ++ readPackedDouble(r.readMessage()); floatForm = true
        case (10, 1) => negCounts = negCounts :+ r.readDouble(); floatForm = true
        case (11, 2) => posSpans += readSpan(r.readMessage())
        case (12, 2) => posDeltas = posDeltas ++ readPackedSint(r.readMessage())
        case (12, 0) => posDeltas = posDeltas :+ zigzag(r.readVarint())
        case (13, 2) => posCounts = posCounts ++ readPackedDouble(r.readMessage()); floatForm = true
        case (13, 1) => posCounts = posCounts :+ r.readDouble(); floatForm = true
        case (14, 0) => resetHint = r.readVarint().toInt
        case (15, 0) => tsMs = r.readVarint()
        case (16, 2) => customValues = customValues ++ readPackedDouble(r.readMessage())
        case (16, 1) => customValues = customValues :+ r.readDouble()
        case _       => r.skip(w)
      }
    }
    Hist(tsMs, count, sum, schema, zeroTh, zeroCount,
      posSpans.result(), posDeltas, posCounts,
      negSpans.result(), negDeltas, negCounts, floatForm, resetHint,
      customValues)
  }

  private def zigzagEnc(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Encode one Hist back to prompb Histogram message bytes — the
    * exact inverse of [[decode]], re-emitting the arm (integer
    * deltas vs float absolutes) the sample arrived on. The sibling
    * native-histogram store persists THESE bytes, so a
    * store-and-forward leg (chunked remote read) hands back the
    * sender's own representation. */
  def encode(h: Hist): Array[Byte] = {
    val w = new ProtoWire.Writer
    if (h.floatForm) w.writeDoubleField(2, h.count)
    else w.writeVarintField(1, h.count.toLong)
    w.writeDoubleField(3, h.sum)
    w.writeVarintField(4, zigzagEnc(h.schema.toLong))
    w.writeDoubleField(5, h.zeroThreshold)
    if (h.floatForm) w.writeDoubleField(7, h.zeroCount)
    else w.writeVarintField(6, h.zeroCount.toLong)
    def spanMsg(s: (Int, Int)): ProtoWire.Writer = {
      val sw = new ProtoWire.Writer
      sw.writeVarintField(1, zigzagEnc(s._1.toLong))
      sw.writeVarintField(2, s._2.toLong)
      sw
    }
    h.negSpans.foreach(s => w.writeMessageField(8, spanMsg(s)))
    if (h.negDeltas.nonEmpty) {
      val pw = new ProtoWire.Writer
      h.negDeltas.foreach(d => pw.writeVarint(zigzagEnc(d)))
      w.writeBytesField(9, pw.toBytes)
    }
    if (h.negCounts.nonEmpty) {
      val pw = new ProtoWire.Writer
      h.negCounts.foreach(pw.writeDouble)
      w.writeBytesField(10, pw.toBytes)
    }
    h.posSpans.foreach(s => w.writeMessageField(11, spanMsg(s)))
    if (h.posDeltas.nonEmpty) {
      val pw = new ProtoWire.Writer
      h.posDeltas.foreach(d => pw.writeVarint(zigzagEnc(d)))
      w.writeBytesField(12, pw.toBytes)
    }
    if (h.posCounts.nonEmpty) {
      val pw = new ProtoWire.Writer
      h.posCounts.foreach(pw.writeDouble)
      w.writeBytesField(13, pw.toBytes)
    }
    if (h.resetHint != 0) w.writeVarintField(14, h.resetHint.toLong)
    w.writeVarintField(15, h.timestampMs)
    if (h.customValues.nonEmpty) {
      val pw = new ProtoWire.Writer
      h.customValues.foreach(pw.writeDouble)
      w.writeBytesField(16, pw.toBytes)
    }
    w.toBytes
  }

  /** Span lengths vs bucket-value counts — the structural invariant
    * the chunk codec needs; a wire histogram violating it is the
    * sender's malformed message (ingest gates on this). */
  def spansConsistent(h: Hist): Boolean = {
    def n(sp: Seq[(Int, Int)]) = sp.iterator.map(_._2).sum
    def vals(d: Seq[Long], c: Seq[Double]) = if (c.nonEmpty) c.length else d.length
    vals(h.posDeltas, h.posCounts) == n(h.posSpans) &&
      vals(h.negDeltas, h.negCounts) == n(h.negSpans)
  }

  /** Bucket indices from spans: each span opens `offset` past the
    * previous span's end (first span's offset is absolute). */
  private def spanIndices(spans: Seq[(Int, Int)]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var idx = 0
    spans.foreach { case (off, len) =>
      idx += off
      for (_ <- 0 until len) { out += idx; idx += 1 }
    }
    out.result()
  }

  /** Per-bucket absolute counts: integer histograms carry deltas
    * (first absolute), float histograms absolutes. */
  private def absCounts(deltas: Seq[Long], counts: Seq[Double]): Seq[Double] =
    if (counts.nonEmpty) counts
    else deltas.scanLeft(0L)(_ + _).drop(1).map(_.toDouble)

  /** Classic `le` text — Go-compatible for the common integers
    * ("1", "2.5", "+Inf") so downstream label joins read naturally. */
  private[ingest] def leText(v: Double): String =
    if (v.isPosInfinity) "+Inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** The conversion: (le-text, cumulative-count) pairs in ascending
    * le order, ending at +Inf = the histogram's total count. None
    * when the schema is outside the standard −4..8 range (the
    * caller's skipped ledger). */
  def toClassic(h: Hist): Option[(Seq[(String, Double)], Double, Double)] = {
    if (!convertible(h)) return None
    if (h.schema == CustomBucketsSchema) {
      // NHCB: the custom values ARE classic le bounds — bucket index
      // i counts (cv[i-1], cv[i]]; an index at/past len(cv) is +Inf
      // overflow mass, already inside `count`. Negative spans and
      // the zero bucket don't exist in the custom-bounds model.
      val cv = h.customValues
      val pos = spanIndices(h.posSpans)
        .zip(absCounts(h.posDeltas, h.posCounts))
        .filter { case (i, c) => c != 0.0d && i >= 0 && i < cv.length }
        .sortBy(_._1)
        .map { case (i, c) => (cv(i), c) }
      var cum = 0.0d
      val buckets = pos.map { case (le, c) =>
        cum += c; (leText(le), cum)
      } :+ (("+Inf", h.count))
      return Some((buckets, h.sum, h.count))
    }
    val base = math.pow(2.0, math.pow(2.0, -h.schema))
    val neg = spanIndices(h.negSpans)
      .zip(absCounts(h.negDeltas, h.negCounts))
      .filter(_._2 != 0.0d)
      .sortBy(-_._1) // descending index = ascending (more negative first) le
      .map { case (i, c) => (-math.pow(base, i - 1), c) }
    val pos = spanIndices(h.posSpans)
      .zip(absCounts(h.posDeltas, h.posCounts))
      .filter(_._2 != 0.0d)
      .sortBy(_._1)
      .map { case (i, c) => (math.pow(base, i), c) }
    val zero = if (h.zeroCount != 0.0d) Seq((h.zeroThreshold, h.zeroCount))
               else Seq.empty
    var cum = 0.0d
    val buckets = (neg ++ zero ++ pos).map { case (le, c) =>
      cum += c; (leText(le), cum)
    } :+ (("+Inf", h.count))
    Some((buckets, h.sum, h.count))
  }

  /** histogram_quantile over ONE native sample — the Prometheus 3.x
    * NATIVE estimator (promql/quantile.go's histogramQuantile):
    * buckets iterate in ascending-bound order (negatives by
    * descending index, the zero bucket, positives ascending; only
    * POPULATED buckets participate); the bucket holding
    * rank = q·count interpolates EXPONENTIALLY — on a log2 scale
    * every exponential bucket has equal width, so the fraction
    * splits the log-bounds linearly and exponentiates back — except
    * a zero-spanning bucket, which stays linear (its bounds cross
    * zero, where the log scale degenerates). A one-sided histogram
    * tightens the zero bucket's far bound to 0. q<0 → -Inf, q>1 →
    * +Inf, an empty histogram → NaN.
    *
    * This deliberately DIFFERS from the classic piecewise-linear
    * estimate graft's default surface computes over the `_bucket`
    * expansion — the same difference a real Prometheus shows between
    * a native series and its classic twin. Classic remains the
    * default; the native path is opt-in (PromQL.eval's nativeHist). */
  /** Populated buckets of one sample in ascending-bound order
    * (negatives by descending index, the zero bucket, positives) as
    * (lower, upper, count), plus which signs hold mass and whether
    * the bounds are CUSTOM (NHCB — interpolation is then LINEAR,
    * classic-bucket semantics, not exponential) — the ONE geometry
    * both estimators walk, so a bounds fix can never diverge between
    * them. None outside the carryable schemas. */
  private def populatedBuckets(h: Hist)
      : Option[(Seq[(Double, Double, Double)], Boolean, Boolean, Boolean)] = {
    if (!convertible(h)) return None
    if (h.schema == CustomBucketsSchema) {
      val cv = h.customValues
      val pos = spanIndices(h.posSpans)
        .zip(absCounts(h.posDeltas, h.posCounts))
        .filter { case (i, c) => c != 0.0d && i >= 0 && i <= cv.length }
        .sortBy(_._1)
        .map { case (i, c) =>
          // the first bucket's lower bound is 0 (the classic
          // convention histQuantile shares); the overflow bucket's
          // upper is +Inf
          (if (i == 0) 0.0d else cv(i - 1),
            if (i < cv.length) cv(i) else Double.PositiveInfinity, c)
        }
      return Some((pos, false, pos.nonEmpty, true))
    }
    val base = math.pow(2.0, math.pow(2.0, -h.schema))
    val neg = spanIndices(h.negSpans)
      .zip(absCounts(h.negDeltas, h.negCounts))
      .filter(_._2 != 0.0d).sortBy(-_._1)
      .map { case (i, c) => (-math.pow(base, i), -math.pow(base, i - 1), c) }
    val zero =
      if (h.zeroCount != 0.0d) Seq((-h.zeroThreshold, h.zeroThreshold, h.zeroCount))
      else Nil
    val pos = spanIndices(h.posSpans)
      .zip(absCounts(h.posDeltas, h.posCounts))
      .filter(_._2 != 0.0d).sortBy(_._1)
      .map { case (i, c) => (math.pow(base, i - 1), math.pow(base, i), c) }
    Some((neg ++ zero ++ pos, neg.nonEmpty, pos.nonEmpty, false))
  }

  /** Prometheus 3.x query-API JSON for ONE histogram sample — the
    * object inside the `"histogram"` / `"histograms"` response arms
    * (HTTP API, "Native histograms" result format): `{"count","sum",
    * "buckets"}` with buckets the POPULATED ones in ascending-bound
    * order as `[boundary_rule, "lower", "upper", "count"]`. Rules:
    * 0 = open left (positive exponential buckets and NHCB le-style
    * buckets), 1 = open right (negative buckets), 3 = closed both
    * (the zero bucket). Numbers render as JSON strings through the
    * same Go-compatible formatter as `le` labels (NaN sum prints
    * "NaN", Prometheus's own encoding). None outside the carryable
    * schemas — the caller falls back to the float surface. */
  def toJson(h: Hist): Option[String] =
    populatedBuckets(h).map { case (bs, _, _, custom) =>
      val buckets = bs.map { case (lo, hi, c) =>
        val rule =
          if (custom) 0
          else if (lo < 0 && hi > 0) 3
          else if (hi <= 0) 1
          else 0
        s"""[$rule,"${numText(lo)}","${numText(hi)}","${numText(c)}"]"""
      }.mkString("[", ",", "]")
      s"""{"count":"${numText(h.count)}","sum":"${numText(h.sum)}"""" +
        (if (bs.isEmpty) "" else s""","buckets":$buckets""") + "}"
    }

  /** The populated buckets behind [[toJson]] as raw
    * (lower, upper, count) triples in ascending-bound order — the
    * oracle-checkable arm of the JSON surface (the driver replays
    * bucket geometry in SQL; the envelope is spec-pinned). */
  def jsonBuckets(h: Hist): Option[Seq[(Double, Double, Double)]] =
    populatedBuckets(h).map(_._1)

  /** [[leText]] extended over the full double line for the JSON
    * surface (−Inf and NaN never appear in `le` labels but do in
    * histogram sums/bounds). */
  private def numText(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isNegInfinity) "-Inf"
    else leText(v)

  def quantile(q: Double, h: Hist): Double = {
    if (q < 0) return Double.NegativeInfinity
    if (q > 1) return Double.PositiveInfinity
    if (h.count == 0 || q.isNaN) return Double.NaN
    val (buckets, hasNeg, hasPos, custom) = populatedBuckets(h) match {
      case None => return Double.NaN
      case Some(t) => t
    }
    if (buckets.isEmpty) return Double.NaN
    val rank = q * h.count
    var cum = 0.0d
    var idx = 0
    while (idx < buckets.length - 1 && cum + buckets(idx)._3 < rank) {
      cum += buckets(idx)._3
      idx += 1
    }
    var (lower, upper, cnt) = buckets(idx)
    if (lower < 0 && upper > 0) {
      // the zero bucket of a one-sided histogram: 0 is the true far
      // bound on the unpopulated side
      if (!hasNeg && hasPos) lower = 0.0d
      else if (!hasPos && hasNeg) upper = 0.0d
    }
    val fraction = (rank - cum) / cnt
    if (custom) {
      // NHCB buckets are classic le-buckets: LINEAR interpolation;
      // rank landing in the +Inf overflow clamps to the top finite
      // bound (the classic estimator's convention)
      if (upper.isPosInfinity) lower
      else lower + (upper - lower) * fraction
    } else if (lower <= 0 && upper >= 0)
      lower + (upper - lower) * fraction // linear across/touching zero
    else {
      val logLower = log2(math.abs(lower))
      val logUpper = log2(math.abs(upper))
      if (lower > 0)
        exp2(logLower + (logUpper - logLower) * fraction)
      else
        -exp2(logUpper + (logLower - logUpper) * (1 - fraction))
    }
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  private def exp2(x: Double): Double = math.pow(2.0, x)

  /** histogram_fraction(lo, hi) over ONE native sample — the
    * estimated fraction of observations in [lo, hi], Prometheus's
    * native-only function (promql/quantile.go histogramFraction),
    * [[quantile]]'s inverse direction: walk the populated buckets in
    * ascending-bound order accumulating rank; a boundary landing
    * INSIDE a bucket interpolates its partial rank EXPONENTIALLY
    * (log2 split, the same scale the quantile uses), linearly inside
    * the zero bucket; a boundary at or below a bucket's lower bound
    * fixes that rank at the cumulative count. NaN bounds or an empty
    * histogram → NaN; lo ≥ hi → 0. The inverse relationship
    * fraction(-∞, quantile(q)) = q holds wherever the quantile lands
    * strictly inside a populated bucket (PromQLSpec fuzzes it). */
  def fraction(lo: Double, hi: Double, h: Hist): Double = {
    if (h.count == 0 || lo.isNaN || hi.isNaN) return Double.NaN
    if (lo >= hi) return 0.0
    val (buckets, hasNeg, hasPos, custom) = populatedBuckets(h) match {
      case None => return Double.NaN
      case Some(t) => t
    }
    if (buckets.isEmpty) return Double.NaN
    var rank = 0.0d
    var lowerRank = -1.0d; var upperRank = -1.0d
    var idx = 0
    while (idx < buckets.length && (lowerRank < 0 || upperRank < 0)) {
      var (bLo, bHi, cnt) = buckets(idx)
      val zeroBucket = bLo < 0 && bHi > 0
      if (zeroBucket) {
        if (!hasNeg && hasPos) bLo = 0.0d
        else if (!hasPos && hasNeg) bHi = 0.0d
      }
      def partial(v: Double): Double =
        if (custom) {
          // NHCB: linear inside classic bounds; inside the +Inf
          // overflow the bound's count is the estimate (the classic
          // clamp convention)
          if (bHi.isPosInfinity) rank
          else rank + cnt * (v - bLo) / (bHi - bLo)
        } else if (zeroBucket) rank + cnt * (v - bLo) / (bHi - bLo)
        else {
          val logLo = log2(math.abs(bLo)); val logHi = log2(math.abs(bHi))
          val logV = log2(math.abs(v))
          val f =
            if (v > 0) (logV - logLo) / (logHi - logLo)
            else 1.0 - (logV - logHi) / (logLo - logHi)
          rank + cnt * f
        }
      if (lowerRank < 0 && bLo >= lo) lowerRank = rank
      if (upperRank < 0 && bLo >= hi) upperRank = rank
      if (lowerRank < 0 && bLo < lo && bHi > lo) lowerRank = partial(lo)
      if (upperRank < 0 && bLo < hi && bHi > hi) upperRank = partial(hi)
      rank += cnt
      idx += 1
    }
    val lr = if (lowerRank < 0 || lowerRank > h.count) h.count
             else lowerRank
    val ur = if (upperRank < 0 || upperRank > h.count) h.count
             else upperRank
    (ur - lr) / h.count
  }

  // ---- sparse-histogram arithmetic (the native estimators' ----
  // ---- rate / sum legs: Prometheus FloatHistogram Sub/Add)  ----

  /** A histogram as sparse per-index float maps — the shape bucket
    * arithmetic wants (prompb spans are a wire encoding, not a
    * working representation). Counts are DOUBLES throughout: a rate
    * is per-second mass and a sum of float histograms is float. */
  final case class Sparse(schema: Int, zeroTh: Double, zeroCount: Double,
                          count: Double, sum: Double,
                          pos: Map[Int, Double], neg: Map[Int, Double],
                          customValues: Seq[Double] = Nil)

  def toSparse(h: Hist): Sparse = {
    def m(sp: Seq[(Int, Int)], d: Seq[Long], c: Seq[Double]) =
      spanIndices(sp).zip(absCounts(d, c)).filter(_._2 != 0.0d).toMap
    Sparse(h.schema, h.zeroThreshold, h.zeroCount, h.count, h.sum,
      m(h.posSpans, h.posDeltas, h.posCounts),
      m(h.negSpans, h.negDeltas, h.negCounts), h.customValues)
  }

  /** Merge to a coarser standard schema: bucket i at schema s covers
    * (base^(i-1), base^i]; at schema t < s each target bucket is the
    * union of 2^(s-t) source buckets, and the index map is
    * j = ceil(i / 2^(s-t)) — the standard exponential downscale. */
  def downscale(s: Sparse, to: Int): Sparse = {
    if (to == s.schema) return s
    require(s.schema != CustomBucketsSchema,
      "custom-bounds histograms have no schema ladder")
    require(to < s.schema, "can only downscale to a coarser schema")
    val shift = s.schema - to
    def re(m: Map[Int, Double]): Map[Int, Double] =
      m.groupBy { case (i, _) =>
        // ceil division for negative-capable indexes
        Math.floorDiv(i - 1, 1 << shift) + 1
      }.map { case (j, xs) => j -> xs.values.sum }
    s.copy(schema = to, pos = re(s.pos), neg = re(s.neg))
  }

  /** Put two operands on common geometry: the COARSER schema wins
    * (Prometheus reduces resolution to make buckets compatible), and
    * the zero threshold widens to the larger one — any bucket lying
    * at or inside the widened threshold folds into the zero bucket,
    * and a bucket STRADDLING it widens the threshold to that
    * bucket's far bound first (Prometheus raises the threshold to a
    * bucket boundary rather than splitting mass). */
  def align(a0: Sparse, b0: Sparse): (Sparse, Sparse) = {
    if (a0.schema == CustomBucketsSchema || b0.schema == CustomBucketsSchema) {
      // NHCB has no resolution ladder: arithmetic requires IDENTICAL
      // bounds (Prometheus's FloatHistogram errors the same way)
      require(a0.schema == b0.schema && a0.customValues == b0.customValues,
        "mismatched custom bucket bounds")
      return (a0, b0)
    }
    val sch = math.min(a0.schema, b0.schema)
    var a = downscale(a0, sch); var b = downscale(b0, sch)
    val zt0 = math.max(a.zeroTh, b.zeroTh)
    if (a.zeroTh != b.zeroTh) {
      val base = math.pow(2.0, math.pow(2.0, -sch))
      def upper(i: Int) = math.pow(base, i)
      def lower(i: Int) = math.pow(base, i - 1)
      // widen to cover any straddling bucket's far bound
      val zt = (a.pos.keys ++ b.pos.keys ++ a.neg.keys ++ b.neg.keys)
        .filter(i => lower(i) < zt0 && upper(i) > zt0)
        .map(upper).foldLeft(zt0)(math.max)
      def fold(s: Sparse): Sparse = {
        val (pIn, pOut) = s.pos.partition { case (i, _) => upper(i) <= zt }
        val (nIn, nOut) = s.neg.partition { case (i, _) => upper(i) <= zt }
        s.copy(zeroTh = zt,
          zeroCount = s.zeroCount + pIn.values.sum + nIn.values.sum,
          pos = pOut, neg = nOut)
      }
      a = fold(a); b = fold(b)
    }
    (a, b)
  }

  /** last − first with counter-reset detection: any bucket, the zero
    * bucket, or the total going DOWN means the counter reset inside
    * the window — the window drops (graft's exact-integer rate model
    * drops reset windows; Prometheus's native rate detects resets
    * the same bucket-wise way). */
  def subtract(last0: Sparse, first0: Sparse): Option[Sparse] = {
    // a custom-bounds change mid-window reads as a reset (the bucket
    // mapping is gone, like a schema change on a classic histogram)
    if ((last0.schema == CustomBucketsSchema ||
        first0.schema == CustomBucketsSchema) &&
        (last0.schema != first0.schema ||
          last0.customValues != first0.customValues)) return None
    val (last, first) = align(last0, first0)
    if (last.count < first.count || last.zeroCount < first.zeroCount)
      return None
    def diff(l: Map[Int, Double], f: Map[Int, Double])
        : Option[Map[Int, Double]] = {
      val keys = l.keySet ++ f.keySet
      val out = Map.newBuilder[Int, Double]
      keys.foreach { k =>
        val d = l.getOrElse(k, 0.0d) - f.getOrElse(k, 0.0d)
        if (d < 0) return None
        if (d != 0.0d) out += k -> d
      }
      Some(out.result())
    }
    for (p <- diff(last.pos, first.pos); n <- diff(last.neg, first.neg))
      yield Sparse(last.schema, last.zeroTh,
        last.zeroCount - first.zeroCount, last.count - first.count,
        last.sum - first.sum, p, n, last.customValues)
  }

  def add(a0: Sparse, b0: Sparse): Sparse = {
    val (a, b) = align(a0, b0)
    def m(x: Map[Int, Double], y: Map[Int, Double]) =
      (x.keySet ++ y.keySet).iterator
        .map(k => k -> (x.getOrElse(k, 0.0d) + y.getOrElse(k, 0.0d)))
        .filter(_._2 != 0.0d).toMap
    Sparse(a.schema, a.zeroTh, a.zeroCount + b.zeroCount,
      a.count + b.count, a.sum + b.sum, m(a.pos, b.pos), m(a.neg, b.neg),
      a.customValues)
  }

  /** [[add]] that degrades instead of failing the task: when an
    * operand's custom-bounds layout disagrees with the accumulator
    * (NHCB vs NHCB with different bounds, or NHCB vs exponential)
    * the WHOLE group's point is dropped — `None` poisons the fold —
    * which is exactly Prometheus's behavior (FloatHistogram add
    * error → warn annotation + dropped output point). One target
    * redeployed with changed classic bounds must degrade that
    * step's point, not 500 the whole query_range (align's require
    * would otherwise fail the Spark task from inside the
    * distributed sum), and must not silently answer with a partial
    * sum over an arbitrary subset of the operands. */
  def addOrDrop(acc: Option[Sparse], b: Sparse): Option[Sparse] =
    acc.flatMap { a =>
      if ((a.schema == CustomBucketsSchema ||
           b.schema == CustomBucketsSchema) &&
          (a.schema != b.schema || a.customValues != b.customValues)) None
      else Some(add(a, b))
    }

  def scale(s: Sparse, k: Double): Sparse =
    s.copy(zeroCount = s.zeroCount * k, count = s.count * k,
      sum = s.sum * k,
      pos = s.pos.map { case (i, c) => i -> c * k },
      neg = s.neg.map { case (i, c) => i -> c * k })

  /** Back to the Hist shape the estimators walk — float-form
    * (absolute double counts), spans rebuilt from the sorted sparse
    * indexes. */
  def fromSparse(tsMs: Long, s: Sparse): Hist = {
    // consecutive index runs → spans: the first span's offset is the
    // absolute start index, later offsets are the gap from the
    // previous span's exclusive end (the wire convention spanIndices
    // inverts)
    def spans(sorted: Seq[Int]): Seq[(Int, Int)] = {
      val sp = Seq.newBuilder[(Int, Int)]
      var i = 0; var prevEnd = 0; var first = true
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1) == sorted(j) + 1) j += 1
        sp += (((if (first) sorted(i) else sorted(i) - prevEnd), j - i + 1))
        prevEnd = sorted(j) + 1; first = false; i = j + 1
      }
      sp.result()
    }
    val pIdx = s.pos.keys.toSeq.sorted
    val nIdx = s.neg.keys.toSeq.sorted
    Hist(tsMs, s.count, s.sum, s.schema, s.zeroTh, s.zeroCount,
      spans(pIdx), Nil, pIdx.map(s.pos), spans(nIdx), Nil, nIdx.map(s.neg),
      floatForm = true, customValues = s.customValues)
  }

  /** Expand one histogram into classic ingested samples under
    * `metric`'s name (labels already sorted "k=v" WITHOUT le). */
  def toClassicSamples(metric: String, labels: Seq[String],
                       h: Hist): Option[Seq[PromRemoteCodec.IngestedSample]] =
    toClassic(h).map { case (buckets, sum, count) =>
      val tsUs = h.timestampMs * 1000L
      val bucketRows = buckets.map { case (le, cum) =>
        PromRemoteCodec.IngestedSample(tsUs, metric + "_bucket",
          (labels :+ s"le=$le").sorted, cum)
      }
      val sumRow =
        if (sum.isNaN) Seq.empty
        else Seq(PromRemoteCodec.IngestedSample(tsUs, metric + "_sum",
          labels, sum))
      bucketRows ++ sumRow :+
        PromRemoteCodec.IngestedSample(tsUs, metric + "_count", labels, count)
    }
}
