package graft.serve

/** Gorilla XOR chunk codec — Prometheus's chunk encoding (the
  * "Gorilla: A Fast, Scalable, In-Memory Time Series Database"
  * VLDB'15 scheme as specialized by prometheus/tsdb/chunkenc/xor.go),
  * re-derived here bit-for-bit so `/read` can answer the protocol's
  * STREAMED_XOR_CHUNKS response type with chunks any Prometheus
  * client decodes natively (the reference serves only SAMPLES; this
  * is the graft extension that makes huge range reads streamable —
  * ~1.37 bytes/sample on typical series instead of 16).
  *
  * Layout (chunk `data` bytes):
  *  - uint16 big-endian sample count
  *  - sample 0: timestamp as ZIGZAG varint (Go binary.PutVarint),
  *    value as raw 64 float bits
  *  - sample 1: timestamp delta as plain uvarint, value XOR-encoded
  *  - samples 2+: delta-of-delta with the 0 / 10+14 / 110+17 /
  *    1110+20 / 1111+64 varbit brackets (asymmetric bitRange:
  *    −(2^(n−1)−1) ≤ dod ≤ 2^(n−1)), value XOR-encoded
  *  - value XOR: '0' = repeat; '1''0' = reuse the previous
  *    leading/trailing window; '1''1' = 5 bits leading (clamped to
  *    31), 6 bits significant-bit count (0 encodes 64), then the
  *    significant bits
  *
  * All writes are MSB-first within the n lowest bits, matching the
  * bstream. Encode/decode round-trip on raw float bits (NaN payloads
  * included). */
object Gorilla {

  /** Prometheus's target samples per chunk (tsdb/head_append.go) —
    * the split point [[encodeChunks]] uses. */
  val SamplesPerChunk: Int = 120

  final class BitWriter {
    private var buf = new Array[Byte](128)
    private var bitLen = 0 // total bits written

    private def ensure(bytes: Int): Unit = {
      val need = (bitLen + 7) / 8 + bytes + 1
      if (need > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
    }

    def writeBit(b: Int): Unit = {
      ensure(1)
      if ((b & 1) != 0) buf(bitLen >> 3) = (buf(bitLen >> 3) | (0x80 >>> (bitLen & 7))).toByte
      bitLen += 1
    }

    /** The lowest `n` bits of `v`, most significant first. */
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n / 8 + 1)
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }

    def writeByte(b: Int): Unit = writeBits(b.toLong & 0xffL, 8)

    /** Patch the first two bytes with the big-endian sample count. */
    def setCount(n: Int): Unit = {
      buf(0) = ((n >>> 8) & 0xff).toByte
      buf(1) = (n & 0xff).toByte
    }

    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitLen + 7) / 8)
  }

  final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // bit position

    def readBit(): Int = {
      val b = (bytes(pos >> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      b
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit().toLong; i += 1 }
      v
    }

    def readUvarint(): Long = {
      var shift = 0
      var res = 0L
      var cont = true
      while (cont) {
        val b = readBits(8)
        res |= (b & 0x7fL) << shift
        cont = (b & 0x80L) != 0
        shift += 7
      }
      res
    }

    def readZigzagVarint(): Long = {
      val u = readUvarint()
      (u >>> 1) ^ -(u & 1L)
    }
  }

  private def writeUvarint(w: BitWriter, v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0L) { w.writeByte(((x & 0x7fL) | 0x80L).toInt); x >>>= 7 }
    w.writeByte(x.toInt)
  }

  private def writeZigzagVarint(w: BitWriter, v: Long): Unit =
    writeUvarint(w, (v << 1) ^ (v >> 63))

  /** Go xor.go bitRange: the asymmetric n-bit window. */
  private def bitRange(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  /** Encode one chunk (≤ 65535 samples, time-ascending (ms, value)). */
  def encode(ts: Array[Long], vs: Array[Double]): Array[Byte] = {
    require(ts.length == vs.length && ts.length <= 0xffff)
    val w = new BitWriter
    w.writeBits(0L, 16) // count, patched below
    var t = 0L
    var vBits = 0L
    var tDelta = 0L
    var leading = 0xff // sentinel: no window yet
    var trailing = 0
    var i = 0
    while (i < ts.length) {
      val ti = ts(i)
      val vb = java.lang.Double.doubleToRawLongBits(vs(i))
      if (i == 0) {
        writeZigzagVarint(w, ti)
        w.writeBits(vb, 64)
      } else {
        if (i == 1) {
          tDelta = ti - t
          writeUvarint(w, tDelta)
        } else {
          val nd = ti - t
          val dod = nd - tDelta
          tDelta = nd
          if (dod == 0L) w.writeBit(0)
          else if (bitRange(dod, 14)) { w.writeBits(0x2L, 2); w.writeBits(dod & 0x3fffL, 14) }
          else if (bitRange(dod, 17)) { w.writeBits(0x6L, 3); w.writeBits(dod & 0x1ffffL, 17) }
          else if (bitRange(dod, 20)) { w.writeBits(0xeL, 4); w.writeBits(dod & 0xfffffL, 20) }
          else { w.writeBits(0xfL, 4); w.writeBits(dod, 64) }
        }
        // value XOR against the previous value's bits
        val xor = vb ^ vBits
        if (xor == 0L) w.writeBit(0)
        else {
          w.writeBit(1)
          var newLeading = java.lang.Long.numberOfLeadingZeros(xor)
          val newTrailing = java.lang.Long.numberOfTrailingZeros(xor)
          if (newLeading >= 32) newLeading = 31
          if (leading != 0xff && newLeading >= leading && newTrailing >= trailing) {
            w.writeBit(0)
            w.writeBits(xor >>> trailing, 64 - leading - trailing)
          } else {
            leading = newLeading
            trailing = newTrailing
            w.writeBit(1)
            w.writeBits(newLeading.toLong, 5)
            val sigbits = 64 - newLeading - newTrailing
            w.writeBits(sigbits.toLong & 0x3fL, 6) // 64 encodes as 0
            w.writeBits(xor >>> newTrailing, sigbits)
          }
        }
      }
      t = ti
      vBits = vb
      i += 1
    }
    w.setCount(ts.length)
    w.toBytes
  }

  /** Decode a chunk back to (ms, value) arrays. */
  def decode(data: Array[Byte]): (Array[Long], Array[Double]) = {
    val count = ((data(0) & 0xff) << 8) | (data(1) & 0xff)
    val r = new BitReader(data)
    r.readBits(16) // skip count
    val ts = new Array[Long](count)
    val vs = new Array[Double](count)
    var t = 0L
    var vBits = 0L
    var tDelta = 0L
    var leading = 0
    var trailing = 0
    var i = 0
    while (i < count) {
      if (i == 0) {
        t = r.readZigzagVarint()
        vBits = r.readBits(64)
      } else {
        if (i == 1) { tDelta = r.readUvarint(); t += tDelta }
        else {
          // count the leading 1-bits of the dod control (max 4)
          var ctl = 0
          var bit = r.readBit()
          while (bit == 1 && ctl < 4) { ctl += 1; if (ctl < 4) bit = r.readBit() }
          val dod = ctl match {
            case 0 => 0L
            case 1 => signExtend(r.readBits(14), 14)
            case 2 => signExtend(r.readBits(17), 17)
            case 3 => signExtend(r.readBits(20), 20)
            case _ => r.readBits(64)
          }
          tDelta += dod
          t += tDelta
        }
        if (r.readBit() == 1) {
          if (r.readBit() == 1) {
            leading = r.readBits(5).toInt
            val mbits0 = r.readBits(6).toInt
            val mbits = if (mbits0 == 0) 64 else mbits0
            trailing = 64 - leading - mbits
          }
          val mbits = 64 - leading - trailing
          vBits ^= r.readBits(mbits) << trailing
        }
      }
      ts(i) = t
      vs(i) = java.lang.Double.longBitsToDouble(vBits)
      i += 1
    }
    (ts, vs)
  }

  /** Go's asymmetric decoder sign rule: strictly greater than
    * 2^(n−1) wraps negative. */
  private def signExtend(bits: Long, nbits: Int): Long =
    if (bits > (1L << (nbits - 1))) bits - (1L << nbits) else bits

  /** Split a series into ≤[[SamplesPerChunk]]-sample chunks:
    * (minTimeMs, maxTimeMs, data) triples, time-ascending. */
  def encodeChunks(ts: Array[Long], vs: Array[Double],
                   perChunk: Int = SamplesPerChunk)
      : Seq[(Long, Long, Array[Byte])] =
    (0 until ts.length by perChunk).map { off =>
      val n = math.min(perChunk, ts.length - off)
      val ct = java.util.Arrays.copyOfRange(ts, off, off + n)
      val cv = java.util.Arrays.copyOfRange(vs, off, off + n)
      (ct(0), ct(n - 1), encode(ct, cv))
    }
}
