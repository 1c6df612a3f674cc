package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted inside executors via
  * `mapPartitions` (the Scala twin of a batched decode UDF — one
  * iterator pass per partition, codec state amortized across the
  * batch).
  *
  * The DECODE ITSELF IS A STUB — the container has no image/audio
  * codecs, so `decodeStub` derives deterministic fake features from
  * the payload bytes (header-byte "dimensions", byte-sum "intensity").
  * Everything around it — schema, binary column handling, partition
  * batching, feature struct output — is the real plumbing a codec
  * would drop into.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], fmt: String, size_meta: Long)

  /** Extracted features (deterministic stub). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                                 width: Int, height: Int, mean_intensity: Double)

  /** documents → media rows: utf-8 payload bytes standing in for an
    * encoded image, source/n_chars as the typed metadata. */
  def packFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      col("source").as("fmt"),
      col("n_chars").as("size_meta"))

  /** STUB decode: a real implementation would parse the codec header
    * and decode frames here; this derives stable pseudo-features so
    * the distributed plumbing is testable. */
  def decodeStub(payload: Array[Byte]): (Int, Long, Int, Int, Double) = {
    val n = payload.length
    if (n == 0) return (0, 0L, 1, 1, 0.0) // empty payload → zeroed features
    var sum = 0L
    var i = 0
    while (i < n) { sum += payload(i) & 0xff; i += 1 }
    val checksum = sum % 997
    val width = (payload(0) & 0xff) % 64 + 1
    val height = if (n >= 2) (payload(1) & 0xff) % 64 + 1 else 1
    val meanIntensity = sum.toDouble / n
    (n, checksum, width, height, meanIntensity)
  }

  /** One sampled frame: fixed-size payload slice + portable content
    * hash (what a downstream embedding/captioning stage would key
    * on). */
  final case class SampledFrame(doc_id: Long, frame_idx: Long, frame_len: Long, frame_h: Long)

  /** Frame sampling over the binary payload: the payload is read as
    * fixed-size frames (frameBytes each, a stand-in for a video
    * container's frame boundaries) and every `everyK`-th frame is
    * emitted — the decimation step a video pipeline runs before the
    * expensive per-frame model. Executed as one iterator pass per
    * partition over the byte arrays (no per-frame task overhead; at
    * 100 TB the parallelism is the partition count and the output is
    * input_bytes/everyK — the sampling happens before any shuffle).
    * frame_h is the portable md5-60 hash over the RAW frame bytes
    * (Portable.hash60Bytes — never a String round-trip, which would
    * collapse invalid UTF-8 to U+FFFD and alias distinct binary
    * frames), so sampled frames are content-addressable for arbitrary
    * payloads. The DuckDB oracle can only mirror this on ASCII
    * corpora (its md5/substr are VARCHAR/char-positional), which the
    * synthetic documents table satisfies. */
  def frameSample(media: DataFrame, frameBytes: Int = 256, everyK: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hash = graft.llm.Portable.hash60Bytes _
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, payload) =>
          val nFrames = (payload.length + frameBytes - 1) / frameBytes
          Iterator.range(0, nFrames).filter(_ % everyK == 0).map { i =>
            val from = i * frameBytes
            val until = math.min(from + frameBytes, payload.length)
            SampledFrame(docId, i.toLong, (until - from).toLong,
              hash(java.util.Arrays.copyOfRange(payload, from, until)))
          }
        }
      }.toDF()
  }

  /** STUB perceptual hash — the average-hash (aHash) shape a real
    * image-dedup pipeline computes over decoded pixels, applied to
    * the raw payload bytes (the container has no codecs): 60 bits,
    * bit b set iff 16-byte block b's byte sum, normalized, exceeds
    * the whole payload's mean — decided by the integer cross-multiply
    * blockSum·totalLen > totalSum·blockLen, so the hash is exact and
    * engine-portable (no float division). Blocks past the payload
    * stay 0. Small payload edits move one block sum and the global
    * mean — a few bit flips, which is exactly the near-dup-tolerant
    * behavior perceptual hashing exists for. */
  def phashStub(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    var total = 0L
    var i = 0
    while (i < n) { total += payload(i) & 0xff; i += 1 }
    var h = 0L
    var b = 0
    while (b < 60) {
      val from = b * 16
      if (from < n) {
        val until = math.min(from + 16, n)
        var s = 0L
        var j = from
        while (j < until) { s += payload(j) & 0xff; j += 1 }
        if (s * n > total * (until - from)) h |= 1L << b
      }
      b += 1
    }
    h
  }

  /** doc_id + 60-bit perceptual hash per media row — one iterator
    * pass per partition (the codec leg; a real pipeline would decode
    * and hash pixels here). */
  def phash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, phashStub(p)) })
      .toDF("doc_id", "phash")
  }

  /** Multimodal near-dup detection: perceptual-hash the payloads,
    * then banded hamming LSH (shared with SimHash — 4×15-bit bands,
    * bucket-capped) emits verified pairs at bit_count(xor) <=
    * maxHamming. The payload bytes never enter the join — the
    * shuffle carries (doc_id, 60-bit sig) only, so a 100 TB image
    * corpus dedups at signature weight. Toy-payload caveat: the
    * synthetic payloads are short, so high blocks are 0 for every
    * row and the top bands degenerate into full buckets — real pixel
    * phashes are dense across all 60 bits; the bucket cap is the
    * guard either way. */
  def phashDedup(media: DataFrame, maxHamming: Int = 2,
                 maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hamming60Pairs(phash(media), "phash", maxHamming, maxBucket)

  /** One resized row: fixed-bucket integer means over the payload. */
  final case class ResizedRow(doc_id: Long, n_bytes: Long, resized: String)

  /** STUB resize — the fixed-target downsample every image pipeline
    * runs before the per-image model: average-pool the payload byte
    * stream into `buckets` integer means (floor division — exact,
    * engine-portable). A real implementation would decode pixels and
    * bilinear-resample inside this same iterator pass; the pooling
    * bounds arithmetic, partition batching, and fixed-width output
    * schema are the real plumbing. Output flattens the vector to a
    * ','-joined string (SURVEY §6: array columns are unsortable in
    * the driver's comparator); in-engine consumers would keep the
    * array. */
  def resizePool(media: DataFrame, buckets: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val n = p.length
        val means = (0 until buckets).map { i =>
          val lo = (i.toLong * n / buckets).toInt
          val hi = ((i + 1).toLong * n / buckets).toInt
          if (hi <= lo) 0L
          else {
            var s = 0L
            var j = lo
            while (j < hi) { s += p(j) & 0xff; j += 1 }
            s / (hi - lo)
          }
        }
        ResizedRow(id, n.toLong, means.mkString(","))
      }).toDF()
  }

  /** Batched feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (n, checksum, w, h, mean) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, n, checksum, w, h, mean)
      }
    }.toDF()
      .withColumn("mean_intensity_e6",
        expr("CAST(floor(mean_intensity * 1000000 + 0.5) AS BIGINT)"))
      .drop("mean_intensity")
  }
}
