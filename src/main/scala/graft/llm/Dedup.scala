package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale shape: candidate generation never compares documents
  * pairwise — it shuffles small integer signatures (128 longs per doc
  * for MinHash, one long for SimHash) and joins on band buckets, so
  * the shuffle volume is O(docs × signature), not O(docs²) and not
  * O(total text bytes). Verification (Jaccard / hamming) only touches
  * candidate pairs. All hashing is the portable md5-60bit → mod-P
  * integer scheme, so signatures are engine-reproducible.
  *
  * Every band self-join is guarded by a bucket-size cap (default
  * [[DefaultMaxBucket]], inert on the test corpora): a degenerate
  * band value — boilerplate-heavy corpora produce them — would make
  * one bucket O(n²) and kill the job at 100 TB. The cap is a window
  * count over the SAME hash partitioning the join needs, so the
  * guard rides the join's exchange instead of adding a shuffle;
  * buckets above the cap are dropped (standard LSH practice: a
  * bucket that hot carries no similarity signal).
  */
object Dedup {
  import Portable._

  val NumPerms = 128 // MinHash permutations (SURVEY §2.4)
  val NumBands = 16  // 16 bands × 8 rows
  val RowsPerBand = NumPerms / NumBands

  /** Band buckets above this size are dropped from candidate
    * generation. Inert on the test corpora (orders of magnitude above
    * any sf0.1 bucket); at 100 TB you'd tune it to the skew of the
    * corpus (10³–10⁴ keeps the worst bucket's pair count bounded). */
  val DefaultMaxBucket: Int = 1000000

  /** Drops rows in (keys...) buckets with more than `cap` rows. The
    * count is a window over the join's own hash partitioning — no
    * extra shuffle; the filter runs before any pair is generated. */
  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    banded.withColumn("bkt_n", count(lit(1)).over(w))
      .filter(col("bkt_n") <= cap)
      .drop("bkt_n")
  }

  /** Line-level dedup (the RefinedWeb / CCNet boilerplate pass):
    * split each document on newlines, count per-line document
    * frequency corpus-wide, drop every line appearing in >= minDf
    * documents (cookie banners, nav bars, footers — the lines that
    * repeat across a crawl), and reassemble the survivors in their
    * original order. Emits per document the line totals, the kept
    * ratio (e6 integer), and the md5 of the scrubbed text (never the
    * text itself — re-derivable from the source row + the boilerplate
    * set).
    *
    * Scale shape: the df count is a hash-groupBy on the line string
    * (at 100 TB you'd pre-hash lines to 128-bit keys so the exchange
    * carries hashes; the test-scale lines are short enough that the
    * string IS the compact key). The boilerplate set — lines with
    * df >= minDf — is small relative to the corpus (that is what
    * makes it boilerplate): AQE broadcasts it when it fits and falls
    * back to a line-keyed hash join when a pathological corpus
    * inflates it. Keep/drop is a flag on a left join so totals, kept
    * counts, and the reassembly all come out of ONE doc-keyed
    * aggregate — two corpus scans total (df build + flagged probe),
    * linear in total line count, no pairwise anything. */
  def lineDedup(documents: DataFrame, minDf: Int = 3): DataFrame = {
    val lines = documents
      .select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), "\n"))
          .as(Seq("ord", "line")))
    // df, salt-exact: a line present in EVERY doc (a universal
    // banner) would otherwise land all its doc_ids in one final
    // count task — doc_id salts partition disjointly, so summing
    // per-salt distinct counts is exact AND bounds any one group at
    // |docs|/256; the line-keyed final exchange carries ≤256
    // rows/line no matter how hot the line is.
    val boiler = lines
      .groupBy(col("line"), (col("doc_id") % 256).as("salt"))
      .agg(countDistinct(col("doc_id")).as("pdf"))
      .groupBy("line")
      .agg(sum(col("pdf")).as("line_df"))
      .filter(col("line_df") >= minDf)
      .select(col("line"), lit(1).as("is_boiler"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the NULLs the CASE leaves for scrubbed
        // lines; array_sort on (ord, line) restores document order
        md5(concat_ws("\n", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN is_boiler IS NULL THEN struct(ord, line) END))," +
            " x -> x.line)"))).as("md5_raw"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        expr("CAST(n_kept * 1000000 DIV n_lines AS BIGINT)")
          .as("kept_ratio_e6"),
        // an all-boilerplate doc has NO clean text, not md5("")
        when(col("n_kept") > 0, col("md5_raw")).as("clean_md5"))
  }

  /** Exact dedup: one row per distinct text with the kept (minimum)
    * doc_id and the number of copies. Hash-groupBy on the text —
    * at 100 TB you'd pre-hash to a 128-bit key so the shuffle carries
    * hashes, not documents; grouping by md5 here keeps that shape. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
           count(lit(1)).as("n_copies"),
           max(length(col("text"))).as("n_chars"))
      .drop("text_md5")

  /** (doc_id, h) — one row per distinct word-level 3-gram shingle,
    * hashed with the portable scheme. The explode keeps the md5 in a
    * plain (whole-stage-codegen'd) projection, computed exactly once
    * per shingle — at 100 TB the shuffle then carries 8-byte hashes,
    * never shingle text. */
  def shingleHashes(documents: DataFrame): DataFrame =
    documents
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(words)-3), i -> concat_ws(' ', words[i], words[i+1], words[i+2])))"))
        .as("s"))
      .select(col("doc_id"), expr(hash60SqlSpark("s")).as("h"))

  /** (doc_id, shs) — the distinct shingle-hash set per document, for
    * exact-Jaccard verification. Kept OUT of the signature/band path
    * so candidate generation never shuffles shingle sets. */
  def shingleSets(documents: DataFrame): DataFrame =
    shingleHashes(documents)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h")).as("shs"))

  /** doc_id + MinHash signature (NumPerms longs) + per-band bucket
    * keys. The signature is ONE narrow per-row pass — the codegen'd
    * [[graft.functions.ShingleMinHash]] kernel folds every shingle's
    * portable hash into the 128 per-permutation minima inside the
    * row (permutation j is (a_j·h + b_j) mod P with
    * a_j = (j·2654435761+1) mod P, b_j = (j·40503+7) mod P). No
    * shingle explode, no 128-column aggregate, NO SHUFFLE: at 100 TB
    * the signature build is a map over the corpus scan. (The
    * previous explode → 128-min-HashAggregate plan computed the same
    * arithmetic with a 50×+ row amplification and an exchange of
    * integer partials; the band keys below are unchanged.) */
  def minhashSignatures(documents: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    documents
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr("graft_shingle_minhash(words)").as("sb"))
      .select(col("doc_id"),
        expr(s"slice(sb, 1, $NumPerms)").as("sig"),
        expr(s"slice(sb, ${NumPerms + 1}, $NumBands)").as("bands"))
  }

  /** MinHash+LSH candidate pairs: docs sharing any band bucket, with
    * the estimated similarity = fraction of matching signature
    * components (granularity 1/128).
    *
    * The band self-join carries (doc_id, band, band_sig) ONLY — the
    * 128-long signature arrays never ride the candidate shuffle
    * (ids-only join ≈ 50× less shuffle than sig-carrying band rows at
    * 16 bands/doc). Signatures join back to the distinct pair list
    * once per side to compute est_sim. The signature relation has two
    * consumers (the band explode and the join-back) and is NOT
    * persisted: the build is a shuffle-free narrow kernel pass, so
    * recomputing it costs one extra corpus scan — cheaper at 100 TB
    * than materializing ~1 KB/doc cluster-wide, and a returned-lazy
    * DataFrame gives no sound point to unpersist (an internal persist
    * here leaked a cached relation per call in a long-lived session;
    * LlmSpec pins the no-residue behavior). */
  def minhashLsh(documents: DataFrame, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sigs = minhashSignatures(documents)
    minhashCandidatePairs(documents, maxBucket)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr(s"CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS BIGINT) * 1000000 DIV $NumPerms")
          .as("est_sim_e6"))
  }

  /** The candidate-pair half of [[minhashLsh]] alone: (doc_a, doc_b)
    * sharing any band bucket, WITHOUT the estimated-similarity
    * join-back. Consumers that discard est_sim (the connected-
    * components labelings — they cluster every candidate pair) take
    * this path and skip two signature kernel passes plus two
    * pair-keyed joins; the emitted pair set is identical by
    * construction (the join-back was inner on keys the pair list
    * came from, so it never changed the row set). */
  private[graft] def minhashCandidatePairs(documents: DataFrame,
                                           maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = capBuckets(
      minhashSignatures(documents)
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_sig"))),
      Seq("band", "band_sig"), maxBucket)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Cross-source duplication matrix — which sources copy from
    * which: the LSH candidate pairs at estimated similarity ≥ tauE6
    * joined back to each side's `source` and aggregated per ordered
    * (source_a ≤ source_b) cell. The curation report behind
    * mirror/scrape detection before source mixing: a hot
    * off-diagonal cell is one corpus republishing another, the
    * diagonal is within-source duplication. Scale shape: pairs are
    * the banded candidates (bucket-capped, never all-pairs); the
    * doc→source projection joins the SMALL pair list against a
    * two-column corpus projection twice; the final aggregate's
    * group cardinality is ≤ sources². */
  def sourceDupMatrix(documents: DataFrame, tauE6: Long,
                      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val pairs = minhashLsh(documents, maxBucket)
      .filter(col("est_sim_e6") >= tauE6)
    val src = documents.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  /** Jaccard verification over the LSH candidates: exact
    * |A∩B| / |A∪B| on distinct shingle-hash sets (integer counts →
    * deterministic ratio). Candidate pairs come from band keys
    * ALONE — the band self-join carries (doc_id, band, band_sig)
    * only; shingle sets are joined back to the (small) pair list
    * afterwards, so the shuffle moves shingle sets once per join
    * side instead of once per (doc, band) row.
    *
    * The band branch is the shuffle-free [[minhashSignatures]] kernel
    * pass; the verification branch re-scans the corpus once for its
    * shingle-set aggregate — two narrow scans of the input, no shared
    * materialization needed (the r4 16× regression came from
    * re-SHINGLING through an exploded 50×-amplified relation; the
    * kernel form shingles inside the row). */
  def ngramJaccard(documents: DataFrame, threshold: Double,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = capBuckets(
      minhashSignatures(documents).select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "band_sig"))),
      Seq("band", "band_sig"), maxBucket)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = shingleSets(documents)
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(size(array_intersect(shs_a, shs_b)) AS BIGINT) * 1000000 " +
          "DIV size(array_union(shs_a, shs_b))").as("jaccard_e6"))
      .filter(col("jaccard_e6") >= math.round(threshold * 1e6))
  }

  /** Greedy LSH dedup — the linear-output production contract: every
    * band bucket keeps its minimum doc_id and DROPS every other
    * member, so a duplicate cluster of size d emits d rows (one kept,
    * d−1 dropped), not d²/2 pairs (SCALE.md: pair output is the
    * quadratic term at scale; a 4× dup-heavy corpus produced 16× the
    * pairs). One row per document: (doc_id, kept, keep_id) where
    * keep_id is the smallest doc_id sharing any band bucket (the
    * doc's greedy representative; keep_id = doc_id for kept docs).
    *
    * Cost shape: the bucket-min is a window over the banded rows'
    * own hash partitioning (no extra shuffle beyond the band
    * explode), then one min-aggregate per doc — never a pair join.
    * Greedy bucket-dedup under-merges transitive clusters that share
    * no bucket (standard LSH trade-off, same recall as the pair
    * candidates) but never exceeds linear output. */
  def minhashKeep(documents: DataFrame, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = capBuckets(
      minhashSignatures(documents)
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_sig"))),
      Seq("band", "band_sig"), maxBucket)
    val w = Window.partitionBy(col("band"), col("band_sig"))
    banded
      .withColumn("bucket_min", min(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(min(col("bucket_min")).as("keep_id"))
      .select(col("doc_id"),
        (col("keep_id") === col("doc_id")).cast("int").as("kept"), col("keep_id"))
  }

  /** Incremental crawl dedup — the production shape where a NEW
    * snapshot dedups against the already-kept corpus instead of
    * re-deduping the world: a new document drops when it shares any
    * MinHash band bucket with ANY old document (the same candidate
    * criterion the batch LSH uses, applied asymmetrically). One row
    * per NEW document: (doc_id, kept).
    *
    * Scale shape: both sides reduce to (doc_id, band, band_sig)
    * rows; the old side further collapses to DISTINCT bucket keys
    * before the left-semi probe, so the join carries bucket keys —
    * never signatures, never text. The old corpus contributes one
    * narrow kernel scan; in production the old side's distinct
    * bucket-key set is exactly the "fingerprint store" you persist
    * between crawls (bounded by old-corpus buckets, ~16 keys/doc),
    * turning every later crawl into new-side-only compute. */
  def incrementalKeep(documents: DataFrame, isNew: Column,
                      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val flags = documents.select(col("doc_id"),
      isNew.cast("boolean").as("_new"))
    val banded = capBuckets(
      minhashSignatures(documents)
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "band_sig"))),
      Seq("band", "band_sig"), maxBucket)
      .join(flags, "doc_id")
    val oldBuckets = banded.filter(!col("_new"))
      .select(col("band"), col("band_sig")).distinct()
    val hitNew = banded.filter(col("_new"))
      .join(oldBuckets, Seq("band", "band_sig"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("_hit", lit(1))
    flags.filter(col("_new"))
      .join(hitNew, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_hit").isNull.cast("int").as("kept"))
  }

  /** One micro-batch's state probe: which of the batch's banded docs
    * share an LSH bucket with ANY earlier crawl. probe = state ⋈
    * broadcast(batch keys), map-side: the state is the STREAMED side
    * of a broadcast hash join, so a batch never shuffles (or
    * deduplicates) the accumulated state — a left-semi + distinct
    * would re-shuffle the WHOLE state every batch, the growth term a
    * long-running stream cannot afford. Duplicate state keys
    * collapse at the doc_id distinct, so the un-distinct'd multiset
    * state answers identically. The state is a FLAT parquet table:
    * every doc emits a key in every band, so a batch always carries
    * all 16 band values and a band-partitioned layout could never
    * prune — it only paid 16× the files and a dynamic-partition
    * commit per batch (measured ~0.3 s/batch at sf0.1, round 17).
    * PlanSpec asserts the shape: one broadcast exchange (the batch
    * keys), no shuffle of the state scan before the join.
    *
    * The batch side is broadcast: one crawl FILE per micro-batch by
    * contract (maxFilesPerTrigger=1 in streamIncrementalKeep), so
    * the broadcast side is bounded by the largest single crawl
    * file's band keys, never the accumulated state. A pathological
    * multi-GB single file should be split upstream before ingest. */
  private[graft] def probeState(sp: org.apache.spark.sql.SparkSession,
                                stateDir: String,
                                banded: DataFrame): DataFrame =
    sp.read.parquet(stateDir)
      .join(broadcast(banded), Seq("band", "band_sig"))
      .select(col("doc_id")).distinct()

  /** STREAMING crawl-by-crawl MinHash dedup — [[incrementalKeep]]'s
    * online twin. Each micro-batch (one crawl file) probes the
    * PERSISTED band-key state of every crawl before it and flags
    * docs sharing any LSH bucket; then ALL the batch's band keys
    * append to the state (flagged docs' too, so a third copy keeps
    * dropping even when its second copy was itself dropped).
    * foreachBatch + a flat parquet band-key table is the production
    * shape: the state is exactly the persistable fingerprint set —
    * (band, band_sig) pairs, never text — and each batch pays only
    * the incremental probe: new-side signatures, one map-side
    * broadcast join of the batch's keys against the state scan (the
    * state never shuffles, never deduplicates — the costs that
    * would grow with stream lifetime), two appends, and an amortized
    * [[compactState]] fold that keeps the file count bounded.
    *
    * Convention matched to [[incrementalKeep]]: docs drop only
    * against EARLIER crawls; within-crawl duplicates both pass
    * (within-crawl dedup is [[minhashKeep]], composable upstream).
    * Batch order is the file-source order (mtime, path) — the query
    * fixture stamps crawl files with ascending mtimes.
    *
    * Output: one row per arriving doc, (doc_id, crawl, kept). */
  def streamIncrementalKeep(spark: org.apache.spark.sql.SparkSession,
                            srcDir: String, workDir: String,
                            maxBucket: Int = DefaultMaxBucket): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("crawl", IntegerType)))
    val stateDir = s"$workDir/state"
    val outDir = s"$workDir/kept"
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    rmrf(new java.io.File(workDir))
    // Batch work runs on a source-scaled clone session (guide §2.2):
    // every inner shuffle (capBuckets' window, the output aggregate)
    // otherwise fans one crawl file's rows across the full session
    // width — pure task tax per micro-batch. Floor 8: the post-shuffle
    // stages still fold real per-row work.
    val sps = graft.ingest.StreamIngest.streamSession(spark, srcDir, 8)
    val q = sps.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        def phase(p: String): Unit =
          sp.sparkContext.setJobDescription(s"stream_minhash: $p")
        // checkpointed once: the same banded rows are probed AND
        // appended — no double signature computation, flat lineage
        phase("band ckpt")
        val banded = capBuckets(
          minhashSignatures(batch)
            .select(col("doc_id"),
              posexplode(col("bands")).as(Seq("band", "band_sig"))),
          Seq("band", "band_sig"), maxBucket)
          .localCheckpoint()
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val haveState = statePath
          .getFileSystem(sp.sparkContext.hadoopConfiguration)
          .exists(statePath)
        val hit =
          if (!haveState) banded.limit(0).select(col("doc_id"))
          else probeState(sp, stateDir, banded)
        // the hit set is ≤ batch docs — broadcast it so the batch
        // never shuffles for its own output row
        phase("out write")
        batch.select(col("doc_id"), col("crawl"))
          .join(broadcast(hit.withColumn("_hit", lit(1))), Seq("doc_id"), "left")
          .select(col("doc_id"), col("crawl"),
            col("_hit").isNull.cast("int").as("kept"))
          .write.mode("append").parquet(outDir)
        // batch keys append FLAT (no partitionBy — the partitioned
        // layout paid 16x files + ~0.3 s/batch commit and pruned
        // nothing), as a MULTISET: the
        // probe tolerates duplicate state keys (its doc_id distinct
        // collapses them) and the state fold's own distinct removes
        // them at the next compaction — so the per-batch distinct()
        // was a pure shuffle tax. Parallelism stays the batch's own
        // (AQE-coalesced) partitioning: a big crawl writes in
        // parallel, and compactState owns the small-file count.
        phase("state append")
        banded.select(col("band_sig"), col("band"))
          .write.mode("append").parquet(stateDir)
        // fold the band's file count back down once it crosses the
        // threshold — without this the append leaves O(batches)
        // small files per band forever and the probe's scan setup
        // (file listing + footer reads) grows with stream lifetime
        // even though its row work stays flat
        phase("compact state")
        compactState(sp, stateDir)
        sp.sparkContext.setJobDescription(null)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }

  /** STREAMING line-level dedup — [[lineDedup]]'s online twin for a
    * crawl-by-crawl pipeline. The persisted state is the line
    * df STATISTIC at (line, crawl, df-in-crawl) grain — never text
    * beyond the lines themselves — and each batch scrubs against the
    * df accumulated over every crawl up to AND INCLUDING itself, so
    * the first crawl behaves exactly like batch [[lineDedup]] and a
    * line crossing minDf in a later crawl starts scrubbing from that
    * crawl on (earlier outputs are already shipped — the
    * incremental contract, same as [[streamIncrementalKeep]]'s
    * earlier-crawls-only drop rule).
    *
    * Idempotence discipline: the state grain is (line, BATCH id,
    * df-in-batch) — df per batch is a FIXED value, so state rows
    * dedup by max() rather than multiset-distinct: a crash between a
    * compaction's rename and delete leaves duplicate rows, and a
    * restarted micro-batch re-appends under the SAME batch id, and
    * both collapse instead of double-counting. Keying by batch (not
    * the crawl column) also keeps the df exact when one crawl
    * arrives split across several source files/batches — each batch
    * contributes its own disjoint doc set. Per batch: one state scan
    * joined to the broadcast batch line set (the state never
    * shuffles), one doc-keyed output aggregate, one append, and the
    * amortized [[compactState]] fold with [[lineDfFold]] plugged in.
    *
    * Output: one row per arriving doc — (doc_id, crawl, n_lines,
    * n_kept, kept_ratio_e6, clean_md5). */
  def streamLineDedup(spark: org.apache.spark.sql.SparkSession,
                      srcDir: String, workDir: String,
                      minDf: Int = 3): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("crawl", IntegerType)))
    val stateDir = s"$workDir/state"
    val outDir = s"$workDir/scrubbed"
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    rmrf(new java.io.File(workDir))
    // NOT width-scaled like [[streamIncrementalKeep]]: the per-doc
    // output aggregate (md5 over the sorted kept lines) is real
    // post-shuffle CPU, and an A/B at width 8 measured ~25% SLOWER
    // than the session width — the narrow-stream tax here is smaller
    // than the lost aggregate parallelism.
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        def phase(p: String): Unit =
          sp.sparkContext.setJobDescription(s"stream_lines: $p")
        // NOT checkpointed: both consumers (the df count and the
        // output aggregate) re-derive the explode from the already-
        // materialized micro-batch — a narrow newline split, cheaper
        // than a per-batch materialization job (unlike the minhash
        // twin, whose signature kernel IS worth checkpointing)
        phase("batchDf ckpt")
        val lines = batch.select(col("doc_id"), col("crawl"),
          posexplode(split(coalesce(col("text"), lit("")), "\n"))
            .as(Seq("ord", "line")))
        val batchDf = lines
          .groupBy(col("line"))
          .agg(countDistinct(col("doc_id")).cast("long").as("dfk"))
          .withColumn("batch", lit(batchId))
          .localCheckpoint()
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val haveState = statePath
          .getFileSystem(sp.sparkContext.hadoopConfiguration)
          .exists(statePath)
        val batchLines = batchDf.select(col("line"))
        val prev =
          if (!haveState)
            batchLines.limit(0).withColumn("df_prev", lit(0L))
          else
            // state scan ⋈ broadcast(batch line set): the state never
            // shuffles; the max-grain fold collapses any crash-left
            // or replay-left duplicates before the sum
            lineDfFold(sp.read.parquet(stateDir)
                // a replayed batch's own earlier append must not count
                .filter(col("batch") =!= batchId)
                .join(broadcast(batchLines), Seq("line")))
              .groupBy(col("line")).agg(sum(col("dfk")).as("df_prev"))
        val boiler = batchDf
          .join(prev, Seq("line"), "left")
          .filter(coalesce(col("df_prev"), lit(0L)) + col("dfk")
            >= minDf)
          .select(col("line"), lit(1).as("is_boiler"))
        phase("out write")
        lines.join(broadcast(boiler), Seq("line"), "left")
          .groupBy(col("doc_id"), col("crawl"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("is_boiler").isNull, 1L).otherwise(0L))
              .as("n_kept"),
            md5(concat_ws("\n", expr(
              "transform(array_sort(collect_list(" +
                "CASE WHEN is_boiler IS NULL THEN struct(ord, line) END))," +
                " x -> x.line)"))).as("md5_raw"))
          .select(col("doc_id"), col("crawl"), col("n_lines"),
            col("n_kept"),
            expr("CAST(n_kept * 1000000 DIV n_lines AS BIGINT)")
              .as("kept_ratio_e6"),
            when(col("n_kept") > 0, col("md5_raw")).as("clean_md5"))
          // replay-idempotent output: a restarted micro-batch (crash
          // after the write, before the checkpoint commit) OVERWRITES
          // its own batch directory instead of appending a duplicate
          // row set — the output-side twin of the state fold's
          // (line, batch) max idempotence
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        phase("state append")
        batchDf.write.mode("append").parquet(stateDir)
        phase("compact state")
        compactState(sp, stateDir, lineDfFold)
        sp.sparkContext.setJobDescription(null)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // partition discovery adds the batch=N directory column; the
    // caller-facing schema stays the per-doc shape
    spark.read.parquet(outDir).drop("batch")
  }

  /** The line-df state's dedup fold: max at the (line, batch) grain.
    * df per (line, batch) is a fixed value, so duplicates left by a
    * compaction crash or a replayed micro-batch collapse instead of
    * double-counting — the idempotence [[streamLineDedup]]'s
    * exactness rests on. Shared with the specs and ScaleSmoke so
    * they exercise the production fold, not a copy. */
  private[graft] val lineDfFold: DataFrame => DataFrame =
    _.groupBy(col("line"), col("batch")).agg(max(col("dfk")).as("dfk"))

  /** File-count threshold [[compactState]] folds at. Low enough
    * that a probe never lists/opens more than ~2× this many files;
    * high enough that a fold isn't paid every batch. */
  private[graft] val StateCompactFiles = 8

  /** Fold the dedup state's small appended files back down — the
    * growth term the per-batch append leaves behind (one file set
    * per micro-batch, forever).
    *
    * Two-tier merge, NOT merge-everything: when the table crosses
    * the file threshold, its files EXCEPT the largest (the "base")
    * merge into one distinct'd file; the base joins the merge only
    * once the accumulated smalls reach half its size. Every key is
    * thus rewritten O(log batches) times over a stream's lifetime
    * (the base roughly doubles between full folds) instead of the
    * O(batches) a merge-all-at-threshold policy pays — the
    * difference between a compaction bill that stays proportional
    * to ingest and one that goes quadratic on a long-running crawl.
    * The fold's output file count is sized from its INPUT bytes
    * (~one file per 128 MB, floor 1) — AQE's parallelism-first
    * coalescing would otherwise keep default-parallelism many tiny
    * parts and re-trip the threshold forever; a huge state still
    * writes in parallel, one task per 128 MB.
    *
    * Crash-safe without a manifest: the merged files land in the
    * table FIRST (written to a _tmp dir Spark owns, then renamed
    * in), and the source files are deleted after. A crash between
    * the two leaves duplicate keys, which the probe's multiset
    * contract already tolerates and the next fold removes. Runs
    * inside foreachBatch, so no reader races the swap (the next
    * batch's probe starts after this returns). */
  private[graft] def compactState(sp: org.apache.spark.sql.SparkSession,
                                  stateDir: String,
                                  fold: DataFrame => DataFrame = _.distinct()): Unit = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(sp.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val files = fs.listStatus(root)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
    if (files.length < StateCompactFiles) return
    val largest = files.maxBy(_.getLen)
    val smalls = files.filter(_.getPath != largest.getPath)
    val fullFold = smalls.iterator.map(_.getLen).sum >= largest.getLen / 2
    val toMerge = if (fullFold) files else smalls
    val tmp = new org.apache.hadoop.fs.Path(stateDir, "_tmp_compact")
    fs.delete(tmp, true)
    val targetParts = math.max(1L,
      toMerge.iterator.map(_.getLen).sum >> 27).toInt // / 128 MiB
    fold(sp.read.parquet(toMerge.map(_.getPath.toString).toIndexedSeq: _*))
      .coalesce(targetParts)
      .write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    if (parts.nonEmpty) {
      val stamp = System.nanoTime()
      // move ALL folded parts into place before deleting any source:
      // a failed rename must abort (leaving sources intact) or the
      // fold's fingerprints are silently lost and future duplicates
      // are wrongly kept
      parts.foreach { pf =>
        val dst = new org.apache.hadoop.fs.Path(root,
          s"compact-$stamp-${pf.getPath.getName}")
        if (!fs.rename(pf.getPath, dst))
          throw new java.io.IOException(
            s"compactState: move ${pf.getPath} -> $dst failed")
      }
      toMerge.foreach(f => fs.delete(f.getPath, false))
    }
    fs.delete(tmp, true)
  }

  /** Connected components over near-duplicate candidate pairs — the
    * union-find step between pair DETECTION (minhash/simhash emit
    * pairs) and cluster-level dedup POLICY (keep exactly one doc per
    * duplicate CLUSTER). [[minhashKeep]]'s greedy bucket-min
    * under-merges clusters that chain across buckets (A~B in one
    * bucket, B~C in another: greedy may keep both A and C);
    * components follows the chain to a single representative.
    *
    * Spark-first union-find: iterative MIN-LABEL PROPAGATION (the
    * MapReduce connected-components pattern) — every node starts as
    * its own component; each round every node takes the min of its
    * own label and its neighbors'; fixpoint after diameter rounds.
    * Near-duplicate clusters are shallow (duplicates of a common
    * source pair with each other — diameters of 2-4), so the loop is
    * 3-5 rounds of two hash-shuffles each, all keyed by doc id; no
    * driver-side graph ever materializes, and each round's frame is
    * persisted + the previous unpersisted so lineage stays flat. The
    * convergence probe shares the round's own materialization. At
    * web scale the known refinement is alternating large-star/
    * small-star (same ops, provably O(log n) rounds); plain min
    * propagation is the right trade below that.
    *
    * Returns one row per distinct doc id appearing in `pairs`:
    * (doc_id, component) with component = min doc id reachable.
    * Throws after `maxIters` without a fixpoint (never observed at
    * sane diameters — a guard, not a tuning knob). */
  def components(pairs: DataFrame, aCol: String = "doc_a",
                 bCol: String = "doc_b", maxIters: Int = 25,
                 onRounds: Int => Unit = _ => ()): DataFrame = {
    // Iterative-algorithm discipline: every round ends in an EAGER
    // localCheckpoint. Persisting alone caches row data but leaves
    // the LOGICAL plan growing — each round references the previous
    // frame twice (union+join), so the plan TREE doubles per round
    // and Catalyst itself OOMs by round ~20 even on a toy graph
    // (measured). localCheckpoint truncates lineage to the
    // materialized partitions, keeping every round's plan flat.
    // materialize the pair plan ONCE — edges and labels each scan it
    // twice, and upstream pair generation (an LSH band join) is the
    // expensive part of the whole operator
    val p0 = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val edges = p0.select(col("a").as("src"), col("b").as("dst"))
      .union(p0.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var labels = p0.select(col("a").as("id"))
      .union(p0.select(col("b").as("id")))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // Convergence tracks Σcomp (decimal — id sums can pass 2^63 at
    // scale): labels only ever DECREASE, so the sum strictly drops
    // while anything changes and a repeated sum IS the fixpoint —
    // one single-row aggregate per round, no extra join.
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var prev = checksum(labels)
    var it = 0
    var done = false
    while (!done) {
      if (it >= maxIters)
        throw new IllegalStateException(
          s"components: no fixpoint after $maxIters rounds")
      val msgs = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
      // checkpoint BEFORE the pointer-jump self-join: a self-join of
      // the raw aggregation plan trips Catalyst's relation dedup
      // (ambiguous attribute ids); a materialized LogicalRDD
      // self-joins cleanly and the round needs the rows anyway
      val next = labels.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      // pointer jumping: comp := min(comp, comp's own comp) —
      // chain lengths HALVE per round on top of the neighbor step,
      // so convergence is logarithmic in the diameter instead of
      // linear (the difference between 5 and 20 rounds on stringy
      // near-dup graphs)
      val jumped = next
        .join(next.toDF("comp", "cc"), Seq("comp"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("cc"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val cur = checksum(jumped)
      labels = jumped
      done = cur.compareTo(prev) == 0
      prev = cur
      it += 1
    }
    onRounds(it)
    labels.select(col("id").as("doc_id"), col("comp").as("component"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", 2014 — the web-scale refinement [[components]]'s
    * doc notes). Each round: large-star rewires every node's
    * STRICTLY-LARGER neighbors onto m(u) = min(N(u) ∪ {u});
    * small-star rewires the ≤-u neighbors (and u itself) onto m(u).
    * Both steps preserve connectivity, never grow the edge set, and
    * the alternation provably converges in O(log² n) rounds (O(log n)
    * observed) REGARDLESS of graph shape — where min-label
    * propagation's per-round message volume is the full frontier
    * edge set and its round count the (jump-halved) diameter. At
    * fixpoint every component is a star whose center is its global
    * minimum id (a center is smaller than all its leaves, so only
    * the global min can be one) — so the output labeling equals
    * [[components]]' exactly, row for row.
    *
    * Same iterative discipline as [[components]]: every round ends
    * in an eager localCheckpoint (flat lineage — the star steps
    * reference each round's frame three times), and convergence
    * compares a per-round decimal checksum triple (edge count, Σlo,
    * Σhi): the transition is a deterministic function of the edge
    * set, so a repeated state IS the fixpoint.
    *
    * Scale shape per round: two groupBy-min aggregations and two
    * equi-joins, all on node ids (map-side combinable), no windows,
    * no driver-side graph; edges always point larger→smaller so the
    * working set shrinks toward one edge per non-root node. */
  def componentsStars(pairs: DataFrame, aCol: String = "doc_a",
                      bCol: String = "doc_b", maxIters: Int = 50,
                      onRounds: Int => Unit = _ => ()): DataFrame = {
    val p0 = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    // canonical undirected edges (lo < hi); self-loops drop
    var edges = p0.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()
      .localCheckpoint(true)

    def canonical(df: DataFrame): DataFrame =
      df.select(least(col("x"), col("m")).as("lo"),
          greatest(col("x"), col("m")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()

    // large-star(u): neighbors v > u attach to m(u)
    def largeStar(e: DataFrame): DataFrame = {
      val adj = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = adj.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      canonical(adj.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("x"), col("m")))
    }

    // small-star(u): neighbors v < u (every canonical edge directed
    // larger→smaller) AND u itself attach to m(u) = min neighbor
    def smallStar(e: DataFrame): DataFrame = {
      val adj = e.select(col("hi").as("u"), col("lo").as("v"))
      val mins = adj.groupBy(col("u")).agg(min(col("v")).as("m"))
      canonical(adj.join(mins, "u")
        // one pass emits both (v, m) and (u, m) — no second join
        .select(explode(array(col("v"), col("u"))).as("x"), col("m")))
    }

    def checksum(e: DataFrame): Seq[java.math.BigDecimal] = {
      val r = e.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        coalesce(sum(col("lo").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("sl"),
        coalesce(sum(col("hi").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("sh")).head()
      Seq(r.getDecimal(0), r.getDecimal(1), r.getDecimal(2))
    }

    var prev = checksum(edges)
    var it = 0
    var done = prev.head.signum == 0 // no edges at all: nothing to do
    while (!done) {
      if (it >= maxIters)
        throw new IllegalStateException(
          s"componentsStars: no fixpoint after $maxIters rounds")
      val ls = largeStar(edges).localCheckpoint(true)
      val next = smallStar(ls).localCheckpoint(true)
      val cur = checksum(next)
      edges = next
      done = cur == prev
      prev = cur
      it += 1
    }
    onRounds(it)
    // fixpoint stars: every non-center node appears as exactly one
    // edge's hi with its center as lo (min() is belt-and-braces)
    val centers = edges.groupBy(col("hi"))
      .agg(min(col("lo")).as("component"))
      .withColumnRenamed("hi", "doc_id")
    p0.select(col("a").as("doc_id")).union(p0.select(col("b").as("doc_id")))
      .distinct()
      .join(centers, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
  }

  /** [[components]] over the MinHash band-bucket pairs, widened to
    * every document: docs outside any pair are their own singleton
    * component; kept = the cluster representative (min doc id). The
    * cluster-policy output a corpus-prep pipeline feeds to its final
    * keep/drop filter. */
  def minhashComponents(documents: DataFrame,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val comp = components(minhashCandidatePairs(documents, maxBucket))
    documents.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("kept", (col("component") === col("doc_id")).cast("int"))
  }

  /** [[minhashComponents]] with the star-contraction union-find —
    * identical labeling (both answer the component minimum), the
    * provable-round-bound variant for adversarial pair graphs. */
  def minhashComponentsStars(documents: DataFrame,
                             maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val comp = componentsStars(minhashCandidatePairs(documents, maxBucket))
    documents.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("kept", (col("component") === col("doc_id")).cast("int"))
  }

  /** Benchmark decontamination — the held-out-eval hygiene pass a
    * training pipeline runs before every model: a training document
    * is CONTAMINATED when it shares any word-level n-gram with the
    * benchmark set. One row per training document:
    * (doc_id, n_hit_grams, contaminated), where n_hit_grams counts
    * this doc's distinct grams that appear anywhere in the benchmark.
    *
    * Scale shape: the benchmark corpus is tiny next to training data
    * (MBs of eval suites vs 100 TB), so its distinct gram-hash set
    * BROADCASTS and the training-side gram stream joins map-side —
    * candidate generation never shuffles the corpus; the only
    * exchanges are the per-doc hit count and the final doc_id join,
    * both keyed by doc_id. Gram hashes ride the portable 60-bit
    * scheme (8 bytes each, never gram text). A production run swaps
    * the exact broadcast set for a Bloom filter at the same plan
    * shape when the benchmark suite outgrows executor memory. */
  def decontaminate(documents: DataFrame, isBench: Column, n: Int = 4): DataFrame = {
    val terms = (0 until n).map(j => s"words[i+$j]").mkString(", ")
    val grams = documents
      .withColumn("is_bench", isBench)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"), col("is_bench"), explode(expr(
        s"array_distinct(transform(sequence(0, size(words)-$n), i -> concat_ws(' ', $terms)))"))
        .as("g"))
      .select(col("doc_id"), col("is_bench"), expr(hash60SqlSpark("g")).as("h"))
    val benchSet = grams.filter(col("is_bench")).select(col("h")).distinct()
    val hits = grams.filter(!col("is_bench"))
      .join(broadcast(benchSet), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_grams"))
    documents.filter(!isBench).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** C4-style repeated-span scrub (the T5 corpus pipeline,
    * arXiv:1910.10683 §2.2, removed any three-sentence span occurring
    * more than once in the dataset): the text splits into
    * NON-OVERLAPPING `window`-word chunks, every chunk whose exact
    * content occurs ≥ `minCount` times corpus-wide (occurrences, not
    * distinct docs) is removed from every document, and the
    * survivors rejoin in order. Emits (doc_id, text_clean, n_chunks,
    * n_removed) — n_removed > 0 rows are the boilerplate carriers.
    *
    * Scale shape: chunking is a per-row transform on the corpus scan
    * (no word explode); the frequent-set build is a map-side-combined
    * count over exploded chunk HASHES (8-byte integers — chunk text
    * never shuffles). Membership is decided at the (doc_id, pos,
    * hash) level: hash rows join the frequent set (AQE broadcasts it
    * while it fits — the common Zipf-head case), the REMOVED
    * positions re-aggregate per doc, and the per-doc removal list
    * joins back (again broadcast while small) so the final scrub is
    * an in-row index filter. Work is O(corpus + removed positions)
    * in every regime — a boilerplate-heavy corpus whose blocklist is
    * huge degrades to ordinary shuffle joins instead of the
    * O(corpus × |blocklist|) scan a broadcast-array membership test
    * would pay (measured: the m=4 ScaleSmoke replication, where
    * EVERY chunk is frequent, stays linear). */
  def scrubRepeatedSpans(documents: DataFrame, window: Int = 8,
                         minCount: Int = 3): DataFrame = {
    val chunked = documents
      .withColumn("toks", split(coalesce(col("text"), lit("")), " "))
      .withColumn("chunks", expr(
        s"transform(sequence(0, (size(toks) - 1) DIV $window), " +
        s"i -> concat_ws(' ', slice(toks, i * $window + 1, $window)))"))
      .select(col("doc_id"), col("chunks"))
    val hashes = chunked.select(col("doc_id"),
      posexplode(expr(s"transform(chunks, c -> ${hash60SqlSpark("c")})"))
        .as(Seq("pos", "h")))
    val freq = hashes
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("h"))
    val removed = hashes.join(freq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("rm"))
    chunked.join(removed, Seq("doc_id"), "left")
      .withColumn("rm",
        coalesce(col("rm"), expr("CAST(array() AS ARRAY<INT>)")))
      .select(col("doc_id"),
        expr("array_join(filter(chunks, (c, i) -> NOT array_contains(rm, i)), ' ')")
          .as("text_clean"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("rm")).cast("long").as("n_removed"))
  }

  /** Repeated-substring DISCOVERY, the Lee-et-al exact-substring
    * dedup product (Deduplicating Training Data Makes Language
    * Models Better, 2022) at word-window granularity: every
    * OVERLAPPING `window`-word span (stride 1 — catches repeats at
    * ANY alignment, unlike [[scrubRepeatedSpans]]'s fixed chunk
    * grid) hashes portably; a span hash appearing in ≥ `minDocs`
    * DISTINCT documents marks duplicated corpus text (within-doc
    * repetition alone is [[graft.llm.TextAnalysis]] repetition
    * territory, not boilerplate); per document the flagged windows
    * merge into MAXIMAL spans (gaps-and-islands: windows whose
    * starts sit ≤ `window` apart overlap or touch). One row per
    * maximal span: (doc_id, span_start, span_end) in 0-based word
    * indices, end exclusive, plus the window count it merged.
    *
    * Scale shape: stride-1 windowing is a ×window row blow-up, but
    * only (h, doc_id, pos) triples ever shuffle — never text; the
    * doc-frequency gate is a two-phase distinct-count on the hash
    * key; the islands window partitions by doc over the repeated
    * subset only (boilerplate hits, not the corpus). A suffix array
    * is the single-node refinement; window hashing is the
    * distributable approximation (repeats shorter than `window`
    * words are invisible — the paper's own length floor). */
  def repeatedSubstringSpans(documents: DataFrame, window: Int = 8,
                             minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    // the window-hash pass is the operator's expensive leg (per-token
    // slice + md5 per position) and BOTH consumers below need it (the
    // frequency gate and the join back) — materialize it once instead
    // of running the shingling twice (the text_perplexity
    // one-derivation rule; rows are skinny (doc_id, pos, h) triples,
    // linear in token count)
    val wins = documents
      .withColumn("toks", split(coalesce(col("text"), lit("")), " "))
      .select(col("doc_id"),
        posexplode(expr(
          s"CASE WHEN size(toks) >= $window THEN " +
          s"transform(sequence(0, size(toks) - $window), i -> ${
            Portable.hash60SqlSpark(s"concat_ws(' ', slice(toks, i + 1, $window))")}) " +
          "ELSE CAST(array() AS ARRAY<BIGINT>) END"))
          .as(Seq("pos", "h")))
      .localCheckpoint()
    val freq = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val byDoc = W.partitionBy(col("doc_id")).orderBy(col("pos"))
    wins.join(freq, Seq("h"))
      .select(col("doc_id"), col("pos"))
      .withColumn("brk",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") > lag(col("pos"), 1).over(byDoc) + window, 1)
          .otherwise(0))
      .withColumn("grp", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + window).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  val SimBits = 60   // portable hash width
  val SimBands = 4   // 4 bands × 15 bits for candidate bucketing

  /** doc_id + 60-bit SimHash over (duplicated) tokens: bit i set when
    * Σ_tokens (2·bit_i(h60(t)) − 1) > 0 — one per-row pass through
    * the codegen'd [[graft.functions.SimHash]] kernel (no token
    * explode, no 60-bit-sum aggregate, NO SHUFFLE: the signature
    * build is a map over the corpus scan, same as MinHash). */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        expr("graft_simhash(split(text, ' '))").as("simhash"))
  }

  /** SimHash near-dup pairs: band on 15-bit slices, verify hamming
    * distance ≤ maxHamming via bit_count(xor).
    *
    * Pair dedup is FIRST-MATCH, not distinct: both join sides carry
    * the full (8-byte) simhash, so a pair that collides in several
    * bands is emitted only from the lowest matching band — a codegen'd
    * bit-compare filter per band hit — and the multi-million-row
    * distinct exchange the clustered corpus used to pay disappears
    * (the output row set is identical). Under an ACTIVE bucket cap
    * this drops a pair whose lowest-band bucket was capped even if a
    * later band matched — acceptable: LSH candidate recall is
    * approximate by construction and a capped bucket carries no
    * similarity signal. */
  def simhashPairs(documents: DataFrame, maxHamming: Int,
                   maxBucket: Int = DefaultMaxBucket): DataFrame =
    hamming60Pairs(simhashSignatures(documents), "simhash",
      maxHamming, maxBucket)

  /** Banded hamming LSH over ANY 60-bit signature column (SimHash,
    * the multimodal perceptual hash): 4 bands × 15 bits generate
    * candidates on band equality; pairs verify at
    * bit_count(xor) <= maxHamming. The first-matching-band filter
    * dedups multi-band hits without a distinct exchange; hamming is
    * filtered per band hit, before any exchange — at scale most
    * candidate pairs die without ever shuffling. */
  private[graft] def hamming60Pairs(sigs: DataFrame, sigCol: String,
                                    maxHamming: Int,
                                    maxBucket: Int): DataFrame = {
    val banded = capBuckets(
      sigs.select(col("doc_id"), col(sigCol).as("sig60"),
        posexplode(expr(
          s"transform(sequence(0, ${SimBands - 1}), b -> ($sigCol >> (b * 15)) & 32767)"))
          .as(Seq("band", "band_val"))),
      Seq("band", "band_val"), maxBucket)
    val firstMatch = (0 until SimBands - 1).map { b =>
      s"WHEN ((a.sig60 >> ${b * 15}) & 32767) = ((b.sig60 >> ${b * 15}) & 32767) THEN $b"
    }.mkString("CASE ", " ", s" ELSE ${SimBands - 1} END")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(expr(s"a.band = ($firstMatch)"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sig60 ^ b.sig60)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Query-param keys a crawl pipeline strips before URL identity:
    * tracking/session noise that multiplies one page into thousands
    * of "distinct" URLs. The standard scrub list (utm_* campaign
    * tags, Facebook/Google/Microsoft click ids, Mailchimp/Instagram
    * ids, bare ref tags). */
  private val TrackingParamRe =
    "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)(=|$)"

  /** RFC-3986-flavored URL canonicalization as ONE pure per-row
    * column expression (whole-stage-codegen'd, zero UDFs): the
    * normalization every web-crawl pipeline runs BEFORE content
    * dedup, because crawl frontiers hand the fetcher millions of
    * spellings of the same page.
    *
    *   - scheme and host lowercase (RFC 3986 §6.2.2.1 case norm)
    *   - default port stripped (:80 for http, :443 for https)
    *   - fragment dropped (never sent to the server)
    *   - trailing slashes trimmed from the path (path CASE is kept —
    *     it's significant; `https://x.com/` folds to `https://x.com`)
    *   - query: tracking params ([[TrackingParamRe]]) and empty
    *     fragments removed, survivors sorted byte-wise and rejoined —
    *     param ORDER never distinguishes two URLs
    *
    * Malformed input degrades, never throws: a string with no
    * `scheme://` canonicalizes to `://` + its lowercased head, which
    * simply dedups against other copies of the same malformed
    * string. */
  /** The shared (scheme, host, rest-after-authority) derivation both
    * canonical columns build on — ONE place for the scheme regex,
    * authority extract, and default-port strip, so URL identity and
    * host grouping can never desync. */
  private def schemeHostRest(u: Column): (Column, Column, Column) = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    (scheme, host, rest)
  }

  def canonicalUrl(u: Column): Column = {
    val (scheme, host, rest) = schemeHostRest(u)
    val pathq = regexp_replace(rest, "^[^/?#]*", "")
    // fragment strips FIRST: a '?' inside the fragment must not be
    // read as a query start
    val noFrag = regexp_extract(pathq, "^([^#]*)", 1)
    val path =
      regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)", 1)
    val kept = array_join(array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** The host part of [[canonicalUrl]] — the crawl-frontier grouping
    * key, derived by the same [[schemeHostRest]]. */
  def canonicalHost(u: Column): Column = schemeHostRest(u)._2

  /** Exact dedup on the canonical URL: keep the smallest doc_id per
    * canonical form, count the copies. The step web pipelines run
    * before any content dedup — it removes the crawl's largest and
    * cheapest duplicate class with one per-row expression and ONE
    * hash-groupBy (map-side combined; at 100 TB the exchange carries
    * (canonical_url, doc_id) pairs, never text). */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.select(col("doc_id"), canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).cast("long").as("n_copies"))

  /** Per-host duplication statistics — the crawl-frontier health
    * metric (a host whose fetches collapse heavily after
    * canonicalization is burning crawl budget on URL aliases).
    * Same single-exchange shape as [[urlDedup]], grouped one level
    * up. */
  def urlHostStats(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.select(canonicalHost(col(urlCol)).as("host"),
        canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("host"))
      .agg(count(lit(1)).cast("long").as("n_fetches"),
        countDistinct(col("canonical_url")).cast("long").as("n_pages"))
      .withColumn("dup_ratio_e6",
        expr("(n_fetches - n_pages) * 1000000 DIV n_fetches"))
}
