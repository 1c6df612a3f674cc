package graft.llm

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training and encoding over a document
  * corpus — the operator a training-data pipeline runs before it can
  * even COUNT tokens honestly. No reference-repo analogue (the
  * reference delegates nothing like this); semantics follow the
  * classic byte-pair-encoding algorithm (Sennrich et al. 2016, and
  * the GPT-2 practice of never merging across word boundaries).
  *
  * Scale design — the whole point at 100 TB:
  *
  *  - **Corpus-sized work happens exactly once**: the word-frequency
  *    count (one shuffle of (word, 1) pairs, map-side combined).
  *    Everything after runs on the DISTINCT-WORD table, which Zipf
  *    collapses to a vanishing fraction of the corpus (billions of
  *    running words → millions of types). This is the same
  *    reduction SentencePiece/HF trainers exploit in one process —
  *    here it is what makes each merge round a small Spark job
  *    instead of a corpus scan.
  *  - **One merge round = one aggregation over the vocab**: adjacent
  *    pairs explode from each type's symbol array weighted by type
  *    frequency, groupBy(pair).sum — a shuffle of pair keys only.
  *    The argmax row (ONE row) comes to the driver; the merge
  *    applies as a narrow per-row fold (codegen'd higher-order
  *    `aggregate`, no UDF), so rounds don't grow the plan — the
  *    vocab is `localCheckpoint`ed every round (lineage stays flat;
  *    the exponential-plan lesson from Dedup.components).
  *  - **Encoding never touches the corpus per merge**: distinct
  *    words encode once through the ranked merge list (k narrow
  *    folds over the vocab table), then a broadcast join maps each
  *    corpus word to its token count. The corpus is read once.
  *
  * Determinism contract (both engines reproduce it exactly): ties on
  * pair count break by (left, right) lexicographic order — where
  * HF's trainer breaks ties by insertion order, this engine defines
  * the order so any implementation (and the DuckDB oracle) agrees.
  * Merge application replaces occurrences LEFT-TO-RIGHT without
  * overlap, the standard scan.
  */
object Tokenizer {

  /** Lowercased alphabetic word extraction — deliberately the
    * simplest cross-engine-identical pre-tokenization (Java and RE2
    * agree on `[a-z]+`); BPE merges never cross these boundaries. */
  private val WordRe = "[a-z]+"

  /** (word, freq) types of the corpus — the ONE corpus-sized job. */
  def wordFreqs(documents: DataFrame): DataFrame =
    documents
      .select(explode(expr(
        s"regexp_extract_all(lower(text), '$WordRe', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol array: the named word column's characters. */
  private def charSyms(name: String): Column =
    expr(s"transform(sequence(1, length($name)), i -> substring($name, i, 1))")

  /** One left-to-right non-overlapping merge (a,b)→ab applied to a
    * symbol array — a codegen'd fold: append x, unless the running
    * tail is `a` and x is `b`, in which case the tail becomes `ab`.
    * (After a merge the tail is `ab` ≠ `a`, so the fold cannot
    * overlap replacements — exactly the standard scan.) */
  private[llm] def applyMerge(syms: Column, a: String, b: String): Column =
    F.aggregate(
      syms,
      lit(Array.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `k` BPE merges over the corpus; answers the ranked merge
    * table (rank, l, r, cnt) — cnt is the weighted pair count at
    * selection time, the trainer's own audit trail. Stops early when
    * no pair occurs at least `minFreq` times. */
  def trainBpe(documents: DataFrame, k: Int, minFreq: Long = 2L): DataFrame = {
    val spark = documents.sparkSession
    var vocab = wordFreqs(documents)
      .select(col("word"), col("freq"), charSyms("word").as("syms"))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val best = vocab
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minFreq) done = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        val cnt = best(0).getLong(2)
        merges += ((rank, l, r, cnt))
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true) // flat lineage, one plan per round
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "l", "r", "cnt")
      .select(col("rank").cast("long").as("rank"), col("l"), col("r"),
        col("cnt"))
  }

  /** The trained vocabulary: every surviving symbol with its
    * weighted corpus occurrence count — the artifact a tokenizer
    * ships. Same distinct-word shape as training; the corpus never
    * re-scans. */
  def bpeVocab(documents: DataFrame, k: Int): DataFrame = {
    val ms = trainBpe(documents, k).select("rank", "l", "r")
      .orderBy("rank").collect()
      .map(row => (row.getString(1), row.getString(2)))
    var enc = wordFreqs(documents)
      .select(col("word"), col("freq"), charSyms("word").as("syms"))
    for ((l, r) <- ms) enc = enc.withColumn("syms", applyMerge(col("syms"), l, r))
    enc.select(explode(col("syms")).as("token"), col("freq"))
      .groupBy("token").agg(sum(col("freq")).as("n_occurrences"))
  }

  /** Encode the corpus with `k` trained merges and answer per-doc
    * token counts (doc_id, n_tokens). Distinct words encode ONCE
    * (k narrow folds over the vocab); the corpus then joins the
    * tiny word→count table — broadcast at any corpus scale. */
  def tokenCountsBpe(documents: DataFrame, k: Int): DataFrame = {
    val ms = trainBpe(documents, k).select("rank", "l", "r")
      .orderBy("rank").collect()
      .map(row => (row.getString(1), row.getString(2)))
    val words = documents
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(lower(text), '$WordRe', 0)"))
          .as("word"))
    var enc = words.select(col("word")).distinct()
      .select(col("word"), charSyms("word").as("syms"))
    for ((l, r) <- ms) enc = enc.withColumn("syms", applyMerge(col("syms"), l, r))
    val counts = enc.select(col("word").as("w"),
      size(col("syms")).cast("long").as("n_word_tokens"))
    words.join(broadcast(counts), words("word") === counts("w"))
      .groupBy("doc_id")
      .agg(sum(col("n_word_tokens")).as("n_tokens"))
  }
}
