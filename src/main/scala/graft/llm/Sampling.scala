package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment over a keyed corpus —
  * the data-mixing primitives a training pipeline runs in front of
  * every job. Spark's `Dataset.sample` draws per-partition random
  * numbers: the subset changes with partitioning, retries, and runs,
  * which is unacceptable for held-out splits (a val document that
  * drifts into train between runs silently leaks). Here membership is
  * a pure function of (salt, key) via the portable 60-bit md5 hash
  * ([[Portable.hash60SqlSpark]]), so:
  *  - the same corpus always yields the same split, on any cluster
  *    topology, at any scale;
  *  - different salts give independent samples (epoch subsets,
  *    ablation slices) without coordination;
  *  - it is a narrow per-row projection/filter — no shuffle, no
  *    driver state, prunes to (key) at the scan at 100 TB.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) as a pure function of
    * (salt, key column), portable across engines bit-for-bit. */
  def hashBucket(keySql: String, salt: String, buckets: Int): Column =
    expr(s"(${Portable.hash60SqlSpark(s"concat('$salt:', CAST($keySql AS STRING))")}) % $buckets")

  /** Assign every row a stable train/val/test split by key hash:
    * bucket < trainPermille → train, < train+val → val, else test.
    * Emits `bucket` too so downstream re-slicing (finer holdouts,
    * deterministic shards) reuses the same hash. */
  def withSplit(df: DataFrame, keyCol: String, salt: String = "split",
                trainPermille: Int = 800, valPermille: Int = 100): DataFrame =
    df.withColumn("bucket", hashBucket(keyCol, salt, 1000))
      .withColumn("split",
        when(col("bucket") < trainPermille, lit("train"))
          .when(col("bucket") < trainPermille + valPermille, lit("val"))
          .otherwise(lit("test")))

  /** Keep rows whose (salt, key) hash lands under `permille`/1000 —
    * a reproducible sample: stable across runs and cluster layouts,
    * composable (permille 100 of salt s is a superset of permille 50
    * of salt s). */
  def sampleByKey(df: DataFrame, keyCol: String, salt: String,
                  permille: Int): DataFrame =
    df.filter(hashBucket(keyCol, salt, 1000) < permille)

  /** Sequence packing for pre-training batches: documents
    * concatenate in doc_id order within `shards` deterministic
    * shards (shard = doc_id mod shards) and the token stream slices
    * into fixed `capacityTokens` chunks — the standard
    * concat-then-chunk packing, where a document may straddle a
    * chunk boundary. Emits each document's stream offsets and the
    * chunk range it lands in, all pure integer arithmetic off one
    * running sum.
    *
    * Scale shape: the only exchange is the hash partition on shard;
    * the running sum is one window per shard ordered by doc_id, so
    * parallelism = shards (pick shards ≈ cluster cores; each shard's
    * packing is independent, deterministic, and resumable). No
    * global sort, no driver state. */
  def packSequences(documents: DataFrame, capacityTokens: Int = 2048,
                    shards: Int = 8): DataFrame = {
    val n = size(split(coalesce(col("text"), lit("")), " "))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    documents.select(col("doc_id"), n.cast("long").as("n_tokens"))
      .withColumn("shard", expr(s"doc_id % $shards"))
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", col("end_offset") - col("n_tokens"))
      .withColumn("first_chunk", expr(s"start_offset DIV $capacityTokens"))
      .withColumn("last_chunk", expr(s"(end_offset - 1) DIV $capacityTokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_offset"), col("first_chunk"), col("last_chunk"),
        (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks"))
  }

  /** Deterministic token-budget slice: documents take a GLOBAL
    * pseudo-random order (the portable hash, key tiebreak) and keep
    * while their cumulative token count stays under `budgetTokens` —
    * "give me the first 50 B tokens of the shuffled corpus", the
    * curriculum/epoch-slice contract. The kept set is a pure
    * function of (salt, corpus, budget): stable across runs,
    * partitionings, and cluster sizes, and a bigger budget keeps a
    * SUPERSET (slices nest like [[sampleByKey]] permilles). The doc
    * that straddles the boundary is kept (packing-style: its start
    * offset is inside the budget).
    *
    * Scale shape — the classic DISTRIBUTED EXCLUSIVE PREFIX SUM: the
    * hash space range-partitions into `shards` contiguous slabs
    * (order within a shard + shard order = global order), one
    * per-shard running-sum window computes local prefixes, the
    * per-shard TOTALS (a `shards`-row relation) take one bounded
    * single-partition window for their exclusive prefix, and a
    * broadcast join adds the shard offset back. No global sort, no
    * driver state, no collect — two narrow exchanges (the shard
    * hash partition and the tiny totals window) regardless of corpus
    * size. Emits (start_offset, end_offset) in the global stream so
    * the slice is auditable and composable with [[packSequences]]. */
  def tokenBudget(documents: DataFrame, keyCol: String, salt: String,
                  budgetTokens: Long, shards: Int = 64): DataFrame = {
    val slab = Portable.P / shards + 1
    val h = expr(Portable.hash60SqlSpark(s"concat('$salt:', CAST($keyCol AS STRING))"))
    val base = documents
      .withColumn("_h", h)
      .withColumn("_shard", expr(s"_h DIV ${slab}L"))
      .withColumn("n_tokens",
        size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
    val w = Window.partitionBy(col("_shard"))
      .orderBy(col("_h").asc, col(keyCol).asc)
    val local = base.withColumn("_cum", sum(col("n_tokens")).over(w))
    val offsets = local.groupBy(col("_shard"))
      .agg(sum(col("n_tokens")).as("_tot"))
      .withColumn("_off", coalesce(
        sum(col("_tot")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_shard"), col("_off"))
    local.join(broadcast(offsets), "_shard")
      .withColumn("end_offset", col("_cum") + col("_off"))
      .withColumn("start_offset", col("end_offset") - col("n_tokens"))
      .filter(col("start_offset") < budgetTokens)
      .select(col(keyCol), col("n_tokens"), col("start_offset"),
        col("end_offset"))
  }

  /** Deterministic stratified sampling: keep AT MOST `perGroup` rows
    * per group, chosen by (salt, key) hash rank — the language/
    * source-balancing primitive ("at most n docs per language").
    * The pick is a pure function of the group's key set: stable
    * across runs, partitionings, and cluster sizes, and adding or
    * removing one group never changes another group's picks. Hash
    * ties break on the key itself, so the selection is total. Emits
    * `srank` (1-based rank within the group) for downstream
    * sub-slicing.
    *
    * Scale shape: one exchange on the group column for the rank
    * window. Group skew is the 100 TB hazard (a 90%-English corpus
    * puts 90% of rows in ONE window partition — a straggler no AQE
    * setting can split, because a rank window is not a join).
    * `skewThin` (default on) pre-thins each over-quota group by hash
    * THRESHOLD before the rank: one narrow per-group count, then
    * keep rows with hash ≤ P·(64·perGroup/n) — expected 64·perGroup
    * survivors per thinned group, so the window partition is bounded
    * by ~64·perGroup rows no matter how skewed the corpus. The pick
    * set is PROVABLY unchanged unless fewer than perGroup of a
    * group's rows land under the cut — P[Binom(n, 64k/n) < k] ≤
    * e^(−50k) by Chernoff, beyond-cosmic at any quota (and the
    * threshold thins by the same hash ORDER the rank uses, so
    * survivors are exactly the smallest-hash rows — a superset of
    * every pick). Groups at or under 128·perGroup rows skip thinning
    * entirely (exactness by construction, not probability). */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String,
                       salt: String, perGroup: Int,
                       skewThin: Boolean = true): DataFrame = {
    val h = expr(Portable.hash60SqlSpark(s"concat('$salt:', CAST($keyCol AS STRING))"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("srank_h").asc, col(keyCol).asc)
    val withH = df.withColumn("srank_h", h)
    val thinned =
      if (!skewThin) withH
      else {
        val safety = 64L
        // the counts side is |distinct groups| rows (languages,
        // sources — never data-sized): broadcast, zero extra shuffle
        // on the corpus
        val counts = withH.groupBy(col(groupCol))
          .agg(count(lit(1)).as("_gn"))
        withH.join(broadcast(counts), Seq(groupCol))
          .withColumn("_cut",
            when(col("_gn") > lit(2L * safety * perGroup),
              (lit(Portable.P.toDouble) *
                (lit(safety.toDouble * perGroup) / col("_gn"))).cast("long"))
              .otherwise(lit(Long.MaxValue)))
          .filter(col("srank_h") <= col("_cut"))
          .drop("_gn", "_cut")
      }
    thinned
      .withColumn("srank", row_number().over(w))
      .filter(col("srank") <= perGroup)
      .drop("srank_h")
  }

  /** Deterministic domain mixing: a per-`groupCol` keep rate in
    * permille — the corpus-mixture primitive ("all of books, 30% of
    * web, none of the rest"). Rows keep when their (salt, key) hash
    * bucket lands under the group's rate, so a mixture over the same
    * salt COMPOSES with [[sampleByKey]]/[[withSplit]] (a group's 300‰
    * is a superset of its 100‰, and the kept set never depends on
    * partitioning or cluster size). Unlisted groups fall to
    * `defaultPermille`. Emits `keep_rate` for downstream audit.
    *
    * Scale shape: a pure per-row projection + filter — zero
    * exchanges; the rate table folds into the plan as a literal
    * CASE chain (mixtures are a handful of corpus sources, never
    * data-sized). */
  def sampleMixture(df: DataFrame, groupCol: String, keyCol: String,
                    salt: String, permilleByGroup: Map[String, Int],
                    defaultPermille: Int = 0): DataFrame = {
    // sorted fold → deterministic plan text for a given mixture
    val rate = permilleByGroup.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (g, p)) =>
        when(col(groupCol) === g, lit(p)).otherwise(acc)
      }
    df.withColumn("keep_rate", rate.cast("int"))
      .filter(hashBucket(keyCol, salt, 1000) < col("keep_rate"))
  }

  /** Temperature-tempered domain mixing — the multilingual
    * α-sampling every mT5/XLM-R-style corpus uses: a group's target
    * share is q_g ∝ n_g^α, so α < 1 flattens head domains toward the
    * tail; realized as per-group permille keep rates over the same
    * (salt, key) hash, so it composes with [[sampleMixture]] /
    * [[withSplit]] like every sampler here. `budgetPermille` is the
    * corpus-level target size (rate_g = budget·N·q_g/n_g, clamped
    * at 1000 — a tail group the budget over-asks keeps everything).
    *
    * α is dyadic (quarters) so the power is a sqrt CHAIN — sqrt and
    * multiply are correctly-rounded IEEE ops, making n^α
    * bit-identical in any engine where a libm `pow` would not be;
    * Σw/ΣN are group-SORTED folds for the same reason.
    *
    * Scale shape: one tiny per-group count aggregate (map-side
    * combined to #groups rows), rates broadcast back — the corpus
    * itself never shuffles. */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         salt: String, alphaQuarters: Int,
                         budgetPermille: Int): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alphaQuarters=$alphaQuarters must be 1..4 (α = quarters/4)")
    val wExpr = alphaQuarters match {
      case 1 => "sqrt(sqrt(nd))"
      case 2 => "sqrt(nd)"
      case 3 => "sqrt(nd) * sqrt(sqrt(nd))"
      case _ => "nd"
    }
    // one counts pass: the group rows collect into ONE sorted array,
    // totals come from folds over it, and the rates explode back out
    // — the rate table never re-reads the corpus
    val rates = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"))
      .withColumn("nd", col("n_g").cast("double"))
      .withColumn("w", expr(wExpr))
      .agg(sort_array(collect_list(struct(col(groupCol).as("g"),
        col("w"), col("n_g")))).as("gs"))
      .select(
        expr("aggregate(gs, CAST(0.0 AS DOUBLE), (a, x) -> a + x.w)")
          .as("w_tot"),
        expr("aggregate(gs, CAST(0 AS BIGINT), (a, x) -> a + x.n_g)")
          .as("n_tot"),
        explode(col("gs")).as("gx"))
      .select(col("gx.g").as(groupCol),
        expr(s"CAST(least(1000.0D, floor($budgetPermille * " +
          "CAST(n_tot AS DOUBLE) * gx.w / " +
          "(w_tot * CAST(gx.n_g AS DOUBLE)))) AS INT)").as("keep_rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashBucket(keyCol, salt, 1000) < col("keep_rate"))
  }

  /** DSIR-style importance weighting (arXiv:2302.03169): score every
    * document by how much its hashed-unigram bag looks like a TARGET
    * slice of the corpus versus the raw distribution. Features are
    * words hashed into `buckets` counts (the paper's hashed n-gram
    * generative model); both distributions get add-1 smoothing; the
    * document's log importance weight is
    * Σ_b c_doc[b]·(ln p_target[b] − ln p_raw[b]) — positive means
    * "more target-like than raw", the resampling key DSIR draws by.
    *
    * Scale shape: one token explode feeding (a) a per-(doc, bucket)
    * map-side-combinable count and (b) ONE bucket-keyed global count
    * carrying the target leg as a conditional sum — at most
    * `buckets` rows, from which the corpus totals also derive, so
    * the model costs one corpus pass and the whole op two. Scoring
    * is the token scan plus one broadcast join; nothing pairwise,
    * nothing driver-side. The per-doc sum folds over a sorted
    * ≤`buckets` array so the double result is bit-deterministic
    * regardless of partitioning (same discipline as the
    * CORDIC/perplexity ops). */
  def dsirWeights(documents: DataFrame,
                  targetSources: Seq[String] = Seq("src0", "src1"),
                  buckets: Int = 64): DataFrame = {
    val words = documents
      .select(col("doc_id"), col("source"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .withColumn("b", expr(s"(${Portable.hash60SqlSpark("w")}) % $buckets"))
    val docCounts = words
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val bucketCounts = words
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("source").isin(targetSources: _*), 1L).otherwise(0L))
          .as("ct"))
    // nr/nt are exactly the column sums of the ≤buckets-row table —
    // a global window over ≤64 rows, not another corpus pass (and
    // not a second reference to bucketCounts, which would re-scan)
    val all = Window.partitionBy()
    val model = bucketCounts
      .withColumn("nr", sum(col("cr")).over(all))
      .withColumn("nt", sum(col("ct")).over(all))
      .select(col("b"), expr(
        s"ln((CAST(ct AS DOUBLE) + 1.0D) / (CAST(nt AS DOUBLE) + $buckets.0D))" +
          s" - ln((CAST(cr AS DOUBLE) + 1.0D) / (CAST(nr AS DOUBLE) + $buckets.0D))")
        .as("log_ratio"))
    docCounts.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sort_array(collect_list(struct(col("b"), col("c"), col("log_ratio"))))
        .as("xs"))
      .select(col("doc_id"), col("source"),
        expr("aggregate(xs, CAST(0 AS BIGINT), (a, x) -> a + x.c)")
          .as("n_words"),
        expr("round(aggregate(xs, CAST(0.0 AS DOUBLE)," +
          " (a, x) -> a + CAST(x.c AS DOUBLE) * x.log_ratio), 6)")
          .as("log_weight"))
      .withColumn("is_target_like",
        (col("log_weight") > 0.0).cast("int").cast("long"))
  }

  /** The discriminative twin of [[dsirWeights]] / text_perplexity —
    * the quality-classifier leg CCNet/GPT-3-style pipelines pair
    * with the LM filter: a logistic regression over the SAME hashed
    * unigram-bucket features, trained by `steps` full-batch gradient
    * steps against the "is this doc from a target source" label,
    * scoring every document's target-like probability.
    *
    * EXACT-INTEGER training (the kmeans discipline): features snap
    * to e6 integers (x_e6 = bucket count ·1e6 ∕ doc words), weights
    * live as e9 integers, the per-doc logit numerator and the
    * per-bucket gradients are INTEGER sums — associative, so plain
    * distributed aggregation is bit-deterministic with no sorted
    * folds in the hot path. The only float ops are one
    * CAST(BIGINT→DOUBLE) ∕ 1e15 (IEEE-identical everywhere) and one
    * sigmoid per (doc, step); p snaps back to e6 before feeding the
    * next gradient, which absorbs exp()'s cross-libm ulp spread
    * EXCEPT when 1e6·σ(z) lands within an ulp of an exact .5
    * boundary (~2e-10 per (doc, step) — negligible at test scale;
    * at 10⁹+ docs a differential check should tolerate one snapped
    * unit, the same caveat as every e6-snapped libm row). η = 1
    * folds into the update Δw_e9 = −grad ∕ (N·1000) (truncating
    * integer division — Scala Long and DuckDB `//` agree on
    * negatives), so the DuckDB oracle replays the unrolled steps
    * as CTEs.
    *
    * Scale shape: the feature table is O(docs × ≤buckets) rows,
    * built once and localCheckpoint'ed; each step is one ≤65-row
    * broadcast join + one doc-keyed aggregate + one bucket-keyed
    * aggregate (gradients sum as DECIMAL(38,0) — r_e6·x_e6 ≤ 1e12
    * per doc, a BIGINT sum would wrap near 10⁷ docs); the driver
    * holds only the ≤65 weights. `steps` is a fixed constant, so
    * total cost is steps × (two linear aggregates). */
  def qualityClassifier(documents: DataFrame,
                        targetSources: Seq[String] = Seq("src0", "src1"),
                        buckets: Int = 64,
                        steps: Int = 3): DataFrame = {
    val sp = documents.sparkSession
    val tgt = targetSources.map(s => s"'$s'").mkString(", ")
    // Feature-build shape: ONE scan, ONE exchange. n_words is the
    // split array's size (the per-bucket counts necessarily sum back
    // to the token count), which retires the post-aggregation window
    // and its exchange; the explicit doc_id repartition UP FRONT is
    // the single shuffle — the bucket groupBy's clustering is
    // satisfied by it (doc_id ⊆ its keys), and the checkpoint then
    // lands hash-partitioned BY doc_id, which every per-step consumer
    // keys on (the score aggregate, the gradient join, the final
    // join), so no step exchanges the feature table again. The
    // prepended position-0 element becomes the synthetic BIAS bucket
    // −1 with x_e6 = 1e6: the scoring join's Σ w_e9·x_e6 then carries
    // bias_e9·1e6 — the very term z used to add separately — and the
    // gradient aggregate's b = −1 row IS Σ r_e6·1e6, the bias
    // gradient, so each training step is ONE aggregate job instead
    // of two. Every quantity is the same exact integer as before —
    // the update rule, z, p_e6 and the oracle's unrolled replay are
    // bit-identical.
    val feats = documents
      .repartition(col("doc_id"))
      // tokenize ONCE into a column the Generate carries through:
      // inlining split() into both size() and the explode would
      // re-tokenize the whole document per emitted token row
      // (O(len·tokens) — measured 2.5× on the corpus build)
      .select(col("doc_id"), col("source"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_words"),
        posexplode(concat(array(lit("")), col("toks"))).as(Seq("pos", "w")))
      .withColumn("b", expr(
        s"CASE WHEN pos = 0 THEN -1 ELSE (${Portable.hash60SqlSpark("w")}) % $buckets END"))
      .groupBy(col("doc_id"), col("source"), col("n_words"), col("b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("x_e6",
        expr("CASE WHEN b = -1 THEN 1000000L ELSE c * 1000000 DIV n_words END"))
      .withColumn("y", expr(s"CAST(source IN ($tgt) AS INT)").cast("long"))
      .select(col("doc_id"), col("source"), col("n_words"), col("b"),
        col("x_e6"), col("y"))
      .localCheckpoint()
    val nDocs = feats.select(col("doc_id")).distinct().count()
    val weights = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(0L)
    import sp.implicits._
    def scored(): DataFrame = {
      val wDf = broadcast((-1 until buckets)
        .map(b => (b, weights(b))).toDF("b", "w_e9"))
      feats.join(wDf, Seq("b"))
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(expr("w_e9 * x_e6")).as("s_num"))
        .withColumn("z", col("s_num").cast("double") / 1e15)
        .withColumn("p_e6",
          expr("CAST(floor(1000000.0D / (1.0D + exp(-z)) + 0.5D) AS BIGINT)"))
        .withColumn("r_e6", col("p_e6") - col("y") * 1000000L)
    }
    // an empty (or fully text-less) corpus trains nothing and
    // answers the empty frame — no null-decimal dereference, no
    // zero divisor
    for (_ <- 0 until steps if nDocs > 0) {
      val sc = scored().localCheckpoint()
      // one aggregate returns every gradient INCLUDING the bias row
      // (b = −1, whose x_e6 = 1e6 makes its sum Σ r_e6·1e6 exactly)
      val grads = feats.join(sc.select(col("doc_id"), col("r_e6")), Seq("doc_id"))
        .groupBy(col("b"))
        // the per-doc product is ≤1e12, BIGINT-exact; only the
        // corpus-wide SUM needs the decimal headroom
        .agg(sum(expr("CAST(r_e6 * x_e6 AS DECIMAL(38,0))")).as("g"))
        .collect()
        .map(r => (r.get(0).asInstanceOf[Number].intValue(),
          r.getDecimal(1).toBigInteger))
      val div = java.math.BigInteger.valueOf(nDocs * 1000L)
      grads.foreach { case (b, g) =>
        weights(b) -= g.divide(div).longValueExact()
      }
    }
    scored()
      .join(feats.filter(col("b") =!= -1)
        .select(col("doc_id"), col("source"), col("n_words"))
        .distinct(), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_words"),
        col("p_e6").as("score_e6"),
        (col("p_e6") > 500000L).cast("int").cast("long")
          .as("predicted_target"))
  }
}
