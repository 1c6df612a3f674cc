package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-preparation pipeline a training run fronts
  * its data with: quality gate → language gate → exact dedup →
  * deterministic split assignment. The point is the COMPOSITION
  * shape, not any single operator: every per-row stage
  * ([[TextAnalysis.withQualityScore]], [[TextAnalysis.withLangPred]],
  * [[Sampling.withSplit]]) appends columns on the SAME scan — no
  * joins between derived frames — so the whole pipeline is one narrow
  * pass plus exactly ONE shuffle (the dedup window over md5(text),
  * which carries gated rows only, already thinned by the filters).
  * At 100 TB that is the difference between a single pass over the
  * corpus and a cascade of scan+join stages.
  */
object CorpusPrep {

  /** documents → (doc_id, quality_score, split) for the de-duplicated,
    * quality- and language-gated corpus. Dedup keeps the min doc_id
    * per distinct text, evaluated as a window over the dedup hash —
    * one shuffle, no join-back. */
  def prepare(documents: DataFrame, minQuality: Double = 0.5,
              lang: String = "en"): DataFrame = {
    val gated = TextAnalysis.withLangPred(TextAnalysis.withQualityScore(documents))
      .filter(col("quality_score_e6") >= math.round(minQuality * 1e6) &&
              col("pred_lang") === lang)
    val kept = gated
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
    Sampling.withSplit(kept, "doc_id")
      .select(col("doc_id"), col("quality_score_e6"), col("split"))
  }

  /** CCNet's quality-weighted sampling policy, end to end: score
    * every document's cross-entropy under the corpus bigram LM,
    * bucket head/middle/tail per language
    * ([[TextAnalysis.perplexityBuckets]]), then keep each bucket at
    * its own permille rate over the deterministic (salt, doc_id)
    * hash — the "train mostly on the fluent third, keep a tail
    * trickle for diversity" mix real pretraining corpora use.
    * Composes [[Sampling.sampleMixture]] verbatim, so it inherits
    * its reproducibility contract (stable across runs and layouts,
    * supersets compose by rate). Scale shape = the perplexity
    * joins + a |languages|-row threshold broadcast; the sampler
    * itself adds zero exchanges. */
  def qualityMixture(documents: DataFrame, salt: String = "qmix",
                     rates: Map[String, Int] =
                       Map("head" -> 1000, "middle" -> 500, "tail" -> 100))
      : DataFrame =
    Sampling.sampleMixture(TextAnalysis.perplexityBuckets(documents),
      "bucket", "doc_id", salt, rates)

  /** The multilingual curation pipeline [[prepare]] grows into once
    * a corpus spans languages: quality score + language ID + the
    * Gopher rule gate ALL as appended columns on one scan (the
    * multilingual stop union keeps the stopword rule fair across
    * languages), exact dedup as the same single window shuffle,
    * then α-TEMPERED language mixing (head languages down-sample
    * toward the tail) and split assignment. Beyond [[prepare]]'s
    * one-scan-one-shuffle the mixture adds exactly one tiny
    * per-language count aggregate (column-pruned re-read of the
    * gated pipeline) whose rates broadcast back — the corpus itself
    * still never joins another corpus-sized frame. */
  def prepareFull(documents: DataFrame, minQuality: Double = 0.5,
                  alphaQuarters: Int = 2,
                  budgetPermille: Int = 800): DataFrame = {
    val allStops = TextAnalysis.StopWords.flatMap(_._2).distinct
    val gated = TextAnalysis.withGopherRules(
        TextAnalysis.withLangPred(TextAnalysis.withQualityScore(documents)),
        minWords = 20, stops = allStops)
      .filter(col("quality_score_e6") >= math.round(minQuality * 1e6) &&
              col("pass") === 1)
    val kept = gated
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
      // the mixture needs a COUNTS pass over the survivors before its
      // keep/drop filter — without a materialization that second leg
      // re-runs every gate regex and the dedup window over the whole
      // corpus (2× the pipeline's per-row CPU, the dominant cost).
      // Checkpoint the NARROW projection only (the three columns the
      // output needs — never text), so the state is O(survivors × 3
      // small columns) while both the rates leg and the output leg
      // read the one materialization.
      .select(col("doc_id"), col("pred_lang"), col("quality_score_e6"))
      .localCheckpoint()
    val mixed = Sampling.temperatureMixture(kept, "pred_lang", "doc_id",
      "cprep", alphaQuarters, budgetPermille)
    Sampling.withSplit(mixed, "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("quality_score_e6"),
        col("keep_rate"), col("split"))
  }

  /** The WEB-CRAWL front of [[prepare]] — the stage order every
    * crawl pipeline uses: URL-canonical dedup FIRST (the cheapest
    * and largest duplicate class dies before any text operator pays
    * for it — at 100 TB the fetch aliases are the bulk), then the
    * quality gate as per-row columns on the same scan, exact text
    * dedup over the URL-thinned survivors, and deterministic split
    * assignment.
    *
    * SKEW shape of the URL stage: the keep decision is an IDS-ONLY
    * min-per-canonical-url aggregate (the [[Dedup.urlDedup]] exchange
    * — skinny (url, doc_id) rows, map-side combinable), re-attached
    * to the corpus as a LEFT SEMI join keyed on the uniformly-
    * distributed doc_id. A pathological alias class — one page
    * behind millions of tracking-param spellings — therefore never
    * lands its full-text copies in one task: the hot canonical_url
    * key only ever exists in the skinny aggregate, and the corpus
    * shuffles (when AQE does not broadcast the keep set outright) by
    * doc_id, which no URL skew can concentrate. The text-dedup
    * window below keeps its documented Sessions.scala-style hazard
    * (md5(text) of a mega-duplicate class lands one task) — that one
    * is bounded by the md5 collision class, not by crawl aliasing.
    *
    * PRECONDITION: doc_id is unique across the corpus (the crawl
    * contract every stage here assumes). The keep semi-join is keyed
    * on doc_id alone, so a corpus that reused one doc_id under
    * several canonical_urls would keep ALL of that id's rows whenever
    * it wins any one group — the old per-group window evaluated each
    * row against its own URL group instead. */
  def webPrep(documents: DataFrame, urlCol: String = "url",
              minQuality: Double = 0.5): DataFrame = {
    val withUrl = documents
      .withColumn("canonical_url", Dedup.canonicalUrl(col(urlCol)))
    val keepIds = withUrl
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val urlKept = withUrl.join(keepIds, Seq("doc_id"), "left_semi")
    val gated = TextAnalysis.withQualityScore(urlKept)
      .filter(col("quality_score_e6") >= math.round(minQuality * 1e6))
    val kept = gated
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
    Sampling.withSplit(kept, "doc_id")
      .select(col("doc_id"), col("canonical_url"),
        col("quality_score_e6"), col("split"))
  }
}
