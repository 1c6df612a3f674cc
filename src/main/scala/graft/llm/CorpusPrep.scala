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
    * assignment. Exactly TWO key-window shuffles (canonical URL,
    * then md5(text) over the already-thinned set); the text column
    * never joins a derived frame. */
  def webPrep(documents: DataFrame, urlCol: String = "url",
              minQuality: Double = 0.5): DataFrame = {
    val urlKept = documents
      .withColumn("canonical_url", Dedup.canonicalUrl(col(urlCol)))
      .withColumn("url_keep",
        min(col("doc_id")).over(Window.partitionBy(col("canonical_url"))))
      .filter(col("doc_id") === col("url_keep"))
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
