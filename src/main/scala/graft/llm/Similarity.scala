package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * All dot products / norms are left-fold double arithmetic
  * (`aggregate(zip_with(...), 0D, +)`): deterministic and
  * bit-reproducible in any engine that folds sequentially, which is
  * what makes the cosine scores oracle-checkable after round(6).
  *
  * Scale shape: the brute-force path broadcasts the (small) query
  * side and scans candidates once — at 100 TB of vectors that is the
  * exact top-k baseline. The LSH path buckets by random-hyperplane
  * signatures so the join shuffles (bucket, vec) pairs instead of
  * computing the full cross product; hyperplanes are derived from a
  * deterministic LCG so every engine agrees on the buckets.
  */
object Similarity {

  /** Left-fold double dot product of two array<double> columns. */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def normExpr(a: String): String =
    s"sqrt(${dotExpr(a, a)})"

  /** vec_id + embedding cast to double + precomputed norm. */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("vec", col("embedding").cast("array<double>"))
      .withColumn("nrm", expr(normExpr("vec")))
      .select(col("vec_id"), col("label"), col("vec"), col("nrm"))

  /** Exact cosine top-k: queries = vec_id < nQueries (broadcast),
    * candidates = everything else. Output query_id, vec_id, cos_sim,
    * rank — ranked by rounded score with vec_id tiebreak so the
    * ordering is engine-stable. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val prep = prepared(embeddings)
    val queries = prep.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val cands = prep.filter(col("vec_id") >= nQueries)
    val scored = cands.join(broadcast(queries))
      .withColumn("cos_sim", expr(
        s"round(${dotExpr("qvec", "vec")} / (qnrm * nrm), 6)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rank"))
  }

  /** Random-hyperplane component r(j, d) as a SQL fragment —
    * LCG((j·dim + d)) mapped into [-0.5, 0.5), exact in double. */
  private def hyperplaneExpr(j: String, d: String, dim: Int): String =
    s"(CAST((1103515245L * ($j * $dim + $d) + 12345) % 2147483648L AS DOUBLE) / 2147483648.0D - 0.5D)"

  /** Signature bits [0, nBits): bit j = sign of <vec, r_j>. */
  def signatureExpr(vecCol: String, nBits: Int, dim: Int): String =
    s"""aggregate(sequence(0, ${nBits - 1}), CAST(0 AS BIGINT), (acc, j) ->
       |  acc + CASE WHEN aggregate(zip_with($vecCol, sequence(0, ${dim - 1}), (x, d) ->
       |                     x * ${hyperplaneExpr("j", "d", dim)}),
       |                   CAST(0 AS DOUBLE), (a, v) -> a + v) > 0
       |             THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)""".stripMargin

  /** LSH-bucketed ANN top-k: join queries to candidates within the
    * same nBits-signature bucket, exact cosine inside the bucket. */
  def lshTopK(embeddings: DataFrame, nQueries: Int, nBits: Int, k: Int, dim: Int = 64): DataFrame = {
    val prep = prepared(embeddings)
      .withColumn("bucket", expr(signatureExpr("vec", nBits, dim)))
    val queries = prep.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
              col("nrm").as("qnrm"), col("bucket"))
    val cands = prep.filter(col("vec_id") >= nQueries)
    val scored = cands.join(broadcast(queries), Seq("bucket"))
      .withColumn("cos_sim", expr(
        s"round(${dotExpr("qvec", "vec")} / (qnrm * nrm), 6)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rank"))
  }

  /** Embedding near-dup pairs via banded hyperplane LSH
    * (nBands bands × bitsPerBand bits) + exact cosine ≥ threshold.
    *
    * The hash partitioning on (band, band_val) has only
    * nBands × 2^bitsPerBand distinct keys — at 100 TB run wider
    * bands (e.g. 8 × 16 bits = 512 Ki keys); both are parameters.
    * maxBucket caps degenerate buckets (all-zero embeddings land in
    * one band value) before any pair is generated. */
  def nearDupPairs(embeddings: DataFrame, nBands: Int, bitsPerBand: Int,
                   threshold: Double, dim: Int = 64,
                   maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val nBits = nBands * bitsPerBand
    val prep = prepared(embeddings)
      .withColumn("sigbits", expr(signatureExpr("vec", nBits, dim)))
      .withColumn("bands", expr(
        s"transform(sequence(0, ${nBands - 1}), b -> (sigbits >> (b * $bitsPerBand)) & ${(1 << bitsPerBand) - 1})"))
    // The bucket-cap window doubles as a materialization barrier: its
    // exchange hash-partitions on the join key, the (interpreted,
    // expensive) signature expression is evaluated exactly once per
    // banded row below that exchange, and the self-join reuses the
    // single exchange for both sides (ReuseExchange) instead of
    // recomputing signatures in each branch.
    val banded = Dedup.capBuckets(
      prep.select(col("vec_id"), col("vec"), col("nrm"),
        posexplode(col("bands")).as(Seq("band", "band_val"))),
      Seq("band", "band_val"), maxBucket)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr(s"round(${dotExpr("a.vec", "b.vec")} / (a.nrm * b.nrm), 6)").as("cos_sim"))
      .distinct()
    pairs.filter(col("cos_sim") >= threshold)
  }
}
