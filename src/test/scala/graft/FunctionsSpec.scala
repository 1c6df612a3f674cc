package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Pins the codegen'd vector kernels to the declarative HOF forms
  * they replaced: identical doubles (no tolerance — both are
  * sequential left folds) on every real embedding vector. */
class FunctionsSpec extends SparkSpecBase {

  private val hofDot =
    "aggregate(zip_with(vec, vec2, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def hofSig(nBits: Int, dim: Int): String = {
    def hyper(j: String, d: String) =
      s"(CAST((1103515245L * ($j * $dim + $d) + 12345) % 2147483648L AS DOUBLE) / 2147483648.0D - 0.5D)"
    s"""aggregate(sequence(0, ${nBits - 1}), CAST(0 AS BIGINT), (acc, j) ->
       |  acc + CASE WHEN aggregate(zip_with(vec, sequence(0, ${dim - 1}), (x, d) ->
       |                     x * ${hyper("j", "d")}),
       |                   CAST(0 AS DOUBLE), (a, v) -> a + v) > 0
       |             THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)""".stripMargin
  }

  test("graft_dot equals the aggregate/zip_with fold exactly") {
    VectorFunctions.register(spark)
    val vecs = Tables.embeddings(spark, Sf)
      .withColumn("vec", col("embedding").cast("array<double>"))
      .withColumn("vec2", reverse(col("vec")))
    val mismatch = vecs
      .withColumn("a", expr("graft_dot(vec, vec2)"))
      .withColumn("b", expr(hofDot))
      .filter(col("a") =!= col("b") || col("a").isNull =!= col("b").isNull)
    assert(mismatch.count() === 0)
    // self dot product = squared norm, strictly positive for real vecs
    assert(vecs.filter(expr("graft_dot(vec, vec) <= 0")).count() === 0)
  }

  test("graft_hyperplane_sig equals the nested HOF fold exactly") {
    VectorFunctions.register(spark)
    val vecs = Tables.embeddings(spark, Sf)
      .withColumn("vec", col("embedding").cast("array<double>"))
    for (nBits <- Seq(1, 6, 24, 64)) {
      val mismatch = vecs
        .withColumn("a", expr(s"graft_hyperplane_sig(vec, $nBits)"))
        .withColumn("b", expr(hofSig(nBits, 64)))
        .filter(col("a") =!= col("b"))
      assert(mismatch.count() === 0, s"nBits=$nBits")
    }
  }
}
