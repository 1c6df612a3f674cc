package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.llm.Dedup
import graft.sources.Tables

/** Scratch profiling harness — times sub-phases of the slow dedup
  * queries at a given SF dir to locate overhead (not committed as a
  * product surface; driver never runs it). */
object Profile {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    t("warmup count")(docs.count())

    import org.apache.spark.sql.functions._
    val words = docs.withColumn("words", split(col("text"), " ")).filter(size(col("words")) >= 3)
    t("a: split only")(words.select(col("doc_id"), size(col("words"))).count())
    val tr = words.select(col("doc_id"), expr(
      "transform(sequence(0, size(words)-3), i -> concat_ws(' ', words[i], words[i+1], words[i+2]))").as("sh"))
    t("b: + transform")(tr.select(col("doc_id"), size(col("sh"))).count())
    t("c: + distinct")(tr.select(col("doc_id"), size(expr("array_distinct(sh)"))).count())
    val ex = tr.select(col("doc_id"), explode(expr("array_distinct(sh)")).as("s"))
    t("d: + explode")(ex.count())
    t("e: + md5hash")(ex.select(col("doc_id"), expr(graft.llm.Portable.hash60SqlSpark("s")).as("h")).agg(sum("h")).count())
    t("shingleHashes")(Dedup.shingleHashes(docs).count())
    t("sigsFromShingles")(Dedup.minhashSignatures(docs).count())
    t("minhashLsh cold")(Dedup.minhashLsh(docs).count())
    spark.sqlContext.clearCache()
    t("minhashLsh warm")(Dedup.minhashLsh(docs).count())
    spark.sqlContext.clearCache()
    t("ngramJaccard warm")(Dedup.ngramJaccard(docs, 0.8).count())
    spark.sqlContext.clearCache()
    t("simhashSignatures")(Dedup.simhashSignatures(docs).count())
    t("simhashPairs warm")(Dedup.simhashPairs(docs, 8).count())
    spark.stop()
  }
}
