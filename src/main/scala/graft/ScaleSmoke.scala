package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup
import graft.sources.Tables

/** Scale-behavior smoke (not driver-run): the dedup family on 1×/2×/4×
  * unions of the sf0.1 documents corpus (ids shifted per copy — every
  * doc gains m−1 exact duplicates, the dup-heavy shape real crawl
  * corpora have). Measures how candidate generation scales and what
  * the hot-bucket cap buys when tuned; numbers land in SCALE.md. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
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
    val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")

    def scaled(m: Int): DataFrame =
      (0 until m).map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)

    def time(name: String)(f: => Long): Unit = {
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    for (m <- Seq(1, 2, 4)) {
      val d = scaled(m)
      time(s"minhashLsh      m=$m cap=inert")(Dedup.minhashLsh(d).count())
      time(s"ngramJaccard    m=$m cap=inert")(Dedup.ngramJaccard(d, 0.8).count())
      time(s"simhashPairs    m=$m cap=inert")(Dedup.simhashPairs(d, 8).count())
      time(s"minhashLsh      m=$m cap=2000")(Dedup.minhashLsh(d, maxBucket = 2000).count())
      time(s"simhashPairs    m=$m cap=2000")(Dedup.simhashPairs(d, 8, maxBucket = 2000).count())
    }

    val emb0 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    def scaledEmb(m: Int): org.apache.spark.sql.DataFrame =
      (0 until m).map(i => emb0.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
    import graft.llm.Similarity
    for (m <- Seq(1, 2, 4)) {
      val e = scaledEmb(m)
      time(s"annBruteForce   m=$m")(Similarity.bruteForceTopK(e, 10, 10).count())
      time(s"annLsh          m=$m")(Similarity.lshTopK(e, 10, 6, 10).count())
      time(s"annIvf          m=$m")(Similarity.ivfTopK(e, 10, 16, 4, 10).count())
      time(s"embNearDup      m=$m")(Similarity.nearDupPairs(e, 4, 6, 0.4).count())
    }
    spark.stop()
  }
}
