package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.llm.{Dedup, Similarity}
import graft.sources.Tables
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, sf).cache(); docs.count()
    val embs = Tables.embeddings(spark, sf).cache(); embs.count()
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"PROF $n%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs rows=$c")
    }
    // candidate volumes
    val ssigs = Dedup.simhashSignatures(docs).cache()
    time("simhash_sigs")(ssigs.count())
    val banded = ssigs.select(col("doc_id"),
      posexplode(expr("transform(sequence(0, 3), b -> (simhash >> (b * 15)) & 32767)")).as(Seq("band", "band_val")))
    time("simhash_candidates")(
      banded.as("a").join(banded.as("b"),
        col("a.band")===col("b.band") && col("a.band_val")===col("b.band_val") && col("a.doc_id")<col("b.doc_id")).count())
    time("simhash_pairs_full")(Dedup.simhashPairs(docs, 8).count())
    val prep = Similarity.prepared(embs).withColumn("sigbits", expr(Similarity.signatureExpr("vec", 24, 64))).cache()
    time("emb_sigs")(prep.count())
    val eb = prep.select(col("vec_id"), posexplode(expr("transform(sequence(0,3), b -> (sigbits >> (b*6)) & 63)")).as(Seq("band","band_val")))
    time("emb_candidates")(
      eb.as("a").join(eb.as("b"), col("a.band")===col("b.band") && col("a.band_val")===col("b.band_val") && col("a.vec_id")<col("b.vec_id")).count())
    time("emb_neardup_full")(Similarity.nearDupPairs(embs, 4, 6, 0.4).count())
    spark.stop()
  }
}
