package graft
import org.apache.spark.sql.SparkSession
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
               "ingest_label_normalize")
    names.foreach { n =>
      (1 to 2).foreach { i =>
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sf).count()
        println(f"PROF $n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$c")
      }
    }
    spark.stop()
  }
}
