package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Neutral warm-up: plain counts over the raw inputs touch the JVM,
    // codegen, and parquet footers without favoring any query's plan.
    try {
      Seq("events", "documents", "embeddings", "lineitem", "orders")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    } catch { case _: Throwable => () }
    // Each query runs twice; the WARM (second) run is the headline so
    // per-query numbers measure the plan, not run order / first-touch
    // JIT. Cold runs are reported alongside for reference.
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = time(fn)
      val warm = time(fn)
      (name, warm, cold)
    }
    def json(sel: ((String, Double, Double)) => (String, Double)): String =
      results.map { r => val (k, v) = sel(r); s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val qs = json { case (k, w, _) => (k, w) }
    val qsCold = json { case (k, _, c) => (k, c) }
    val total = results.map(_._2).sum
    val totalCold = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"total_cold":$totalCold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
