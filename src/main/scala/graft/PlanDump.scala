package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan/phase dump for the optimization rounds (the driver
  * never runs it). For each named query: builds the DataFrame (side
  * effects included), writes `.explain("formatted")` to
  * plans/<tag>/<name>_<suffix>.txt, and prints a wall-clock split of
  * build (fixture/side-effect) vs execute (count) plus Catalyst phase
  * times from the execution tracker.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=r21 SPARK_GRAFT_PLAN_SUFFIX=before \
  *   sbt "runMain graft.PlanDump q1 q2 ..."   (or `all`)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          spark.sqlContext.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val t2 = System.nanoTime()
          df.count()
          val t3 = System.nanoTime()
          val phases = df.queryExecution.tracker.phases
            .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
            .mkString(" ")
          val w = new java.io.PrintWriter(
            new java.io.File(dir, s"${name}_$suffix.txt"), "UTF-8")
          try w.println(plan) finally w.close()
          println(f"[plandump] $name%-32s build=${(t1 - t0) / 1e9}%7.3f s " +
            f"explain=${(t2 - t1) / 1e9}%6.3f s exec=${(t3 - t2) / 1e9}%7.3f s  $phases")
      }
    }
    spark.stop()
  }
}
