package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.{SamplesStore, RollupStore}

/** Dev-only sub-phase profiler for the r21 optimization round (the
  * driver never runs it): times each store-maintenance phase that the
  * bench's multi-second queries pay, plus repeated warm runs.
  */
object ProfileR21 {
  def t(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[p21] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }

  def qc(spark: SparkSession, sfDir: String): Unit = {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    t("warmup")(docs.count())
    (1 to 3).foreach { r =>
      println(s"--- qc round $r ---")
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val tgt = Seq("src0", "src1").map(s => s"'$s'").mkString(", ")
      var feats: org.apache.spark.sql.DataFrame = null
      t("feats build+ckpt") {
        feats = docs
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("source"),
            split(coalesce(col("text"), lit("")), " ").as("toks"))
          .select(col("doc_id"), col("source"),
            size(col("toks")).cast("long").as("n_words"),
            posexplode(concat(array(lit("")), col("toks"))).as(Seq("pos", "w")))
          .withColumn("b", expr(
            s"CASE WHEN pos = 0 THEN -1 ELSE (${graft.llm.Portable.hash60SqlSpark("w")}) % 64 END"))
          .groupBy(col("doc_id"), col("source"), col("n_words"), col("b"))
          .agg(count(lit(1)).as("c"))
          .withColumn("x_e6",
            expr("CASE WHEN b = -1 THEN 1000000L ELSE c * 1000000 DIV n_words END"))
          .withColumn("y", expr(s"CAST(source IN ($tgt) AS INT)").cast("long"))
          .localCheckpoint()
      }
      t("nDocs")(feats.select(col("doc_id")).distinct().count())
      import spark.implicits._
      val wDf = broadcast((-1 until 64).map(b => (b, 0L)).toDF("b", "w_e9"))
      var sc: org.apache.spark.sql.DataFrame = null
      t("scored+ckpt") {
        sc = feats.join(wDf, Seq("b"))
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(expr("w_e9 * x_e6")).as("s_num"))
          .withColumn("z", col("s_num").cast("double") / 1e15)
          .withColumn("p_e6",
            expr("CAST(floor(1000000.0D / (1.0D + exp(-z)) + 0.5D) AS BIGINT)"))
          .withColumn("r_e6", col("p_e6") - col("y") * 1000000L)
          .localCheckpoint()
      }
      t("grads collect") {
        feats.join(sc.select(col("doc_id"), col("r_e6")), Seq("doc_id"))
          .groupBy(col("b"))
          .agg(sum(expr("CAST(r_e6 * x_e6 AS DECIMAL(38,0))")).as("g"))
          .collect()
      }
      t("grads bcast collect") {
        feats.join(broadcast(sc.select(col("doc_id"), col("r_e6"))), Seq("doc_id"))
          .groupBy(col("b"))
          .agg(sum(expr("CAST(r_e6 * x_e6 AS DECIMAL(38,0))")).as("g"))
          .collect()
      }
      t("old feats build+ckpt") {
        docs
          .select(col("doc_id"), col("source"),
            explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
          .withColumn("b", expr(s"(${graft.llm.Portable.hash60SqlSpark("w")}) % 64"))
          .groupBy(col("doc_id"), col("source"), col("b"))
          .agg(count(lit(1)).as("c"))
          .withColumn("n_words", sum(col("c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
          .withColumn("x_e6", expr("c * 1000000 DIV n_words"))
          .withColumn("y", expr(s"CAST(source IN ($tgt) AS INT)").cast("long"))
          .localCheckpoint()
      }
      t("new feats, no repart") {
        docs
          .select(col("doc_id"), col("source"),
            size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_words"),
            posexplode(concat(array(lit("")),
              split(coalesce(col("text"), lit("")), " "))).as(Seq("pos", "w")))
          .withColumn("b", expr(
            s"CASE WHEN pos = 0 THEN -1 ELSE (${graft.llm.Portable.hash60SqlSpark("w")}) % 64 END"))
          .groupBy(col("doc_id"), col("source"), col("n_words"), col("b"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
      }
      t("new feats, plain explode") {
        docs
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("source"),
            size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_words"),
            explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
          .withColumn("b", expr(s"(${graft.llm.Portable.hash60SqlSpark("w")}) % 64"))
          .groupBy(col("doc_id"), col("source"), col("n_words"), col("b"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
      }
      if (r == 1) {
        val oldF = docs
          .select(col("doc_id"), col("source"),
            explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
          .withColumn("b", expr(s"(${graft.llm.Portable.hash60SqlSpark("w")}) % 64"))
          .groupBy(col("doc_id"), col("source"), col("b"))
          .agg(count(lit(1)).as("c"))
        val newF = docs
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("source"),
            size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_words"),
            explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
          .withColumn("b", expr(s"(${graft.llm.Portable.hash60SqlSpark("w")}) % 64"))
          .groupBy(col("doc_id"), col("source"), col("n_words"), col("b"))
          .agg(count(lit(1)).as("c"))
        new java.io.File("plans/r21").mkdirs()
        def dump(n: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val w = new java.io.PrintWriter(s"plans/r21/_qc_$n.txt", "UTF-8")
          try w.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)) finally w.close()
        }
        dump("old", oldF); dump("new", newF)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    if (sys.env.get("SPARK_GRAFT_P21").contains("qc")) { qc(spark, sfDir); spark.stop(); return }
    if (sys.env.get("SPARK_GRAFT_P21").contains("stream")) {
      // floor of a minimal one-batch memory-sink stream vs the real op
      import org.apache.spark.sql.types._
      val src = "/tmp/p21stream/src"
      val fs0 = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs0.delete(new org.apache.hadoop.fs.Path("/tmp/p21stream"), true)
      graft.sources.Tables.eventsNorm(spark, sfDir).write.parquet(src)
      val schema = graft.ingest.StreamIngest.eventsSchema
      (1 to 3).foreach { r =>
        t(s"minimal stream r$r") {
          val q = spark.readStream.schema(schema).parquet(src)
            .groupBy(col("event_type")).count()
            .writeStream.outputMode("complete").format("memory")
            .queryName(s"p21min$r").start()
          q.processAllAvailable(); q.stop()
        }
        t(s"runToMemory r$r")(
          graft.ingest.StreamIngest.runToMemory(spark, src, s"p21rtm$r"))
      }
      spark.stop(); return
    }
    if (sys.env.get("SPARK_GRAFT_P21").contains("wreq")) {
      val sm = graft.sources.Tables.samples(spark, sfDir)
      t("warmup")(sm.count())
      val blobs = graft.ingest.Ingest.toWriteRequestBlobs(sm)
        .collect().map(_.getAs[Array[Byte]](0)).toSeq
      println(s"[p21] blobs=${blobs.size} bytes=${blobs.map(_.length).sum}")
      (1 to 3).foreach { r =>
        t(s"decode all blobs r$r")(blobs.foreach(b =>
          graft.ingest.PromRemoteCodec.decodeNegotiated(None, b)))
        val store = s"/tmp/p21wreq/store$r"
        t(s"serveAll r$r")(
          graft.serve.RemoteWrite.serveAll(spark, store, blobs))
      }
      spark.stop(); return
    }
    val all = graft.sources.Tables.samples(spark, sfDir)
    t("warmup count")(all.count())
    val base = "/tmp/p21"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val even = all.filter(expr("ts_us % 2 = 0"))
      val odd = all.filter(expr("ts_us % 2 = 1"))
      t("write(half)")(SamplesStore.write(even, s"$base/store"))
      t("rollup build")(RollupStore.rollup(spark, s"$base/store", s"$base/roll", 3600L))
      t("append(half)")(SamplesStore.append(odd, s"$base/store"))
      t("rollup incr")(RollupStore.rollup(spark, s"$base/store", s"$base/roll", 3600L))
      t("read+agg count")(RollupStore.read(spark, s"$base/roll")
        .groupBy(col("metric")).agg(sum(col("n_points"))).count())
      t("store read count")(SamplesStore.read(spark, s"$base/store").count())
      t("compact")(SamplesStore.compact(spark, s"$base/store"))
      // rollup internals replicated: read → dedup → window → agg → write
      val raw = SamplesStore.read(spark, s"$base/store")
      t("  roll: read noop")(raw.write.format("noop").mode("overwrite").save())
      val deduped = raw
        .withColumn("t_sec", expr("ts_us DIV 1000000"))
        .groupBy(col("date"), col("metric"), col("labels"), col("t_sec"))
        .agg(max(col("value")).as("v"))
      t("  roll: dedup noop")(deduped.write.format("noop").mode("overwrite").save())
      val bucketW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("date"), col("metric"), col("labels"), col("bucket"))
        .orderBy(col("t_sec").desc)
      val rolled = deduped
        .withColumn("bucket", expr("t_sec DIV 3600 * 3600"))
        .withColumn("_rk", row_number().over(bucketW))
        .groupBy(col("date"), col("metric"), col("labels"), col("bucket"))
        .agg(min(col("v")).as("min_value"), max(col("v")).as("max_value"),
          sum(col("v")).as("sum_value"), count(lit(1)).as("n_points"),
          min(col("t_sec")).as("t_first"), max(col("t_sec")).as("t_last"),
          min_by(col("v"), col("t_sec")).as("v_first"),
          max_by(col("v"), col("t_sec")).as("v_last"),
          max(when(col("_rk") === 2, col("t_sec"))).as("t_penult"),
          max(when(col("_rk") === 2, col("v"))).as("v_penult"),
          sum(expr("CAST(floor(v * 100 + 0.5) AS BIGINT)")).as("sy_e2"),
          sum(expr("CAST(CAST(floor(v * 100 + 0.5) AS BIGINT) * " +
            "CAST(floor(v * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))"))
            .as("syy_e4"),
          expr("max_by(t_sec, struct(v, t_sec))").as("t_vmax"),
          expr("max_by(t_sec, struct(-v, t_sec))").as("t_vmin"))
      t("  roll: agg noop")(rolled.write.format("noop").mode("overwrite").save())
      t("  roll: agg+repart noop")(rolled.repartition(col("date"))
        .sortWithinPartitions(col("date"), col("metric"), col("labels"), col("bucket"))
        .write.format("noop").mode("overwrite").save())
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/rollout"), true)
      t("  roll: parquet write")(rolled.repartition(col("date"))
        .sortWithinPartitions(col("date"), col("metric"), col("labels"), col("bucket"))
        .write.mode("overwrite").partitionBy("date").parquet(s"$base/rollout"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      t("  roll: dedup noop noAQE")(deduped.write.format("noop").mode("overwrite").save())
      t("  roll: agg noop noAQE")(rolled.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      t("  roll: agg noop noAQE sp4")(rolled.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      t("  roll: agg noop AQE sp4")(rolled.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      // store write internals
      t("  store: layout noop")(even
        .withColumn("date", expr("ts_us DIV 1000000 DIV 86400 * 86400"))
        .repartition(col("date"))
        .sortWithinPartitions(col("date"), col("metric"), col("labels"), col("ts_us"))
        .write.format("noop").mode("overwrite").save())
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/storeout"), true)
      t("  store: layout parquet")(even
        .withColumn("date", expr("ts_us DIV 1000000 DIV 86400 * 86400"))
        .repartition(col("date"))
        .sortWithinPartitions(col("date"), col("metric"), col("labels"), col("ts_us"))
        .write.mode("overwrite").partitionBy("date").parquet(s"$base/storeout"))
    }
    spark.stop()
  }
}
