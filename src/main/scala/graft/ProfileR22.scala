package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Dev-only sub-phase profiler for the r22 optimization round (the
  * driver never runs it): decomposes the streaming family's per-batch
  * job structure with a job-level listener, and times the histogram /
  * e2e-decode paths. Output roots default under java.io.tmpdir.
  *
  * Usage: SPARK_GRAFT_P22=stream|hist|wreq sbt "runMain graft.ProfileR22"
  */
object ProfileR22 {
  def t(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[p22] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }

  /** Collects (jobId, desc, durMs) for every job run while attached. */
  final class JobLog extends SparkListener {
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]
    private val starts = new scala.collection.mutable.HashMap[Int, (String, Long)]
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
      starts(js.jobId) = (desc, js.time)
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      starts.remove(je.jobId).foreach { case (desc, t0) =>
        jobs += ((je.jobId, desc, t0, je.time))
      }
    }
  }

  def withJobLog(spark: SparkSession, name: String)(f: => Any): Unit = {
    val lg = new JobLog
    spark.sparkContext.addSparkListener(lg)
    val t0 = System.nanoTime()
    f
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(lg)
    Thread.sleep(100) // let queued listener events drain
    val js = lg.jobs.sortBy(_._1)
    val sum = js.map(j => j._4 - j._3).sum / 1e3
    println(f"[p22] === $name wall=$wall%7.3f s jobs=${js.size} jobsum=$sum%7.3f s ===")
    js.foreach { case (id, desc, t0j, t1j) =>
      println(f"[p22]   job $id%3d ${(t1j - t0j) / 1e3}%7.3f s  ${desc.take(100)}")
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
    val section = sys.env.getOrElse("SPARK_GRAFT_P22", "stream")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)

    if (section == "stream") {
      // warm up: one full run of each streaming query (JVM/codegen),
      // then a logged run with the per-job breakdown
      val qs = Seq("ingest_streaming", "ingest_streaming_window",
        "ingest_streaming_dedup", "ingest_streaming_sessionize",
        "ingest_streaming_store", "ingest_streaming_rollup",
        "stream_line_dedup", "stream_dedup_minhash")
        .filter(q => only.forall(_.contains(q)))
      qs.foreach { q =>
        val fn = SparkEntry.queries(q)
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        t(s"$q warm0")(fn(spark, sfDir).count())
        (1 to 2).foreach { r =>
          spark.sqlContext.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          withJobLog(spark, s"$q r$r")(fn(spark, sfDir).count())
        }
      }
    }

    if (section == "hist") {
      val qs = Seq("promql_histogram", "promql_hist_fraction",
        "promql_hist_count_sum", "promql_hist_stdvar")
        .filter(q => only.forall(_.contains(q)))
      qs.foreach { q =>
        val fn = SparkEntry.queries(q)
        t(s"$q warm0")(fn(spark, sfDir).count())
        (1 to 2).foreach { r =>
          spark.sqlContext.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          withJobLog(spark, s"$q r$r")(fn(spark, sfDir).count())
        }
      }
    }

    if (section == "wreq") {
      val qs = Seq("write_request_e2e", "write_request_v2_e2e",
        "write_request_metadata", "ingest_otlp", "ingest_otlp_scope")
        .filter(q => only.forall(_.contains(q)))
      qs.foreach { q =>
        val fn = SparkEntry.queries(q)
        t(s"$q warm0")(fn(spark, sfDir).count())
        (1 to 2).foreach { r =>
          spark.sqlContext.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          withJobLog(spark, s"$q r$r")(fn(spark, sfDir).count())
        }
      }
    }

    if (section == "wreqdig") {
      // decompose write_request_e2e's driver-side time
      val sm = graft.sources.Tables.samples(spark, sfDir)
      t("warmup")(sm.count())
      val blobs = graft.ingest.Ingest.toWriteRequestBlobs(sm)
        .collect().map(_.getAs[Array[Byte]](0)).toSeq
      println(s"[p22] blobs=${blobs.size} bytes=${blobs.map(_.length).sum}")
      import graft.ingest.PromRemoteCodec
      (1 to 3).foreach { r =>
        var reqs: Seq[PromRemoteCodec.PromWriteRequest] = null
        t(s"decode r$r")({ reqs = blobs.map(b =>
          PromRemoteCodec.decodeNegotiated(None, b).toOption.get) })
        var rows: Seq[PromRemoteCodec.IngestedSample] = null
        t(s"toSamples r$r")({ rows = reqs.flatMap(q => PromRemoteCodec.toSamples(q)) })
        println(s"[p22] rows=${rows.size}")
        import spark.implicits._
        var df: org.apache.spark.sql.DataFrame = null
        t(s"toDF r$r")({ df = rows.toDF("ts_us", "metric", "labels", "value") })
        t(s"plan stats r$r")(df.queryExecution.optimizedPlan.stats.sizeInBytes)
        val store = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"p22wreq/store$r").getAbsolutePath
        t(s"append samples r$r")(graft.ingest.SamplesStore.append(df, store))
        t(s"append again (2 day-sets) r$r")(graft.ingest.SamplesStore.append(df, store))
        t(s"read-agg r$r")(graft.ingest.SamplesStore.read(spark, store)
          .groupBy(col("metric"), col("date")).count().count())
        t(s"noop layoutless write r$r") {
          val stg = new java.io.File(System.getProperty("java.io.tmpdir"),
            s"p22wreq/raw$r").getAbsolutePath
          df.write.mode("overwrite").parquet(stg)
        }
      }
    }

    if (section == "streamwidth") {
      // A/B: the same memory-sink stream on sessions with different
      // shuffle widths (state partitions follow the session conf)
      import org.apache.spark.sql.types._
      val src = new java.io.File(System.getProperty("java.io.tmpdir"),
        "p22stream/src").getAbsolutePath
      val fs0 = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs0.delete(new org.apache.hadoop.fs.Path(src).getParent, true)
      graft.sources.Tables.eventsNorm(spark, sfDir).write.parquet(src)
      println(s"[p22] src files: " +
        fs0.listStatus(new org.apache.hadoop.fs.Path(src)).count(_.getPath.getName.endsWith(".parquet")))
      val schema = graft.ingest.StreamIngest.eventsSchema
      Seq("32", "8", "2", "1").foreach { w =>
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", w)
        (1 to 3).foreach { r =>
          t(s"minimal stream w$w r$r") {
            val q = ss.readStream.schema(schema).parquet(src)
              .groupBy(col("event_type")).count()
              .writeStream.outputMode("complete").format("memory")
              .queryName(s"p22min${w}_$r").start()
            q.processAllAvailable(); q.stop()
          }
        }
        (1 to 2).foreach { r =>
          t(s"runToMemory w$w r$r")(
            graft.ingest.StreamIngest.runToMemory(ss, src, s"p22rtm${w}_$r"))
        }
        // batch equivalent of the same aggregate, same session width
        (1 to 2).foreach { r =>
          t(s"batch agg w$w r$r") {
            ss.read.schema(schema).parquet(src)
              .groupBy(col("event_type")).count().collect()
          }
        }
      }
    }

    if (section == "helperwidth") {
      // A/B the real stream helpers under different width targets
      // (statePartitionBytes: 1 byte → width=cap i.e. old behavior;
      // 32MiB → floor 2 locally; 400KiB → ~4-8 locally)
      val src1 = "/tmp/graft_work/stream_src_sf0.1"
      val src2 = "/tmp/graft_work/stream_dedup_src_sf0.1"
      Seq(("cap", "1"), ("w2", (32L << 20).toString), ("w8", (400L << 10).toString))
        .foreach { case (tag, tgt) =>
          spark.conf.set("spark.graft.stream.statePartitionBytes", tgt)
          (1 to 3).foreach { r =>
            t(s"runToMemory $tag r$r")(
              graft.ingest.StreamIngest.runToMemory(spark, src1, s"hw_rtm_${tag}_$r").count())
            t(s"runWindowed $tag r$r")(
              graft.ingest.StreamIngest.runWindowedToMemory(spark, src1, s"hw_win_${tag}_$r").count())
            t(s"runDedup $tag r$r")(
              graft.ingest.StreamIngest.runDedupToMemory(spark, src2, s"hw_dd_${tag}_$r").count())
            t(s"runSessionize $tag r$r")(
              graft.ingest.StreamIngest.runSessionizeToMemory(spark, src1, s"hw_sess_${tag}_$r").count())
          }
        }
    }

    if (section == "qwidth") {
      // A/B whole query entries on sessions of different shuffle
      // widths (queries take the session as an argument)
      val qs = only.map(_.toSeq.sorted).getOrElse(Seq(
        "promql_group_left", "promql_at_baseline", "promql_scalar_share",
        "promql_histogram", "promql_hist_stdvar", "promql_subquery",
        "ts_topk", "ts_rate_per_second", "read_series_assembly",
        "promql_sum_rate", "promql_binary_op"))
      val sessions = Seq("32", "8", "4").map { w =>
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", w)
        (w, ss)
      }
      qs.foreach { q =>
        SparkEntry.queries.get(q).foreach { fn =>
          // warm plans/codegen on each width once
          sessions.foreach { case (w, ss) => fn(ss, sfDir).count() }
          (1 to 3).foreach { r =>
            sessions.foreach { case (w, ss) =>
              spark.sqlContext.clearCache()
              spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
              t(s"$q w$w r$r")(fn(ss, sfDir).count())
            }
          }
        }
      }
    }

    if (section == "skew") {
      // VERDICT item 7: the series-keyed raw-row exchange
      // (dedupPerSecond / dedupedWindow / selectKeyed) vs the old
      // two-exchange shape, on a fixture with ONE series carrying
      // ~50% of rows and 4x sub-second duplication (the HA-pair /
      // retry-heavy remote-write shape). Pipeline includes the lag
      // window consumer both shapes feed, so the saved second
      // exchange counts.
      import org.apache.spark.sql.expressions.Window
      val nRows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
      val base = spark.range(nRows)
        .select(
          // half the rows land on ONE hot series, the rest on 10k
          when(expr("id % 2 = 0"), "k=hot")
            .otherwise(concat(lit("k=s"), expr("CAST(id % 10000 AS STRING)"))).as("lb"),
          // 4x sub-second duplication: 4 rows per (series, second)
          expr("1704067200000000 + (id DIV 8) * 250000").as("ts_us"),
          expr("CAST(id % 97 AS DOUBLE) / 2").as("value"))
        .select(lit("m").as("metric"), array(col("lb")).as("labels"),
          col("ts_us"), col("value"))
      val src = new java.io.File(System.getProperty("java.io.tmpdir"),
        "p22skew").getAbsolutePath
      base.write.mode("overwrite").parquet(src)
      val sm = spark.read.parquet(src)
      def consume(deduped: org.apache.spark.sql.DataFrame): Unit = {
        val w = Window.partitionBy(col("metric"), col("labels")).orderBy(col("t_sec"))
        deduped
          .withColumn("prev", lag(col("value"), 1).over(w))
          .select(col("metric"), col("labels"), col("t_sec"),
            (col("value") - coalesce(col("prev"), lit(0.0))).as("d"))
          .write.format("noop").mode("overwrite").save()
      }
      (1 to 3).foreach { r =>
        t(s"old 2-exchange shape r$r") {
          consume(sm
            .withColumn("t_sec", expr("ts_us DIV 1000000"))
            .groupBy(col("metric"), col("labels"), col("t_sec"))
            .agg(max(col("value")).as("value")))
        }
        t(s"new series-keyed shape r$r") {
          consume(sm
            .withColumn("t_sec", expr("ts_us DIV 1000000"))
            .repartition(col("metric"), col("labels"))
            .groupBy(col("metric"), col("labels"), col("t_sec"))
            .agg(max(col("value")).as("value")))
        }
      }
    }

    if (section == "tails") {
      val qs = Seq("promql_group_left", "promql_at_baseline",
        "promql_scalar_share", "store_rollup_serve",
        "store_rollup_serve_ladder", "store_rollup_serve_stdvar",
        "store_rollup_serve_rate")
        .filter(q => only.forall(_.contains(q)))
      qs.foreach { q =>
        val fn = SparkEntry.queries(q)
        t(s"$q warm0")(fn(spark, sfDir).count())
        (1 to 2).foreach { r =>
          spark.sqlContext.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          withJobLog(spark, s"$q r$r")(fn(spark, sfDir).count())
        }
      }
    }
    spark.stop()
  }
}
