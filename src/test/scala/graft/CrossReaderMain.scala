package graft

import org.apache.spark.sql.SparkSession

/** Second-PROCESS reader for the cross-process visibility case in
  * StoreTortureSpec: a separate JVM (own SparkSession, no access to
  * the writer's in-JVM locks) loops lock-free reads of a store that
  * another process is concurrently appending to / compacting /
  * expiring, and exits non-zero if any read observes a torn batch.
  *
  * The writer lands batches of exactly `batchSize` rows sharing one
  * `value`; manifest-snapshot atomicity promises a reader sees each
  * batch entirely or not at all, and grace-retention promises the
  * files a planned snapshot references outlive the plan. A torn read
  * (count % batchSize != 0 for some value) or a vanished-file crash
  * would both break the out-of-process contract the store documents
  * (Ingest.scala's grace-window notes).
  *
  * args: storePath reads batchSize
  */
object CrossReaderMain {
  def main(args: Array[String]): Unit = {
    val Array(path, reads, batchSize) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var torn = 0
    var crashed = 0
    var nonEmpty = 0
    for (_ <- 1 to reads.toInt) {
      try {
        val counts = graft.ingest.SamplesStore.read(spark, path)
          .groupBy("value").count().collect()
        if (counts.nonEmpty) nonEmpty += 1
        counts.foreach { r =>
          if (r.getLong(1) % batchSize.toLong != 0) {
            torn += 1
            System.err.println(
              s"[crossreader] TORN batch: value=${r.get(0)} count=${r.getLong(1)}")
          }
        }
      } catch {
        case e: Throwable =>
          crashed += 1
          System.err.println(s"[crossreader] read crashed: ${e.getMessage}")
      }
    }
    println(s"[crossreader] done reads=$reads nonEmpty=$nonEmpty torn=$torn crashed=$crashed")
    spark.stop()
    if (torn > 0) sys.exit(2)
    if (crashed > 0) sys.exit(3)
    if (nonEmpty == 0) sys.exit(4) // vacuous run proves nothing
  }
}
