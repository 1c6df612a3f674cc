package graft.serve

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.OpsMetrics
import graft.ingest.PromRemoteCodec
import graft.ingest.PromRemoteCodec.{PromLabel, PromSample, PromTimeSeries}
import graft.operators.SeriesRead

/** The end-to-end remote-read serving loop — the reference's whole
  * `/read` contract in one function (reference: main.go:55-74 +
  * main.go:145-155, internal/clickhouse/read.go:15-103): ReadRequest
  * blob in → matcher compile → distributed query → ReadResponse blob
  * out, one QueryResult per request query, in request order.
  *
  * Execution is fully distributed (SeriesRead's single-shuffle
  * select+assemble); only the final assembled series are collected to
  * be framed into the response — the reference's HTTP handler
  * materializes exactly the same rows in its one goroutine, and the
  * response is driver-bounded by construction: the matchers select a
  * series subset and the remote-read protocol ships it as one
  * protobuf body either way. The request side is bounded by the
  * 32 MiB decode limit (PromRemoteCodec.DecodeReadLimit).
  */
object RemoteRead {

  /** Default cap on post-aggregation samples a single read query may
    * return. The request side is bounded by the 32 MiB decode limit;
    * this bounds the RESPONSE — without it, a match-everything query
    * collects the whole store's assembled series into driver memory
    * before encoding (the reference is implicitly bounded by streaming
    * one ClickHouse resultset through its handler; at 100 TB an
    * unbounded collect is the one driver-side OOM). 10M samples ≈
    * a few hundred MB encoded, comfortably under driver heap. */
  val DefaultMaxReadSamples: Long = 10000000L

  /** Thrown when a query would return more than maxSamples — the HTTP
    * shim maps it to the reference's 500 path. */
  final class ResponseTooLargeException(msg: String) extends RuntimeException(msg)

  /** ReadRequest blob → ReadResponse blob over the canonical samples
    * DataFrame. ignoreLabel/ignoreHints mirror the reference's
    * -read.ignore-label / -read.ignore-hints flags. Each query's
    * result size is counted BEFORE series assembly; an over-limit
    * query errors like the reference's HTTP-500 path and increments
    * read_errors.
    *
    * The selected aggregate is persisted across the two actions (the
    * size-guard count and the assembly collect) so each `/read` runs
    * its filter+aggregate ONCE — without the persist every request
    * paid the full pushed-filter scan twice. The cache is bounded by
    * maxSamples (the count rejects anything bigger before assembly
    * materializes) and dropped in a finally, so a failed or oversized
    * query leaks nothing. */
  def serve(samples: DataFrame, readRequestBlob: Array[Byte],
            ignoreLabel: Option[String] = Some("remote=clickhouse"),
            ignoreHints: Boolean = false,
            maxSamples: Long = DefaultMaxReadSamples): Array[Byte] = {
    val m = OpsMetrics(samples.sparkSession)
    m.readRequests.add(1)
    try {
      val queries = PromRemoteCodec.decodeReadRequest(readRequestBlob)
      val results = queries.map { q =>
        val sel = SeriesRead.selectKeyed(samples, q, ignoreLabel, ignoreHints)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val n = sel.count()
          if (n > maxSamples)
            throw new ResponseTooLargeException(
              s"query matches $n samples, exceeds response limit $maxSamples")
          SeriesRead.assemble(sel)
            .orderBy(col("metric"), col("labels")) // read.go ORDER BY metric_name, slb, t
            .collect().iterator.map(rowToSeries).toSeq
        } finally sel.unpersist(false)
      }
      PromRemoteCodec.encodeReadResponseResults(results)
    } catch {
      case e: Throwable => m.readErrors.add(1); throw e
    }
  }

  /** One assembled (metric, labels, points) row → prompb.TimeSeries:
    * __name__ rejoins the sorted "k=v" labels, second buckets go back
    * to wire milliseconds. */
  private def rowToSeries(row: Row): PromTimeSeries = {
    val metric = row.getString(0)
    val labels = row.getSeq[String](1)
    val points = row.getSeq[Row](2)
    val promLabels = PromLabel("__name__", metric) +: labels.map { kv =>
      val i = kv.indexOf('=')
      PromLabel(kv.substring(0, i), kv.substring(i + 1))
    }
    PromTimeSeries(promLabels,
      points.map(p => PromSample(p.getDouble(1), p.getLong(0) * 1000L)))
  }
}
