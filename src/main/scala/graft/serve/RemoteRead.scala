package graft.serve

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

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

  /** ReadRequest blob → ReadResponse blob over the canonical samples
    * DataFrame. ignoreLabel/ignoreHints mirror the reference's
    * -read.ignore-label / -read.ignore-hints flags. */
  def serve(samples: DataFrame, readRequestBlob: Array[Byte],
            ignoreLabel: Option[String] = Some("remote=clickhouse"),
            ignoreHints: Boolean = false): Array[Byte] = {
    val m = OpsMetrics(samples.sparkSession)
    m.readRequests.add(1)
    try {
      val queries = PromRemoteCodec.decodeReadRequest(readRequestBlob)
      val results = queries.map { q =>
        SeriesRead.assemble(SeriesRead.selectKeyed(samples, q, ignoreLabel, ignoreHints))
          .orderBy(col("metric"), col("labels")) // read.go ORDER BY metric_name, slb, t
          .collect().iterator.map(rowToSeries).toSeq
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
