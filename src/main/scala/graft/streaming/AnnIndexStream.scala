package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.Similarity

/** Structured-Streaming maintenance of an ANN index: every micro-batch of
  * a vector stream is [[Similarity.ivfAppend]]ed (or [[Similarity
  * .ivfPqAppend]]ed) against the index's FROZEN centroids/codebooks — the
  * `readStream → foreachBatch` shape of keeping retrieval fresh while the
  * corpus grows, with no rebuild ever on the hot path.
  *
  * Exactly-once INDEX CONTENT from at-least-once delivery: foreachBatch
  * can redeliver a micro-batch after a failure, but the append's id
  * anti-join makes a replayed batch a no-op (and its meta bump a spurious
  * counter increment, the refusing side) — the same idempotence contract
  * the batch path's crash fuzz pins, so no output-side transaction log is
  * needed. Consequently `dedupAgainstIndex=false` is deliberately NOT
  * offered here: under redelivery it would duplicate rows.
  *
  * The index must exist before the stream starts ([[Similarity
  * .ivfBuildIfMissing]] over the seed corpus) — centroids are frozen at
  * build time, so a stream cannot bootstrap an empty index. Periodic
  * re-clustering (drifted centroids) and de-fragmentation stay
  * OFFLINE concerns: stop the stream, [[Similarity.indexCompactTo]] /
  * rebuild blue-green, restart — or let [[Similarity.maintainIndex]]
  * drive the stop → rebuild → flip → restart cycle off the measured
  * probed-fraction statistic.
  *
  * SINGLE WRITER per index path: the append's meta read-modify-write and
  * pre-append dedup snapshot are not safe against a CONCURRENT second
  * writer — attach at most ONE stream to an index, and never run an
  * ad-hoc ivfAppend/ivfPqAppend against it while the stream is active
  * (concurrent writers can double-insert shared ids and lose counter
  * bumps). The exactly-once claim is for sequential redelivery, which is
  * what foreachBatch's recovery model produces; micro-batches of one
  * stream never overlap.
  */
object AnnIndexStream {

  /** Start a stream appending every micro-batch into the IVF index at
    * `indexPath`. `transform` maps the raw micro-batch to index-schema
    * rows (must match the seed corpus schema), defaulting to identity.
    */
  def attachIvf(stream: DataFrame, vecCol: Column, idCol: Column,
                indexPath: String, checkpoint: String,
                transform: DataFrame => DataFrame = identity)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfAppend(batch.sparkSession, indexPath,
          transform(batch), vecCol, idCol)
        ()
      }
      .start()

  /** The IVF-PQ twin: micro-batches are encoded with the frozen codebooks
    * (kept attribute columns ride along per the index recipe).
    */
  def attachIvfPq(stream: DataFrame, vecCol: Column, idCol: Column,
                  indexPath: String, checkpoint: String,
                  transform: DataFrame => DataFrame = identity)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfPqAppend(batch.sparkSession, indexPath,
          transform(batch), vecCol, idCol)
        ()
      }
      .start()
}
