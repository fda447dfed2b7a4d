package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.Dedup

/** Structured-Streaming maintenance of the NEAR-DUP MinHash index — the
  * near-duplicate twin of [[DedupIndexStream]]: every micro-batch runs
  * [[Dedup.nearDupIncremental]] with `admit = true`, so "is this text a
  * near-duplicate of anything ever admitted" stays fresh while the crawl
  * flows, with no rebuild on the hot path.
  *
  * Exactly-once INDEX CONTENT from at-least-once delivery, by the same
  * argument as the exact twin with one extra case: a redelivered doc is an
  * EXACT copy of its admitted self, so its Jaccard is 1.0 ≥ any threshold
  * and the re-append is empty; zero-shingle docs (the documented
  * pass-through) are never admitted in the first place, so they cannot
  * duplicate either. The meta counter may bump spuriously on redelivery —
  * the refusing side of the tripwire, never a lost or duplicated
  * signature.
  *
  * SURVIVOR DELIVERY is AT-LEAST-ONCE with the same deliberate ordering as
  * [[DedupIndexStream]]: the optional `sink` receives each batch's novel
  * rows from a PURE READ (`admit = false`) before the admitting pass
  * commits, so a crash between the two replays — never loses — survivors.
  * The sink-bearing mode pays the candidate+verify pass twice; make the
  * sink idempotent or re-dedup downstream.
  *
  * SINGLE WRITER per index path (the meta read-modify-write and the
  * pre-append snapshot are not safe against a concurrent second writer):
  * attach at most one stream, and never run an ad-hoc admitting
  * [[Dedup.nearDupIncremental]] against the same index while it is active.
  *
  * The index must exist before the stream starts
  * ([[Dedup.buildNearDupIndexIfMissing]] over the admitted history, or an
  * empty-corpus build for a cold start) and the stream's (n, numHashes,
  * bands) must match the recipe the index was built with.
  */
object NearDupIndexStream {

  /** Start a stream admitting every micro-batch's novel (non-near-dup)
    * texts into the MinHash index at `indexPath`. `sink` (optional)
    * receives each batch's survivors — at-least-once — before their
    * signatures commit; `None` is pure index maintenance in one pass.
    */
  def attach(stream: DataFrame, textCol: Column, idCol: Column,
             indexPath: String, checkpoint: String,
             n: Int, numHashes: Int, bands: Int, threshold: Double,
             sink: Option[DataFrame => Unit] = None)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.foreach { s =>
          // pure read against the pre-admit snapshot, delivered FIRST so a
          // crash between sink and admit replays (never loses) survivors
          s(Dedup.nearDupIncremental(batch, textCol, idCol, indexPath,
            n, numHashes, bands, threshold, admit = false))
        }
        Dedup.nearDupIncremental(batch, textCol, idCol, indexPath,
          n, numHashes, bands, threshold, admit = true)
        ()
      }
      .start()
}
