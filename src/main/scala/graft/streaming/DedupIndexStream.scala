package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.Dedup

/** Structured-Streaming maintenance of the exact-dedup index — the
  * streaming twin of [[AnnIndexStream]]: every micro-batch of a document
  * stream runs [[Dedup.exactIncremental]] with `admit = true` against the
  * persistent hash index, so "have we ever admitted this text" stays
  * fresh while the crawl flows, with no rebuild on the hot path.
  *
  * Exactly-once INDEX CONTENT from at-least-once delivery: a redelivered
  * micro-batch recomputes its novel set against an index that already
  * holds the batch's hashes, so the re-append is empty — the same
  * idempotence the batch path's crash fuzz pins (the meta counter may
  * bump spuriously, which is the refusing side of the tripwire, never a
  * lost or duplicated hash). No output transaction log is needed for the
  * index itself.
  *
  * SURVIVOR DELIVERY is AT-LEAST-ONCE: with a `sink`, each batch's novel
  * rows are computed as a PURE READ (`admit = false`) and handed to the
  * sink BEFORE the admitting pass commits anything. A crash after the
  * sink but before the admit therefore replays the same survivors on
  * redelivery — duplicates, never losses. That ordering is deliberate:
  * admit-first would silently DROP survivors whenever the sink dies after
  * the admit (the redelivered batch's novel set is empty), and a lost
  * training document is strictly worse than a duplicated one feeding a
  * downstream exact dedup (which this library provides). Make the sink
  * idempotent (e.g. write to a per-batch-id directory) or re-dedup
  * downstream to finish the exactly-once chain. The sink-bearing mode
  * pays one extra read of the (broadcast-joined, map-only for daily-sized
  * batches) index scan; pure maintenance (`sink` omitted) runs the single
  * admitting pass only.
  *
  * SINGLE WRITER per index path, same contract as the ANN appends: the
  * meta read-modify-write and the pre-append snapshot are not safe
  * against a concurrent second writer — attach at most one stream, and
  * never run an ad-hoc admitting [[Dedup.exactIncremental]] against the
  * same index while the stream is active. Sequential redelivery (what
  * foreachBatch's recovery model produces) is the supported schedule.
  *
  * The index must exist before the stream starts
  * ([[Dedup.buildExactIndexIfMissing]] over the admitted history, or an
  * empty build for a cold start).
  */
object DedupIndexStream {

  /** Start a stream admitting every micro-batch's novel texts into the
    * exact-dedup index at `indexPath`. `sink` (optional) receives each
    * batch's survivors — novel rows, at-least-once — before their hashes
    * commit; `None` is pure index maintenance in one pass.
    */
  def attach(stream: DataFrame, keyCol: Column, idCol: Column,
             indexPath: String, checkpoint: String,
             sink: Option[DataFrame => Unit] = None)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.foreach { s =>
          // pure read against the pre-admit snapshot, delivered FIRST so a
          // crash between sink and admit replays (never loses) survivors
          s(Dedup.exactIncremental(batch, keyCol, idCol, indexPath,
            admit = false))
        }
        // the admitting pass commits counter-then-append (crash-ordered);
        // its returned plan is pinned to the pre-append file list and is
        // discarded here — the side effect is the point
        Dedup.exactIncremental(batch, keyCol, idCol, indexPath, admit = true)
        ()
      }
      .start()
}
