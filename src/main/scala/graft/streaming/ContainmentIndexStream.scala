package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.Dedup

/** Structured-Streaming maintenance of the CONTAINMENT (quotation) index —
  * the third streaming twin ([[DedupIndexStream]], [[NearDupIndexStream]]):
  * every micro-batch runs [[Dedup.containmentIncremental]] with
  * `admit = true`, so "does this doc quote anything ever admitted" stays
  * fresh while the crawl flows.
  *
  * Exactly-once INDEX CONTENT under at-least-once redelivery: a
  * redelivered doc is an exact copy of its admitted self (containment
  * 1.0 ≥ any threshold), so the re-append is empty; zero-shingle docs are
  * never admitted. A crash mid-admit leaves at worst orphan postings,
  * which the replay self-heals (the operator's post-first ordering — its
  * crash fuzz pins twin convergence), so index content stays exact while
  * posting rows may transiently duplicate (benign; compaction drops them).
  *
  * SURVIVOR DELIVERY is AT-LEAST-ONCE via a pure pre-admit read, same
  * ordering and rationale as the other two twins. SINGLE WRITER per
  * index path.
  */
object ContainmentIndexStream {

  /** Start a stream admitting every micro-batch's novel (non-quoting,
    * non-quoted) texts into the containment index at `indexPath`.
    */
  def attach(stream: DataFrame, textCol: Column, idCol: Column,
             indexPath: String, checkpoint: String,
             n: Int, threshold: Double, numProbes: Int = 16,
             sink: Option[DataFrame => Unit] = None)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.foreach { s =>
          s(Dedup.containmentIncremental(batch, textCol, idCol, indexPath,
            n, threshold, numProbes, admit = false))
        }
        Dedup.containmentIncremental(batch, textCol, idCol, indexPath,
          n, threshold, numProbes, admit = true)
        ()
      }
      .start()
}
