package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared corpus blow-up for the scale-stress tools: k independent copies
  * of the events table with re-seeded user/event ids (the group space grows
  * k× — identical copies would just deepen existing accumulators) and
  * per-copy 32-day time strides (events span ~30 days, so each copy owns
  * its day partitions). This is how 100 TB of events actually grows: more
  * days, more users — not denser duplicates of one day.
  */
object EventsBlowup {

  /** Base events via Catalog (events.ts is parquet TIMESTAMP(NANOS),
    * unreadable without the nanosAsLong switch + classify()'s conversion).
    */
  def baseEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.Catalog.fromParquetDir(spark, sfDir, Seq("events"))
      .get("events").df
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  /** Materialize the k× corpus under /tmp/graft-scale (cached across runs
    * of the same session's tools).
    */
  def blowUp(spark: SparkSession, sfDir: String, k: Int): String = {
    val dir = s"/tmp/graft-scale/ev_x$k"
    if (!Files.isDirectory(java.nio.file.Paths.get(dir))) {
      val copies = spark.range(k).select(col("id").as("__copy"))
      baseEvents(spark, sfDir).crossJoin(copies)
        .select(
          (col("event_id") + col("__copy") * 100000000L).as("event_id"),
          timestamp_millis(unix_millis(col("ts")) +
            col("__copy") * (32L * 86400000L)).as("ts"),
          (col("user_id") + col("__copy") * 100000000L).as("user_id"),
          col("event_type"), col("value"))
        .repartition(32)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }
}
