package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media payloads ride as opaque `binary` columns next to a typed metadata
  * struct; all Spark-side plumbing (schema, partition sizing, batch shape)
  * is real. The actual codec work is STUBBED — this container has no
  * image/audio libraries — behind deterministic byte-derived fakes marked
  * `STUB:` below, so the distributed shape is testable end-to-end and a real
  * decoder drops in by replacing one function.
  */
object Multimodal {

  /** media metadata struct carried beside every payload */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  /** Attach a metadata struct derived from raw fields. */
  def withMeta(df: DataFrame, format: Column, width: Column, height: Column,
               durationMs: Column): DataFrame =
    df.withColumn("meta", struct(
      format.as("format"), width.cast("int").as("width"),
      height.cast("int").as("height"), durationMs.cast("long").as("duration_ms")))

  /** Partition media rows so each task holds ~`targetMb` of payload — large
    * blobs otherwise skew task runtimes and blow executor memory. This is the
    * knob that matters at 100 TB: size tasks by bytes, not row count.
    */
  def repartitionBySize(df: DataFrame, payload: Column, targetMb: Int): DataFrame = {
    val targetBytes = targetMb.toLong * 1024 * 1024
    val totalBytes = df.agg(sum(length(payload))).collect()(0).getLong(0)
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    df.repartition(parts)
  }

  /** STUB: image decode → fixed-dim feature vector. A real implementation
    * would decode `payload` (JPEG/PNG) and pool pixels; the container has no
    * codec, so features are deterministic hashes of payload chunks — the
    * schema (`array<float>` of length `dim`) and batch shape are the real
    * contract.
    */
  def decodeImageFeatures(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(payload, i), lit(2000001L)) - 1000000L).cast("float") / 1000000.0f)

  /** STUB: audio decode → per-window energy envelope of `windows` values.
    * Real path: PCM decode + RMS per window. Fake derives from byte slices
    * so unequal payloads produce unequal envelopes.
    */
  def decodeAudioEnvelope(payload: Column, windows: Int): Column =
    transform(sequence(lit(0), lit(windows - 1)), i =>
      pmod(xxhash64(substring(payload, lit(1).cast("int"), lit(64).cast("int")), i),
        lit(1000L)).cast("float") / 1000.0f)

  /** STUB: sample every-nth frame of a video payload as binary slices.
    * Real path: container demux + keyframe extraction. The fake slices bytes
    * (substring on binary is a real Spark op) so downstream plumbing sees
    * genuine per-frame binary chunks.
    */
  def sampleFrames(payload: Column, frameBytes: Int, everyN: Int,
                   maxFrames: Int): Column =
    filter(
      transform(sequence(lit(0), lit(maxFrames - 1)),
        i => payload.substr(i * frameBytes * everyN + 1, lit(frameBytes))),
      f => length(f) > 0)

  /** Resize metadata after a (stubbed) scale operation — the metadata math
    * is real; the pixel work is the codec's job.
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    struct(
      meta.getField("format").as("format"),
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }
}
