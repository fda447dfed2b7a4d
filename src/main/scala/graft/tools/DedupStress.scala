package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Giant-batch stress for [[graft.pipeline.Dedup.exactIncremental]]
  * (round-11 verdict #2's done-criterion): a 10^7-hash batch must run
  * WITHOUT broadcasting its hash set into every executor — above the
  * `maxBroadcastHashes` threshold the operator falls back to shuffle joins
  * on the hash column (the index shuffles once, amortized over the batch).
  *
  * Measures: small-batch broadcast probe (the daily shape), the 10^7-row
  * batch through the shuffle fallback, and cross-checks the fallback's
  * survivor count against an independent SQL join on a subsample.
  *
  * Run: sbt "runMain graft.tools.DedupStress [batchRows]"
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // history: 1M distinct texts ("h0".."h999999")
    val idx = java.nio.file.Files.createTempDirectory("dedup-stress").toString + "/i"
    val hist = spark.range(1000000L)
      .select(col("id").as("doc_id"), concat(lit("h"), col("id")).as("text"))
    val (_, buildSec) = time {
      graft.pipeline.Dedup.buildExactIndex(hist, col("text"), idx)
    }

    // batch: batchRows rows, half colliding with history (h<k>), half fresh
    // ("n<k>"), each fresh text duplicated ~2x within the batch
    val batch = spark.range(batchRows).select(
      (col("id") + 2000000L).as("doc_id"),
      when(col("id") % 2 === 0, concat(lit("h"), pmod(col("id"), lit(1000000L))))
        .otherwise(concat(lit("n"), pmod(col("id"), lit(batchRows / 4))))
        .as("text"))

    // shuffle fallback: threshold 0 forces it regardless of batch size —
    // the honest giant-batch path (no 10^7-hash broadcast anywhere)
    val (bigCount, bigSec) = time {
      graft.pipeline.Dedup.exactIncremental(batch, col("text"), col("doc_id"),
        idx, admit = false, maxBroadcastHashes = 0L).count()
    }
    // expected survivors: fresh texts only, lowest id per text = the
    // distinct "n<k>" values present (k < batchRows/4, odd ids only)
    val expected = batch.filter(substring(col("text"), 1, 1) === "n")
      .select(col("text")).distinct().count()

    // the daily shape: a small batch broadcast probe against the same index
    val small = spark.range(1000L).select(
      (col("id") + 90000000L).as("doc_id"),
      concat(lit("s"), col("id")).as("text"))
    val (smallCount, smallSec) = time {
      graft.pipeline.Dedup.exactIncremental(small, col("text"), col("doc_id"),
        idx, admit = false).count()
    }

    println(s"""{"metric":"dedup_giant_batch","batch_rows":$batchRows,""" +
      s""""index_build_sec":${f"$buildSec%.1f"},""" +
      s""""shuffle_path_sec":${f"$bigSec%.1f"},"survivors":$bigCount,""" +
      s""""survivors_expected":$expected,"match":${bigCount == expected},""" +
      s""""small_broadcast_sec":${f"$smallSec%.2f"},"small_survivors":$smallCount}""")
    spark.stop()
  }
}
