package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Giant-batch stress for [[graft.pipeline.Dedup.nearDupIncremental]]:
  * above `maxBroadcastBandRows` the batch's band rows must NOT broadcast —
  * the index band scan shuffles once, amortized over the batch — and the
  * survivor set must still match a closed-form expectation.
  *
  * Fixture with a provable answer: history docs carry 10 tokens unique to
  * their id (no organic cross-doc overlap), and the batch interleaves four
  * classes per id k — an exact copy of a history doc (j = 1, rejected), a
  * 9-of-10-token near copy (j = 0.9, rejected at threshold 0.9), a
  * 5-of-10 "far" copy padded with fresh tokens (j = 1/3, survives), and a
  * wholly fresh doc (survives). Bases are distinct within each class, so
  * expected survivors = exactly half the batch. The intra-batch pair
  * (exact copy, near copy) of one base scores 0.9 — the dominance rule
  * fires but both rows are already history-rejected, so the expectation
  * stays closed-form while the code path still runs.
  *
  * Run: sbt "runMain graft.tools.NearDupStress [histDocs] [batchRows]"
  */
object NearDupStress {
  def main(args: Array[String]): Unit = {
    val histDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val batchRows = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    require(batchRows / 4 <= histDocs, "bases must stay distinct per class")
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
    def toks(base: org.apache.spark.sql.Column, n: Int) =
      (0 until n).map(i => concat(lit(s"t${i}_"), base))

    val idx = java.nio.file.Files
      .createTempDirectory("nd-stress").toString + "/i"
    val hist = spark.range(histDocs).select(col("id").as("doc_id"),
      concat_ws(" ", toks(col("id"), 10): _*).as("text"))
    val (_, buildSec) = time {
      graft.pipeline.Dedup.buildNearDupIndex(hist, col("text"), col("doc_id"),
        idx, n = 1, numHashes = 64, bands = 32)
    }

    val base = (col("id") / 4).cast("long")
    val batch = spark.range(batchRows).select(
      (col("id") + 10000000L).as("doc_id"),
      when(col("id") % 4 === 0, concat_ws(" ", toks(base, 10): _*))
        .when(col("id") % 4 === 1, concat_ws(" ", toks(base, 9): _*))
        .when(col("id") % 4 === 2, concat_ws(" ",
          toks(base, 5) ++ (0 until 5).map(i =>
            concat(lit(s"f${i}_"), col("id"))): _*))
        .otherwise(concat_ws(" ", (0 until 10).map(i =>
          concat(lit(s"n${i}_"), col("id"))): _*))
        .as("text"))

    // forced shuffle: the giant-batch path (no band-row broadcast anywhere)
    val (bigCount, bigSec) = time {
      graft.pipeline.Dedup.nearDupIncremental(batch, col("text"),
        col("doc_id"), idx, n = 1, numHashes = 64, bands = 32,
        threshold = 0.9, admit = false, maxBroadcastBandRows = 0L).count()
    }
    val expected = batchRows / 2

    // the daily shape: a small broadcast probe against the same index
    val small = spark.range(1000L).select(
      (col("id") + 90000000L).as("doc_id"),
      when(col("id") % 2 === 0,
          concat_ws(" ", toks((col("id") / 2).cast("long"), 10): _*))
        .otherwise(concat_ws(" ", (0 until 10).map(i =>
          concat(lit(s"s${i}_"), col("id"))): _*)).as("text"))
    val (smallCount, smallSec) = time {
      graft.pipeline.Dedup.nearDupIncremental(small, col("text"),
        col("doc_id"), idx, n = 1, numHashes = 64, bands = 32,
        threshold = 0.9, admit = false).count()
    }

    // one admitting pass (counter + clustered append) at the giant size
    val (_, admitSec) = time {
      graft.pipeline.Dedup.nearDupIncremental(batch, col("text"),
        col("doc_id"), idx, n = 1, numHashes = 64, bands = 32,
        threshold = 0.9, admit = true, maxBroadcastBandRows = 0L)
        .write.format("noop").mode("overwrite").save()
    }

    println(s"""{"metric":"neardup_giant_batch","hist_docs":$histDocs,""" +
      s""""batch_rows":$batchRows,"index_build_sec":${f"$buildSec%.1f"},""" +
      s""""shuffle_path_sec":${f"$bigSec%.1f"},"survivors":$bigCount,""" +
      s""""survivors_expected":$expected,"match":${bigCount == expected},""" +
      s""""small_broadcast_sec":${f"$smallSec%.2f"},""" +
      s""""small_survivors":$smallCount,""" +
      s""""admit_shuffle_sec":${f"$admitSec%.1f"}}""")
    spark.stop()
  }
}
