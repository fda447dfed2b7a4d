package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Giant-batch stress for [[graft.pipeline.Dedup.containmentIncremental]]:
  * above `maxBroadcastRows` nothing broadcasts — the postings and the
  * probe frames shuffle once, amortized over the batch — and the survivor
  * set must still match a closed-form expectation.
  *
  * Fixture with a provable answer: history docs carry 10 tokens unique to
  * their id, and the batch interleaves four classes per id k — an exact
  * copy (c = 1, rejected), a 5-token PREFIX quote (c = 1 via "batch
  * quotes history", the side-1 probe direction), the history doc EXTENDED
  * with 5 fresh tokens (c = 1 via "history quoted by batch", side 2), and
  * a wholly fresh doc (survives). Bases are distinct within each class,
  * so expected survivors = exactly a quarter of the batch; intra-batch
  * dominance among same-base classes fires but only on rows history
  * already rejects, keeping the expectation closed-form.
  *
  * Run: sbt "runMain graft.tools.ContainmentStress [histDocs] [batchRows]"
  */
object ContainmentStress {
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
      .createTempDirectory("cn-stress").toString + "/i"
    val hist = spark.range(histDocs).select(col("id").as("doc_id"),
      concat_ws(" ", toks(col("id"), 10): _*).as("text"))
    val (_, buildSec) = time {
      graft.pipeline.Dedup.buildContainmentIndex(hist, col("text"),
        col("doc_id"), idx, n = 1, numProbes = 16)
    }

    val base = (col("id") / 4).cast("long")
    val batch = spark.range(batchRows).select(
      (col("id") + 10000000L).as("doc_id"),
      when(col("id") % 4 === 0, concat_ws(" ", toks(base, 10): _*))
        .when(col("id") % 4 === 1, concat_ws(" ", toks(base, 5): _*))
        .when(col("id") % 4 === 2, concat_ws(" ",
          toks(base, 10) ++ (0 until 5).map(i =>
            concat(lit(s"f${i}_"), col("id"))): _*))
        .otherwise(concat_ws(" ", (0 until 10).map(i =>
          concat(lit(s"n${i}_"), col("id"))): _*))
        .as("text"))

    // forced shuffle: the giant-batch path (no broadcast anywhere)
    val (bigCount, bigSec) = time {
      graft.pipeline.Dedup.containmentIncremental(batch, col("text"),
        col("doc_id"), idx, n = 1, threshold = 0.95, numProbes = 16,
        admit = false, maxBroadcastRows = 0L).count()
    }
    val expected = batchRows / 4

    // the daily shape: a small broadcast probe against the same index
    val small = spark.range(1000L).select(
      (col("id") + 90000000L).as("doc_id"),
      when(col("id") % 2 === 0,
          concat_ws(" ", toks((col("id") / 2).cast("long"), 3): _*))
        .otherwise(concat_ws(" ", (0 until 8).map(i =>
          concat(lit(s"s${i}_"), col("id"))): _*)).as("text"))
    val (smallCount, smallSec) = time {
      graft.pipeline.Dedup.containmentIncremental(small, col("text"),
        col("doc_id"), idx, n = 1, threshold = 0.95, numProbes = 16,
        admit = false).count()
    }

    // one admitting pass (counter + postings + docs) at the giant size
    val (_, admitSec) = time {
      graft.pipeline.Dedup.containmentIncremental(batch, col("text"),
        col("doc_id"), idx, n = 1, threshold = 0.95, numProbes = 16,
        admit = true, maxBroadcastRows = 0L)
        .write.format("noop").mode("overwrite").save()
    }

    println(s"""{"metric":"containment_giant_batch","hist_docs":$histDocs,""" +
      s""""batch_rows":$batchRows,"index_build_sec":${f"$buildSec%.1f"},""" +
      s""""shuffle_path_sec":${f"$bigSec%.1f"},"survivors":$bigCount,""" +
      s""""survivors_expected":$expected,"match":${bigCount == expected},""" +
      s""""small_broadcast_sec":${f"$smallSec%.2f"},""" +
      s""""small_survivors":$smallCount,""" +
      s""""admit_shuffle_sec":${f"$admitSec%.1f"}}""")
    spark.stop()
  }
}
