package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.pipeline.Similarity

/** Measures the actual recall@3 margin behind the `_fast` ANN twins'
  * pinned 0.9 floor (SparkEntry.recallRow): runs the same pruned configs
  * (IVF nProbe 4/16; IVF-PQ nProbe 4, refineK 50) against the cached
  * exact truth for one or more fixture dirs and prints the raw recall per
  * config — the number the folded boolean gate hides by design. Run per
  * round to confirm the floor keeps real margin at every scale factor:
  *
  *   runMain graft.tools.RecallProbe /root/testdata/sf0.001 ...
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def recallOf(fast: org.apache.spark.sql.DataFrame,
                 truth: org.apache.spark.sql.DataFrame): Double =
      truth.join(fast.select(col("qid"), col("id"), lit(1).as("__hit"))
          .distinct(), Seq("qid", "id"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1))).as("r"))
        .collect()(0).getDouble(0)

    for (dir <- dirs) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val corpus = e.filter(col("vec_id") >= 20)
      val truth = SparkEntry.gateAnnTruth(spark, dir)
      val centroids = Similarity.ivfBuildIfMissing(corpus, col("embedding"),
        col("vec_id"), nCentroids = 16, SparkEntry.gateBatchPath(dir))
      val ivfFast = Similarity.ivfTopKBatch(spark, SparkEntry.gateBatchPath(dir),
        centroids, e.filter(col("vec_id") < 20), col("vec_id"),
        col("embedding"), col("vec_id"), col("embedding"), k = 3,
        nProbe = 4, quantized = true)
      val (coarse, books) = Similarity.ivfPqBuildIfMissing(corpus,
        col("embedding"), col("vec_id"), nCentroids = 16, m = 8, k = 16,
        SparkEntry.gatePqBatchPath(dir))
      val pqFast = Similarity.ivfPqTopKBatch(spark,
        SparkEntry.gatePqBatchPath(dir), coarse, books, corpus,
        col("embedding"), col("vec_id"), e.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), k = 3, nProbe = 4, refineK = 50,
        quantized = true)
      // filtered fast path vs the exact FILTERED truth (its own compound
      // recall regime — the q_ann_filtered_fast floor calibrates off this)
      val truthF = SparkEntry.gateAnnTruth(spark, dir, filtered = true)
      val ivfFilt = Similarity.ivfTopKBatch(spark, SparkEntry.gateBatchPath(dir),
        centroids, e.filter(col("vec_id") < 20), col("vec_id"),
        col("embedding"), col("vec_id"), col("embedding"), k = 3,
        nProbe = 4, quantized = true,
        extraFilter = Some(col("label") % 3 === 0))
      println(f"[recall] $dir ivf_fast=${recallOf(ivfFast, truth)}%.4f " +
        f"pq_fast=${recallOf(pqFast, truth.filter(col("qid") < 10))}%.4f " +
        f"ivf_filtered_fast=${recallOf(ivfFilt, truthF)}%.4f")
      if (sys.env.contains("RECALL_SWEEP")) {
        for (np <- Seq(4, 6, 8)) {
          val iv = Similarity.ivfTopKBatch(spark, SparkEntry.gateBatchPath(dir),
            centroids, e.filter(col("vec_id") < 20), col("vec_id"),
            col("embedding"), col("vec_id"), col("embedding"), k = 3,
            nProbe = np, quantized = true)
          println(f"[sweep] $dir ivf nProbe=$np r=${recallOf(iv, truth)}%.4f")
          for (rk <- Seq(50, 100, 200)) {
            val pq = Similarity.ivfPqTopKBatch(spark,
              SparkEntry.gatePqBatchPath(dir), coarse, books, corpus,
              col("embedding"), col("vec_id"), e.filter(col("vec_id") < 10),
              col("vec_id"), col("embedding"), k = 3, nProbe = np,
              refineK = rk, quantized = true)
            println(f"[sweep] $dir pq nProbe=$np refineK=$rk " +
              f"r=${recallOf(pq, truth.filter(col("qid") < 10))}%.4f")
          }
        }
      }
    }
    spark.stop()
  }
}
