package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Quantifies WHEN an incrementally-appended IVF index needs the offline
  * re-cluster the docs prescribe. Drift does NOT primarily hurt recall —
  * a drifted query and its drifted neighbors still agree on the nearest
  * FROZEN centroid, so they meet in the same cell (measured: recall@10
  * stayed 0.99–1.00 out to drift 5× the cluster radius). What drift
  * destroys is CELL BALANCE: appends from a shifted distribution crowd
  * into few frozen cells, so a "pruned" probe reads an ever-growing
  * fraction of the corpus and the index degenerates toward a scan — a
  * COST collapse, not a quality collapse. After each drifted append this
  * prints the probed-corpus fraction for an nProbe-2-of-8 probe (queries
  * drawn from the fresh batch, the data users actually search for) and
  * the max cell share; re-cluster when the probed fraction crosses the
  * scan-budget. Run: runMain graft.tools.AnnDriftStress [driftStep]
  */
object AnnDriftStress {
  def main(args: Array[String]): Unit = {
    val driftStep = if (args.nonEmpty) args(0).toDouble else 0.5
    val dim = 16
    val nClusters = 8
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new scala.util.Random(31)
    val centers = Seq.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 8))
    // ONE shared drift direction: a real ingest-distribution shift moves
    // the whole stream toward a common region ("the new crawl is all
    // <new domain>"), which is what crowds frozen cells — per-cluster
    // random directions just re-spread the data (measured: probed
    // fraction stayed ~0.30 out to drift 40 under that model)
    val shared = {
      val r = new scala.util.Random(999)
      Array.fill(dim)(r.nextGaussian())
    }
    def corpus(n: Int, off: Long, drift: Double): DataFrame =
      (0 until n).map { i =>
        val c = centers(i % nClusters)
        (off + i, c.indices.map(j =>
          (c(j) + drift * shared(j) + rnd.nextGaussian() * 0.3).toFloat))
      }.toDF("vec_id", "embedding")

    val seed = corpus(2000, 0L, 0.0)
    val idx = java.nio.file.Files.createTempDirectory("ann-drift").toString + "/i"
    val cents = Similarity.ivfBuildIfMissing(seed, col("embedding"),
      col("vec_id"), nClusters, idx)
    var all = seed
    for (step <- 1 to 5) {
      val drift = driftStep * step
      val batch = corpus(500, 10000L * step, drift)
      Similarity.ivfAppend(spark, idx, batch, col("embedding"), col("vec_id"))
      all = all.unionByName(batch)
      // cell occupancy after the append (one small agg over the index)
      val occ = spark.read.parquet(idx).groupBy(col("__c"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val total = occ.values.sum.toDouble
      // probed fraction: rows inside each fresh query's 2 nearest frozen
      // cells / corpus — the cost of a "pruned" probe
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      val fracs = batch.limit(20).collect().map(_.getSeq[Float](1)).map { q =>
        val probes = cents.sortBy { case (i, c) => (-cos(c, q), i) }
          .take(2).map(_._1)
        probes.map(c => occ.getOrElse(c, 0L)).sum / total
      }
      println(f"[anndrift] appended=${step * 500} drift=$drift%.1f " +
        f"probed_fraction(nProbe 2/8)=${fracs.sum / fracs.length}%.3f " +
        f"(balanced would be ${2.0 / nClusters}%.3f) " +
        f"max_cell_share=${occ.values.max / total}%.3f")
    }
    spark.stop()
  }
}
