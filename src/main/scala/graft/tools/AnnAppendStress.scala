package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Measures the claim behind incremental ANN maintenance: appending a
  * daily batch must cost FAR less than the full rebuild a corpus change
  * used to force, and must not grow with corpus size beyond the one
  * column-pruned id scan (or at all, in the fresh-ids fast path).
  *
  * For each corpus size N: build an IVF index over N rows, then time
  *   (a) a full rebuild (what every append used to cost),
  *   (b) ivfAppend of a B-row batch with the id anti-join (safe mode),
  *   (c) ivfAppend with dedupAgainstIndex=false (fresh-ids fast path).
  * Run: runMain graft.tools.AnnAppendStress [sizes...]
  */
object AnnAppendStress {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(20000, 80000, 320000)
    val batch = 2000
    val dim = 32
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Int, off: Long): DataFrame =
      spark.range(n).select((col("id") + off).as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => (pmod(xxhash64(col("id") + off, i), lit(1000)).cast("double")
            / 1000.0).cast("float"))
          .as("embedding"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- sizes) {
      val dir = java.nio.file.Files.createTempDirectory(s"annstress-$n")
        .toString
      val seed = corpus(n, 0L)
      // write the seed once so build/append read comparable parquet
      seed.write.mode("overwrite").parquet(s"$dir/seed")
      val seedP = spark.read.parquet(s"$dir/seed")
      val nc = math.max(16, math.sqrt(n.toDouble).toInt / 4)
      val (_, tBuild) = time {
        Similarity.ivfBuildIfMissing(seedP, col("embedding"), col("vec_id"),
          nc, s"$dir/idx")
      }
      val b1 = corpus(batch, n.toLong)
      val (_, tSafe) = time {
        Similarity.ivfAppend(spark, s"$dir/idx", b1, col("embedding"),
          col("vec_id"))
      }
      val b2 = corpus(batch, n.toLong + batch)
      val (_, tFast) = time {
        Similarity.ivfAppend(spark, s"$dir/idx", b2, col("embedding"),
          col("vec_id"), dedupAgainstIndex = false)
      }
      println(f"[annappend] n=$n%7d centroids=$nc%5d build=$tBuild%7.2fs " +
        f"append_safe=$tSafe%6.2fs append_fast=$tFast%6.2fs " +
        f"(batch $batch, rebuild/append ${tBuild / tSafe}%5.1fx)")

      // GIANT-batch append through the shuffle fallback (the bootstrap
      // backfill shape the unguarded broadcast would have OOM'd at real
      // scale): a batch comparable to the whole index, forced down the
      // always-shuffle path, overlapping history on the odd ids so the
      // survivor count has an independent expectation.
      val giant = corpus(n, n.toLong + 2L * batch) // all fresh
        .unionByName(seedP.filter(col("vec_id") % 2 === 1)) // half the index
      val preRows = spark.read.parquet(s"$dir/idx").count()
      val (appended, tGiant) = time {
        Similarity.ivfAppend(spark, s"$dir/idx", giant, col("embedding"),
          col("vec_id"), maxBroadcastIds = 0L)
      }
      val postRows = spark.read.parquet(s"$dir/idx").count()
      val distinctIds = spark.read.parquet(s"$dir/idx")
        .select(col("vec_id")).distinct().count()
      assert(appended == n.toLong,
        s"giant fallback: expected $n fresh survivors, got $appended")
      assert(postRows == preRows + n && distinctIds == postRows,
        s"giant fallback: rows $preRows->$postRows distinct=$distinctIds")
      println(f"[annappend] n=$n%7d GIANT fallback batch=${n + n / 2}%8d " +
        f"append_shuffle=$tGiant%6.2fs survivors=$appended%8d (verified)")
    }
    spark.stop()
  }
}
