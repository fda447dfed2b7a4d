package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance-cost profile for the dedup index family across corpus
  * sizes: puts numbers on the lifecycle's three cost classes so the
  * 100 TB story is measured, not asserted.
  *
  *  - `stat_tick`: [[graft.pipeline.Dedup.maintainIndex]] when nothing is
  *    fragmented — the per-tick steady-state cost every enrolled index
  *    pays. Expected ~flat in corpus size (one driver file listing).
  *  - `incremental`: one fixed-size batch through
  *    [[graft.pipeline.Dedup.nearDupIncremental]] — the per-batch ingest
  *    cost. The batch broadcasts into a map-only scan of the index
  *    (PlanSpec pins no-shuffle), so growth with corpus size is the
  *    columnar scan term, with no shuffle of corpus-proportional data.
  *  - `compact`: a forced full compaction (maxFilesPerPrefix = 1) — the
  *    amortized cost. Corpus-linear by design (blue/green rewrite), paid
  *    once per ~maxFilesPerPrefix fragmenting batches per prefix, i.e.
  *    amortized corpus/maxFiles per batch; the statistic that triggers it
  *    is the flat `stat_tick`.
  *
  * Fixture: every doc carries tokens unique to its id, so MinHash bands
  * never collide across docs (candidate generation stays O(batch)) and
  * every incremental row admits — the measured time is pipeline cost,
  * not verification skew.
  *
  * Run: sbt "runMain graft.tools.MaintStress [corpusSizes...]"
  *      (default 20000 80000 320000; env SPARK_GRAFT_MASTER/JARS/CPUS as
  *      the other stress tools)
  */
object MaintStress {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(20000L, 80000L, 320000L)
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
    def docs(from: Long, n: Long) =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(i =>
          concat(lit(s"w${i}_"), col("id"))): _*).as("text"))
    def fileCount(p: String): Int =
      spark.read.parquet(p).inputFiles.length

    val batchRows = 2000L
    sizes.foreach { n =>
      val idx = java.nio.file.Files
        .createTempDirectory(s"maint-stress-$n").toString + "/i"
      val (_, buildSec) = time {
        graft.pipeline.Dedup.buildNearDupIndexIfMissing(docs(0L, n),
          col("text"), col("doc_id"), idx, n = 1, numHashes = 64, bands = 16)
      }
      // steady state: the statistic alone, nothing to compact
      val (r0, statSec) = time {
        graft.pipeline.Dedup.maintainIndex(spark, idx,
          s"$idx-gX", maxFilesPerPrefix = 1000000)
      }
      require(!r0.compacted, "stat tick must not compact")
      // one fixed-size batch: per-batch ingest cost at this corpus size
      val (_, incSec) = time {
        graft.pipeline.Dedup.nearDupIncremental(docs(10000000L, batchRows),
          col("text"), col("doc_id"), idx, n = 1, numHashes = 64,
          bands = 16, threshold = 0.9, admit = true)
      }
      // fragment with two more batches, then force the full compaction
      (1 to 2).foreach { b =>
        graft.pipeline.Dedup.nearDupIncremental(
          docs(20000000L + b * 1000000L, batchRows),
          col("text"), col("doc_id"), idx, n = 1, numHashes = 64,
          bands = 16, threshold = 0.9, admit = true)
      }
      val before = fileCount(idx)
      val ((res, compactSec)) = time {
        graft.pipeline.Dedup.maintainIndex(spark, idx,
          s"$idx-g1", maxFilesPerPrefix = 1)
      }
      require(res.compacted, "forced compact must flip")
      val after = fileCount(res.activePath)
      val rows = spark.read.parquet(res.activePath).count()
      println(f"""{"metric":"maint_cost","corpus":$n,"build_sec":$buildSec%.2f,""" +
        f""""stat_tick_sec":$statSec%.3f,"incremental_${batchRows}_sec":$incSec%.2f,""" +
        f""""compact_sec":$compactSec%.2f,"files_before":$before,""" +
        f""""files_after":$after,"rows":$rows}""")
    }
    spark.stop()
  }
}
