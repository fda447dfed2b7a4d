package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every (or the named) gate query into
  * one file per query — the plans/rNN/<query>_{before,after}.txt evidence
  * the optimization rounds commit. One session for all dumps (per-query
  * Explain JVMs would take an hour across the suite).
  *
  *   scripts/jrun graft.tools.BulkExplain <outDir> [sfDir] [query...]
  */
object BulkExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE may right-size cached-plan output partitions (see Bench)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n.txt"), plan)
        println(s"[bulk-explain] $n ok")
      } catch { case e: Throwable =>
        println(s"[bulk-explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
