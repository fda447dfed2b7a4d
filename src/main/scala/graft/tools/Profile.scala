package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named gate queries in sequence with repeats. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE may right-size cached-plan output partitions (see Bench)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"  [$name plan ${(t1 - t0) / 1e9}%.3f exec ${(t2 - t1) / 1e9}%.3f]")
      (t2 - t0) / 1e9
    }
    run("q_sum_group") // session warmup, matches Bench
    args.foreach { n => println(f"$n%-20s ${run(n)}%.3f s") }
    spark.stop()
  }
}
