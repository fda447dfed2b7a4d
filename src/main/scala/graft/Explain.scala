package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection util: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan — the loop for checking PushedFilters/ReadSchema,
  * broadcast choices, and WholeStageCodegen spans before shipping a query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE may right-size cached-plan output partitions (see Bench)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
