package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-gate plan hygiene sweep: prints any gate query whose physical plan
  * contains a WindowExec, more than one SinglePartition exchange, or a
  * cartesian product — the shapes that silently serialize at scale. Keyed
  * windows (non-empty partitionBy) are expected for per-group ranking
  * (q_dedup_exact, q_embed_top_pairs, per-series crosstab shift); anything
  * NEW appearing here deserves a PlanSpec pin or a fix.
  *
  *   sbt "runMain graft.tools.PlanSweep"
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        val win = p.contains("Window")
        val sp = "SinglePartition".r.findAllIn(p).size
        val cart = p.contains("CartesianProduct")
        val smj = "SortMergeJoin".r.findAllIn(p).size
        if (win || cart || sp > 1)
          println(f"$name%-22s window=$win singlePartition=$sp cartesian=$cart sortMergeJoin=$smj")
      } catch { case e: Throwable => println(s"$name ERR ${e.getMessage}") }
    }
    println("sweep done")
    spark.stop()
  }
}
