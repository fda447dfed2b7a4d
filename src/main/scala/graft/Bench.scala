package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries execute to a noop
  * sink so column pruning can't skip the projected work the way `count()`
  * would.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup amortizes JVM/codegen/session start out of per-query numbers.
    // Five plan families on throwaway data hit the big one-time class-load
    // paths: scan+agg (via a real query), driver collect (CollectLimitExec +
    // result serialization), pivot (PivotFirst + wide-agg codegen), join,
    // and window (WindowExec) — without pre-running any measured query's
    // own work.
    run("q_sum_group")
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, row_number, sum}
      spark.range(100).select(col("id").cast("string"))
        .distinct().limit(1000).collect()
      val t = Seq(("a", "x", 1.0), ("b", "y", 2.0)).toDF("k", "p", "v")
      t.groupBy("k").pivot("p", Seq("x", "y")).agg(sum("v"))
        .write.format("noop").mode("overwrite").save()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("v"))
      t.join(t.select(col("k"), col("v").as("v2")), Seq("k"), "full")
        .withColumn("rn", row_number().over(w))
        .write.format("noop").mode("overwrite").save()
    }

    // ingest benchmark (the reference's only perf instrumentation is insert
    // throughput, insert.go:110-118): materialize the events stream into a
    // 1h-bucketed table and report seconds
    def runIngest(): Double = {
      val t0 = System.nanoTime()
      try {
        val dir = java.nio.file.Files.createTempDirectory("graft-bench").toString
        val db = new GraftDB(spark,
          "ev:\n  sql: >\n    SELECT value, AVG(value) AS av FROM evs GROUP BY event_type, user_id, period(1h)\n",
          dir)
        db.insert("evs", Catalog.fromParquetDir(spark, sfDir, Seq("events"))
          .get("events").df)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ingest failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val results = (SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n))) :+
      ("ingest_events" -> runIngest())
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
