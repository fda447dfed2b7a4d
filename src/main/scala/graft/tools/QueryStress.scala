package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftDB

/** Scale-stress evidence for the stored-table QUERY path — the last 100 TB
  * claim without a measured exponent (round-7 verdict, next-round #1). The
  * same events corpus blow-up as [[IngestStress]] (more days × more users)
  * is materialized into stores holding 1×, 10×, 100× of data, then:
  *
  *  1. a 1-day ASOF/UNTIL window query must cost O(window), NOT O(store):
  *     manifest day pruning (MaterializedTable.readPruned) opens only the
  *     day dirs overlapping the window, so the time should be FLAT in store
  *     size (target exponent ≈ 0);
  *  2. a `partitionby`-dim equality query must be decisively sub-linear vs
  *     the full scan: the sorted, dim-partitioned day files (the
  *     reference's sorted filestore + partition advice, table.go:537-557,
  *     README.md:522-529) let the pushed filter skip row groups whose
  *     min/max stats exclude the value;
  *  3. the full-scan control grows ~linearly — proof the corpus actually
  *     grew (without it, flat curves prove nothing).
  *
  * Copy 0 of every store is IDENTICAL (copies 1.. are day- and id-shifted
  * away), so the window and dim queries — both aimed at copy-0 data — must
  * return identical results at every scale: the correctness cross-check
  * rides along with the timing.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.QueryStress"
  * Results are recorded in BENCH_LOCAL.md.
  */
object QueryStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same multi-JVM escape hatch as Bench: SPARK_GRAFT_MASTER +
    // SPARK_GRAFT_JARS rerun the identical exponent measurements on real
    // separate executors
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the Bench ingest shape + the sorted partitionby layout under test
    val yaml =
      "ev:\n  partitionby: [user_id]\n  sql: >\n    SELECT value, AVG(value) AS av FROM evs GROUP BY event_type, user_id, period(1h)\n"

    // aim both selective queries at copy-0 data, present in every store
    val base = EventsBlowup.baseEvents(spark, sfDir)
    val Seq(minMs, maxMs) = base
      .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val dayMs = 86400000L
    val midDay = (minMs / dayMs + maxMs / dayMs) / 2
    def iso(day: Long) = java.time.LocalDate.ofEpochDay(day).toString
    val (d0, d1) = (iso(midDay), iso(midDay + 1))
    // floor-div via cast: Spark's `/` on longs is TRUE division (double)
    val uid = base
      .filter((unix_millis(col("ts")) / lit(dayMs)).cast("long") === midDay)
      .select(col("user_id")).head().getLong(0)

    def store(k: Int): String = {
      val dir = s"/tmp/graft-scale/qstore_x$k"
      if (!Files.exists(java.nio.file.Paths.get(dir, "ev", "MANIFEST"))) {
        val db = new GraftDB(spark, yaml, dir)
        db.insert("evs", spark.read.parquet(EventsBlowup.blowUp(spark, sfDir, k)))
      }
      dir
    }

    val qWindow =
      s"SELECT value FROM ev ASOF '$d0' UNTIL '$d1' GROUP BY event_type"
    val qDim =
      s"SELECT value FROM ev WHERE user_id = $uid GROUP BY event_type, period(1h)"
    val qFull = "SELECT value FROM ev GROUP BY event_type"

    /** User-facing latency: plan construction (catalog + planner) AND
      * execution, min of two runs (cold-JIT/load decorrelation).
      */
    def time(storeDir: String, sql: String): Double = {
      def once(): Double = {
        val db = new GraftDB(spark, yaml, storeDir)
        val t0 = System.nanoTime()
        db.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    /** Rows canonicalized for cross-store comparison: doubles rounded to
      * 1e-6 (sum ORDER differs between a 32-file and 3200-file store, so
      * last-ulp float drift is expected; value drift is not).
      */
    def rowsOf(storeDir: String, sql: String): Seq[String] = {
      val db = new GraftDB(spark, yaml, storeDir)
      db.sql(sql).collect().map(_.toSeq.map {
        case d: Double => f"$d%.6f"
        case other => String.valueOf(other)
      }.mkString("|")).toSeq.sorted
    }

    val scales = Seq(1, 10, 100)
    val stores = scales.map(k => k -> store(k)).toMap
    time(stores(1), qWindow) // warmup: codegen/class-load out of the fit

    val results = for (k <- scales) yield {
      val tw = time(stores(k), qWindow)
      val td = time(stores(k), qDim)
      val tf = time(stores(k), qFull)
      println(f"""{"store_scale":$k,"window_1d_sec":$tw%.2f,"dim_eq_sec":$td%.2f,"full_scan_sec":$tf%.2f}""")
      (k, tw, td, tf)
    }
    val byK = results.map(r => r._1 -> r).toMap
    def expo(t: Int => Double): Double =
      math.log(t(100) / t(1)) / math.log(100.0)
    println(f"""{"metric":"query_scaling_exponent","window_1d":${
      expo(k => byK(k)._2)}%.2f,"dim_eq":${expo(k => byK(k)._3)}%.2f,"full_scan":${
      expo(k => byK(k)._4)}%.2f,"dim_vs_full_100x":${byK(100)._3 / byK(100)._4}%.2f}""")

    // correctness cross-check: copy-0-aimed queries are scale-invariant
    val w1 = rowsOf(stores(1), qWindow)
    val w100 = rowsOf(stores(100), qWindow)
    val di1 = rowsOf(stores(1), qDim)
    val di100 = rowsOf(stores(100), qDim)
    require(w1.nonEmpty && w1 == w100,
      s"window query diverged across scales: ${w1.take(2)} vs ${w100.take(2)}")
    require(di1.nonEmpty && di1 == di100,
      s"dim query diverged across scales: ${di1.take(2)} vs ${di100.take(2)}")
    println(s"""{"metric":"query_scale_invariance","window_rows":${w1.size},"dim_rows":${di1.size},"identical":true}""")
    spark.stop()
  }
}
