package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the CROSSTAB one-scan-vs-two-scan trade at a sf1-equivalent
  * corpus (10× the sf0.1 events table, ~60M rows via EventsBlowup):
  *
  *  - one-scan (the shipped shape, Planner.planCrosstab): aggregate
  *    accumulators onto (keys, __ct) once, persist that group-cardinality
  *    frame, and derive the pivot-value collect AND the pivot from it.
  *  - two-scan (the pre-r11 shape): collect pivot values from one
  *    aggregation over the raw source, then run the pivot as a second
  *    full-source aggregation.
  *
  * At sf0.1 the persist materialization costs more than the saved scan
  * (BENCH r10→r11 q_crosstab 1.67×); this tool shows where the trade
  * inverts as the source outgrows the group cardinality. Also loops many
  * distinct one-scan crosstabs to confirm session storage stays bounded
  * (Planner.registerCrosstabCache FIFO).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.CrosstabStress [k]"
  */
object CrosstabStress {

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-crosstab-stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = EventsBlowup.blowUp(spark, sfDir, k)
    val ev = spark.read.parquet(dir)
      .select(date_trunc("DAY", col("ts")).as("day"),
        lower(col("event_type")).as("__ct"), col("value"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def oneScan(): Long = {
      val pre = ev.groupBy(col("day"), col("__ct"))
        .agg(sum(col("value")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val vals = pre.select(col("__ct")).where(col("__ct").isNotNull)
          .distinct().collect().map(_.getString(0)).sorted.toSeq
        pre.groupBy(col("day")).pivot("__ct", vals)
          .agg(first(col("v"))).count()
      } finally pre.unpersist(blocking = true)
    }

    def twoScan(): Long = {
      val vals = ev.select(col("__ct")).where(col("__ct").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted.toSeq
      ev.groupBy(col("day")).pivot("__ct", vals)
        .agg(sum(col("value"))).count()
    }

    // CROSSTABT shapes: totals need every selected column again, so the
    // no-persist variant pays a SECOND full-width aggregation (not a
    // column-pruned sliver like the values scan)
    def totalsPre(): Long = {
      val pre = ev.groupBy(col("day"), col("__ct"))
        .agg(sum(col("value")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val vals = pre.select(col("__ct")).where(col("__ct").isNotNull)
          .distinct().collect().map(_.getString(0)).sorted.toSeq
        val piv = pre.groupBy(col("day")).pivot("__ct", vals).agg(first(col("v")))
        val tot = pre.groupBy(col("day")).agg(sum(col("v")).as("total"))
        piv.join(tot, "day").count()
      } finally pre.unpersist(blocking = true)
    }
    def totalsRescan(): Long = {
      val vals = ev.select(col("__ct")).where(col("__ct").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted.toSeq
      val piv = ev.groupBy(col("day")).pivot("__ct", vals).agg(sum(col("value")))
      val tot = ev.groupBy(col("day")).agg(sum(col("value")).as("total"))
      piv.join(tot, "day").count()
    }

    // warm the page cache / JIT once each, then measure 3 rounds
    oneScan(); twoScan(); totalsPre(); totalsRescan()
    val one = (0 until 3).map(_ => time(oneScan())).sorted.apply(1)
    val two = (0 until 3).map(_ => time(twoScan())).sorted.apply(1)
    val tp = (0 until 3).map(_ => time(totalsPre())).sorted.apply(1)
    val tr = (0 until 3).map(_ => time(totalsRescan())).sorted.apply(1)

    // bounded-storage loop: many DISTINCT crosstab shapes through the real
    // planner path would be heavier; here we pin the primitive — repeated
    // persist+register keeps getPersistentRDDs bounded by the FIFO cap
    val before = spark.sparkContext.getPersistentRDDs.size
    for (i <- 0 until 30) {
      val pre = ev.filter(col("value") > i * 0.001)
        .groupBy(col("day"), col("__ct")).agg(sum(col("value")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.planner.Planner.registerCrosstabCache(pre)
      pre.select(col("__ct")).distinct().collect()
    }
    val after = spark.sparkContext.getPersistentRDDs.size

    println(s"""{"metric":"crosstab_scale","k":$k,""" +
      s""""one_scan_sec":${f"$one%.2f"},"two_scan_sec":${f"$two%.2f"},""" +
      s""""ratio":${f"${one / two}%.3f"},""" +
      s""""totals_pre_sec":${f"$tp%.2f"},"totals_rescan_sec":${f"$tr%.2f"},""" +
      s""""totals_ratio":${f"${tp / tr}%.3f"},""" +
      s""""cached_before":$before,"cached_after":$after}""")
    spark.stop()
  }
}
