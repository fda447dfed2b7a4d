package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress evidence for CONCURRENT queries on a grown store — the
  * multi-tenant server shape: one long-lived GraftDB (one SparkSession, one
  * relation cache) answering many dim-equality and window queries at once.
  * The reference serves concurrent reads from its filestore without
  * coordination (table.go iterators are per-query); our equivalent claim is
  * that N parallel queries through one driver (a) are thread-safe and
  * (b) share the session's 32 cores instead of serializing.
  *
  * Runs against the QueryStress 100× store (3,000 days, built by
  * `runMain graft.tools.QueryStress`): 8 dim-equality queries over distinct
  * user_ids (distinct buckets — distinct cached relations) + 8 one-day
  * window queries over distinct days, three ways: cold-serial (first touch
  * of each relation), warm-serial (relation cache hot), warm-concurrent
  * (8 threads). Results recorded in BENCH_LOCAL.md.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ConcurrencyStress [storeDir]"
  */
object ConcurrencyStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val store = args.headOption.getOrElse("/tmp/graft-scale/qstore_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val yaml =
      "ev:\n  partitionby: [user_id]\n  sql: >\n    SELECT value, AVG(value) AS av FROM evs GROUP BY event_type, user_id, period(1h)\n"
    val dayMs = 86400000L
    val base = EventsBlowup.baseEvents(spark, sfDir)
    val Seq(minMs, maxMs) = base
      .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val midDay = (minMs / dayMs + maxMs / dayMs) / 2
    def iso(day: Long) = java.time.LocalDate.ofEpochDay(day).toString
    val uids = base
      .filter((unix_millis(col("ts")) / lit(dayMs)).cast("long") === midDay)
      .select(col("user_id")).distinct().limit(8).collect().map(_.getLong(0)).toSeq

    val db = new graft.GraftDB(spark, yaml, store)
    val queries: Seq[String] =
      uids.map(u =>
        s"SELECT value FROM ev WHERE user_id = $u GROUP BY event_type, period(1h)") ++
      (0 until 8).map(i =>
        s"SELECT value FROM ev ASOF '${iso(midDay - 3 + i)}' UNTIL '${iso(midDay - 2 + i)}' GROUP BY event_type")

    def runAll(threads: Int): Double = {
      val t0 = System.nanoTime()
      if (threads == 1) queries.foreach(q => db.sql(q).collect())
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        try {
          val futs = queries.map(q => pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = db.sql(q).collect().length.toLong
          }))
          futs.foreach(_.get())
        } finally pool.shutdown()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val cold = runAll(1)       // first touch: each query resolves its relation
    val warmSerial = runAll(1) // relation cache hot
    val warmConc = runAll(8)   // the server shape: 8 clients at once
    println(f"""{"metric":"concurrent_queries","store":"$store","queries":${queries.size},"cold_serial_sec":$cold%.2f,"warm_serial_sec":$warmSerial%.2f,"warm_concurrent8_sec":$warmConc%.2f,"concurrency_speedup":${warmSerial / warmConc}%.2f}""")
    spark.stop()
  }
}
