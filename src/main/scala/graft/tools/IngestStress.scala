package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftDB

/** Scale-stress evidence for the ingest path (the one bench family without
  * a measured exponent before round 7): events blown up 10×/100× with
  * re-seeded user/event ids (group count grows with the data — identical
  * copies would just deepen existing accumulators) and per-copy time-shifts
  * (32-day strides, so each copy lands on its own day partitions — the
  * corpus grows the way 100 TB of events actually grows: more days, more
  * users).
  *
  * Two claims under test (MaterializedTable.mergeBatch):
  *  1. insert cost is ~linear in BATCH size (exponent ≈ 1 on the
  *     log-ratio fit) — the partial agg + touched-day merge + write all
  *     scale with the batch;
  *  2. insert cost is independent of STORE size — flush rewrites only the
  *     touched day partitions (O(touched days), row_store.go's
  *     generation rewrite is O(store)), so the same batch into a 1×, 10×,
  *     and 100× store should cost the same.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.IngestStress"
  * Results are recorded in BENCH_LOCAL.md.
  */
object IngestStress {
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

    def blowUp(k: Int): String = EventsBlowup.blowUp(spark, sfDir, k)

    // the Bench ingest table shape (1h buckets over event_type × user_id)
    val yaml =
      "ev:\n  sql: >\n    SELECT value, AVG(value) AS av FROM evs GROUP BY event_type, user_id, period(1h)\n"

    def freshStore(): String =
      Files.createTempDirectory("graft-ingest-stress").toString

    /** Time one insert of `dataDir` into the db at `storeDir`. */
    def ingest(dataDir: String, storeDir: String): Double = {
      val db = new GraftDB(spark, yaml, storeDir)
      val batch = spark.read.parquet(dataDir)
      val t0 = System.nanoTime()
      db.insert("evs", batch)
      (System.nanoTime() - t0) / 1e9
    }

    val scales = Seq(1, 10, 100)
    val dirs = scales.map(k => k -> blowUp(k)).toMap
    ingest(dirs(1), freshStore()) // warmup: codegen/class-load out of the fit

    // claim 1: batch-size scaling into FRESH stores (and keep each store for
    // claim 2 — after this its day partitions hold exactly one copy's data)
    val stores = scales.map(k => k -> freshStore()).toMap
    val batchTimes = scales.map { k =>
      val t = ingest(dirs(k), stores(k))
      println(f"""{"scale":$k,"ingest_sec":$t%.2f}""")
      k -> t
    }.toMap
    def expo(k0: Int, k1: Int): Double =
      math.log(batchTimes(k1) / batchTimes(k0)) / math.log(k1.toDouble / k0)
    println(f"""{"metric":"ingest_scaling_exponent","ingest":${expo(1, 100)}%.2f,""" +
      f""""ingest_tail":${expo(10, 100)}%.2f,"scales":[${scales.mkString(",")}]}""")

    // claim 2: the SAME 1× batch into stores holding 1×, 10×, 100× of data.
    // Every store's base-day partitions hold exactly one copy (copy 0), so
    // a store-size-independent flush shows flat times; an O(store) flush
    // would show ~k×.
    val sameBatch = scales.map { k =>
      val t = ingest(dirs(1), stores(k))
      println(f"""{"store_scale":$k,"ingest_x1_sec":$t%.2f}""")
      k -> t
    }.toMap
    println(f"""{"metric":"ingest_store_independence","ratio_10x":${
      sameBatch(10) / sameBatch(1)}%.2f,"ratio_100x":${
      sameBatch(100) / sameBatch(1)}%.2f}""")

    // follow-journal overhead: with an RPC server attached every committed
    // batch is also serialized into the journal by a distributed Spark
    // text write (executors write their own partitions — the one-time
    // driver-side toLocalIterator funnel measured 2.09× here and was
    // replaced) — quantify the remaining cost at 10×
    val jStore = freshStore()
    val jdb = new GraftDB(spark, yaml, jStore)
    jdb.enableFollowJournal()
    val batch10 = spark.read.parquet(dirs(10))
    val tj0 = System.nanoTime()
    jdb.insert("evs", batch10)
    val tj = (System.nanoTime() - tj0) / 1e9
    println(f"""{"metric":"ingest_journal_overhead","with_journal_10x_sec":$tj%.2f,""" +
      f""""without_sec":${batchTimes(10)}%.2f,"ratio":${tj / batchTimes(10)}%.2f}""")
    spark.stop()
  }
}
