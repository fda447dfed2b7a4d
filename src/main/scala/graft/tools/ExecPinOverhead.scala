package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the execution-pin listener's per-query cost (r19: a
  * SparkListener walks every SQL execution's optimized plan for GC-able
  * file roots once a maintenance enrollment exists — see
  * [[graft.GraftDB]] "execution-time generation pinning").
  *
  * Phase A times repeated SIMSEARCH queries with NO enrollment in the
  * session (listener never registered — the zero-cost path every
  * maintenance-free db keeps). Phase B enrolls a SECOND index for
  * maintenance (listener active, candidate set nonempty) and re-times the
  * SAME queries — every execution now runs the listener's candidate
  * computation + plan walk on the bus thread. The listener is
  * asynchronous (bus thread, not the query path), so the expectation is
  * parity within noise; this tool exists so that claim is a number in
  * BENCH_LOCAL.md, not an assertion. Phase order biases warm-up toward B,
  * i.e. AGAINST hiding an overhead regression in A.
  *
  * Run: sbt "runMain graft.tools.ExecPinOverhead [reps]"  (default 60)
  */
object ExecPinOverhead {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 60
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
    import spark.implicits._

    val rnd = new scala.util.Random(7)
    val vecs = (0L until 2000L).map { i =>
      (i, Seq.fill(16)((rnd.nextGaussian() * 2).toFloat))
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("execpin-ovh").toString
    graft.pipeline.Similarity.ivfBuildIfMissing(vecs, col("embedding"),
      col("vec_id"), nCentroids = 8, s"$root/a")
    graft.pipeline.Similarity.ivfBuildIfMissing(vecs, col("embedding"),
      col("vec_id"), nCentroids = 8, s"$root/b")

    val db = new graft.GraftDB(spark,
      "combined:\n  sql: >\n    SELECT requests FROM inbound GROUP BY server, period(5m)\n",
      java.nio.file.Files.createTempDirectory("execpin-ovh-db").toString)
    db.registerAnnIndex("qidx", s"$root/a", "embedding", "vec_id",
      quantized = false)
    val qv = vecs.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getSeq[Float](0)
    val vecLit = qv.map(f => new java.math.BigDecimal(f.toString)
      .toPlainString).mkString(",")
    val sql =
      s"SELECT score FROM SIMSEARCH('qidx', [$vecLit], 5, 4) GROUP BY id"

    def block(label: String): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        require(db.sqlTimed(sql, 120000L).length == 5)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val med = times(times.size / 2)
      println(f"[execpin-ovh] $label median ${med}%.1f ms over $reps reps " +
        f"(p90 ${times((times.size * 9) / 10)}%.1f)")
      med
    }

    (1 to 20).foreach(_ => db.sqlTimed(sql, 120000L)) // warm-up
    val a0 = block("no-enrollment warm-in (discard)")
    val a = block("no-enrollment (listener unregistered)")
    // enroll a DIFFERENT index: listener registers, candidate set becomes
    // nonempty, every execution pays the plan walk — but no pin matches
    // the measured query's index, isolating pure listener overhead
    db.registerAnnMaintenance("midx", s"$root/b", "embedding", "vec_id",
      nProbe = 4, scanBudget = 2.0, gcOldGenerations = true)
    val b0 = block("enrolled warm-in (discard)")
    val b = block("enrolled (listener active)")
    println(f"[execpin-ovh] drift check: A $a0%.1f -> $a%.1f, " +
      f"B $b0%.1f -> $b%.1f ms")
    println(f"[execpin-ovh] delta ${b - a}%+.1f ms/query " +
      f"(${(b / a - 1) * 100}%+.1f%%; compare against the A-block drift " +
      "before reading this as listener cost)")
    spark.stop()
  }
}
