package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the [[graft.pipeline.Similarity.ivfAssign]] ceiling as the
  * centroid matrix grows (round-11 verdict #7): ArgMinCosine carries the
  * matrix as ONE flat double[] reference object inside the task binary, so
  * a 10^4-centroid × dim-1024 index rides ~84 MB of plan state into every
  * job — fine or fatal depending on broadcast, not codegen (code size is
  * O(1) in centroid count by design).
  *
  * Reports per-cell: wall seconds (min of 2), µs/row, and the scan-only
  * control (vector synthesis without the argmin) so the argmin cost is
  * separable. Rows per cell are scaled to keep centroids×dim×rows roughly
  * constant — the quantity measured is overhead growth, not FLOPs.
  *
  * Run: sbt "runMain graft.tools.CentroidStress"
  */
object CentroidStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic vectors, generated inside the scan (no
    // materialized corpus): element j of row id = hash(id, j) mapped to
    // [-1, 1)
    def vecExpr(dim: Int) =
      transform(sequence(lit(0), lit(dim - 1)),
        j => pmod(xxhash64(col("id"), j), lit(1000L)).cast("float") / 500.0f - 1.0f)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val grid = args.toSeq match {
      case Seq(nc, dim, rows) => Seq((nc.toInt, dim.toInt, rows.toLong))
      case _ => Seq((1000, 128, 80000L), (10000, 128, 8000L),
        (1000, 1024, 10000L), (10000, 1024, 1000L))
    }
    val out = grid.map { case (nc, dim, rows) =>
      val rnd = new scala.util.Random(42)
      val cents = (0 until nc).map(i =>
        i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
      val df = spark.range(rows).repartition(cpus.toInt)
        .select(vecExpr(dim).as("v"))
      var buildSec = 0.0
      def assignOnce(): Long = {
        val t0 = System.nanoTime()
        val assigned = graft.pipeline.Similarity.ivfAssign(df, col("v"), cents)
        buildSec = (System.nanoTime() - t0) / 1e9 // matrix copy + broadcast
        assigned.groupBy("__c").count().count()
      }
      val control = time(df.agg(count(lit(1))).collect()) // synthesis only
      assignOnce() // warm codegen + first task-binary broadcast
      val sec = Seq(time(assignOnce()), time(assignOnce())).min
      val usRow = sec * 1e6 / rows
      val matMb = nc.toLong * dim * 8 / 1000000
      println(f"""{"centroids":$nc,"dim":$dim,"rows":$rows,"matrix_mb":$matMb,"assign_sec":$sec%.2f,"us_per_row":$usRow%.1f,"build_bcast_sec":$buildSec%.2f,"control_sec":$control%.2f}""")
      (nc, dim, sec)
    }
    println(s"""{"metric":"centroid_scale","cells":${out.size}}""")
    spark.stop()
  }
}
