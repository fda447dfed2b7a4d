package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Catalog, Engine}

/** Scale exponents for the dialect query families the bench exercises but
  * ScaleStress (pipeline ops) and QueryStress (stored-table reads) don't
  * cover: SHIFT, CROSSTAB, IN-subquery, PERCENTILE (round-7 verdict,
  * next-round #7). Each family runs the gate-shaped query over 1×/10×/100×
  * corpora and fits a log-ratio exponent — the claim is that none of the
  * custom operator machinery (explode-regroup, pivot-value collect + wide
  * agg, bounded two-phase IN collect, mergeable sketch agg) degrades
  * super-linearly as the data grows.
  *
  * Blow-up shapes mirror how each input actually grows at 100 TB:
  *  - lineitem/part grow k× with re-seeded part keys (the join/IN key space
  *    grows; the pivot dims l_returnflag/l_linestatus keep their real
  *    cardinality — pivot width is a workload property, not a scale one);
  *  - orders copies are time-shifted 8 years apart, so period('30d')
  *    buckets — and with them SHIFT's group space — grow k×.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.DialectStress"
  * Results are recorded in BENCH_LOCAL.md.
  */
object DialectStress {
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

    val FixedNow = 886809600000L // post-TPC-H range, as the gates pin it

    def blowUp(k: Int): String = {
      val dir = s"/tmp/graft-scale/dialect_x$k"
      if (!Files.isDirectory(java.nio.file.Paths.get(dir))) {
        val copies = spark.range(k).select(col("id").as("__copy"))
        def dup(df: DataFrame, rekey: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column]): DataFrame =
          df.crossJoin(copies).select(df.columns.map { c =>
            rekey.get(c).map(f => f(col(c)).as(c)).getOrElse(col(c))
          }: _*)
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        dup(li, Map(
          "l_orderkey" -> (c => c + col("__copy") * 100000000L),
          "l_partkey" -> (c => c + col("__copy") * 100000000L)))
          .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        dup(ord, Map(
          "o_orderkey" -> (c => c + col("__copy") * 100000000L),
          // keep the column TIMESTAMP: date_add returns DATE, and a stored
          // DATE column would exercise classify's date-cast path instead of
          // the real fixture's timestamp shape
          "o_orderdate" -> (c =>
            date_add(c, (col("__copy") * 3000).cast("int")).cast("timestamp"))))
          .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
        val part = spark.read.parquet(s"$sfDir/part.parquet")
        dup(part, Map(
          "p_partkey" -> (c => c + col("__copy") * 100000000L)))
          .repartition(32).write.mode("overwrite").parquet(s"$dir/part.parquet")
      }
      dir
    }

    val families = Seq(
      "shift" ->
        """SELECT SUM(o_totalprice * 100) / 100 AS rev,
          |  SHIFT(SUM(o_totalprice * 100) / 100, '-30d') AS prev_rev
          |FROM orders GROUP BY _, period('30d')""".stripMargin,
      "crosstab" ->
        """SELECT l_quantity AS qty FROM lineitem
          |GROUP BY l_linestatus, CROSSTAB(l_returnflag)""".stripMargin,
      "in_subquery" ->
        """SELECT l_quantity AS qty FROM lineitem
          |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
          |GROUP BY l_returnflag""".stripMargin,
      "percentile" ->
        """SELECT PERCENTILE(l_quantity, 50, 0, 100, 2) AS p50,
          |  PERCENTILE(l_quantity, 95, 0, 100, 2) AS p95
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)

    def time(cat: Catalog, sql: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Engine.sql(cat, sql, () => FixedNow)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val scales = Seq(1, 10, 100)
    val cats = scales.map(k => k -> Catalog.fromParquetDir(spark, blowUp(k),
      Seq("lineitem", "orders", "part"))).toMap
    families.foreach { case (_, sql) => time(cats(1), sql) } // warmup

    val rows = for ((name, sql) <- families) yield {
      val ts = scales.map(k => k -> time(cats(k), sql)).toMap
      val e = math.log(ts(100) / ts(1)) / math.log(100.0)
      val eTail = math.log(ts(100) / ts(10)) / math.log(10.0)
      println(f"""{"family":"$name","sec_1x":${ts(1)}%.2f,"sec_10x":${ts(10)}%.2f,"sec_100x":${ts(100)}%.2f,"exponent":$e%.2f,"exponent_tail":$eTail%.2f}""")
      name -> e
    }
    println(s"""{"metric":"dialect_scaling","families":${
      rows.map { case (n, e) => "\"" + n + f"""\":$e%.2f""" }.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
