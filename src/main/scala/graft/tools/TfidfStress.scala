package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for tf-idf's shared term-frequency cache: cached
  * ([[graft.pipeline.TextAnalysis.tfidfKeywords]]) vs an uncached twin that
  * recomputes the (doc, token) relation per consumer (the pre-r13 shape),
  * at 1× and N× corpus blow-ups of sf0.1 documents.
  *
  * The question it answers: the cache build is a fixed serialization cost —
  * at what corpus size does one tokenize pass beat three? (At 100 TB the
  * answer is trivially "cached": tokenization dominates per-row cost and
  * the uncached plan tokenizes up to three times. The tool pins where the
  * crossover sits so the small-scale bench delta can be attributed.)
  *
  * Usage: sbt "runMain graft.tools.TfidfStress [multipliers...]"
  */
object TfidfStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextAnalysis

    // uncached twin: the pre-r13 tfidfKeywords, term-frequency recomputed
    // by every consumer
    def uncached(df: DataFrame, k: Int): DataFrame = {
      def perDocF = df.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(TextAnalysis.tokensSimple(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfs = perDocF.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDf = perDocF.agg(countDistinct(col("doc_id")).cast("double").as("__n"))
      val score = round(col("tf").cast("double") * log(col("__n") / col("df")), 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(score.desc, col("token"))
      perDocF.join(dfs, "token").crossJoin(broadcast(nDf))
        .select(col("doc_id"), col("token"),
          row_number().over(w).cast("long").as("rank"), score.as("score"))
        .filter(col("rank") <= k)
    }

    def corpus(mult: Int): DataFrame = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      (0 until mult).map(i => base.select(
        (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm both plan families once on a tiny slice
    locally {
      val tiny = corpus(1).filter(col("doc_id") < 100)
      TextAnalysis.tfidfKeywords(tiny, col("text"), col("doc_id"), 3)
        .write.format("noop").mode("overwrite").save()
      uncached(tiny, 3).write.format("noop").mode("overwrite").save()
    }
    println(f"${"mult"}%6s ${"rows"}%10s ${"cached_s"}%9s ${"uncached_s"}%11s ratio")
    for (m <- mults) {
      val c = corpus(m)
      val rows = c.count()
      val tc = (1 to 2).map(_ => time(
        TextAnalysis.tfidfKeywords(c, col("text"), col("doc_id"), 5)
          .write.format("noop").mode("overwrite").save())).min
      val tu = (1 to 2).map(_ => time(
        uncached(c, 5).write.format("noop").mode("overwrite").save())).min
      println(f"$m%6d $rows%10d $tc%9.2f $tu%11.2f ${tu / tc}%5.2f")
    }
    spark.stop()
  }
}
