package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sampling, TextAnalysis}

/** Scale exponents for the round-13 text-pipeline operators — line dedup,
  * bigram-LM cross-entropy, RAG chunking, sequence packing — on k×
  * INDEPENDENT corpus copies (tokens re-tagged per copy, as in ScaleStress:
  * the corpus grows the way "more data" grows — new text, not duplicate
  * cliques; vocab and unit spaces scale with it).
  *
  * Healthy shapes: chunking/packing are map-only / one-keyed-window, so
  * ≈1.0 or below; line dedup is two keyed shuffles → ≈1.0; bigram xent is
  * two LM aggregations + lookup joins → ≈1.0 (its LM table grows with the
  * re-tagged vocab here — the worst case; a natural corpus's vocab grows
  * sub-linearly).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *      sbt "runMain graft.tools.TextPipelineStress"
  * Results recorded in BENCH_LOCAL.md.
  */
object TextPipelineStress {
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

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))

    def blowUp(k: Int): String = {
      val copies = spark.range(k).select(col("id").as("__copy"))
      val dir = s"/tmp/graft-scale/text_x$k"
      base.crossJoin(copies)
        .select(
          (col("doc_id") + col("__copy") * 100000000L).as("doc_id"),
          concat(col("source"), lit("_"), col("__copy")).as("source"),
          when(col("__copy") === 0, col("text")).otherwise(
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("c"), col("__copy"), lit("_$1")))).as("text"))
        .repartition(32)
        .write.mode("overwrite").parquet(dir)
      dir
    }

    def lineDedup(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir).filter(length(trim(col("text"))) > 0)
      val toks = TextAnalysis.tokensSimple(col("text"))
      val chunked = array_join(
        transform(sequence(lit(0), floor((size(toks) - 1) / 5).cast("int")),
          i => concat_ws(" ", slice(toks, i * 5 + 1, lit(5)))), "\n")
      Dedup.lineDedup(docs.select(col("doc_id"), chunked.as("__t")),
        col("__t"), col("doc_id"))
    }
    def bigramXent(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir)
      TextAnalysis.bigramCrossEntropy(docs, col("text"), col("doc_id"))
    }
    def chunk(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir)
      TextAnalysis.chunkText(docs, col("text"), col("doc_id"), 40, 10)
    }
    def pack(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir).filter(length(trim(col("text"))) > 0)
      Sampling.packSequences(docs,
        size(TextAnalysis.tokensSimple(col("text"))), col("doc_id"),
        col("source"), 512)
    }

    def spans(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir)
      Dedup.repeatedSpanStats(docs, col("text"), col("doc_id"), n = 5)
    }
    def dsir(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir)
      Sampling.dsirWeights(docs, col("text"), col("doc_id"),
        col("source").endsWith("_0"), nBuckets = 4096)
    }
    def classify(dir: String): DataFrame = {
      val docs = spark.read.parquet(dir)
      val wt = spark.range(1024).select(col("id").as("bucket"),
        ((col("id") * lit(2654435761L)) % 2001 - 1000).as("w_milli"))
      TextAnalysis.classifierScore(docs, col("text"), col("doc_id"), wt, 1024)
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(df: => DataFrame): Double = math.min(time(df), time(df))

    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val dirs = scales.map(k => k -> blowUp(k)).toMap
    time(lineDedup(dirs(1))); time(bigramXent(dirs(1)))
    time(chunk(dirs(1))); time(pack(dirs(1)))
    time(spans(dirs(1))); time(dsir(dirs(1))); time(classify(dirs(1)))

    val ops: Seq[(String, String => DataFrame)] = Seq(
      "line_dedup" -> lineDedup, "bigram_xent" -> bigramXent,
      "chunk_text" -> chunk, "pack_sequences" -> pack,
      "repeated_spans" -> spans, "dsir" -> dsir, "classifier" -> classify)
    val results = scales.map { k =>
      val row = ops.map { case (name, f) => name -> minOf2(f(dirs(k))) }
      println(s"""{"scale":$k,${row.map { case (n, t) =>
        f""""$n%s":$t%.2f""" }.mkString(",")}}""")
      k -> row.toMap
    }.toMap
    val kHi = scales.max
    val kMid = scales.sorted.takeRight(2).head
    def expo(name: String, k0: Int, k1: Int): Double =
      math.log(results(k1)(name) / results(k0)(name)) /
        math.log(k1.toDouble / k0)
    println("{\"metric\":\"scaling_exponent\"," + ops.map { case (n, _) =>
      f""""$n%s":${expo(n, 1, kHi)}%.2f,"${n}_tail":${expo(n, kMid, kHi)}%.2f"""
    }.mkString(",") + s""","scales":[${scales.mkString(",")}]}""")
    spark.stop()
  }
}
