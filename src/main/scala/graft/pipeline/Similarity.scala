package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path is a single map + TakeOrdered (top-k
  * never collects more than k×partitions rows to the driver); the LSH path
  * buckets by random-hyperplane sign bits so candidate generation is a
  * hash-partitioned join; the IVF path prunes to the nearest partitions of a
  * sampled centroid set broadcast to executors.
  */
object Similarity {

  /** Dot product — index-order summation in doubles, so results are
    * bit-reproducible across engines and runs. Compiled by the native
    * [[graft.functions.VecDot]] expression (tight codegen loop) rather than
    * an interpreted `aggregate(zip_with(...))` fold: identical fold order
    * and widening, ~an order of magnitude less per-pair overhead in joins.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantized cosine: elements rounded to 10^-6 and scaled to exact longs,
    * so the dot/norm sums are exact integers — identical in any engine.
    * Use for reproducible dedup decisions / oracle checks.
    */
  def quantize(a: Column): Column =
    transform(a, x => round(x.cast("double") * 1000000.0).cast("long"))

  def cosineQuantized(a: Column, b: Column): Column = {
    val qa = quantize(a); val qb = quantize(b)
    val dq = graft.functions.VecDot(qa, qb) // long×long stays exact
    val na = graft.functions.VecDot(qa, qa)
    val nb = graft.functions.VecDot(qb, qb)
    dq.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  /** Brute-force top-k by cosine against one query vector. Catalyst plans
    * sort+limit as TakeOrderedAndProject — no global sort materializes.
    */
  def topK(df: DataFrame, vecCol: Column, idCol: Column,
           query: Seq[Float], k: Int, quantized: Boolean = false): DataFrame = {
    val q = lit(query.toArray)
    val score = if (quantized) cosineQuantized(vecCol, q) else cosine(vecCol, q)
    df.select(idCol.as("id"), score.as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of projections onto
    * seeded pseudo-random planes. Vectors in the same bucket are cosine-close
    * with high probability; search = bucket equi-join instead of cross join.
    */
  def lshBucket(vecCol: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vecCol, lit(p)) >= 0, 1L << i).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** All pairs with cosine ≥ threshold among vectors sharing an LSH bucket
    * (near-duplicate detection on the embedding side).
    */
  def lshCosinePairs(df: DataFrame, vecCol: Column, idCol: Column, dim: Int,
                     nBits: Int, threshold: Double): DataFrame = {
    val withB = df.select(idCol.as("id"), vecCol.as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, nBits))
    val a = withB.as("a"); val b = withB.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate dedup: drop every row that has a
    * neighbor with cosine ≥ `threshold` and a smaller id — the one-pass
    * "earliest representative wins" rule production dedup pipelines use.
    * (A chain a~b~c with a<b<c keeps only a, but a component whose later
    * member is linked only through even-later rows can keep a second
    * representative — the documented trade vs an iterative
    * connected-components pass, which no single shuffle can express.)
    *
    * Candidates come from an LSH bucket self-join (`nBits` hyperplane sign
    * bits): identical/near-identical vectors collide deterministically, so
    * shuffle volume is per-bucket quadratic, not corpus quadratic. nBits=0
    * degrades to exact all-pairs — bounded blocks and oracle checks only.
    * The dropped-id set is compact (ids only), so the final anti-join
    * broadcasts at any realistic dup rate.
    */
  def cosineDedup(df: DataFrame, vecCol: Column, idCol: Column,
                  threshold: Double, dim: Int = 0, nBits: Int = 0,
                  quantized: Boolean = false): DataFrame = {
    require(nBits == 0 || dim > 0, "dim is required when nBits > 0")
    // per-ROW prep (quantization + norm) BEFORE the join: a HOF like
    // quantize() inside the pair predicate would re-fold both arrays
    // interpreted, once per pair — the same trap blockedTopPairs dodges
    val base = df.select(idCol.as("id"), vecCol.as("v"))
      .withColumn("bucket",
        if (nBits == 0) lit(0L) else lshBucket(col("v"), dim, nBits))
    val prep =
      if (quantized) base
        .select(col("id"), col("bucket"), quantize(col("v")).as("qv"))
        .withColumn("nq",
          sqrt(graft.functions.VecDot(col("qv"), col("qv")).cast("double")))
      else base.select(col("id"), col("bucket"), col("v").as("qv"))
        .withColumn("nq", norm(col("qv")))
    val a = prep.as("a"); val b = prep.as("b")
    val dotC =
      if (quantized)
        graft.functions.VecDot(col("a.qv"), col("b.qv")).cast("double")
      else dot(col("a.qv"), col("b.qv"))
    val dups = a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .filter(dotC / (col("a.nq") * col("b.nq")) >= threshold)
      .select(col("b.id").as("__dup")).distinct()
    df.join(dups, idCol === col("__dup"), "left_anti")
  }

  /** Most-similar pair per block (e.g. per label/cluster): block-local
    * self-join + window rank. The block key bounds the join quadratically —
    * at scale, blocks come from LSH buckets or IVF cells, and the same
    * ranking runs unchanged.
    */
  def blockedTopPairs(df: DataFrame, vecCol: Column, idCol: Column,
                      blockCol: Column, quantized: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // precompute per-ROW vectors and norms once; the O(pairs) join then only
    // evaluates the dot product — norms inside the pair expression would
    // re-fold both arrays for every pair
    val prep =
      if (quantized) df.select(blockCol.as("block"), idCol.as("id"),
        quantize(vecCol).as("qv"))
        .withColumn("nq",
          sqrt(graft.functions.VecDot(col("qv"), col("qv")).cast("double")))
      else df.select(blockCol.as("block"), idCol.as("id"), vecCol.as("qv"))
        .withColumn("nq", norm(col("qv")))
    val a = prep.as("a"); val b = prep.as("b")
    val dotC =
      if (quantized)
        graft.functions.VecDot(col("a.qv"), col("b.qv")).cast("double")
      else dot(col("a.qv"), col("b.qv"))
    val pairs = a.join(b, col("a.block") === col("b.block") &&
        col("a.id") < col("b.id"))
      .select(col("a.block").as("block"), col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        (dotC / (col("a.nq") * col("b.nq"))).as("c"))
    val w = Window.partitionBy(col("block"))
      .orderBy(col("c").desc, col("id_a"), col("id_b"))
    pairs.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Deterministic pseudo-random centroid sample: the `n` rows with the
    * smallest xxhash64(id) — independent of scan/partition order (a seeded
    * stand-in for k-means|| sampling; plans as TakeOrderedAndProject, so no
    * global sort materializes).
    */
  def sampleCentroids(df: DataFrame, vecCol: Column, idCol: Column,
                      n: Int): Seq[(Int, Seq[Float])] =
    df.select(idCol.as("id"), vecCol.as("v"))
      .orderBy(xxhash64(col("id")), col("id")).limit(n)
      .collect().zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](1) }.toSeq

  /** Assign each row to its nearest centroid (broadcast argmin — map-only). */
  def ivfAssign(df: DataFrame, vecCol: Column,
                centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    val dists = centroids.map { case (i, c) =>
      struct((lit(1.0) - cosine(vecCol, lit(c.toArray))).as("d"), lit(i).as("c"))
    }
    df.withColumn("__c", array_min(array(dists: _*)).getField("c"))
  }

  /** Build an IVF index at `indexPath`: sample centroids, assign rows, and
    * write the assigned table `partitionBy("__c")`. That layout is what makes
    * the probe an index: `ivfTopK`'s cell filter becomes a partition filter,
    * so at 100 TB a probe reads nProbe/nCentroids of the files, not all of
    * them.
    */
  def ivfBuild(df: DataFrame, vecCol: Column, idCol: Column, nCentroids: Int,
               indexPath: String): Seq[(Int, Seq[Float])] = {
    val centroids = sampleCentroids(df, vecCol, idCol, nCentroids)
    ivfAssign(df, vecCol, centroids)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("__c").parquet(indexPath)
    centroids
  }

  /** Order-independent dataset fingerprint: row count + XOR of xxhash64(id).
    * A single column-pruned aggregation — far cheaper than the index build
    * it guards — that changes whenever rows are added, removed, or re-keyed.
    */
  def datasetFingerprint(df: DataFrame, idCol: Column): String = {
    val r = df.agg(
      org.apache.spark.sql.functions.count(lit(1)),
      org.apache.spark.sql.functions.bit_xor(xxhash64(idCol))).collect()(0)
    s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  /** Build the IVF index only if absent — or STALE: the cached index is
    * keyed by (nCentroids, dataset fingerprint), so a changed dataset at the
    * same path rebuilds instead of silently serving stale cells. Real
    * deployments build once and amortize over queries; the fingerprint check
    * costs one count+hash scan, not a rebuild. Centroids are persisted next
    * to the index; the sample is deterministic, so reuse is exact.
    */
  def ivfBuildIfMissing(df: DataFrame, vecCol: Column, idCol: Column,
                        nCentroids: Int, indexPath: String): Seq[(Int, Seq[Float])] = {
    val metaPath = java.nio.file.Paths.get(indexPath, "_centroids.txt")
    val fp = datasetFingerprint(df, idCol)
    if (java.nio.file.Files.exists(metaPath)) {
      val lines = java.nio.file.Files.readAllLines(metaPath)
      if (lines.size() == nCentroids + 1 && lines.get(0) == s"fp=$fp") {
        return (0 until nCentroids).map { i =>
          i -> lines.get(i + 1).split(",").toSeq.map(_.toFloat)
        }
      }
    }
    val centroids = ivfBuild(df, vecCol, idCol, nCentroids, indexPath)
    val body = (s"fp=$fp" +: centroids.map(_._2.map(f => f.toString).mkString(",")))
      .mkString("\n")
    java.nio.file.Files.writeString(metaPath, body)
    centroids
  }

  private def cosLocal(a: Seq[Float], b: Seq[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    d / (na * nb)
  }

  /** ANN top-k over a built index: read only the nProbe nearest centroid
    * cells (partition-pruned scan), score, TakeOrdered. nProbe = nCentroids
    * degrades to exact top-k (the oracle configuration).
    */
  def ivfTopK(spark: org.apache.spark.sql.SparkSession, indexPath: String,
              centroids: Seq[(Int, Seq[Float])],
              vecCol: Column, idCol: Column, query: Seq[Float], k: Int,
              nProbe: Int, quantized: Boolean = false): DataFrame = {
    val probes = centroids.sortBy { case (i, c) => (-cosLocal(c, query), i) }
      .take(nProbe).map(_._1)
    val q = lit(query.toArray)
    val score = if (quantized) cosineQuantized(vecCol, q) else cosine(vecCol, q)
    spark.read.parquet(indexPath)
      .filter(col("__c").isin(probes: _*))
      .select(idCol.as("id"), score.as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
