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

  /** Dot product via a left-fold in doubles — deterministic element order,
    * so results are bit-reproducible across engines and runs.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

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
    val dq = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val na = aggregate(transform(qa, x => x * x), lit(0L), (acc, x) => acc + x)
    val nb = aggregate(transform(qb, x => x * x), lit(0L), (acc, x) => acc + x)
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
        .withColumn("nq", sqrt(
          aggregate(transform(col("qv"), x => x * x), lit(0L), (acc, x) => acc + x)
            .cast("double")))
      else df.select(blockCol.as("block"), idCol.as("id"), vecCol.as("qv"))
        .withColumn("nq", norm(col("qv")))
    val a = prep.as("a"); val b = prep.as("b")
    val dotC =
      if (quantized)
        aggregate(zip_with(col("a.qv"), col("b.qv"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).cast("double")
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

  /** IVF-style index: centroids sampled from the data (deterministic takeSample
    * stand-in: first `nCentroids` by id), broadcast, each row assigned to its
    * nearest centroid. Query path probes only `nProbe` nearest centroid
    * partitions — at 100 TB this is the difference between scanning
    * everything and scanning nProbe/nCentroids of it.
    */
  def ivfAssign(df: DataFrame, vecCol: Column, idCol: Column,
                nCentroids: Int): (DataFrame, Seq[(Int, Seq[Float])]) = {
    val centroids = df.select(vecCol.as("v")).limit(nCentroids).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0) }.toSeq
    val dists = centroids.map { case (i, c) =>
      struct((lit(1.0) - cosine(vecCol, lit(c.toArray))).as("d"), lit(i).as("c"))
    }
    val assigned = df.withColumn("__c",
      array_min(array(dists: _*)).getField("c"))
    (assigned, centroids)
  }

  /** ANN top-k: score only rows whose centroid is among the query's nProbe
    * nearest centroids.
    */
  def ivfTopK(assigned: DataFrame, centroids: Seq[(Int, Seq[Float])],
              vecCol: Column, idCol: Column, query: Seq[Float], k: Int,
              nProbe: Int): DataFrame = {
    def cosLocal(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      d / (na * nb)
    }
    val probes = centroids.sortBy { case (_, c) => -cosLocal(c, query) }
      .take(nProbe).map(_._1)
    assigned.filter(col("__c").isin(probes: _*))
      .select(idCol.as("id"), cosine(vecCol, lit(query.toArray)).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
