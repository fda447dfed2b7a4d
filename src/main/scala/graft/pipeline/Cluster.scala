package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate cluster resolution: connected components over candidate
  * pair edges, then canonical-representative dedup.
  *
  * The pair operators ([[Dedup.minHashLsh]], [[Dedup.simHashPairs]],
  * [[Similarity.lshCosinePairs]]) emit edges; a real dedup pipeline must
  * resolve them into clusters and keep ONE representative per cluster —
  * transitively: a~b and b~c puts a,b,c in one cluster even when a~c was
  * never emitted. [[Similarity.cosineDedup]]'s single-pass "drop the larger
  * id of every pair" rule can keep two representatives of one chain; this
  * operator is the exact closure.
  *
  * Algorithm: alternating Large-Star / Small-Star (the MapReduce
  * connected-components algorithm of Kiveris et al., SoCC'14), which
  * converges in O(log²) rounds on any graph shape — a plain "propagate the
  * min label to neighbors" loop needs O(diameter) rounds and dies on chain
  * graphs at scale. Each half-step is one per-node min aggregation joined
  * back onto the edges (compact (long,long) rows; the document payload
  * never enters the loop), so an iteration costs a bounded number of
  * shuffles of the edge list regardless of corpus size.
  */
object Cluster {

  /** Connected components of the undirected graph given by pair edges.
    * Returns (id BIGINT, cluster BIGINT) for every node that appears in at
    * least one edge; `cluster` is the smallest node id in the component.
    * Nodes with no edges are absent (their component is themselves) —
    * [[dedupByPairs]] accounts for that.
    *
    * Hybrid execution: the candidate-pair edge set is orders of magnitude
    * smaller than the corpus (dup-rate × n compact id pairs), so when it
    * fits comfortably on the driver (≤ `localEdgeLimit` after distinct) an
    * in-memory union-find resolves it in one collect — the iterative star
    * rounds each cost several shuffles of driver-loop latency. Graphs past
    * the limit take the distributed star loop, which never collects edges.
    * Set `localEdgeLimit = 0` to force the distributed path.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 30,
                          localEdgeLimit: Long = 1000000L): DataFrame = {
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
    if (localEdgeLimit > 0) {
      // limit+collect bounds driver memory even when the count would be huge:
      // take limit+1 rows; only commit to the local path if under the limit
      val sample = edges
        .limit(math.min(localEdgeLimit + 1, Int.MaxValue.toLong).toInt)
        .collect()
      if (sample.length <= localEdgeLimit) {
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.getOrDefault(c, c) != c) {
            val nxt = parent.get(c); parent.put(c, r); c = nxt
          }
          r
        }
        sample.foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          parent.putIfAbsent(a, a)
          parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        }
        val spark = pairs.sparkSession
        import spark.implicits._
        val out = parent.keySet().toArray(Array.empty[java.lang.Long])
          .map(id => id.longValue() -> find(id.longValue())).toSeq
        return out.toDF("id", "cluster")
      }
    }
    // Driver-side loop over a (count, hash-sum) signature of the edge set:
    // one tiny aggregate per round, never the edges themselves. Each round
    // localCheckpoints (materialize + TRUNCATE LINEAGE): largeStar references
    // its input twice, so without truncation the logical plan doubles per
    // round; superseded rounds' blocks are released by the context cleaner.
    var prevSig: (Long, Long) = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // bit_xor, not sum: ANSI mode makes a 64-bit sum overflow an error,
      // and xor of distinct-edge hashes is an equally strong set signature
      val r = next
        .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .collect()(0)
      val sig = (r.getLong(0), r.getLong(1))
      edges = next
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }
    // alternating star rounds converge in O(log² n) rounds on any graph
    // (Kiveris et al., "Connected Components in MapReduce and Beyond"), so
    // hitting the cap means something is genuinely wrong (e.g. a signature
    // hash collision oscillation) — returning unresolved labels silently
    // would corrupt downstream dedup, so fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connected-components did not converge within $maxIter rounds")
    // Converged: a star forest of (child, root) edges, root = component min.
    edges.select(col("u").as("id"), col("v").as("cluster"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster")))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
  }

  /** Per-node neighborhood minimum via groupBy+join, NOT a window: a window
    * over partitionBy(u) funnels a hub's entire neighbor list into one task
    * (windows have no partial aggregation), and large-star deliberately
    * GROWS hubs around component minima. groupBy gets map-side combine for
    * the min, and the join back is a plain equi-join AQE can skew-split.
    */
  private def withNbrMin(nbrs: DataFrame): DataFrame = {
    val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("__nm"))
    nbrs.join(mins, "u")
  }

  /** Large-Star: every node links its LARGER neighbors to the minimum of its
    * neighborhood (including itself). Output keeps the (bigger, smaller)
    * orientation invariant.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    withNbrMin(nbrs)
      .withColumn("m", least(col("__nm"), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-Star: every node links its SMALLER neighbors (and itself) to the
    * minimum of that set. Input/output edges are (bigger, smaller).
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val withM = withNbrMin(edges).withColumnRenamed("__nm", "m")
    withM.filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Keep one row per connected component of the pair graph — the smallest
    * id survives; rows that appear in no pair survive untouched. The dropped
    * set is (ids only) compact, so the anti-join broadcasts at any realistic
    * duplicate rate.
    */
  def dedupByPairs(df: DataFrame, idCol: Column, pairs: DataFrame,
                   aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val losers = cc.filter(col("id") =!= col("cluster"))
      .select(col("id").as("__loser"))
    df.join(losers, idCol.cast("long") === col("__loser"), "left_anti")
  }
}
