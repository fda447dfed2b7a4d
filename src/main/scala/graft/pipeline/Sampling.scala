package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Production corpus sampling must be reproducible (same subset on re-run,
  * on another engine, after a repartition) and cheap (no shuffle, no RNG
  * state). Both operators here are map-only filters on an md5-derived
  * uniform of the row KEY — md5 is bit-identical in every engine (Spark,
  * DuckDB, Trino), so the selected id set is portable, and membership of a
  * row is independent of partitioning, scan order, and cluster size.
  * `Dataset.sample` by contrast is seed+partition-dependent: the same row
  * can flip in/out when the file layout changes.
  */
object Sampling {

  /** Uniform in [0,1): the first 13 hex digits of md5(key) = 52 bits, which
    * a double represents exactly, divided by 2^52. Division by a power of
    * two is exact, so every engine computes the identical double.
    */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52

  /** Deterministic bucket in [0, nBuckets): the first 8 hex digits of
    * md5(key) = 32 bits (exact in a long) mod the bucket count. Same
    * engine-portability argument as [[hashUniform]] — the bucket of a
    * feature is identical in Spark and in any SQL oracle, so hashed-feature
    * models (DSIR, fastText-style classifiers) score identically anywhere.
    */
  def hashBucket(key: Column, nBuckets: Int): Column = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % nBuckets
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed n-gram features are under a TARGET
    * distribution (rows matching `targetPred` — the high-quality subset)
    * than under the raw corpus distribution, then make the deterministic
    * resampling decision.
    *
    * Per bucket b: λ(b) = ln p̂_target(b) − ln p̂_raw(b), add-one smoothed,
    * quantized to integer micros so the per-doc sum is an exact BIGINT (no
    * float summation order can leak into results across engines). Per doc:
    * logw = Σ_features λ(bucket(f)) / n_features; keep ⇔
    * hashUniform(id) < sigmoid(logw) — the importance-resampling coin flip
    * with the md5-uniform standing in for the RNG, so the selected subset
    * is reproducible across re-runs, partitionings, and engines.
    *
    * Output: (doc_id, n_feat, logw, keep) for docs with non-empty text.
    *
    * Scale shape: features come off one map-side tokenize (unigrams +
    * bigrams hashed to `nBuckets` ints — text never shuffles); the two
    * distributions come from ONE partial-agg pass (count + conditional
    * count per bucket, collapsing to ≤ nBuckets rows per partition before
    * the shuffle); the λ table is ≤ nBuckets rows and broadcasts; scoring
    * is a broadcast join + one per-doc sum. Two shuffles, both narrow.
    * The distribution pass and the scoring pass both consume the hashed
    * features, so the compact (doc_id, target, buckets) projection — ints,
    * a few percent of the text's bytes — is persisted via the FIFO
    * [[graft.PersistCache]]: ONE text scan + md5 featurization instead of
    * two, and eviction only ever costs a recompute, never correctness.
    */
  def dsirWeights(df: DataFrame, textCol: Column, idCol: Column,
                  targetPred: Column, nBuckets: Int = 1 << 14): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val docFeats = graft.PersistCache.persist(
      df.select(idCol.as("doc_id"), targetPred.as("__tgt"),
        TextAnalysis.hashedNgramBuckets(textCol, nBuckets).as("__bs")))
    val feats = docFeats
      .select(col("doc_id"), col("__tgt"), explode(col("__bs")).as("b"))
    val counts = feats.groupBy(col("b")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("tc"))
    val totals = counts.agg(sum(col("rc")).as("rtot"), sum(col("tc")).as("ttot"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("tc") + 1).cast("double") /
                   (col("ttot") + nBuckets).cast("double")) -
               log((col("rc") + 1).cast("double") /
                   (col("rtot") + nBuckets).cast("double"))) * 1e6)
          .cast("long").as("lam"))
    val w = feats.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"), sum(col("lam")).as("__sw"))
    val logw = col("__sw").cast("double") / (col("n_feat") * 1e6)
    w.select(col("doc_id"), col("n_feat"),
        round(logw, 6).as("logw"),
        (hashUniform(col("doc_id")) <
          lit(1.0) / (lit(1.0) + exp(-logw))).as("keep"))
  }

  /** Keep ~rate of rows, deterministically in the key. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    df.filter(hashUniform(keyCol) < lit(rate))
  }

  /** Deterministic weighted repetition — the "epochs per domain/quality
    * tier" primitive of a pretraining mixture (DoReMi-style weights made
    * materializable): emit `floor(w)` copies of every row plus one more
    * with probability `frac(w)`, the md5-uniform standing in for the RNG
    * so the materialized mixture is identical across re-runs,
    * partitionings, and engines. Rows whose copy count lands on 0
    * disappear (w < 1 downsamples, w > 1 upsamples — one operator covers
    * both sides); output carries a 0-based `copy` index for downstream
    * shuffling/packing. Map-only: no shuffle, no state — a pure scan
    * transform at any corpus size.
    */
  def weightedRepeat(df: DataFrame, idCol: Column,
                     weightCol: Column): DataFrame = {
    val n = (floor(weightCol) +
      when(hashUniform(idCol) < weightCol - floor(weightCol), 1).otherwise(0))
      .cast("long")
    df.withColumn("__n", n).filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Per-stratum rates (e.g. keep 50% of English, 15% of everything else) —
    * the language/domain/source re-balancing step of a data mixture. Still
    * map-only: the rate is a CASE over the stratum column; rows never
    * shuffle.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1]: $r"))
    // deterministic CASE order (sorted keys) — rates is an unordered Map
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(strataCol === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(keyCol) < rateCol)
  }

  /** Deterministic train/val/test (or any n-way) split: a `split` label
    * column assigned by where the key's md5-uniform lands among the
    * cumulative weights. Map-only and key-stable — a document keeps its
    * split across re-runs, repartitions, and engines, which is what keeps
    * eval sets from leaking into training data as the corpus is rebuilt.
    */
  def splitLabel(keyCol: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0), "bad split weights")
    val total = splits.map(_._2).sum
    require(total > 0.0, "split weights must sum > 0")
    val u = hashUniform(keyCol)
    val cum = splits.scanLeft(0.0)(_ + _._2 / total).tail
    // the last bucket takes everything to 1.0, so no row falls through
    splits.init.zip(cum.init).foldRight(lit(splits.last._1)) {
      case (((name, _), upper), acc) => when(u < upper, lit(name)).otherwise(acc)
    }
  }

  /** Deterministic corpus shuffle — the "shuffle the training data" step
    * of a pretraining run: every row gets a shard and an in-shard position
    * from the md5-uniform of its KEY, so the global order (shard, pos) is
    * a reproducible pseudo-random permutation — stable across re-runs,
    * engines, and file layouts, unlike `rand()`/`repartition`, whose
    * order silently changes with partitioning (and with it every training
    * batch). Output: source columns + (shard, pos).
    *
    * Scale shape: the shard assignment is map-only; the position is a
    * per-SHARD keyed window — shards are the parallelism unit (pass the
    * `shard` column straight into [[packSequences]], whose per-shard
    * cumsum then walks documents in exactly this shuffled order via
    * doc_id = pos), so no corpus-global sort ever materializes. Ties in
    * the 52-bit uniform are broken by the key itself, keeping the
    * permutation total and deterministic.
    */
  def shuffleShards(df: DataFrame, keyCol: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val u = hashUniform(keyCol)
    // u < 1 so floor(u·n) ≤ n−1 mathematically; least() guards the one
    // floating-point edge where u·n rounds up to exactly n
    val shard = least(floor(u * nShards), lit(nShards - 1L)).cast("int")
    df.withColumn("__u", u)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__u"), keyCol.cast("string"))).cast("long"))
      .drop("__u")
  }

  /** Per-stratum sample rates that hit a target token budget per stratum:
    * `rate(s) = min(1, budget / tokens(s))` from ONE aggregation over the
    * corpus (one row per stratum on the driver). Composing with
    * [[stratifiedSample]] yields the mixture-balancing pass of a training
    * run — downsample the over-represented languages/sources until each
    * contributes ~`budgetPerStratum` tokens, keep the small ones whole.
    */
  def tokenBudgetRates(df: DataFrame, strataCol: Column, tokenCol: Column,
                       budgetPerStratum: Double): Map[String, Double] = {
    require(budgetPerStratum > 0.0, "budget must be positive")
    df.groupBy(strataCol.as("__s"))
      .agg(sum(tokenCol.cast("double")).as("__t"))
      .collect()
      .map(r => r.getString(0) ->
        math.min(1.0, budgetPerStratum / math.max(1.0, r.getDouble(1))))
      .toMap
  }

  /** Sequence packing — the concat-and-chunk layout of a pretraining run:
    * documents are concatenated in (shard, id) order and the token stream
    * is cut into fixed `seqLen` blocks, documents splitting across block
    * boundaries (the GPT-style packing that wastes zero pad tokens).
    * For each document the plan emits which training blocks it lands in and
    * its offset inside the first one:
    * (id, shard, n_tok, block_start, block_end, offset_start).
    *
    * Packing runs WITHIN shards on purpose: a corpus-global document order
    * would need a global cumulative sum (one giant partition at 100 TB),
    * while per-shard order is a keyed window — one shuffle on shard, block
    * ids local to the shard, exactly how production packers shard the
    * stream. Shards with heavy skew should be pre-split upstream (the
    * shard column is the parallelism unit here by definition of the
    * output's block numbering).
    */
  def packSequences(df: DataFrame, nTokCol: Column, idCol: Column,
                    shardCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    import org.apache.spark.sql.expressions.Window
    val L = lit(seqLen.toLong)
    // zero-token documents occupy no stream positions, so they have no
    // block range — emitting them would produce inverted (block_end <
    // block_start) rows that break downstream block expansion. Dropping
    // them here (instead of requiring callers to pre-filter) also keeps
    // the cumulative stream identical either way: a 0-length doc never
    // advances __cum.
    df.select(idCol.as("doc_id"), shardCol.as("shard"),
        nTokCol.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("__cum", sum(col("n_tok")).over(
        Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        floor((col("__cum") - col("n_tok")) / L).cast("long").as("block_start"),
        floor((col("__cum") - 1) / L).cast("long").as("block_end"),
        (col("__cum") - col("n_tok") -
          L * floor((col("__cum") - col("n_tok")) / L)).cast("long")
          .as("offset_start"))
  }
}
