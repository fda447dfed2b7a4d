package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is pure `Column` composition (higher-order array
  * functions, regex, hashes) — no UDFs — so the whole pipeline stays inside
  * whole-stage codegen and scales linearly with executors: a 100 TB corpus
  * is a map-only job with zero shuffles for every function in this object.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Tokens split on single spaces (exact-parity variant for oracles). */
  def tokensSimple(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword estimate: word-piece + punctuation regex matches.
    * A real BPE vocabulary isn't needed for budgeting token counts.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\w+|[^\w\s]"""), lit(0)))

  def charCount(text: Column): Column = length(text)

  /** Hashed n-gram feature buckets of a document — the fastText/DSIR
    * featurization: every unigram and every space-joined bigram of the
    * whitespace tokens, hashed to [0, nBuckets) with the engine-portable
    * md5 bucket ([[Sampling.hashBucket]]'s math). Compiled by the native
    * [[graft.functions.HashedNgramBuckets]] expression — one byte walk
    * per row, bigrams digested as contiguous byte ranges with no feature
    * strings materialized; [[hashedNgramBucketsColumnar]] is the
    * Column/HOF executable spec it is pinned against in PipelineSpec.
    * Map-only; the array is bounded by 2·n_tok−1 entries of 8 bytes, so
    * downstream per-doc sums explode ints, never text.
    */
  def hashedNgramBuckets(text: Column, nBuckets: Int): Column =
    graft.functions.HashedNgramBuckets(text, nBuckets)

  /** HOF formulation of [[hashedNgramBuckets]] — kept as the executable
    * spec for the native expression (same trim/split/concat_ws/md5-prefix
    * semantics, feature for feature, in the same order).
    */
  private[graft] def hashedNgramBucketsColumnar(text: Column,
                                                nBuckets: Int): Column = {
    val t = tokensSimple(text)
    val bi = when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
    transform(concat(t, bi), f => Sampling.hashBucket(f, nBuckets))
  }

  /** fastText-style linear quality classifier INFERENCE (the
    * CCNet/GPT-3-lineage "does this look like reference text" filter):
    * score = sigmoid(bias + mean of per-feature weights), features =
    * hashed unigram+bigram buckets ([[hashedNgramBuckets]]), weights a
    * (bucket, w_milli) table in integer MILLI-units so each doc's weight
    * sum is an exact BIGINT — float summation order can't leak into the
    * score on any engine. Buckets absent from the table score 0 (OOV).
    *
    * Output: (doc_id, n_feat, score, label) for docs with non-empty text;
    * label ⇔ score ≥ 0.5.
    *
    * Scale shape: the weight table is ≤ nBuckets rows and broadcasts (a
    * trained hashed-ngram model is a few MB — the whole point of the
    * hashing trick); scoring is map-side explode + broadcast join + one
    * per-doc sum: a single shuffle on doc_id.
    */
  def classifierScore(df: DataFrame, textCol: Column, idCol: Column,
                      weights: DataFrame, nBuckets: Int,
                      bias: Double = 0.0): DataFrame = {
    val feats = df
      .select(idCol.as("doc_id"),
        explode(hashedNgramBuckets(textCol, nBuckets)).as("b"))
    val w = feats
      .join(broadcast(weights.select(col("bucket").as("b"),
        col("w_milli").cast("long").as("__w"))), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"),
        sum(coalesce(col("__w"), lit(0L))).as("__sw"))
    val mean = col("__sw").cast("double") / (col("n_feat") * 1e3) + lit(bias)
    w.select(col("doc_id"), col("n_feat"),
      round(lit(1.0) / (lit(1.0) + exp(-mean)), 6).as("score"),
      (lit(1.0) / (lit(1.0) + exp(-mean)) >= 0.5).as("label"))
  }

  /** PII redaction (the C4/Dolma-style scrub stage): emails → `[EMAIL]`,
    * dotted IPv4 → `[IP]`, 8+-digit runs (phone/account-shaped) → `[NUM]`.
    * Order matters — emails first (their local parts may contain digits),
    * dotted IPs before bare digit runs. Patterns stay inside the
    * Java-regex ∩ RE2 common subset (no lookaround), so the exact same
    * expressions run in the DuckDB oracle; map-only, codegen'd
    * regexp_replace chain.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
        """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]"),
      """\d{8,}""", "[NUM]")

  /** Count of PII matches scrubbed by [[redactPii]] — the audit metric a
    * pipeline reports per shard.
    */
  def piiMatchCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b|\d{8,}"""),
      lit(0)))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, """[^.,;:!?'"()\[\]{}-]""", "")).cast("double") /
        length(text))

  /** Fraction of tokens found in the given stopword list. */
  def stopwordRatio(text: Column, stop: Seq[String]): Column =
    stopwordRatioFromTokens(tokens(text), stop)

  def stopwordRatioFromTokens(t: Column, stop: Seq[String]): Column =
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, tok => array_contains(lit(stop.toArray), lower(tok))))
        .cast("double") / size(t))

  def meanTokenLength(text: Column): Column =
    meanTokenLengthFromTokens(tokens(text))

  /** 1 − distinct/total over whitespace tokens: the repeated-content signal
    * quality filters use (0 = no repetition, →1 = one token repeated).
    * Map-only; empty text scores 0.
    */
  def dupTokenRatio(text: Column): Column = {
    val t = tokensSimple(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
  }

  /** 1 − distinct/total over lines (boilerplate detector: nav bars, headers,
    * repeated list rows). Lines are '\n'-separated with surrounding
    * whitespace kept (a re-indented duplicate is a different line).
    */
  def dupLineRatio(text: Column): Column = {
    val lines = when(length(text) === 0, array().cast("array<string>"))
      .otherwise(split(text, "\n"))
    when(size(lines) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
  }

  /** Share of all word bigrams taken by the single most frequent bigram —
    * the "top n-gram fraction" filter of large-corpus quality pipelines
    * (Rae et al.'s Gopher rules use exactly this family). 0 when the doc
    * has fewer than 2 tokens.
    *
    * The max count is the longest run of equal neighbors in the SORTED
    * bigram array (one sort + one linear fold per row) — a count-per-
    * distinct-gram formulation is quadratic per document and measured 100×
    * slower on natural text. Map-only, no shuffle.
    */
  def topBigramShare(text: Column): Column = {
    val t = tokensSimple(text)
    val bg = when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", slice(t, i, lit(2)))))
    val top = aggregate(
      array_sort(bg),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
    when(size(bg) === 0, lit(0.0))
      .otherwise(top.cast("double") / size(bg))
  }

  def meanTokenLengthFromTokens(t: Column): Column =
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, tok) => acc + length(tok)).cast("double") /
        size(t))

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, some stopwords, plausible word length. The weights are a
    * heuristic, not a model — deterministic and cheap at any scale.
    */
  def qualityScore(text: Column, stop: Seq[String] = enStopwords): Column =
    qualityScoreFromTokens(text, tokens(text), stop)

  /** [[qualityScore]] over a pre-tokenized column — computing the token
    * array once per row and sharing it across qualityScore/langId/counters
    * is the single biggest saving when scoring a corpus (tokenization is
    * the dominant per-row regex).
    */
  def qualityScoreFromTokens(text: Column, t: Column,
                             stop: Seq[String] = enStopwords): Column =
    qualityScoreParts(text, t, stopwordRatioFromTokens(t, stop))

  /** [[qualityScore]] sharing pre-computed [[langMasks]]: the English
    * stop-ratio comes from mask bit 0, so the whole score adds zero extra
    * string passes beyond the one shared tokenize+lookup.
    */
  def qualityScoreFromMasks(text: Column, t: Column, masks: Column): Column =
    qualityScoreParts(text, t, stopwordRatioFromMasks(t, masks, 0))

  private def qualityScoreParts(text: Column, t: Column,
                                stopRatio: Column): Column = {
    val n = size(t).cast("double")
    val lengthScore = least(n / 64.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    val mtl = meanTokenLengthFromTokens(t)
    val wordLenScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.3)
    round((lengthScore * 0.25 + punctScore * 0.25 + stopScore * 0.25 +
      wordLenScore * 0.25), 6)
  }

  val enStopwords: Seq[String] = Seq("the", "and", "of", "to", "in", "is",
    "you", "that", "it", "for", "a", "on", "with", "as", "at", "this")

  /** Language → stopword list, shared with the native single-pass scorer
    * (`functions.TextScore`) so both formulations stay in lockstep.
    */
  private[graft] def langStopwordLists: Seq[(String, Seq[String])] = langStopwords

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> enStopwords,
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "ich", "auf", "sich", "den", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour",
      "que", "dans", "qui", "au", "pas", "sur"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no",
      "con", "por", "las", "para", "es"),
    "it" -> Seq("il", "di", "che", "la", "e", "per", "un", "in", "non", "si",
      "una", "con", "del", "le", "sono"))

  /** token → bitmask of languages whose stopword list contains it: one hash
    * lookup per token replaces |langs| × |list| string comparisons (and the
    * |langs| redundant lower() passes) when scoring all languages at once.
    */
  private lazy val stopwordBits: Map[String, Int] =
    langStopwords.zipWithIndex.foldLeft(Map.empty[String, Int]) {
      case (m, ((_, words), i)) =>
        words.foldLeft(m)((mm, w) => mm.updated(w, mm.getOrElse(w, 0) | (1 << i)))
    }

  /** n-gram-heuristic language ID: argmax of stopword hits per language;
    * "und" (undetermined) when no list scores a hit. Ties break
    * alphabetically-last via struct max — deterministic.
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  def langIdFromTokens(t: Column): Column = langIdFromMasks(langMasks(t))

  /** Per-token language bitmasks: lowercase each token once, resolve its
    * stopword-membership bitmask via a literal-map hash lookup. Materialize
    * this ONCE per row (`withColumn`) and share it — higher-order functions
    * are interpreted (CodegenFallback), so repeated subtrees really do
    * recompute.
    */
  def langMasks(t: Column): Column =
    transform(t,
      tok => coalesce(element_at(typedLit(stopwordBits), lower(tok)), lit(0)))

  /** Language argmax over [[langMasks]] output: per-language hit counts are
    * integer bit tests over the small mask array — no further string work.
    */
  def langIdFromMasks(masks: Column): Column = {
    val scored = langStopwords.zipWithIndex.map { case ((lang, _), i) =>
      val hits = size(filter(masks, m => m.bitwiseAND(lit(1 << i)) =!= 0))
      struct(hits.as("s"), lit(lang).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** [[stopwordRatio]] for a language in [[langStopwords]], counted from
    * pre-computed masks — shares the one lower()+lookup pass per row.
    */
  def stopwordRatioFromMasks(t: Column, masks: Column, langIdx: Int): Column =
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(masks, m => m.bitwiseAND(lit(1 << langIdx)) =!= 0))
        .cast("double") / size(t))

  /** Deterministic document fingerprint: position-weighted token hash,
    * `(Σ_i (ascii(tok_i)+len(tok_i))·i) mod 1e9+7` (1-based i). Order-
    * sensitive like a rolling hash but exactly reproducible in any engine
    * with 64-bit integers — no overflow, no modpow.
    */
  def fingerprint(text: Column): Column = {
    val toks = tokensSimple(text)
    when(size(toks) === 0, lit(0L)).otherwise(
      pmod(
        aggregate(
          zip_with(toks, sequence(lit(1), size(toks)),
            (t, i) => (ascii(t) + length(t)).cast("long") * i),
          lit(0L), (acc, x) => acc + x),
        lit(1000000007L)))
  }

  /** Canonical text normalization — the pre-dedup normalizer every
    * curation pipeline runs so that trivial variants (case, punctuation,
    * whitespace runs) hash identically: lowercase, punctuation stripped
    * (everything outside [a-z0-9] and whitespace), whitespace runs
    * collapsed to single spaces, trimmed. Pure regexp_replace chain in
    * whole-stage codegen (Java ∩ RE2 subset) — map-only, zero shuffles —
    * and exactly replayable in a SQL oracle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  /** Fixed-size token chunks with overlap — the document-splitting stage in
    * front of an embedding/RAG pipeline (long docs exceed embedder context;
    * overlapping windows keep boundary sentences retrievable). Chunk `i`
    * covers tokens `[i·stride, i·stride + chunkTokens)` with
    * `stride = chunkTokens - overlap`; chunk count is
    * `ceil(max(1, nTok - overlap) / stride)`, so every token is covered and
    * the last chunk is the only short one. Output one row per chunk:
    * (doc_id, chunk_id, chunk_text, n_tok).
    *
    * Map-only (an explode of a per-row computed array): zero shuffles at
    * any corpus size; downstream embedding batches repartition as needed.
    */
  def chunkText(df: DataFrame, textCol: Column, idCol: Column,
                chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens: $overlap / $chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokensSimple(textCol)
    val nChunks = ceil(
      greatest(size(toks) - overlap, lit(1)).cast("double") / stride)
      .cast("int")
    df.filter(length(trim(textCol)) > 0)
      .select(idCol.as("doc_id"), toks.as("__tk"), nChunks.as("__n"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__n") - 1), i =>
          concat_ws(" ", slice(col("__tk"), i * stride + 1, lit(chunkTokens)))))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_tok"))
  }

  /** Per-document bigram cross-entropy under an add-one-smoothed bigram LM
    * trained on `lmCorpus` (pass the scored corpus itself for the
    * CCNet-style self-scoring filter): documents whose token transitions
    * are improbable under the corpus LM (gibberish, boilerplate soup,
    * wrong-language text) score HIGH and get filtered. The perplexity
    * proxy used by CCNet / Gopher / RefinedWeb quality filtering, with a
    * bigram LM standing in for KenLM's 5-gram (no external model files).
    *
    * `xent = -avg_i ln P(w_{i+1} | w_i)`,
    * `P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)` — c(w1·) is w1's count as
    * a bigram CONTEXT (= Σ_w2 c(w1,w2)), V the number of distinct bigram
    * target tokens.
    *
    * Engine-portable by construction: each bigram's log term is quantized
    * to an exact integer (`round(ln(p)·10^6)`) BEFORE the per-doc sum, so
    * the aggregate is exact integer arithmetic and the result cannot
    * depend on Spark's (or the oracle's) float summation order — the same
    * discipline as [[Similarity.cosineQuantized]]. Output:
    * (doc_id, n_bigrams, xent) with xent rounded to 6 decimals.
    *
    * Scale shape: two partial-aggregated shuffles build the LM ((w1,w2)
    * then w1), each output far smaller than the corpus; scoring joins the
    * doc-bigram relation to the LM on (w1,w2) and w1 — AQE broadcasts the
    * LM when the vocabulary is small, falls back to shuffle joins at
    * web-scale vocabularies (not forced broadcast on purpose); the per-doc
    * reduce is one partial-aggregated shuffle on doc_id. Nothing global.
    */
  def bigramCrossEntropy(df: DataFrame, textCol: Column, idCol: Column,
                         lmCorpus: Option[DataFrame] = None): DataFrame = {
    def bigramsOf(d: DataFrame): DataFrame = {
      val tk = tokensSimple(textCol)
      d.filter(size(tk) >= 2)
        .select(idCol.as("doc_id"), tk.as("__tk"))
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("__tk")) - 1), i =>
            struct(element_at(col("__tk"), i).as("w1"),
              element_at(col("__tk"), i + 1).as("w2")))).as("__b"))
        .select(col("doc_id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    }
    val trainBi = bigramsOf(lmCorpus.getOrElse(df))
    // biCounts has THREE consumers (context counts, vocab size, the scoring
    // join); uncached, each would recompute the corpus tokenize+explode.
    // The persist is the LM table — vocab²-bounded, safe at any corpus
    // size — never the corpus-sized bigram relation itself. FIFO-capped
    // like the tf-idf and CROSSTAB scan-savers.
    val biCounts = graft.PersistCache.persist(
      trainBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__cbi")))
    val ctxCounts = biCounts.groupBy(col("w1"))
      .agg(sum(col("__cbi")).as("__cw1"))
    val vocab = biCounts.select(countDistinct(col("w2")).as("__v"))
    // Per-DISTINCT-bigram quantized log-prob, derived once on the LM side:
    // the scoring pass used to re-derive log((c+1)/(c(w1)+V)) per token
    // OCCURRENCE through three joins (pair counts, context counts, the
    // vocab scalar); attaching one compact (w1, w2, __lq) relation keeps
    // the per-occurrence path at a single hash probe — at corpus scale
    // occurrences outnumber distinct bigrams by orders of magnitude.
    // Bit-identical: the same deterministic arithmetic over the same
    // operands, evaluated per distinct pair instead of per occurrence.
    val lm = biCounts.join(ctxCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(log((col("__cbi") + 1).cast("double") /
          (col("__cw1") + col("__v")).cast("double")) * 1000000.0)
          .cast("long").as("__lq"))
    val base = bigramsOf(df).join(lm, Seq("w1", "w2"), "left")
    val scored = lmCorpus match {
      case None =>
        // self-scored: every scored bigram is in the LM by construction
        // (trainBi IS bigramsOf(df)), so the unseen-fallback joins below
        // would be dead weight on the per-occurrence path
        base.select(col("doc_id"), col("__lq"))
      case Some(_) =>
        // unseen (w1,w2) under a foreign lmCorpus: count 0 (add-one
        // smoothing still yields a finite probability); unseen CONTEXT
        // w1: c(w1)=0 — the per-occurrence formula, verbatim
        base.join(ctxCounts, Seq("w1"), "left")
          .crossJoin(broadcast(vocab))
          .select(col("doc_id"),
            coalesce(col("__lq"),
              round(log(lit(1.0) /
                (coalesce(col("__cw1"), lit(0L)) + col("__v")).cast("double"))
                * 1000000.0).cast("long")).as("__lq"))
    }
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("__lq")).cast("double") /
          (count(lit(1)).cast("double") * 1000000.0), 6).as("xent"))
  }

  /** Per-(doc, token) term frequency — the shared first stage of [[vocab]]
    * and [[tfidfKeywords]]. Explode + one partial-aggregated shuffle on
    * (doc, token); empty texts drop out before the explode.
    */
  private def docTermFreq(df: DataFrame, textCol: Column,
                          idCol: Column): DataFrame =
    df.filter(length(trim(textCol)) > 0)
      .select(idCol.as("doc_id"), explode(tokensSimple(textCol)).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: per-token total term frequency (`tf`) and document
    * frequency (`df`) — the statistic a tokenizer-training / vocab-building
    * pass needs over a training corpus.
    *
    * Scale design: two partial-aggregated shuffles — (doc, token) then
    * token — instead of `COUNT(DISTINCT doc)` in one, so no per-token
    * distinct-doc set ever materializes: at 100 TB a stopword's billions of
    * postings reduce map-side per partition in stage 1 and arrive at stage 2
    * already one row per (doc, token). Top-k consumers should `orderBy`
    * + `limit`, which Catalyst plans as TakeOrderedAndProject (no global
    * sort).
    */
  def vocab(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docTermFreq(df, textCol, idCol)
      .groupBy(col("token"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))

  /** Per-document top-`k` keywords by tf-idf
    * (`score = tf · ln(N / df)`, rounded to 6 decimals so the ranking key is
    * reproducible across engines; ties break on token order).
    *
    * Scale design: the (doc, token) relation aggregates once per stage; the
    * document-frequency side joins back on `token` (AQE broadcasts it when
    * the vocabulary is small — it is NOT forced broadcast, web-scale token
    * sets can exceed executor memory); the corpus size N rides as a
    * broadcast 1-row aggregate; the final ranking is a per-document keyed
    * window, never a global sort.
    *
    * The (doc, token) relation is PERSISTED (FIFO-capped, see
    * [[graft.PersistCache]]): three consumers read it — the per-doc tf
    * side, the document-frequency aggregate, and the corpus-size count —
    * and at 100 TB tokenization is the dominant per-row cost, so
    * recomputing it per consumer would triple the whole job. The cache is
    * a scan-saver, never a correctness dependency: an evicted entry just
    * recomputes from lineage.
    */
  def tfidfKeywords(df: DataFrame, textCol: Column, idCol: Column,
                    k: Int): DataFrame = {
    val perDoc = graft.PersistCache.persist(docTermFreq(df, textCol, idCol))
    val dfs = perDoc.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDf = perDoc.agg(
      countDistinct(col("doc_id")).cast("double").as("__n"))
    val score = round(
      col("tf").cast("double") * log(col("__n") / col("df")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(score.desc, col("token"))
    perDoc.join(dfs, "token")
      .crossJoin(broadcast(nDf))
      .select(col("doc_id"), col("token"),
        row_number().over(w).cast("long").as("rank"), score.as("score"))
      .filter(col("rank") <= k)
  }
}
