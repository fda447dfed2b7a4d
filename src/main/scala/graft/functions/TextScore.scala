package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.TextAnalysis

/** Single-pass native text statistics — the hot loop of corpus scoring
  * (language ID, quality, token budgeting over the `documents` table).
  *
  * The higher-order-function formulation (`transform`/`filter`/`aggregate`
  * over `split(text)`) is CodegenFallback: per row it runs a regex split,
  * allocates the token array, then interprets a lambda per token per metric.
  * This expression makes ONE scan over the string's UTF-8 bytes and returns
  * every metric the scoring pipeline needs in a struct; downstream score
  * arithmetic stays in whole-stage codegen. At 100 TB of text the corpus
  * scan is a map-only job whose cost is exactly this per-row loop.
  *
  * Semantics replicate the Column formulation bit-for-bit (the DuckDB
  * oracle pins them):
  *  - tokens ≡ `split(trim(text), "\\s+")` with Spark's limit=-1: `trim`
  *    strips 0x20 only; fields are separated by runs of Java-regex `\s`
  *    (tab, LF, VT, FF, CR, space), so a leading/trailing non-space
  *    whitespace run yields an empty edge field that counts toward `ntoks`;
  *  - `toklen` sums `length(tok)` (chars, not bytes);
  *  - per-language stopword hits lowercase each token (stopwords are short
  *    ASCII, so non-ASCII/long tokens can never hit — they skip the pack);
  *  - `punct` counts chars in `[.,;:!?'"()\[\]{}-]` over the RAW text;
  *  - `nchars` ≡ `length(text)`;
  *  - `bpeish` ≡ `size(regexp_extract_all(text, "\\w+|[^\\w\\s]"))` — ASCII
  *    word runs plus one per non-word non-space code point.
  *
  * Reference behavior: zenodb has no text pipeline; this belongs to the
  * training-data extensions (SURVEY.md north star).
  */
case class TextScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextScorer.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_score expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TextScorer.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextScorer.score($c);")

  override protected def withNewChildInternal(newChild: Expression): TextScore =
    copy(child = newChild)
}

object TextScore {
  /** All text metrics for one row in one pass:
    * struct<ntoks, toklen, punct, nchars, bpeish, h_&lt;lang&gt;...>.
    */
  def stats(text: Column): Column =
    ColumnBridge.column(TextScore(ColumnBridge.expression(text)))

  /** Language argmax over a [[stats]] struct — same tie-break (hits, then
    * alphabetically-last code) as `TextAnalysis.langIdFromMasks`.
    */
  def langIdFromStats(stats: Column): Column = {
    val scored = TextAnalysis.langStopwordLists.map { case (lang, _) =>
      struct(stats.getField(s"h_$lang").as("s"), lit(lang).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Quality score over a [[stats]] struct — the exact arithmetic of
    * `TextAnalysis.qualityScore` on pre-computed counts.
    */
  def qualityScoreFromStats(stats: Column): Column = {
    val n = stats.getField("ntoks").cast("double")
    val lengthScore = least(n / 64.0, lit(1.0))
    val punctRatio = when(stats.getField("nchars") === 0, lit(0.0)).otherwise(
      stats.getField("punct").cast("double") / stats.getField("nchars"))
    val punctScore = lit(1.0) - least(punctRatio * 5.0, lit(1.0))
    val stopRatio = when(stats.getField("ntoks") === 0, lit(0.0)).otherwise(
      stats.getField("h_en").cast("double") / stats.getField("ntoks"))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    val mtl = when(stats.getField("ntoks") === 0, lit(0.0)).otherwise(
      stats.getField("toklen").cast("double") / stats.getField("ntoks"))
    val wordLenScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.3)
    round(lengthScore * 0.25 + punctScore * 0.25 + stopScore * 0.25 +
      wordLenScore * 0.25, 6)
  }

  def bpeishFromStats(stats: Column): Column = stats.getField("bpeish")
}

/** The per-row scanner behind [[TextScore]] — static so generated code can
  * call it without captured state.
  */
object TextScorer {

  private val langs = TextAnalysis.langStopwordLists
  private val nLangs = langs.size

  val schema: StructType = StructType(
    Seq(
      StructField("ntoks", IntegerType, nullable = false),
      StructField("toklen", LongType, nullable = false),
      StructField("punct", IntegerType, nullable = false),
      StructField("nchars", IntegerType, nullable = false),
      StructField("bpeish", IntegerType, nullable = false)) ++
      langs.map { case (lang, _) =>
        StructField(s"h_$lang", IntegerType, nullable = false)
      })

  // --- packed-stopword hash table -----------------------------------------
  // Stopwords are lowercase ASCII ≤ 8 bytes: pack into a long, probe an
  // open-addressed table. One integer hash per token replaces
  // |langs| × |list| string equality checks.
  private val (tblKeys, tblVals, tblMask): (Array[Long], Array[Int], Int) = {
    val packed = new java.util.HashMap[java.lang.Long, Integer]()
    langs.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val bytes = w.getBytes("UTF-8")
        require(bytes.length <= 8 && bytes.forall(b => b >= 0x21 && b < 0x7f),
          s"stopword '$w' must be short printable ASCII")
        var k = 0L
        bytes.foreach(b => k = (k << 8) | (b & 0xffL))
        val prev = packed.get(k)
        packed.put(k, (if (prev == null) 0 else prev.intValue()) | (1 << i))
      }
    }
    var cap = 16
    while (cap < packed.size * 4) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Int](cap)
    val it = packed.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey.longValue()
      var idx = hash(k) & (cap - 1)
      while (keys(idx) != 0L) idx = (idx + 1) & (cap - 1)
      keys(idx) = k // 0L is never a valid packed token (tokens are non-empty)
      vals(idx) = e.getValue.intValue()
    }
    (keys, vals, cap - 1)
  }

  private def hash(k: Long): Int = {
    val h = k * -7046029254386353131L // Stafford mix constant
    ((h ^ (h >>> 32)) & 0x7fffffff).toInt
  }

  private def maskOf(packed: Long): Int = {
    if (packed == 0L) return 0
    var idx = hash(packed) & tblMask
    while (true) {
      val k = tblKeys(idx)
      if (k == packed) return tblVals(idx)
      if (k == 0L) return 0
      idx = (idx + 1) & tblMask
    }
    0
  }

  // Java regex \s — the 6 ASCII whitespace chars (NOT unicode spaces).
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  private val punctSet: Array[Boolean] = {
    val s = new Array[Boolean](128)
    ".,;:!?'\"()[]{}-".foreach(c => s(c) = true)
    s
  }

  /** One pass over the UTF-8 bytes; see [[TextScore]] for the semantics
    * each field replicates.
    */
  def score(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length

    var nchars = 0
    var punct = 0
    var bpeish = 0
    var prevWord = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val isLead = (b & 0xc0) != 0x80
      if (isLead) nchars += 1
      if (b >= 0 && b < 128) {
        if (punctSet(b)) punct += 1
        if (isWord(b)) {
          if (!prevWord) bpeish += 1
          prevWord = true
        } else {
          prevWord = false
          if (!isWs(b)) bpeish += 1
        }
      } else {
        prevWord = false
        if (isLead) bpeish += 1 // non-ASCII code point: one [^\w\s] match
      }
      i += 1
    }

    // trim (0x20 only), then split-like tokenization with limit=-1 fields
    var st = 0
    var en = n
    while (st < en && bytes(st) == 0x20) st += 1
    while (en > st && bytes(en - 1) == 0x20) en -= 1

    var ntoks = 0
    var toklen = 0L
    val hits = new Array[Int](nLangs)
    if (en > st) {
      var wsRuns = 0
      var j = st
      while (j < en) {
        if (isWs(bytes(j))) { // consume a separator run
          wsRuns += 1
          while (j < en && isWs(bytes(j))) j += 1
        } else { // consume a token
          var packed = 0L
          var packable = true
          var chars = 0
          val t0 = j
          while (j < en && !isWs(bytes(j))) {
            val b = bytes(j)
            if ((b & 0xc0) != 0x80) chars += 1
            if (packable && b >= 0 && j - t0 < 8) {
              val lc = if (b >= 'A' && b <= 'Z') b + 32 else b.toInt
              packed = (packed << 8) | (lc & 0xffL)
            } else packable = false
            j += 1
          }
          toklen += chars
          if (packable) {
            val m = maskOf(packed)
            if (m != 0) {
              var l = 0
              while (l < nLangs) {
                if ((m & (1 << l)) != 0) hits(l) += 1
                l += 1
              }
            }
          }
        }
      }
      ntoks = wsRuns + 1 // empty edge fields count, like split(limit=-1)
    }

    val out = new Array[Any](5 + nLangs)
    out(0) = ntoks
    out(1) = toklen
    out(2) = punct
    out(3) = nchars
    out(4) = bpeish
    var l = 0
    while (l < nLangs) { out(5 + l) = hits(l); l += 1 }
    new GenericInternalRow(out)
  }
}
