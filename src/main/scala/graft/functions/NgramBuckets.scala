package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed unigram+bigram feature buckets in one native pass — the
  * featurization under the DSIR importance weights and the fastText-style
  * classifier ([[graft.pipeline.TextAnalysis.hashedNgramBuckets]]).
  *
  * The Column formulation (`transform` over tokens ++ bigrams with
  * `conv(substring(md5(cast(cast(...))))) % B` inside the lambda) md5s a
  * hex STRING per feature and then re-parses it — three string
  * round-trips per feature, ~2·n_tok features per doc. This expression
  * walks the trimmed text's UTF-8 bytes once: tokens are byte ranges
  * split on 0x20 (a byte that never occurs inside a UTF-8 multibyte
  * sequence, so byte-split == char-split), a unigram's digest reads its
  * range directly, and a BIGRAM's digest reads the contiguous range
  * spanning both tokens and the single separating space — zero feature
  * strings are ever materialized.
  *
  * Semantics replicate the Column spec exactly (PipelineSpec pins
  * equivalence; the DuckDB oracles pin them end-to-end): trim strips 0x20
  * only; tokens split on SINGLE spaces keeping empty fields; empty text →
  * empty array; bucket = first 8 md5 hex digits (= first 4 digest bytes,
  * unsigned) mod nBuckets; unigrams in order, then bigrams in order.
  */
case class HashedNgramBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 1, "nBuckets must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_buckets expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramBucketScanner.scan(input.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramBucketScanner.scan($c, $nBuckets);")

  override protected def withNewChildInternal(newChild: Expression)
      : HashedNgramBuckets = copy(child = newChild)
}

object HashedNgramBuckets {
  def apply(text: Column, nBuckets: Int): Column =
    ColumnBridge.column(
      new HashedNgramBuckets(ColumnBridge.expression(text), nBuckets))
}

object NgramBucketScanner {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  def scan(s: UTF8String, nBuckets: Int): GenericArrayData = {
    val bytes = s.getBytes
    var st = 0
    var en = bytes.length
    // trim 0x20 only (Spark trim), matching the Column spec's trim()
    while (st < en && bytes(st) == ' '.toByte) st += 1
    while (en > st && bytes(en - 1) == ' '.toByte) en -= 1
    if (en <= st) return new GenericArrayData(Array.empty[Any])
    // token boundaries: split on single 0x20 bytes, KEEPING empty fields
    // (split(" ", -1) semantics) — starts(i) .. ends(i) is token i
    var nTok = 1
    var i = st
    while (i < en) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = st
    i = st
    while (i < en) {
      if (bytes(i) == ' '.toByte) {
        ends(t) = i; t += 1; starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = en
    val md = md5.get()
    val d = digestBuf.get()
    def bucket(from: Int, until: Int): java.lang.Long = {
      md.update(bytes, from, until - from)
      md.digest(d, 0, 16) // writes in place and resets the digest
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      java.lang.Long.valueOf(v % nBuckets)
    }
    val out = new Array[Any](if (nTok >= 2) 2 * nTok - 1 else nTok)
    i = 0
    while (i < nTok) { out(i) = bucket(starts(i), ends(i)); i += 1 }
    // bigram "t(i) t(i+1)" is the CONTIGUOUS byte range spanning both
    // tokens and the single separating space — no string is built
    i = 0
    while (i < nTok - 1) {
      out(nTok + i) = bucket(starts(i), ends(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}
