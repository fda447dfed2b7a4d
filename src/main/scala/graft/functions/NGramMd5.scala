package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping word n-gram md5s of a document in one native byte walk
  * — the gram keys under the repeated-span (exact-substring) dedup of
  * [[graft.pipeline.Dedup.repeatedSpanStats]].
  *
  * The Column formulation (`md5(concat_ws(" ", slice(tk, i+1, n)))` per
  * position) materializes every gram as a string and every digest as a
  * 32-char hex string — ~n_tok strings and ~50-byte shuffle keys per doc.
  * This expression exploits the single-space token layout: the gram
  * starting at token i is a CONTIGUOUS byte range of the trimmed text
  * (its n tokens plus the separating spaces), so each digest reads the
  * source bytes in place and is returned as a struct of two longs —
  * 16-byte shuffle keys, zero gram strings. Grouping on the (h1, h2)
  * pair is grouping on the FULL 128-bit md5, bit-identical in collision
  * behavior to the hex-string oracle formulation.
  *
  * Output: array of struct(h1, h2), index = gram start position (so
  * `posexplode` yields (start, hash) directly); fewer than n tokens or
  * blank text → empty array. Semantics pinned against the hex
  * formulation in PipelineSpec (trim 0x20 only; single-space split
  * keeping empty fields).
  */
case class NGramMd5(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_md5 expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NGramMd5Scanner.scan(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramMd5Scanner.scan($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramMd5 =
    copy(child = newChild)
}

object NGramMd5 {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(new NGramMd5(ColumnBridge.expression(text), n))
}

object NGramMd5Scanner {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  def scan(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    var st = 0
    var en = bytes.length
    // trim 0x20 only (Spark trim), matching the Column spec's trim()
    while (st < en && bytes(st) == ' '.toByte) st += 1
    while (en > st && bytes(en - 1) == ' '.toByte) en -= 1
    if (en <= st) return new GenericArrayData(Array.empty[Any])
    // token boundaries: split on single 0x20 bytes keeping empty fields
    var nTok = 1
    var i = st
    while (i < en) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = st
    i = st
    while (i < en) {
      if (bytes(i) == ' '.toByte) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = en
    val md = md5.get()
    val d = digestBuf.get()
    val out = new Array[Any](nTok - n + 1)
    i = 0
    while (i <= nTok - n) {
      // the gram "t(i) .. t(i+n-1)" IS the contiguous byte range from
      // token i's start to token i+n-1's end (single-space separators
      // included) — digest it in place, no gram string
      md.update(bytes, starts(i), ends(i + n - 1) - starts(i))
      md.digest(d, 0, 16) // writes in place and resets the digest
      val h1 = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val h2 = ((d(8) & 0xffL) << 56) | ((d(9) & 0xffL) << 48) |
        ((d(10) & 0xffL) << 40) | ((d(11) & 0xffL) << 32) |
        ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
        ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
      out(i) = InternalRow(h1, h2)
      i += 1
    }
    new GenericArrayData(out)
  }
}
