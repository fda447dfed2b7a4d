package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of the single-space token stream — the per-row
  * hot loop of corpus-scale near-dup detection.
  *
  * Bit-identical to the Column/HOF formulation in `Dedup.simHashColumnar`
  * (which stays as the executable spec): tokens are
  * `split(trim(text), " ")` with limit=-1 (consecutive spaces yield empty
  * tokens, which DO vote — md5("") is a defined value), empty-after-trim
  * text has NO tokens, each token votes with the 64 low-endian nibble bits
  * of the first 16 hex digits of md5(utf8(token)), and bit i of the
  * signature is set iff its vote sum is positive. md5 is the hash because
  * it is bit-identical in every engine — the DuckDB oracle recomputes the
  * whole signature in SQL.
  *
  * The HOF chain (`transform`·`conv`·`substr` over 64-wide arrays, per
  * token) is CodegenFallback and allocates three intermediate arrays per
  * token; this expression is one JVM loop per row and keeps downstream
  * banding in whole-stage codegen.
  *
  * Reference behavior: zenodb has no text pipeline; this belongs to the
  * training-data extensions (SURVEY.md north star).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHasher.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHasher.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}

/** The per-row loop behind [[SimHash64]] — static so generated code can call
  * it without captured state.
  */
object SimHasher {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    // trim strips 0x20 only (Spark's trim); empty-after-trim → no tokens
    var st = 0
    var en = bytes.length
    while (st < en && bytes(st) == 0x20) st += 1
    while (en > st && bytes(en - 1) == 0x20) en -= 1
    if (en == st) return 0L

    val votes = new Array[Int](64)
    val digest = md5.get()
    var t0 = st
    var j = st
    while (j <= en) {
      if (j == en || bytes(j) == 0x20) { // token boundary (empty tokens vote)
        digest.reset()
        digest.update(bytes, t0, j - t0)
        val h = digest.digest()
        // first 16 hex digits = bytes 0..7, high nibble printed first;
        // bit i = (digit[i/4] >> (i%4)) & 1
        var i = 0
        while (i < 64) {
          val d = if ((i & 4) == 0) (h(i >> 3) >> 4) & 0xf else h(i >> 3) & 0xf
          if (((d >> (i & 3)) & 1) != 0) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
        t0 = j + 1
      }
      j += 1
    }

    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}
