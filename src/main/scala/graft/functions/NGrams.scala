package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in one native pass — the hot primitive of
  * the text-dedup family (exact/LSH Jaccard, MinHash signatures, eval-set
  * decontamination all explode this array).
  *
  * The Column formulation (`split` → `transform(sequence)` → `concat_ws`
  * over `slice` → `array_distinct`) allocates the token array, then an
  * interpreted lambda per gram, then a distinct pass — several interpreted
  * walks per row. This expression tokenizes, joins, and dedups in one walk
  * with a hash set; at corpus scale the shingle computation is the map-side
  * cost of every dedup shuffle.
  *
  * Semantics replicate `Dedup.shinglesColumnar` exactly (PipelineSpec pins
  * equivalence; the DuckDB oracles pin them end-to-end): trim strips 0x20
  * only; tokens split on SINGLE spaces keeping empty fields; a doc with
  * fewer than n tokens has NO gram; grams join tokens with one space;
  * distinct keeps first-occurrence order like `array_distinct`.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NGramScanner.scan(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramScanner.scan($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object NGrams {
  def wordNGrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(text), n))
}

object NGramScanner {
  def scan(s: UTF8String, n: Int): GenericArrayData = {
    val str = s.toString
    var st = 0
    var en = str.length
    // trim 0x20 only (Spark trim), not Java trim (strips <= 0x20)
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    if (en <= st) return new GenericArrayData(Array.empty[Any])
    val toks = str.substring(st, en).split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[String]((toks.length + 1) * 2)
    if (n == 1) {
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}
