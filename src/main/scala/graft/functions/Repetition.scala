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

/** Single-pass native repetition statistics for corpus quality filtering.
  *
  * The Column formulations in `TextAnalysis` (`dupTokenRatio`,
  * `topBigramShare`) build the token and bigram arrays per row and fold
  * them with interpreted higher-order functions; the sorted-run bigram
  * count alone measured ~13 s over the sf0.1 corpus. This expression makes
  * one pass with two hash maps and returns every count the ratios need;
  * the ratio arithmetic stays in whole-stage codegen. Map-only at any
  * corpus size.
  *
  * Semantics replicate `TextAnalysis.tokensSimple` exactly (the DuckDB
  * oracle pins them): trim strips 0x20 only; tokens split on SINGLE
  * spaces with trailing empties kept (`split(s, " ", -1)`), so runs of
  * spaces yield empty tokens, like the Column/DuckDB formulations.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionScorer.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionScorer.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionScorer.score($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object Repetition {
  /** struct<ntoks, ndistinct, nbigrams, topbg> in one pass. */
  def stats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  /** 1 − distinct/total tokens over a [[stats]] struct. */
  def dupTokenRatioFromStats(st: Column): Column =
    when(st.getField("ntoks") === 0, lit(0.0)).otherwise(
      lit(1.0) - st.getField("ndistinct").cast("double") /
        st.getField("ntoks"))

  /** Most-frequent-bigram share over a [[stats]] struct. */
  def topBigramShareFromStats(st: Column): Column =
    when(st.getField("nbigrams") === 0, lit(0.0)).otherwise(
      st.getField("topbg").cast("double") / st.getField("nbigrams"))
}

/** The per-row scanner behind [[RepetitionStats]] — static so generated
  * code can call it without captured state.
  */
object RepetitionScorer {

  val schema: StructType = StructType(Seq(
    StructField("ntoks", IntegerType, nullable = false),
    StructField("ndistinct", IntegerType, nullable = false),
    StructField("nbigrams", IntegerType, nullable = false),
    StructField("topbg", IntegerType, nullable = false)))

  def score(s: UTF8String): InternalRow = {
    val str = s.toString
    // trim 0x20 only (Spark trim), NOT Java String.trim (strips <= 0x20)
    var st = 0
    var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    if (en <= st) return row(0, 0, 0, 0)
    val toks = str.substring(st, en).split(" ", -1)
    val n = toks.length
    val seen = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { seen.add(toks(i)); i += 1 }
    var topbg = 0
    if (n >= 2) {
      val bg = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val key = toks(i) + " " + toks(i + 1)
        val c = bg.merge(key, 1, (a, b) => Integer.valueOf(a + b))
        if (c > topbg) topbg = c
        i += 1
      }
    }
    row(n, seen.size, math.max(0, n - 1), topbg)
  }

  private def row(a: Int, b: Int, c: Int, d: Int): InternalRow =
    new GenericInternalRow(Array[Any](a, b, c, d))
}
