package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) score for product-quantized codes: the
  * per-query lookup table `lut` holds `dot(q_m, codebook_m[j])` for every
  * subspace m and codeword j, and the score of a code row is
  * `Σ_m lut[m·K + code_m]` — the PQ approximation of `dot(q, x)`.
  *
  * The LUT (M·K doubles, built once per query on the driver) rides as ONE
  * flat reference object; the generated code is a single fixed-size loop of
  * array lookups — the hot inner loop of a PQ probe stays in whole-stage
  * codegen with O(M) work per row instead of O(dim).
  *
  * Codes outside `[0, K)` (a corrupted index) score as 0 contribution
  * rather than throwing inside generated code; the builder never emits
  * them. Null codes row → null score.
  */
case class PqAdc(child: Expression, lut: Array[Double], k: Int, offset: Int)
    extends UnaryExpression {

  require(k > 0 && lut.length % k == 0, "malformed ADC lookup table")

  override def dataType: DataType = DoubleType

  private def elemOf(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemOf(child.dataType) match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects an array of integral codes, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val et = elemOf(child.dataType)
    val m = math.min(codes.numElements(), lut.length / k)
    var s = 0.0
    var i = 0
    while (i < m) {
      val c: Int = offset + (et match {
        case ByteType    => codes.getByte(i).toInt
        case ShortType   => codes.getShort(i).toInt
        case IntegerType => codes.getInt(i)
        case LongType    => codes.getLong(i).toInt
        case other       => throw new IllegalStateException(s"pq_adc: $other")
      })
      if (c >= 0 && c < k) s += lut(i * k + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val reader = elemOf(child.dataType) match {
        case ByteType    => "getByte"
        case ShortType   => "getShort"
        case IntegerType => "getInt"
        case LongType    => "getLong"
        case other       => throw new IllegalStateException(s"pq_adc: $other")
      }
      val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
         |final int $m = java.lang.Math.min($a.numElements(), ${lut.length / k});
         |double $s = 0.0d;
         |for (int $i = 0; $i < $m; $i++) {
         |  final int $c = (int)$a.$reader($i) + $offset;
         |  if ($c >= 0 && $c < $k) { $s += $lutRef[$i * $k + $c]; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqAdc {
  /** Column-level entry: `lut` laid out as `lut(m)(j) = dot(q_m, cb_m(j))`.
    * `offset` is added to each stored code before the lookup — PQ indexes
    * store codes offset-encoded as `(code - 128).toByte` so a full unsigned
    * 256-codeword book fits a signed byte (pass offset = 128 for those).
    */
  def apply(codes: Column, lut: Seq[Seq[Double]], offset: Int = 0): Column = {
    require(lut.nonEmpty && lut.head.nonEmpty, "pq_adc needs a non-empty LUT")
    val k = lut.head.length
    require(lut.forall(_.length == k), "ragged ADC lookup table")
    ColumnBridge.column(
      PqAdc(ColumnBridge.expression(codes), lut.flatten.toArray, k, offset))
  }
}
