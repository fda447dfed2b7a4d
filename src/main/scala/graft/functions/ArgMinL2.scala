package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-codeword id by Euclidean distance over a broadcast codebook,
  * optionally reading only a slice `[offset, offset+dim)` of the input
  * array — the product-quantization encode step (one subspace) as one
  * native expression.
  *
  * Same design as [[ArgMinCosine]]: the codebook rides as ONE flat double[]
  * reference object and the generated code is a fixed-size nested loop, so
  * code size is O(1) in codebook size and the plan stays inside whole-stage
  * codegen. The slice offset avoids materializing an intermediate
  * `slice(vec, ...)` array per subspace — M subspace encoders each read
  * their window of the SAME input array.
  *
  * Ranking arithmetic: argmin ‖x − c‖² = argmin (‖c‖² − 2·x·c) — ‖x‖² is
  * constant across candidates and never computed. Exact ties keep the
  * lowest codeword id. Returns null only for a null vector; elements past
  * the end of a short input read as 0.
  */
case class ArgMinL2(child: Expression, flat: Array[Double],
                    normSq: Array[Double], dim: Int, offset: Int)
    extends UnaryExpression {

  require(normSq.nonEmpty && flat.length == normSq.length * dim &&
    offset >= 0, "malformed codebook")

  override def dataType: DataType = IntegerType

  private def elemOf(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemOf(child.dataType) match {
    case LongType | FloatType | DoubleType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"arg_min_l2 expects an array of long/int/float/double elements, " +
        s"got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val et = elemOf(child.dataType)
    val n = math.max(0, math.min(dim, v.numElements() - offset))
    def d(i: Int): Double = et match {
      case DoubleType  => v.getDouble(offset + i)
      case FloatType   => v.getFloat(offset + i).toDouble
      case LongType    => v.getLong(offset + i).toDouble
      case IntegerType => v.getInt(offset + i).toDouble
      case other       => throw new IllegalStateException(s"arg_min_l2: $other")
    }
    var best = 0
    var bestScore = Double.PositiveInfinity
    var c = 0
    while (c < normSq.length) {
      var dot = 0.0
      val off = c * dim
      var i = 0
      while (i < n) { dot += flat(off + i) * d(i); i += 1 }
      val s = normSq(c) - 2.0 * dot
      if (s < bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val reader = elemOf(child.dataType) match {
        case DoubleType  => "getDouble"
        case FloatType   => "getFloat"
        case LongType    => "getLong"
        case IntegerType => "getInt"
        case other       => throw new IllegalStateException(s"arg_min_l2: $other")
      }
      val flatRef = ctx.addReferenceObj("argminL2Flat", flat, "double[]")
      val normRef = ctx.addReferenceObj("argminL2Norm", normSq, "double[]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
         |final int $n = java.lang.Math.max(0,
         |  java.lang.Math.min($dim, $a.numElements() - $offset));
         |int $best = 0;
         |double $bestScore = java.lang.Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < ${normSq.length}; $c++) {
         |  double $dot = 0.0d;
         |  final int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $flatRef[$off + $i] * ((double)$a.$reader($offset + $i));
         |  }
         |  final double $s = $normRef[$c] - 2.0d * $dot;
         |  if ($s < $bestScore) { $bestScore = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgMinL2 =
    copy(child = newChild)
}

object ArgMinL2 {
  /** Column-level entry: nearest codeword index (0-based) for the slice
    * `[offset, offset+dim)` of each input vector.
    */
  def apply(vec: Column, codebook: Seq[Seq[Double]], offset: Int): Column = {
    require(codebook.nonEmpty, "arg_min_l2 needs at least one codeword")
    val dim = codebook.head.length
    val flat = new Array[Double](codebook.length * dim)
    val normSq = new Array[Double](codebook.length)
    codebook.zipWithIndex.foreach { case (v, c) =>
      require(v.length == dim, "codeword dimensions must agree")
      // toArray first: a List's positional apply is O(i), making indexed
      // copy O(dim²) per codeword (same trap as ArgMinCosine.apply)
      val a = v.toArray
      var ss = 0.0
      var i = 0
      while (i < dim) {
        val x = a(i)
        flat(c * dim + i) = x
        ss += x * x
        i += 1
      }
      normSq(c) = ss
    }
    ColumnBridge.column(
      ArgMinL2(ColumnBridge.expression(vec), flat, normSq, dim, offset))
  }
}
