package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two array columns — the hot inner loop
  * of every similarity operator (cosine top-k, LSH bucketing/verification,
  * IVF assign/probe, blocked pair joins).
  *
  * The `aggregate(zip_with(...))` higher-order-function formulation is
  * CodegenFallback: per pair it allocates a zipped array and interprets the
  * lambda per element. This expression compiles to a tight primitive loop
  * inside whole-stage codegen — no allocation, no virtual calls — which is
  * the difference between an O(pairs·dim) join being CPU-bound on
  * interpretation overhead vs on the multiplies themselves.
  *
  * Semantics match the HOF it replaces: elements are combined in index
  * order (bit-reproducible float sums), per-side values are widened to
  * double unless BOTH sides are long (the exact quantized path, which stays
  * in long arithmetic). Lengths are not required to match; the shorter
  * length wins. Null/NaN handling: a null array yields null (BinaryExpression
  * null-safety); null *elements* are undefined — embedding vectors are
  * non-null by construction.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOf(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def dataType: DataType =
    if (elemOf(left.dataType) == LongType && elemOf(right.dataType) == LongType)
      LongType
    else DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(c => elemOf(c.dataType) match {
      case LongType | FloatType | DoubleType | IntegerType => true
      case _                                               => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects arrays of long/int/float/double elements, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def d(ad: ArrayData, et: DataType, i: Int): Double = et match {
      case DoubleType  => ad.getDouble(i)
      case FloatType   => ad.getFloat(i).toDouble
      case LongType    => ad.getLong(i).toDouble
      case IntegerType => ad.getInt(i).toDouble
      case other       => throw new IllegalStateException(s"vec_dot: $other")
    }
    val (el, er) = (elemOf(left.dataType), elemOf(right.dataType))
    if (dataType == LongType) {
      var s = 0L; var i = 0
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    } else {
      var s = 0.0; var i = 0
      while (i < n) { s += d(x, el, i) * d(y, er, i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def reader(et: DataType): String = et match {
        case DoubleType  => "getDouble"
        case FloatType   => "getFloat"
        case LongType    => "getLong"
        case IntegerType => "getInt"
        case other       => throw new IllegalStateException(s"vec_dot: $other")
      }
      val long = dataType == LongType
      val (jt, zero) = if (long) ("long", "0L") else ("double", "0.0d")
      val castS = if (long) "" else "(double)"
      val (gl, gr) = (reader(elemOf(left.dataType)), reader(elemOf(right.dataType)))
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$jt $s = $zero;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ($castS$a.$gl($i)) * ($castS$b.$gr($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
