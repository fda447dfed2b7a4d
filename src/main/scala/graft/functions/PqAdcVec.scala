package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** ADC score of a PQ code row against a PER-ROW query vector — the batched
  * retrieval counterpart of [[PqAdc]].
  *
  * [[PqAdc]] takes a driver-built lookup table, which only works for ONE
  * query per plan; a batch retrieval join pairs every code row with many
  * query rows, so the LUT trick doesn't compose. Instead of decoding codes
  * to a reconstructed vector and dotting it (an O(dim) allocation per
  * pair), this expression fuses the two:
  *
  *   score = Σ_s Σ_t books[s][code_s][t] · qhat[s·dsub + t]
  *
  * — one tight loop over the flattened codebooks (a reference object:
  * m·k·dsub doubles, a few MB at most — small enough for the task binary)
  * with the query slice read straight from the joined row. Exactly
  * `dot(reconstruct(codes), qhat)`, which for unit-normalized training is
  * the PQ approximation of cosine(q, x). Codes decode with `offset` added
  * (PQ indexes store `(code − 128).toByte`); out-of-range codes (corrupt
  * rows) contribute 0 rather than throwing inside generated code.
  */
case class PqAdcVec(left: Expression, right: Expression, flat: Array[Double],
                    m: Int, k: Int, dsub: Int, offset: Int)
    extends BinaryExpression {

  require(m > 0 && k > 0 && dsub > 0 && flat.length == m * k * dsub,
    "malformed PQ codebooks")

  override def dataType: DataType = DoubleType

  private def elemOf(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = elemOf(left.dataType) match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val vecOk = elemOf(right.dataType) match {
      case DoubleType | FloatType => true
      case _                      => false
    }
    if (codesOk && vecOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc_vec expects (integral codes array, float/double vector), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val et = elemOf(left.dataType)
    val qt = elemOf(right.dataType)
    val subs = math.min(m, codes.numElements())
    var s = 0.0
    var sub = 0
    while (sub < subs) {
      val c = offset + (et match {
        case ByteType    => codes.getByte(sub).toInt
        case ShortType   => codes.getShort(sub).toInt
        case IntegerType => codes.getInt(sub)
        case LongType    => codes.getLong(sub).toInt
        case other       => throw new IllegalStateException(s"pq_adc_vec: $other")
      })
      if (c >= 0 && c < k) {
        val base = (sub * k + c) * dsub
        val qBase = sub * dsub
        var t = 0
        while (t < dsub && qBase + t < q.numElements()) {
          val qv = qt match {
            case DoubleType => q.getDouble(qBase + t)
            case FloatType  => q.getFloat(qBase + t).toDouble
            case other      => throw new IllegalStateException(s"pq_adc_vec: $other")
          }
          s += flat(base + t) * qv
          t += 1
        }
      }
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val codeReader = elemOf(left.dataType) match {
        case ByteType    => "getByte"
        case ShortType   => "getShort"
        case IntegerType => "getInt"
        case LongType    => "getLong"
        case other       => throw new IllegalStateException(s"pq_adc_vec: $other")
      }
      val qReader = elemOf(right.dataType) match {
        case DoubleType => "getDouble"
        case FloatType  => "getFloat"
        case other      => throw new IllegalStateException(s"pq_adc_vec: $other")
      }
      val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
      val subs = ctx.freshName("subs")
      val qn = ctx.freshName("qn")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val qBase = ctx.freshName("qBase")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      s"""
         |final int $subs = java.lang.Math.min($m, $a.numElements());
         |final int $qn = $b.numElements();
         |double $s = 0.0d;
         |for (int $sub = 0; $sub < $subs; $sub++) {
         |  final int $c = (int)$a.$codeReader($sub) + $offset;
         |  if ($c >= 0 && $c < $k) {
         |    final int $base = ($sub * $k + $c) * $dsub;
         |    final int $qBase = $sub * $dsub;
         |    for (int $t = 0; $t < $dsub && $qBase + $t < $qn; $t++) {
         |      $s += $flatRef[$base + $t] * ((double)$b.$qReader($qBase + $t));
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcVec =
    copy(left = newLeft, right = newRight)
}

object PqAdcVec {
  /** Column-level entry: `books(s)(j)` is subspace s's j-th codeword. */
  def apply(codes: Column, qhat: Column,
            books: Seq[Seq[Seq[Double]]], offset: Int): Column = {
    require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
      "pq_adc_vec needs non-empty codebooks")
    val m = books.length
    val k = books.head.length
    val dsub = books.head.head.length
    require(books.forall(b => b.length == k && b.forall(_.length == dsub)),
      "ragged PQ codebooks")
    ColumnBridge.column(PqAdcVec(
      ColumnBridge.expression(codes), ColumnBridge.expression(qhat),
      books.flatten.flatten.toArray, m, k, dsub, offset))
  }
}
