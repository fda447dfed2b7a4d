package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The one-sided containment probe set: for each seed i < k, the element
  * of a hash array minimizing the seeded hash `xxhash64(h, i)` — an
  * argmin, so every probe is a REAL member hash that can equi-join the
  * other side — de-duplicated, order of first appearance by seed.
  *
  * The Column formulation
  * (`array_distinct(array_min(transform(hs, h => struct(xxhash64(h, i), h))) ...)`)
  * allocates k struct arrays and evaluates interpreted lambdas per
  * element — k × |hs| boxed evaluations per document. This expression
  * runs the identical arithmetic as one tight JVM loop, calling the same
  * XXH64 primitives Spark's `xxhash64` compiles to, with the struct-min
  * tie rule preserved (equal seeded keys → smaller element hash), so
  * outputs are BIT-IDENTICAL to the Column spec (pinned in PipelineSpec).
  * Used by [[graft.pipeline.Dedup.containmentLsh]] and the containment
  * index signatures.
  */
case class ArgMinProbes(child: Expression, numProbes: Int)
  extends UnaryExpression {
  require(numProbes >= 1, "numProbes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_probes expects array<bigint>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ArgMinProbesKernel.eval(input.asInstanceOf[ArrayData], numProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArgMinProbesKernel.eval($c, $numProbes);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ArgMinProbes =
    copy(child = newChild)
}

object ArgMinProbes {
  def apply(hs: Column, numProbes: Int): Column =
    ColumnBridge.column(
      new ArgMinProbes(ColumnBridge.expression(hs), numProbes))
}

object ArgMinProbesKernel {
  /** Bit-identical to the Column spec: seeded key
    * `xxhash64(h, i)` = hashInt(i, hashLong(h, 42)); per seed take the
    * (key, h) struct minimum — key first, element hash breaks ties —
    * then de-duplicate keeping first appearance by seed order (what
    * array_distinct does over the seed-ordered array).
    */
  def eval(hs: ArrayData, numProbes: Int): GenericArrayData = {
    val m = hs.numElements()
    if (m == 0) return null
    val base = new Array[Long](m)
    var j = 0
    while (j < m) {
      base(j) = XXH64.hashLong(hs.getLong(j), 42L)
      j += 1
    }
    val out = new Array[Long](numProbes)
    var n = 0
    var i = 0
    while (i < numProbes) {
      var bestKey = Long.MaxValue
      var bestVal = Long.MaxValue
      var first = true
      j = 0
      while (j < m) {
        val k = XXH64.hashInt(i, base(j))
        val v = hs.getLong(j)
        if (first || k < bestKey || (k == bestKey && v < bestVal)) {
          bestKey = k; bestVal = v; first = false
        }
        j += 1
      }
      // de-dup keeping first appearance (array_distinct semantics)
      var seen = false
      var q = 0
      while (q < n && !seen) { seen = out(q) == bestVal; q += 1 }
      if (!seen) { out(n) = bestVal; n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }
}
