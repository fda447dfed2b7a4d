package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature + LSH band hashes of a shingle set in one native
  * walk — the signature layer under
  * [[graft.pipeline.Dedup.nearDupIncremental]]'s persistent index.
  *
  * The Column formulation (`numHashes` separate
  * `array_min(transform(hs, h => xxhash64(h, i)))` passes, then a band
  * pass over `slice`s of the signature) is a higher-order-function stack:
  * every seeded variant allocates an array and evaluates interpreted
  * lambda calls per element — `numHashes × |sh|` boxed evaluations per
  * document. This expression runs the same arithmetic as two tight JVM
  * loops per row, calling the SAME XXH64 primitives Spark's `xxhash64`
  * compiles to, so outputs are BIT-IDENTICAL to the Column spec (pinned
  * in PipelineSpec) — an index built by either formulation probes
  * correctly under the other.
  *
  * Input: the distinct-shingle string array ([[graft.pipeline.Dedup.shingles]]).
  * Output: struct(hs: array<long>, bnd: array<long>) — per-shingle
  * xxhash64 (the exact-verify payload) and the `bands` band hashes (the
  * candidate key). An EMPTY shingle array yields null (the Column spec's
  * array_min over an empty transform is null; callers filter size > 0).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
  extends UnaryExpression {
  require(numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    "bands must divide numHashes")

  override def dataType: DataType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("bnd", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<string>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashBandsKernel.eval(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashBandsKernel.eval($c, $numHashes, $bands);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  def apply(sh: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(
      new MinHashBands(ColumnBridge.expression(sh), numHashes, bands))
}

object MinHashBandsKernel {
  /** Bit-identical to the Column spec: per shingle
    * `xxhash64(s)` = hashUTF8String(s, 42); per signature slot i
    * `xxhash64(h, i)` = hashInt(i, hashLong(h, 42)); per band b
    * `xxhash64(slice(sig, b*r+1, r), b)` = hashInt(b, fold of
    * hashLong over the slice from seed 42) — exactly how Spark's
    * XxHash64 folds its children and array elements.
    */
  def eval(sh: ArrayData, numHashes: Int, bands: Int): InternalRow = {
    val m = sh.numElements()
    if (m == 0) return null
    val hs = new Array[Long](m)
    var k = 0
    while (k < m) {
      hs(k) = XXH64.hashUTF8String(sh.getUTF8String(k), 42L)
      k += 1
    }
    // base hashes once per element: xxhash64(h, i) = hashInt(i, hashLong(h, 42))
    val base = new Array[Long](m)
    k = 0
    while (k < m) { base(k) = XXH64.hashLong(hs(k), 42L); k += 1 }
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var min = Long.MaxValue
      var j = 0
      while (j < m) {
        val seeded = XXH64.hashInt(i, base(j))
        if (seeded < min) min = seeded
        j += 1
      }
      sig(i) = min
      i += 1
    }
    val r = numHashes / bands
    val bnd = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var q = b * r
      val end = q + r
      while (q < end) { h = XXH64.hashLong(sig(q), h); q += 1 }
      bnd(b) = XXH64.hashInt(b, h)
      b += 1
    }
    InternalRow(new GenericArrayData(hs), new GenericArrayData(bnd))
  }
}
