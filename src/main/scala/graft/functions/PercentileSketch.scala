package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable percentile sketch — the zenodb PERCENTILE accumulator
  * (/root/reference/expr/percentile.go) re-expressed as Spark typed
  * aggregators. Values are recorded into a fixed-width histogram over
  * [lo, hi] scaled by 10^precision (capped at 64Ki buckets, like HDR's
  * bounded memory); out-of-range inputs are DISCARDED (BOUNDED semantics,
  * percentile.go:16-19). Sketches are binary columns: build with
  * [[sketchAgg]], re-merge stored sketches with [[mergeAgg]], read any
  * quantile with [[valueAt]] — which is what makes 2-arg
  * `PERCENTILE(existing, p)` reuse (percentile_optimized.go) free.
  *
  * Scale note: the sketch is O(buckets) per (group, bucket) row and merges
  * associatively, so partial aggregation and AQE work unchanged; this is the
  * only way percentiles survive pre-aggregated storage — raw values are gone.
  */
object PercentileSketch {

  val MaxBuckets = 65536

  def numBuckets(lo: Double, hi: Double, precision: Int): Int = {
    val p = math.max(0, math.min(6, precision))
    val ideal = (hi - lo) * math.pow(10, p) + 1
    math.max(2, math.min(MaxBuckets, math.ceil(ideal).toLong).toInt)
  }

  def serialize(counts: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + counts.length * 8)
    bb.putInt(counts.length)
    counts.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  private def idxOf(v: Double, lo: Double, hi: Double, b: Int): Int =
    math.min(b - 1, math.max(0, math.round((v - lo) / (hi - lo) * (b - 1)).toInt))

  /** representative value of bucket i */
  def valueOfIdx(i: Int, lo: Double, hi: Double, b: Int): Double =
    lo + i.toDouble * (hi - lo) / (b - 1)

  /** quantile from counts: smallest bucket whose cumulative count reaches
    * ceil(q·n) (HDR valueAtQuantile shape). NaN when the sketch is empty —
    * the caller maps it to unset/NULL.
    */
  def quantile(counts: Array[Long], q: Double, lo: Double, hi: Double): Double = {
    val b = counts.length
    val n = counts.sum
    if (n == 0) return Double.NaN
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < b) {
      cum += counts(i)
      if (cum >= target) return valueOfIdx(i, lo, hi, b)
      i += 1
    }
    hi
  }

  final class SketchAgg(lo: Double, hi: Double, precision: Int)
      extends Aggregator[java.lang.Double, Array[Long], Array[Byte]] {
    private val b = numBuckets(lo, hi, precision)
    def zero: Array[Long] = new Array[Long](b)
    def reduce(acc: Array[Long], v: java.lang.Double): Array[Long] = {
      if (v != null && v >= lo && v <= hi) acc(idxOf(v, lo, hi, b)) += 1
      acc
    }
    def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a
    }
    def finish(acc: Array[Long]): Array[Byte] = serialize(acc)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Re-merge stored (serialized) sketches across buckets/groups. */
  final class MergeAgg(buckets: Int)
      extends Aggregator[Array[Byte], Array[Long], Array[Byte]] {
    def zero: Array[Long] = new Array[Long](buckets)
    def reduce(acc: Array[Long], s: Array[Byte]): Array[Long] =
      if (s == null) acc else merge(acc, deserialize(s))
    def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      // a stored sketch serialized under different lo/hi/precision has a
      // different bucket count — fail loudly instead of silently truncating
      require(a.length == c.length,
        s"percentile sketch bucket-count mismatch (${a.length} vs ${c.length}): " +
          "stored sketch was built with different PERCENTILE(lo, hi, precision) " +
          "bounds than this query expects")
      var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a
    }
    def finish(acc: Array[Long]): Array[Byte] = serialize(acc)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a sketch from raw values (aggregation). */
  def sketchAgg(value: Column, lo: Double, hi: Double, precision: Int): Column =
    udaf(new SketchAgg(lo, hi, precision), Encoders.DOUBLE).apply(value)

  /** Merge stored sketches (re-aggregation). */
  def mergeAgg(sketch: Column, lo: Double, hi: Double, precision: Int): Column =
    udaf(new MergeAgg(numBuckets(lo, hi, precision)), Encoders.BINARY).apply(sketch)

  /** Read quantile q (0-1) out of a sketch column; NULL when unset/empty. */
  def valueAt(sketch: Column, q: Double, lo: Double, hi: Double): Column = {
    val f = org.apache.spark.sql.functions.udf {
      (bytes: Array[Byte]) =>
        if (bytes == null) null.asInstanceOf[java.lang.Double]
        else {
          val v = quantile(deserialize(bytes), q, lo, hi)
          if (v.isNaN) null.asInstanceOf[java.lang.Double]
          else java.lang.Double.valueOf(v)
        }
    }
    f(sketch)
  }
}
