package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable percentile sketch — the zenodb PERCENTILE accumulator
  * (/root/reference/expr/percentile.go, which wraps an HDR histogram)
  * re-expressed as Spark typed aggregators, with the publicly-documented
  * HDR structure: the value offset is decimal-scaled to an integer
  * o = round((v − lo)·10^precision) (percentile.go:43 scaleToInt), and
  * recorded into a hybrid array — exact linear buckets while o < S
  * (S = sub-bucket count, the smallest power of two ≥ 2·10^sigfigs), then
  * per-power-of-two ranges of S/2 equal sub-buckets, so relative error is
  * bounded by 10^-sigfigs across arbitrarily wide [lo, hi] spans. Reads
  * return the bucket's HIGHEST equivalent value, like HDR's
  * valueAtQuantile. `sigfigs` = precision clamped to [1, 5] exactly as the
  * reference does (percentile.go:35-41), degraded further only if the 64Ki
  * bucket cap would otherwise be exceeded. Out-of-range inputs are
  * DISCARDED (BOUNDED semantics, percentile.go:16-19). Sketches are binary
  * columns: build with [[sketchAgg]], re-merge stored sketches with
  * [[mergeAgg]], read any quantile with [[valueAt]] — which is what makes
  * 2-arg `PERCENTILE(existing, p)` reuse (percentile_optimized.go) free.
  *
  * Scale note: the sketch is O(buckets) per (group, bucket) row — bucket
  * count is logarithmic in the span, not linear — and merges
  * associatively, so partial aggregation and AQE work unchanged; this is
  * the only way percentiles survive pre-aggregated storage — raw values
  * are gone.
  */
object PercentileSketch {

  val MaxBuckets = 65536

  /** decimal scaling before bucketing (reference scaleToInt) */
  private def scaleOf(precision: Int): Double =
    math.pow(10, math.max(-6, math.min(6, precision)))

  /** sub-bucket count for a sigfig target: smallest power of 2 ≥ 2·10^sig */
  def subBuckets(sig: Int): Int = {
    var s = 1
    while (s < 2 * math.pow(10, sig)) s <<= 1
    s
  }

  /** Effective significant digits: the reference clamp [1, 5]
    * (percentile.go:35-41), degraded while the bucket array would exceed
    * [[MaxBuckets]] (HDR memory is bounded by construction).
    */
  def sigOf(lo: Double, hi: Double, precision: Int): Int = {
    var sig = math.max(1, math.min(5, precision))
    while (sig > 1 && bucketsFor(lo, hi, precision, sig) > MaxBuckets) sig -= 1
    sig
  }

  private def maxOffset(lo: Double, hi: Double, precision: Int): Long =
    math.max(1L, math.round((hi - lo) * scaleOf(precision)))

  /** HDR countsIndex: identity in the linear region, then (power-of-two
    * bucket, S/2 sub-buckets) beyond it.
    */
  private def idxOfOffset(o: Long, s: Int): Int =
    if (o < s) o.toInt
    else {
      val shift = (63 - java.lang.Long.numberOfLeadingZeros(o)) -
        (Integer.numberOfTrailingZeros(s) - 1)
      val sub = (o >> shift).toInt // ∈ [S/2, S)
      (shift + 1) * (s / 2) + (sub - s / 2)
    }

  private def bucketsFor(lo: Double, hi: Double, precision: Int, sig: Int): Int =
    idxOfOffset(maxOffset(lo, hi, precision), subBuckets(sig)) + 1

  def numBuckets(lo: Double, hi: Double, precision: Int): Int =
    bucketsFor(lo, hi, precision, sigOf(lo, hi, precision))

  /** Serialized format v2: `[version:1][lo:8][hi:8][precision:4][n:4][n×8]`.
    * The header pins the bucket geometry: a sketch stored under different
    * (lo, hi, precision) — or by the round-1 linear-histogram format, which
    * had no header (first byte = high byte of a ≤64Ki count, i.e. 0) — is
    * rejected loudly instead of being silently decoded with the wrong
    * geometry.
    */
  val FormatVersion: Byte = 2

  def serialize(counts: Array[Long], lo: Double, hi: Double,
                precision: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 8 + 8 + 4 + 4 + counts.length * 8)
    bb.put(FormatVersion)
    bb.putDouble(lo); bb.putDouble(hi); bb.putInt(precision)
    bb.putInt(counts.length)
    counts.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte], lo: Double, hi: Double,
                  precision: Int): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val ver = bb.get()
    require(ver == FormatVersion,
      s"percentile sketch format version $ver, expected $FormatVersion: " +
        "this sketch was stored by an incompatible engine version")
    val (slo, shi, sprec) = (bb.getDouble, bb.getDouble, bb.getInt)
    require(slo == lo && shi == hi && sprec == precision,
      s"percentile sketch was stored with PERCENTILE(lo=$slo, hi=$shi, " +
        s"precision=$sprec) but this query expects (lo=$lo, hi=$hi, " +
        s"precision=$precision)")
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  private def idxOf(v: Double, lo: Double, hi: Double, precision: Int,
                    s: Int, b: Int): Int = {
    val o = math.max(0L, math.round((v - lo) * scaleOf(precision)))
    math.min(b - 1, idxOfOffset(o, s))
  }

  /** HIGHEST equivalent value of bucket i, unscaled back into [lo, hi]
    * (HDR highestEquivalentValue shape)
    */
  def valueOfIdx(i: Int, lo: Double, hi: Double, precision: Int): Double = {
    val s = subBuckets(sigOf(lo, hi, precision))
    val halfS = s / 2
    val o: Long =
      if (i < s) i.toLong
      else {
        val bucket = i / halfS - 1 // power-of-two range number ≥ 1
        val sub = i % halfS + halfS
        ((sub.toLong + 1) << bucket) - 1
      }
    math.min(hi, math.max(lo, lo + o.toDouble / scaleOf(precision)))
  }

  /** quantile from counts: smallest bucket whose cumulative count reaches
    * ceil(q·n) (HDR valueAtQuantile shape). NaN when the sketch is empty —
    * the caller maps it to unset/NULL.
    */
  def quantile(counts: Array[Long], q: Double, lo: Double, hi: Double,
               precision: Int): Double = {
    val b = counts.length
    val n = counts.sum
    if (n == 0) return Double.NaN
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < b) {
      cum += counts(i)
      if (cum >= target) return valueOfIdx(i, lo, hi, precision)
      i += 1
    }
    hi
  }

  final class SketchAgg(lo: Double, hi: Double, precision: Int)
      extends Aggregator[java.lang.Double, Array[Long], Array[Byte]] {
    private val b = numBuckets(lo, hi, precision)
    private val s = subBuckets(sigOf(lo, hi, precision))
    def reduce(acc: Array[Long], v: java.lang.Double): Array[Long] = {
      if (v != null && v >= lo && v <= hi)
        acc(idxOf(v, lo, hi, precision, s, b)) += 1
      acc
    }
    def zero: Array[Long] = new Array[Long](b)
    def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a
    }
    def finish(acc: Array[Long]): Array[Byte] = serialize(acc, lo, hi, precision)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Re-merge stored (serialized) sketches across buckets/groups. The
    * (lo, hi, precision) the query expects is validated against each stored
    * sketch's header — a geometry mismatch fails loudly.
    */
  final class MergeAgg(lo: Double, hi: Double, precision: Int)
      extends Aggregator[Array[Byte], Array[Long], Array[Byte]] {
    private val buckets = numBuckets(lo, hi, precision)
    def zero: Array[Long] = new Array[Long](buckets)
    def reduce(acc: Array[Long], s: Array[Byte]): Array[Long] =
      if (s == null) acc else merge(acc, deserialize(s, lo, hi, precision))
    def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      require(a.length == c.length,
        s"percentile sketch bucket-count mismatch (${a.length} vs ${c.length})")
      var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a
    }
    def finish(acc: Array[Long]): Array[Byte] = serialize(acc, lo, hi, precision)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a sketch from raw values (aggregation). */
  def sketchAgg(value: Column, lo: Double, hi: Double, precision: Int): Column =
    udaf(new SketchAgg(lo, hi, precision), Encoders.DOUBLE).apply(value)

  /** Merge stored sketches (re-aggregation). */
  def mergeAgg(sketch: Column, lo: Double, hi: Double, precision: Int): Column =
    udaf(new MergeAgg(lo, hi, precision), Encoders.BINARY).apply(sketch)

  /** Read quantile q (0-1) out of a sketch column; NULL when unset/empty. */
  def valueAt(sketch: Column, q: Double, lo: Double, hi: Double,
              precision: Int): Column = {
    val f = org.apache.spark.sql.functions.udf {
      (bytes: Array[Byte]) =>
        if (bytes == null) null.asInstanceOf[java.lang.Double]
        else {
          val v = quantile(deserialize(bytes, lo, hi, precision), q, lo, hi, precision)
          if (v.isNaN) null.asInstanceOf[java.lang.Double]
          else java.lang.Double.valueOf(v)
        }
    }
    f(sketch)
  }
}
