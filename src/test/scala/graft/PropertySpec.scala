package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.PercentileSketch
import graft.sqlx.Durations

/** Properties the reference relies on implicitly (SURVEY.md §5): accumulator
  * merges must be associative+commutative for partial aggregation and
  * arbitrary micro-batch splits to be correct.
  */
object PercentileSketchProps extends Properties("PercentileSketch") {

  private val lo = 0.0; private val hi = 100.0; private val prec = 1

  private def sketchOf(vs: Seq[Double]): Array[Long] = {
    val agg = new PercentileSketch.SketchAgg(lo, hi, prec)
    vs.foldLeft(agg.zero)((acc, v) => agg.reduce(acc, v))
  }

  private val values = Gen.listOf(Gen.choose(-20.0, 120.0))

  property("merge is split-independent") =
    forAll(values, Gen.choose(0, 1000)) { (vs, splitSeed) =>
      val agg = new PercentileSketch.SketchAgg(lo, hi, prec)
      val whole = sketchOf(vs)
      val k = if (vs.isEmpty) 0 else math.abs(splitSeed) % (vs.size + 1)
      val (a, b) = vs.splitAt(k)
      agg.merge(sketchOf(a), sketchOf(b)).toSeq == whole.toSeq
    }

  property("merge is order-independent") = forAll(values) { vs =>
    sketchOf(vs.reverse).toSeq == sketchOf(vs).toSeq
  }

  property("serialized merge agrees with direct merge") =
    forAll(values, values) { (a, b) =>
      val m = new PercentileSketch.MergeAgg(lo, hi, prec)
      val viaBytes = m.reduce(
        m.reduce(m.zero, PercentileSketch.serialize(sketchOf(a), lo, hi, prec)),
        PercentileSketch.serialize(sketchOf(b), lo, hi, prec))
      viaBytes.toSeq ==
        new PercentileSketch.SketchAgg(lo, hi, prec)
          .merge(sketchOf(a), sketchOf(b)).toSeq
    }

  property("quantile monotonic in q, bounded by [lo,hi]") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 100.0)),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (vs, q1, q2) =>
      val s = sketchOf(vs)
      val (qa, qb) = if (q1 <= q2) (q1, q2) else (q2, q1)
      val va = PercentileSketch.quantile(s, qa, lo, hi, prec)
      val vb = PercentileSketch.quantile(s, qb, lo, hi, prec)
      va <= vb && va >= lo && vb <= hi
    }

  // --- HDR-bucket accuracy: relative error bounded across wide spans ------
  // Spans ≥ 6 decades are exactly where the old linear bucketing collapsed
  // (64Ki buckets over [0, 2e6] ⇒ ±30 absolute error everywhere); the HDR
  // hybrid bounds error RELATIVE to the offset: bucket width ≤ 2·o/S, plus
  // the decimal-scaling quantization of ±0.5/10^precision.

  private val wideRanges = Gen.oneOf(
    (0.0, 2.0e6), (0.0, 1.0e9), (-1.0e3, 1.0e7), (5.0, 9.0e6))

  property("single-value read-back within relative-error bound, 6+ decades") =
    forAll(wideRanges, Gen.choose(0.0, 1.0), Gen.choose(1, 4)) { (r, frac, p) =>
      val (wlo, whi) = r
      val v = wlo + frac * (whi - wlo)
      val agg = new PercentileSketch.SketchAgg(wlo, whi, p)
      val got = PercentileSketch.quantile(
        agg.reduce(agg.zero, v), 0.5, wlo, whi, p)
      val s = PercentileSketch.subBuckets(PercentileSketch.sigOf(wlo, whi, p))
      val bound = 2.0 * (v - wlo) / s + 1.0 / math.pow(10, p) + 1e-6
      math.abs(got - v) <= bound
    }

  property("geometry mismatch is rejected loudly, never silently decoded") =
    forAll(Gen.oneOf((0.0, 50.0, 1), (0.0, 100.0, 2), (10.0, 100.0, 1))) { p =>
      val (mlo, mhi, mprec) = p
      val bytes = PercentileSketch.serialize(sketchOf(Seq(42.0)), lo, hi, prec)
      // matching params round-trip; mismatched params throw (v2 header check)
      PercentileSketch.deserialize(bytes, lo, hi, prec).sum == 1 && {
        try { PercentileSketch.deserialize(bytes, mlo, mhi, mprec); false }
        catch { case _: IllegalArgumentException => true }
      } && {
        // round-1's unversioned format (leading count int, high byte 0) is
        // rejected rather than decoded with the new geometry
        val legacy = java.nio.ByteBuffer.allocate(12).putInt(1).putLong(7L).array()
        try { PercentileSketch.deserialize(legacy, lo, hi, prec); false }
        catch { case _: IllegalArgumentException => true }
      }
    }

  property("v2 wire fixture round-trips byte-for-byte (forward-compat pin)") = {
    // A FIXTURE sketch as the round-5 engine stored it, built from literal
    // layout constants — NOT by calling serialize() — the way the reference
    // pins its stored msgpack exprs (expr/combined_test.go). If the header
    // layout, the v2 geometry (112 buckets for lo=0,hi=100,prec=1), or the
    // bucket index function drifts, stored tables become unreadable and this
    // fails before a user's data does. Source values: 1.0, 2.5, 50.0×2,
    // 50.1, 99.0 (plus -5.0 and 120.0, discarded by bounded-discard).
    val bb = java.nio.ByteBuffer.allocate(921)
    bb.put(2.toByte)                          // FormatVersion as stored
    bb.putDouble(0.0); bb.putDouble(100.0); bb.putInt(1)
    bb.putInt(112)                            // v2 bucket geometry
    Seq(10 -> 1L, 25 -> 1L, 95 -> 3L, 110 -> 1L).foreach { case (i, c) =>
      bb.putLong(25 + i * 8, c)               // 25-byte header, 8-byte counts
    }
    val fixture = bb.array()
    val counts = PercentileSketch.deserialize(fixture, lo, hi, prec)
    counts.sum == 6 &&
      PercentileSketch.quantile(counts, 0.1, lo, hi, prec) == 1.0 &&
      PercentileSketch.quantile(counts, 0.5, lo, hi, prec) == 51.1 &&
      PercentileSketch.quantile(counts, 0.9, lo, hi, prec) == 99.1 &&
      // and today's writer still emits the identical bytes
      java.util.Arrays.equals(
        PercentileSketch.serialize(counts, lo, hi, prec), fixture) &&
      java.util.Arrays.equals(
        PercentileSketch.serialize(sketchOf(
          Seq(1.0, 2.5, 50.0, 99.0, -5.0, 120.0, 50.0, 50.1)), lo, hi, prec),
        fixture)
  }

  property("bucket count bounded; sub-buckets meet the sigfig target") =
    forAll(wideRanges, Gen.choose(-1, 5)) { (r, p) =>
      val (wlo, whi) = r
      val b = PercentileSketch.numBuckets(wlo, whi, p)
      val sig = PercentileSketch.sigOf(wlo, whi, p)
      // reference clamp [1,5] (percentile.go:35-41); the 64Ki cap can only
      // degrade sig, never below 1, and S always honors 2·10^sig
      b <= PercentileSketch.MaxBuckets && sig >= 1 &&
        sig <= math.max(1, math.min(5, p)) &&
        PercentileSketch.subBuckets(sig) >= 2 * math.pow(10, sig)
    }
}

object DurationProps extends Properties("Durations") {
  property("format/parse round-trips at second granularity") =
    forAll(Gen.choose(1L, 10000000L)) { secs =>
      val ms = secs * 1000
      Durations.parseMillis(Durations.format(ms)) == ms
    }
}

object Mp3MetaProps extends Properties("Mp3Meta") {
  // a byte-walker over untrusted payloads must never throw — at 100 TB the
  // corpus WILL contain truncated/garbage frames, 0xFF runs, and lying ID3
  // sizes; the contract is "valid stream or null", never an exception
  private val junk = Gen.containerOf[Array, Byte](
    Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  private val ffHeavy = Gen.containerOf[Array, Byte](
    Gen.frequency(3 -> Gen.const(0xff.toByte), 2 -> Gen.const(0xfb.toByte),
      1 -> Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
  private val lyingId3 = Gen.containerOf[Array, Byte](
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    .map(b => Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++ b)

  property("never throws on arbitrary bytes") = forAll(junk) { b =>
    graft.pipeline.Multimodal.mp3Meta(b); true
  }
  property("never throws on sync-heavy bytes") = forAll(ffHeavy) { b =>
    graft.pipeline.Multimodal.mp3Meta(b); true
  }
  property("never throws when ID3 size exceeds the payload") =
    forAll(lyingId3) { b => graft.pipeline.Multimodal.mp3Meta(b); true }
}
