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
      val m = new PercentileSketch.MergeAgg(
        PercentileSketch.numBuckets(lo, hi, prec))
      val viaBytes = m.reduce(
        m.reduce(m.zero, PercentileSketch.serialize(sketchOf(a))),
        PercentileSketch.serialize(sketchOf(b)))
      viaBytes.toSeq ==
        new PercentileSketch.SketchAgg(lo, hi, prec)
          .merge(sketchOf(a), sketchOf(b)).toSeq
    }

  property("quantile monotonic in q, bounded by [lo,hi]") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 100.0)),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (vs, q1, q2) =>
      val s = sketchOf(vs)
      val (qa, qb) = if (q1 <= q2) (q1, q2) else (q2, q1)
      val va = PercentileSketch.quantile(s, qa, lo, hi)
      val vb = PercentileSketch.quantile(s, qb, lo, hi)
      va <= vb && va >= lo && vb <= hi
    }
}

object DurationProps extends Properties("Durations") {
  property("format/parse round-trips at second granularity") =
    forAll(Gen.choose(1L, 10000000L)) { secs =>
      val ms = secs * 1000
      Durations.parseMillis(Durations.format(ms)) == ms
    }
}
