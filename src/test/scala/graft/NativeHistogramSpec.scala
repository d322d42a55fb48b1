package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.promql.NativeHistogram

/** Pins the native-histogram estimators to hand-derived values from the
  * published Prometheus semantics (exponential interpolation, zero-bucket
  * clamping, custom-bucket linearity, counter-reset compensation).
  */
class NativeHistogramSpec extends AnyFunSuite {

  private def hist(zero: Double, idx: Array[Int], counts: Array[Double],
      sum: Double, schema: Int = 0, custom: Array[Double] = Array.empty,
      negIdx: Array[Int] = Array.empty, negCounts: Array[Double] = Array.empty) =
    NativeHistogram(schema, 0.001, zero, zero + counts.sum + negCounts.sum, sum,
      idx, counts, negIdx, negCounts, custom)

  // zero: 2, (1,2]: 4, (2,4]: 4, sum 20
  private val h = hist(2.0, Array(1, 2), Array(4.0, 4.0), 20.0)

  test("scalar extractors") {
    assert(h.count === 10.0)
    assert(h.sum === 20.0)
    assert(h.avg === 2.0)
    val expectedVar = (2 * 4.0 +
      4 * math.pow(math.sqrt(2.0) - 2, 2) + 4 * math.pow(math.sqrt(8.0) - 2, 2)) / 10
    assert(math.abs(h.stdvar - expectedVar) < 1e-12)
    assert(math.abs(h.stddev - math.sqrt(expectedVar)) < 1e-12)
  }

  test("quantile: exponential interpolation, zero bucket, bounds") {
    // rank 5 falls in (1,2] with fraction 3/4 -> 2^0.75
    assert(math.abs(h.quantile(0.5) - math.pow(2.0, 0.75)) < 1e-12)
    // rank 0.5 falls in the zero bucket (clamped to [0, zt], linear)
    assert(math.abs(h.quantile(0.05) - 0.001 * 0.25) < 1e-15)
    assert(h.quantile(-0.1).isNegInfinity)
    assert(h.quantile(1.1).isPosInfinity)
    assert(hist(0, Array.empty, Array.empty, 0.0).quantile(0.5).isNaN)
  }

  test("quantile: negative buckets interpolate mirrored") {
    val neg = hist(0.0, Array.empty, Array.empty, -4.0,
      negIdx = Array(1), negCounts = Array(3.0))
    assert(math.abs(neg.quantile(0.5) - -math.sqrt(2.0)) < 1e-12)
  }

  test("quantile: custom buckets are linear (classic histogram)") {
    val c = NativeHistogram(NativeHistogram.CustomSchema, 0.0, 0.0, 10.0, 40.0,
      Array(0, 1, 2), Array(2.0, 6.0, 2.0), Array.empty, Array.empty,
      Array(1.0, 5.0, 10.0))
    assert(math.abs(c.quantile(0.5) - 3.0) < 1e-12)
    // no +inf bucket here: rank 9.99 interpolates inside (5,10]
    assert(math.abs(c.quantile(0.999) - 9.975) < 1e-12)
    // with a populated (10,+inf) bucket the estimator returns its lower bound
    val withInf = NativeHistogram(NativeHistogram.CustomSchema, 0.0, 0.0, 10.0, 40.0,
      Array(0, 1, 2, 3), Array(2.0, 6.0, 1.0, 1.0), Array.empty, Array.empty,
      Array(1.0, 5.0, 10.0))
    assert(withInf.quantile(0.999) === 10.0)
  }

  test("fraction: boundary-exact and interpolated ranks") {
    assert(math.abs(h.fraction(1.0, 4.0) - 0.8) < 1e-12)
    val lowerRank = 2 + 4 * (math.log(1.5) / math.log(2.0))
    assert(math.abs(h.fraction(1.5, 2.0) - (6.0 - lowerRank) / 10.0) < 1e-12)
    assert(h.fraction(4.0, 1.0) === 0.0)
    assert(math.abs(h.fraction(-100.0, 100.0) - 1.0) < 1e-12)
  }

  test("add merges sparse layouts; sub inverts") {
    val a = hist(1.0, Array(0, 2), Array(1.0, 2.0), 5.0)
    val b = hist(2.0, Array(1, 2), Array(3.0, 4.0), 7.0)
    val s = a.add(b)
    assert(s.posIndex.toSeq === Seq(0, 1, 2))
    assert(s.posBuckets.toSeq === Seq(1.0, 3.0, 6.0))
    assert(s.count === a.count + b.count && s.sum === 12.0 && s.zeroCount === 3.0)
    val back = s.sub(b)
    assert(back.equalsHist(a))
  }

  test("scale and negate") {
    val d = h.scale(0.5)
    assert(d.count === 5.0 && d.sum === 10.0 && d.posBuckets.toSeq === Seq(2.0, 2.0))
    assert(h.negated.sum === -20.0)
  }

  test("reset detection and series ops") {
    def at(c: Double) = hist(0.0, Array(0), Array(c), c)
    val series = Seq(at(10), at(20), at(15)) // reset between 2nd and 3rd
    assert(at(15).detectReset(at(20)))
    assert(!at(20).detectReset(at(10)))
    assert(NativeHistogram.resets(series) === 1L)
    assert(NativeHistogram.changes(series) === 2L)
    val sum = NativeHistogram.sumSeries(series).get
    assert(sum.count === 45.0)
    assert(NativeHistogram.avgSeries(series).get.count === 15.0)
    // increase with reset compensation, no extrapolation (samples at range ends)
    val inc = NativeHistogram.extrapolated(Seq(0L, 30000L, 60000L), series,
      rangeMs = 60000L, endTs = 60000L, isCounter = true, isRate = false).get
    assert(math.abs(inc.count - 25.0) < 1e-12)
    val rate = NativeHistogram.extrapolated(Seq(0L, 30000L, 60000L), series,
      rangeMs = 60000L, endTs = 60000L, isCounter = true, isRate = true).get
    assert(math.abs(rate.count - 25.0 / 60.0) < 1e-12)
    // delta (gauge): no reset compensation
    val delta = NativeHistogram.extrapolated(Seq(0L, 30000L, 60000L), series,
      rangeMs = 60000L, endTs = 60000L, isCounter = false, isRate = false).get
    assert(math.abs(delta.count - 5.0) < 1e-12)
  }

  test("spans round-trip to absolute indices") {
    assert(NativeHistogram.spansToIndices(Seq((2, 2), (3, 1))).toSeq === Seq(2, 3, 7))
  }
}
