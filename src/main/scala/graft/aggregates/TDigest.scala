package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** t-digest quantile sketch (Dunning & Ertl, "Computing Extremely
  * Accurate Quantiles Using t-Digests"), the merging-digest variant with
  * the piecewise-quadratic scale function `k_to_q` — the same published
  * algorithm the reference's `approx_percentile_cont` family evaluates
  * through DataFusion (ref `common/function` re-exports; pinned by
  * tests/cases/standalone/common/aggregate/approx_percentile_cont.result).
  *
  * Scale design: points buffer up to [[TDigest.BufferCap]] per partial
  * aggregate and compress into ≤ [[TDigest.MaxSize]] centroids; merges
  * combine centroid lists and re-compress, so executor memory stays
  * bounded at any input size. Below the cap the digest is built from the
  * fully-sorted input in one pass — bit-identical to the reference on
  * the corpus's small tables.
  */
object TDigest {
  val MaxSize = 100
  val BufferCap = 10000

  final case class Buf(
      pm: Array[Double], pw: Array[Double], // buffered raw points
      cm: Array[Double], cw: Array[Double], // compressed centroids
      q: Double, lo: Double, hi: Double, n: Long)

  private def kToQ(k: Double, d: Double): Double = {
    val kd = k / d
    if (kd >= 0.5) 1.0 - 2.0 * (1.0 - kd) * (1.0 - kd) else 2.0 * kd * kd
  }

  /** One merge pass over (mean, weight) pairs sorted by mean. */
  def compress(means: Array[Double], weights: Array[Double]): (Array[Double], Array[Double]) = {
    if (means.isEmpty) return (means, weights)
    val idx = means.indices.sortBy(means(_))
    val total = weights.sum
    val om = Array.newBuilder[Double]
    val ow = Array.newBuilder[Double]
    var k = 0.0
    var qLimit = kToQ(k, MaxSize) * total
    var curM = means(idx.head)
    var curW = weights(idx.head)
    var merged = 0.0
    idx.tail.foreach { i =>
      val (v, w) = (means(i), weights(i))
      if (merged + curW + w <= qLimit) {
        curM = (curM * curW + v * w) / (curW + w); curW += w
      } else {
        om += curM; ow += curW; merged += curW
        k += 1.0
        qLimit = kToQ(k, MaxSize) * total
        curM = v; curW = w
      }
    }
    om += curM; ow += curW
    (om.result(), ow.result())
  }

  /** Quantile estimate: linear interpolation on half-neighbor deltas,
    * clamped into the observed [lo, hi]. */
  def quantile(cm: Array[Double], cw: Array[Double], q: Double,
      lo: Double, hi: Double): Double = {
    if (cm.isEmpty) return Double.NaN
    if (cm.length == 1) return math.min(hi, math.max(lo, cm(0)))
    val total = cw.sum
    val rank = q * total
    var t = 0.0
    var i = 0
    var res = Double.NaN
    while (i < cm.length && res.isNaN) {
      if (rank < t + cw(i) || i == cm.length - 1) {
        val delta =
          if (i == 0) cm(1) - cm(0)
          else if (i == cm.length - 1) cm(i) - cm(i - 1)
          else (cm(i + 1) - cm(i - 1)) / 2.0
        res = cm(i) + ((rank - t) / cw(i) - 0.5) * delta
      }
      t += cw(i); i += 1
    }
    math.min(hi, math.max(lo, res))
  }

  private def flushed(b: Buf): Buf = {
    if (b.pm.isEmpty) return b
    val (m, w) = compress(b.cm ++ b.pm, b.cw ++ b.pw)
    Buf(Array.empty, Array.empty, m, w, b.q, b.lo, b.hi, b.n)
  }

  /** approx_percentile_cont / _with_weight over (value, weight, q). */
  val agg: Aggregator[(Double, Double, Double), Buf, java.lang.Double] =
    new Aggregator[(Double, Double, Double), Buf, java.lang.Double] {
      def zero: Buf = Buf(Array.empty, Array.empty, Array.empty, Array.empty,
        0.5, Double.PositiveInfinity, Double.NegativeInfinity, 0L)
      def reduce(b0: Buf, in: (Double, Double, Double)): Buf = {
        val (v, w, q) = in
        if (w <= 0 || v.isNaN) return b0.copy(q = q)
        val b = if (b0.pm.length >= BufferCap) flushed(b0) else b0
        b.copy(pm = b.pm :+ v, pw = b.pw :+ w, q = q,
          lo = math.min(b.lo, v), hi = math.max(b.hi, v), n = b.n + 1)
      }
      def merge(a: Buf, b: Buf): Buf = {
        val fa = flushed(a); val fb = flushed(b)
        val (m, w) = compress(fa.cm ++ fb.cm, fa.cw ++ fb.cw)
        Buf(Array.empty, Array.empty, m, w,
          if (fa.n > 0) fa.q else fb.q,
          math.min(fa.lo, fb.lo), math.max(fa.hi, fb.hi), fa.n + fb.n)
      }
      def finish(b0: Buf): java.lang.Double = {
        val b = flushed(b0)
        if (b.n == 0) null
        else java.lang.Double.valueOf(quantile(b.cm, b.cw, b.q, b.lo, b.hi))
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  def apply(value: Column, weight: Column, q: Column): Column =
    udaf(agg, Encoders.product[(Double, Double, Double)])(value, weight, q)
}
