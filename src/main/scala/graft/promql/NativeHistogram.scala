package graft.promql

/** Prometheus native (sparse exponential-bucket) histograms — the query-time
  * model and function family of reference `promql/src/functions/
  * native_histogram.rs:1-2600` and `common/query/src/native_histogram.rs`,
  * re-derived from the published Prometheus semantics.
  *
  * Representation note: the reference's Arrow payload stores sparse spans
  * (offset/length runs); this model stores the ABSOLUTE bucket index per
  * populated bucket ([[posIndex]]/[[negIndex]]), which is the span list in
  * expanded form — `spansToIndices` converts. Counts are absolute doubles.
  *
  * schema: exponential scale (bound(i) = 2^(i * 2^-schema)); schema == -53
  * (CUSTOM_BUCKETS_SCHEMA in the reference) means [[customValues]] holds
  * inclusive upper bounds like a classic histogram.
  */
final case class NativeHistogram(
    schema: Int,
    zeroThreshold: Double,
    zeroCount: Double,
    count: Double,
    sum: Double,
    posIndex: Array[Int],
    posBuckets: Array[Double],
    negIndex: Array[Int],
    negBuckets: Array[Double],
    customValues: Array[Double]) {

  import NativeHistogram._

  def usesCustom: Boolean = schema == CustomSchema

  def compatibleWith(o: NativeHistogram): Boolean =
    schema == o.schema && zeroThreshold == o.zeroThreshold &&
      java.util.Arrays.equals(customValues, o.customValues)

  // ---- materialized buckets (negative desc | zero | positive asc) ----
  private[promql] case class Bucket(lower: Double, upper: Double, count: Double)

  private def bound(idx: Int): Double = {
    if (usesCustom) {
      if (idx == -1) Double.NegativeInfinity
      else if (idx == customValues.length) Double.PositiveInfinity
      else customValues(idx)
    } else math.pow(2.0, idx.toDouble * math.pow(2.0, -schema.toDouble))
  }

  private def sideBuckets(positive: Boolean): Seq[Bucket] = {
    val (idx, cnt) = if (positive) (posIndex, posBuckets) else (negIndex, negBuckets)
    idx.zip(cnt).toSeq.map { case (i, c) =>
      val up = bound(i); val lo = bound(i - 1)
      if (positive) Bucket(lo, up, c) else Bucket(-up, -lo, c)
    }
  }

  private[promql] def allBuckets: Seq[Bucket] = {
    val neg = sideBuckets(positive = false).reverse
    val zero = if (zeroCount != 0.0)
      Seq(Bucket(-zeroThreshold, zeroThreshold, zeroCount)) else Seq.empty
    neg ++ zero ++ sideBuckets(positive = true)
  }

  // ---- scalar extractors ----
  def avg: Double = sum / count

  /** stddev/stdvar estimated from bucket midpoints (geometric mean for
    * exponential buckets), matching the reference's estimator. */
  def stdvar: Double = {
    if (count == 0.0) return Double.NaN
    val mean = sum / count
    var acc = 0.0
    allBuckets.foreach { b =>
      if (b.count != 0.0) {
        val mid =
          if (usesCustom) (b.lower + b.upper) / 2.0
          else if (b.lower <= 0.0 && b.upper >= 0.0) 0.0
          else {
            val m = math.sqrt(b.lower.abs * b.upper.abs)
            if (b.lower < 0.0) -m else m
          }
        acc += (mid - mean) * (mid - mean) * b.count
      }
    }
    acc / count
  }
  def stddev: Double = math.sqrt(stdvar)

  /** Prometheus histogram_quantile over native buckets: cumulative walk,
    * exponential interpolation inside exponential buckets, linear inside
    * the zero/custom buckets. */
  def quantile(q: Double): Double = {
    if (q < 0.0) return Double.NegativeInfinity
    if (q > 1.0) return Double.PositiveInfinity
    if (count == 0.0 || q.isNaN) return Double.NaN
    val rank = q * count
    var cum = 0.0
    for (b0 <- allBuckets if b0.count != 0.0) {
      cum += b0.count
      if (cum >= rank) {
        var b = b0
        if (!usesCustom && b.lower < 0.0 && b.upper > 0.0) {
          if (negBuckets.isEmpty && posBuckets.nonEmpty) b = b.copy(lower = 0.0)
          else if (posBuckets.isEmpty && negBuckets.nonEmpty) b = b.copy(upper = 0.0)
        } else if (usesCustom) {
          if (b.lower.isNegInfinity) {
            if (b.upper <= 0.0) return b.upper
            b = b.copy(lower = 0.0)
          } else if (b.upper.isPosInfinity) return b.lower
        }
        val rankInBucket = rank - (cum - b.count)
        val fraction = rankInBucket / b.count
        if (usesCustom || (b.lower <= 0.0 && b.upper >= 0.0))
          return b.lower + (b.upper - b.lower) * fraction
        val logLower = math.log(b.lower.abs) / math.log(2.0)
        val logUpper = math.log(b.upper.abs) / math.log(2.0)
        return if (b.lower > 0.0)
          math.pow(2.0, logLower + (logUpper - logLower) * fraction)
        else
          -math.pow(2.0, logUpper + (logLower - logUpper) * (1.0 - fraction))
      }
    }
    Double.NaN
  }

  /** Estimated fraction of observations in [lower, upper]. */
  def fraction(lower: Double, upper: Double): Double = {
    if (count == 0.0 || lower.isNaN || upper.isNaN) return Double.NaN
    if (lower >= upper) return 0.0
    val buckets = allBuckets
    var rank = 0.0
    var lowerRank = 0.0; var upperRank = 0.0
    var lowerSet = false; var upperSet = false
    val it = buckets.iterator
    while (it.hasNext && !(lowerSet && upperSet)) {
      var b = it.next()
      val zeroBucket = b.lower <= 0.0 && b.upper >= 0.0
      if (zeroBucket) {
        if (negBuckets.isEmpty && posBuckets.nonEmpty) b = b.copy(lower = 0.0)
        else if (posBuckets.isEmpty && negBuckets.nonEmpty) b = b.copy(upper = 0.0)
      }
      if (!lowerSet && b.lower >= lower) { lowerRank = rank; lowerSet = true }
      if (!upperSet && b.lower >= upper) { upperRank = rank; upperSet = true }
      if (!(lowerSet && upperSet)) {
        if (!lowerSet && b.lower < lower && b.upper > lower) {
          lowerRank = interpolateRank(b, rank, lower, zeroBucket); lowerSet = true
        }
        if (!upperSet && b.lower < upper && b.upper > upper) {
          upperRank = interpolateRank(b, rank, upper, zeroBucket); upperSet = true
        }
        rank += b.count
      }
    }
    if (!lowerSet || lowerRank > count) lowerRank = count
    if (!upperSet || upperRank > count) upperRank = count
    (upperRank - lowerRank) / count
  }

  private def interpolateRank(b: Bucket, rank: Double, value: Double,
      zeroBucket: Boolean): Double = {
    if (usesCustom || zeroBucket) {
      if (b.lower.isNegInfinity) return b.count
      return rank + b.count * (value - b.lower) / (b.upper - b.lower)
    }
    val logLower = math.log(b.lower.abs) / math.log(2.0)
    val logUpper = math.log(b.upper.abs) / math.log(2.0)
    val logValue = math.log(value.abs) / math.log(2.0)
    val fraction =
      if (value > 0.0) (logValue - logLower) / (logUpper - logLower)
      else 1.0 - ((logValue - logUpper) / (logLower - logUpper))
    rank + b.count * fraction
  }

  // ---- arithmetic (same-layout; mixed schemas must be downscaled first) ----
  private def combine(o: NativeHistogram, op: (Double, Double) => Double): NativeHistogram = {
    require(compatibleWith(o), "incompatible histogram layouts")
    def side(ai: Array[Int], ab: Array[Double], bi: Array[Int], bb: Array[Double]) = {
      val av = ai.zip(ab).toMap
      val bv = bi.zip(bb).toMap
      val keys = (ai ++ bi).distinct.sorted
      (keys, keys.map(i => op(av.getOrElse(i, 0.0), bv.getOrElse(i, 0.0))))
    }
    val (pi, pb) = side(posIndex, posBuckets, o.posIndex, o.posBuckets)
    val (ni, nb) = side(negIndex, negBuckets, o.negIndex, o.negBuckets)
    copy(zeroCount = op(zeroCount, o.zeroCount), count = op(count, o.count),
      sum = op(sum, o.sum), posIndex = pi, posBuckets = pb, negIndex = ni, negBuckets = nb)
  }

  def add(o: NativeHistogram): NativeHistogram = combine(o, _ + _).compact
  def sub(o: NativeHistogram): NativeHistogram = combine(o, _ - _).compact

  def scale(f: Double): NativeHistogram =
    copy(zeroCount = zeroCount * f, count = count * f, sum = sum * f,
      posBuckets = posBuckets.map(_ * f), negBuckets = negBuckets.map(_ * f))
  def negated: NativeHistogram = scale(-1.0)

  def equalsHist(o: NativeHistogram): Boolean =
    compatibleWith(o) && zeroCount == o.zeroCount && count == o.count &&
      (sum == o.sum || (sum.isNaN && o.sum.isNaN)) &&
      compact.sameBuckets(o.compact)

  private def sameBuckets(o: NativeHistogram): Boolean =
    java.util.Arrays.equals(posIndex, o.posIndex) &&
      java.util.Arrays.equals(posBuckets, o.posBuckets) &&
      java.util.Arrays.equals(negIndex, o.negIndex) &&
      java.util.Arrays.equals(negBuckets, o.negBuckets)

  /** drop zero-count buckets (the reference compacts spans the same way) */
  def compact: NativeHistogram = {
    val p = posIndex.zip(posBuckets).filter(_._2 != 0.0)
    val n = negIndex.zip(negBuckets).filter(_._2 != 0.0)
    copy(posIndex = p.map(_._1), posBuckets = p.map(_._2),
      negIndex = n.map(_._1), negBuckets = n.map(_._2))
  }

  /** counter reset iff any cumulative quantity decreased (simplified from
    * the reference: same-layout series, no schema migration mid-series) */
  def detectReset(previous: NativeHistogram): Boolean = {
    if (count < previous.count || zeroCount < previous.zeroCount) return true
    val prevP = previous.posIndex.zip(previous.posBuckets).toMap
    val prevN = previous.negIndex.zip(previous.negBuckets).toMap
    posIndex.zip(posBuckets).exists { case (i, c) => c < prevP.getOrElse(i, 0.0) } ||
      negIndex.zip(negBuckets).exists { case (i, c) => c < prevN.getOrElse(i, 0.0) }
  }

  /** render like the reference's to_string: count/sum plus bucket list */
  def toDisplayString: String = {
    val bs = allBuckets.filter(_.count != 0.0)
      .map(b => s"[${b.lower},${b.upper}]:${b.count}").mkString(" ")
    s"count:$count sum:$sum $bs".trim
  }
}

object NativeHistogram {
  /** matches the reference's CUSTOM_BUCKETS_SCHEMA sentinel */
  val CustomSchema: Int = -53

  /** expand (offset, length) spans into absolute bucket indices */
  def spansToIndices(spans: Seq[(Int, Int)]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var cur = 0; var first = true
    spans.foreach { case (offset, length) =>
      cur = if (first) offset else cur + offset
      first = false
      (0 until length).foreach { _ => out += cur; cur += 1 }
    }
    out.result()
  }

  def empty(schema: Int, zeroThreshold: Double): NativeHistogram =
    NativeHistogram(schema, zeroThreshold, 0.0, 0.0, 0.0,
      Array.empty, Array.empty, Array.empty, Array.empty, Array.empty)

  // ---- time-series ops over one series (ts-ascending) ----
  def sumSeries(hs: Seq[NativeHistogram]): Option[NativeHistogram] =
    hs.reduceOption((a, b) => a.add(b))
  def avgSeries(hs: Seq[NativeHistogram]): Option[NativeHistogram] =
    sumSeries(hs).map(_.scale(1.0 / hs.size))

  /** increase/rate/delta with the same counter-reset compensation and
    * range extrapolation as classic counters (PromFunctions.extrapolatedRate).
    */
  def extrapolated(tsMs: Seq[Long], hs: Seq[NativeHistogram], rangeMs: Long,
      endTs: Long, isCounter: Boolean, isRate: Boolean): Option[NativeHistogram] = {
    if (hs.size < 2) return None
    var result = hs.last.sub(hs.head)
    if (isCounter) {
      // add back the pre-reset level at each detected reset
      hs.sliding(2).foreach {
        case Seq(a, b) => if (b.detectReset(a)) result = result.add(a)
        case _ =>
      }
    }
    // Prometheus range extrapolation, clamped to half the average sample
    // interval on each side (histograms skip the counter zero-floor check)
    val rangeStart = endTs - rangeMs
    val durationToStart = (tsMs.head - rangeStart).toDouble / 1000.0
    val durationToEnd = (endTs - tsMs.last).toDouble / 1000.0
    val sampledInterval = (tsMs.last - tsMs.head).toDouble / 1000.0
    val averageDuration = sampledInterval / (hs.size - 1).toDouble
    val startAdj = math.min(durationToStart, averageDuration / 2.0)
    val endAdj = math.min(durationToEnd, averageDuration / 2.0)
    val factor = (sampledInterval + startAdj + endAdj) / sampledInterval
    var out = result.scale(factor)
    if (isRate) out = out.scale(1000.0 / rangeMs.toDouble)
    Some(out)
  }

  def changes(hs: Seq[NativeHistogram]): Long =
    hs.sliding(2).count { case Seq(a, b) => !b.equalsHist(a); case _ => false }
  def resets(hs: Seq[NativeHistogram]): Long =
    hs.sliding(2).count { case Seq(a, b) => b.detectReset(a); case _ => false }
}
