package graft.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Frame-statistics support for the SQL window spellings of the anomaly
  * scorers — reference common/function/src/scalars/anomaly/{mad,utils}.rs,
  * exercised as `anomaly_score_mad(v) OVER (...)` in
  * tests/cases/standalone/common/function/anomaly.sql.
  *
  * zscore and iqr expand to plain windowed aggregates in the dialect
  * layer (GraftSession); MAD needs the median-of-deviations-from-median,
  * a two-pass statistic no single built-in aggregate expresses — this
  * Aggregator computes the frame's (median, MAD) pair in its finish, and
  * the dialect macro scores the current row against it, so any frame
  * shape (centered, following, running) works exactly like the
  * reference's window UDF. O(n log n) per frame — the Column-level
  * AnomalyFunctions.withAnomalyScoreMad stays the vectorized scale path.
  */
object AnomalyWindowAggs {

  final case class MadStats(med: Double, mad: Double)

  /** Exact linear-interpolation percentile over a sorted array
    * (reference utils.rs `percentile_sorted` / `median_f64`). */
  private def pct(sorted: Array[Double], p: Double): Double = {
    val n = sorted.length
    val pos = p * (n - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** Frame (median, MAD); null-valued and non-finite inputs skipped
    * like the reference's collect_window_values. */
  val madStats: Aggregator[java.lang.Double, Array[Double], MadStats] =
    new Aggregator[java.lang.Double, Array[Double], MadStats] {
      def zero: Array[Double] = Array.empty
      def reduce(b: Array[Double], v: java.lang.Double): Array[Double] =
        if (v == null || v.isNaN || v.isInfinite) b else b :+ v.doubleValue()
      def merge(a: Array[Double], b: Array[Double]): Array[Double] = a ++ b
      def finish(b: Array[Double]): MadStats = {
        if (b.isEmpty) return null
        val med = pct(b.sorted, 0.5)
        val mad = pct(b.map(v => math.abs(v - med)).sorted, 0.5)
        MadStats(med, mad)
      }
      def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
      def outputEncoder: Encoder[MadStats] = Encoders.product[MadStats]
    }
}
