package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Anomaly-scoring window functions — reference
  * common/function/src/scalars/anomaly/{zscore,mad,iqr}.rs.
  * Each scores a value against its window population:
  *  - zscore: |x - mean| / stddev; 0 when stddev=0 ∧ x=mean, +inf else;
  *    null when n < 2
  *  - mad:    |x - median| / (1.4826 * median(|xi - median|))
  *  - iqr:    distance beyond the k·IQR fences, scaled by IQR
  *            (iqr.rs:168-181); 0 inside the fences
  */
object AnomalyFunctions {

  private val Inf = lit(Double.PositiveInfinity)

  def anomalyScoreZscore(v: Column, w: WindowSpec): Column = {
    val x = v.cast("double")
    val mean = avg(x).over(w)
    val sd = stddev_samp(x).over(w)
    val n = count(x).over(w)
    when(n < 2, lit(null).cast("double"))
      .when(sd === 0.0, when(x === mean, 0.0).otherwise(Inf))
      .otherwise(abs(x - mean) / sd)
  }

  /** Z-score as a DataFrame transform — the SCALE path: mean/stddev/
    * count come from a map-side-combined groupBy and join back (tiny
    * group table, AQE broadcasts), so a low-cardinality partition
    * column (a handful of event types over 10⁹ rows) never funnels a
    * whole group through one window task. The WindowSpec variant above
    * stays for composability inside larger window chains. */
  def withAnomalyScoreZscore(
      df: org.apache.spark.sql.DataFrame,
      valueCol: String,
      partitionBy: Seq[String],
      outCol: String): org.apache.spark.sql.DataFrame = {
    val x = col(valueCol).cast("double")
    // Null-safe join on the group keys: the WindowSpec variant scores a
    // null partition value as its own group, so the join-back must keep
    // those rows too (a plain USING join would drop them).
    val stats = partitionBy.foldLeft(
        df.groupBy(partitionBy.map(col): _*)
          .agg(avg(x).as("__m"), stddev_samp(x).as("__sd"), count(x).as("__n"))
      ) { (d, c) => d.withColumnRenamed(c, s"__k_$c") }
    val cond = partitionBy.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(stats, cond)
      .drop(partitionBy.map(c => s"__k_$c"): _*)
      .withColumn(outCol,
        when(col("__n") < 2, lit(null).cast("double"))
          .when(col("__sd") === 0.0, when(x === col("__m"), 0.0).otherwise(Inf))
          .otherwise(abs(x - col("__m")) / col("__sd")))
      .drop("__m", "__sd", "__n")
  }

  /** MAD needs the window median materialized before the second
    * percentile pass (window functions cannot nest), so it is a
    * DataFrame transform: adds `outCol` scoring `valueCol` within each
    * `partitionBy` group. Scale note: the exact-percentile semantics
    * (pinned by the oracle) buffer each group wherever they run —
    * window or aggregate; the sketch-based scale path for huge groups
    * is the t-digest/uddsketch family in graft.aggregates. */
  def withAnomalyScoreMad(
      df: org.apache.spark.sql.DataFrame,
      valueCol: String,
      partitionBy: Seq[String],
      outCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(partitionBy.map(col): _*)
    val x = col(valueCol).cast("double")
    val staged = df.withColumn("__med", percentileOver(x, w))
    val mad = lit(1.4826) * percentile(abs(x - col("__med")), lit(0.5)).over(w)
    staged
      .withColumn("__mad", mad)
      .withColumn(outCol,
        when(col("__mad") === 0.0, when(x === col("__med"), 0.0).otherwise(Inf))
          .otherwise(abs(x - col("__med")) / col("__mad")))
      .drop("__med", "__mad")
  }

  def anomalyScoreIqr(v: Column, w: WindowSpec, k: Double = 1.5): Column = {
    val x = v.cast("double")
    val q1 = expr_percentile(x, 0.25, w)
    val q3 = expr_percentile(x, 0.75, w)
    val iqr = q3 - q1
    val lo = q1 - lit(k) * iqr
    val hi = q3 + lit(k) * iqr
    when(x >= lo && x <= hi, 0.0)
      .when(iqr === 0.0, Inf)
      .when(x < lo, (lo - x) / iqr)
      .otherwise((x - hi) / iqr)
  }

  /** Exact linear-interpolation percentile (matches DuckDB
    * quantile_cont, so MAD/IQR scores are oracle-checkable). */
  private def expr_percentile(x: Column, p: Double, w: WindowSpec): Column =
    percentile(x, lit(p)).over(w)

  private def percentileOver(x: Column, w: WindowSpec): Column =
    expr_percentile(x, 0.5, w)
}
