package graft.queries

import org.apache.spark.sql.functions._
import QueryDsl._

/** TSBS devops-equivalent benchmark queries over the `events` table
  * (BASELINE.md maps these to the reference's published cpu-only
  * results, `docs/benchmarks/tsbs/v0.12.0.md`). `user_id` plays host,
  * `event_type` plays metric, `value` plays the gauge. All filters are
  * fixed constants so the queries are deterministic at every sf.
  *
  * `ts` arrives as raw nanoseconds (nanosAsLong); bucket arithmetic is
  * integer division, matching DuckDB's `epoch_ns(ts) // n`.
  */
object TsbsQueries {

  private val NS_MIN  = 60L * 1000 * 1000 * 1000
  private val NS_HOUR = 3600L * 1000 * 1000 * 1000
  // 2024-01-02T00:00Z .. +12h, and 2024-01-05T00:00Z .. +24h
  private val D2  = 1704153600L * 1000000000L
  private val D2H = D2 + 12 * NS_HOUR
  private val D5  = 1704412800L * 1000000000L
  private val D6  = D5 + 24 * NS_HOUR

  val queries: Map[String, Q] = Map(
    // single-groupby-1-1-12: 1 metric, 1 host, 12h, per-minute max
    "tsbs_single_groupby_1_1_12" -> ((s, d) => {
      T(s, d, "events")
        .filter(col("user_id") === 1 && col("ts") >= D2 && col("ts") < D2H)
        .groupBy(expr(s"ts div $NS_MIN").as("min_b"))
        .agg(max(col("value")).as("max_v"))
        .orderBy(col("min_b"))
    }),

    // cpu-max-all-8: all metrics, 8 hosts, 1 day, per-hour max
    "tsbs_cpu_max_all_8" -> ((s, d) => {
      T(s, d, "events")
        .filter(col("user_id") < 8 && col("ts") >= D5 && col("ts") < D6)
        .groupBy(expr(s"ts div $NS_HOUR").as("hour_b"), col("event_type"))
        .agg(max(col("value")).as("max_v"))
        .orderBy(col("hour_b"), col("event_type"))
    }),

    // double-groupby-1: 1 metric, all hosts, full range, (hour, host) mean
    "tsbs_double_groupby_1" -> ((s, d) => {
      T(s, d, "events").filter(col("event_type") === "click")
        .groupBy(expr(s"ts div $NS_HOUR").as("hour_b"), col("user_id"))
        .agg(davg(col("value")).as("avg_v"))
        .orderBy(col("hour_b"), col("user_id"))
    }),

    // double-groupby-all: all metrics, all hosts, (hour, host, metric) mean
    "tsbs_double_groupby_all" -> ((s, d) => {
      T(s, d, "events")
        .groupBy(expr(s"ts div $NS_HOUR").as("hour_b"), col("user_id"),
          col("event_type"))
        .agg(davg(col("value")).as("avg_v"))
        .orderBy(col("hour_b"), col("user_id"), col("event_type"))
    }),

    // high-cpu-all: full scan, threshold filter, raw rows back
    "tsbs_high_cpu_all" -> ((s, d) => {
      T(s, d, "events").filter(col("value") > 148.0)
        .select(col("event_id"), expr("ts div 1000000").as("ts_ms"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "tsbs_single_groupby_1_1_12" ->
      s"""SELECT epoch_ns(ts) // $NS_MIN AS min_b, MAX(value) AS max_v
          FROM events WHERE user_id = 1 AND epoch_ns(ts) >= $D2 AND epoch_ns(ts) < $D2H
          GROUP BY 1 ORDER BY 1""",
    "tsbs_cpu_max_all_8" ->
      s"""SELECT epoch_ns(ts) // $NS_HOUR AS hour_b, event_type, MAX(value) AS max_v
          FROM events WHERE user_id < 8 AND epoch_ns(ts) >= $D5 AND epoch_ns(ts) < $D6
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "tsbs_double_groupby_1" ->
      s"""SELECT epoch_ns(ts) // $NS_HOUR AS hour_b, user_id,
            CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) AS avg_v
          FROM events WHERE event_type = 'click' GROUP BY 1, 2 ORDER BY 1, 2""",
    "tsbs_double_groupby_all" ->
      s"""SELECT epoch_ns(ts) // $NS_HOUR AS hour_b, user_id, event_type,
            CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) AS avg_v
          FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "tsbs_high_cpu_all" ->
      """SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, user_id, event_type, value
         FROM events WHERE value > 148.0 ORDER BY event_id"""
  )
}
