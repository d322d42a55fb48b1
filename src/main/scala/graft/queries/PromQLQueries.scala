package graft.queries

import org.apache.spark.sql.functions._
import graft.promql._
import graft.promql.PromQL.{EvalParams, Metric}
import QueryDsl._

/** TQL/PromQL surface (SURVEY.md §2.6) on the events table, treated as
  * a metric `events_value{event_type=...}`. The instant-vector and
  * aggregation paths have full DuckDB oracles (grid join + arg_max);
  * rate/extrapolation is pinned by PromQLSpec goldens instead (the
  * extrapolation algebra is not reasonably expressible in SQL).
  */
object PromQLQueries {

  // events start 2024-01-01T00:00:00Z; evaluate 6h at 5m steps
  private val Start = 1704067200000L
  private val End = Start + 6 * 3600000L
  private val Step = 300000L

  private def metric(s: org.apache.spark.sql.SparkSession, d: String): Metric = {
    val df = T(s, d, "events")
      .select(col("event_type"), expr("ts div 1000000").as("ts_ms"), col("value"))
    Metric(df, "ts_ms", "value", Seq("event_type"))
  }

  private def ev(s: org.apache.spark.sql.SparkSession, d: String, q: String) =
    new PromEval(s, Map("events_value" -> metric(s, d)), EvalParams(Start, End, Step))
      .evalQuery(q)

  val queries: Map[String, Q] = Map(
    "promql_instant" -> ((s, d) => {
      ev(s, d, "events_value")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("val"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_agg_sum" -> ((s, d) => {
      ev(s, d, "sum(events_value)")
        .select(col("__ts").as("ts_g"),
          round(col("__val"), 4).as("val"))
        .orderBy(col("ts_g"))
    }),

    "promql_topk" -> ((s, d) => {
      ev(s, d, "topk(2, events_value)")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("val"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_binary" -> ((s, d) => {
      ev(s, d, """events_value{event_type="error"} > 100""")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("val"))
        .orderBy(col("ts_g"))
    }),

    "promql_sum_rate" -> ((s, d) => {
      ev(s, d, "sum by (event_type) (rate(events_value[15m]))")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("val"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_count_values" -> ((s, d) => {
      // bucket values to 100s so identical-sample groups actually occur
      ev(s, d, """count_values("bucket", floor(events_value / 100))""")
        .select(col("__ts").as("ts_g"), col("bucket"), col("__val").as("n"))
        .orderBy(col("ts_g"), col("bucket"))
    }),

    "promql_holt_winters" -> ((s, d) => {
      ev(s, d, "holt_winters(events_value[30m], 0.5, 0.3)")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("val"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_or_unless" -> ((s, d) => {
      ev(s, d, """events_value{event_type="error"} or events_value{event_type="click"}""")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("val"))
        .orderBy(col("ts_g"), col("event_type"))
    })
  )

  private val instantCte =
    s"""WITH grid AS (SELECT unnest(generate_series($Start, $End, $Step)) AS ts_g),
        iv AS (
          SELECT g.ts_g, e.event_type,
                 arg_max(e.value, epoch_ns(e.ts) // 1000000) AS val
          FROM grid g JOIN events e
            ON (epoch_ns(e.ts) // 1000000) <= g.ts_g
           AND (epoch_ns(e.ts) // 1000000) >= g.ts_g - 300000
          GROUP BY g.ts_g, e.event_type)"""

  val oracles: Map[String, String] = Map(
    "promql_instant" ->
      s"""$instantCte SELECT ts_g, event_type, val FROM iv
          ORDER BY ts_g, event_type""",

    "promql_agg_sum" ->
      s"""$instantCte SELECT ts_g, round(SUM(val), 4) AS val FROM iv
          GROUP BY ts_g ORDER BY ts_g""",

    "promql_topk" ->
      s"""$instantCte
          SELECT ts_g, event_type, val FROM (
            SELECT *, row_number() OVER (PARTITION BY ts_g
              ORDER BY val DESC, event_type) AS rn FROM iv) t
          WHERE rn <= 2 ORDER BY ts_g, event_type""",

    "promql_binary" ->
      s"""$instantCte SELECT ts_g, event_type, val FROM iv
          WHERE event_type = 'error' AND val > 100 ORDER BY ts_g""",

    "promql_count_values" ->
      s"""$instantCte
          SELECT ts_g, CAST(CAST(floor(val / 100) AS BIGINT) AS VARCHAR) AS bucket,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM iv GROUP BY 1, 2 ORDER BY 1, 2""",

    "promql_or_unless" ->
      s"""$instantCte SELECT ts_g, event_type, val FROM iv
          WHERE event_type IN ('error', 'click') ORDER BY ts_g, event_type""",

    // Prometheus extrapolatedRate (PromFunctions.extrapolatedRate) spelled
    // out in SQL: window (t-15m, t], samples ordered (ts, value), counter
    // resets add the pre-reset value, extrapolation clamped at the
    // average sample gap and at the zero crossing
    "promql_sum_rate" ->
      s"""WITH grid AS (SELECT unnest(generate_series($Start, $End, $Step)) AS ts_g),
          rv AS (
            SELECT g.ts_g, e.event_type,
                   epoch_ns(e.ts) // 1000000 AS ts_ms, e.value
            FROM grid g JOIN events e
              ON (epoch_ns(e.ts) // 1000000) <= g.ts_g
             AND (epoch_ns(e.ts) // 1000000) > g.ts_g - 900000),
          ordd AS (
            SELECT *,
              first_value(value) OVER w AS v_first,
              last_value(value) OVER (PARTITION BY ts_g, event_type
                ORDER BY ts_ms, value
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v_last,
              lag(value) OVER w AS pv
            FROM rv
            WINDOW w AS (PARTITION BY ts_g, event_type ORDER BY ts_ms, value)),
          st AS (
            SELECT ts_g, event_type, COUNT(*) AS n,
              MIN(v_first) AS v_first, MIN(v_last) AS v_last,
              MIN(ts_ms) AS t_first, MAX(ts_ms) AS t_last,
              SUM(CASE WHEN pv IS NOT NULL AND value < pv THEN pv ELSE 0 END) AS resets
            FROM ordd GROUP BY 1, 2),
          c1 AS (
            SELECT ts_g, event_type, n,
              v_last - v_first + resets AS rv0, v_first,
              (t_first - (ts_g - 900000)) / 1000.0 AS d_start0,
              (ts_g - t_last) / 1000.0 AS d_end,
              (t_last - t_first) / 1000.0 AS si,
              (t_last - t_first) / 1000.0 / (n - 1) AS adbs
            FROM st WHERE n >= 2),
          c2 AS (
            SELECT *,
              CASE WHEN rv0 > 0 AND v_first >= 0
                        AND si * (v_first / rv0) < d_start0
                   THEN si * (v_first / rv0) ELSE d_start0 END AS d_start,
              adbs * 1.1 AS thr
            FROM c1)
          SELECT ts_g, event_type,
            round(rv0 * (((si
              + CASE WHEN d_start < thr THEN d_start ELSE adbs / 2 END
              + CASE WHEN d_end  < thr THEN d_end  ELSE adbs / 2 END) / si) / 900.0),
              6) AS val
          FROM c2 ORDER BY ts_g, event_type""",

    // double_exponential_smoothing (PromFunctions.doubleExponentialSmoothing)
    // as a recursive CTE over the per-window sample index. (1 - 0.3) is
    // spelled as arithmetic, not 0.7: the engine computes 1-tf at runtime
    // and 1-0.3 != 0.7 in binary doubles.
    "promql_holt_winters" ->
      s"""WITH RECURSIVE grid AS (
            SELECT unnest(generate_series($Start, $End, $Step)) AS ts_g),
          rv AS (
            SELECT g.ts_g, e.event_type,
                   epoch_ns(e.ts) // 1000000 AS ts_ms, e.value
            FROM grid g JOIN events e
              ON (epoch_ns(e.ts) // 1000000) <= g.ts_g
             AND (epoch_ns(e.ts) // 1000000) > g.ts_g - 1800000),
          smp AS (
            SELECT ts_g, event_type, value,
              row_number() OVER (PARTITION BY ts_g, event_type
                ORDER BY ts_ms, value) AS i,
              COUNT(*) OVER (PARTITION BY ts_g, event_type) AS n
            FROM rv),
          base AS (
            SELECT ts_g, event_type, n,
              MAX(CASE WHEN i = 1 THEN value END) AS x1,
              MAX(CASE WHEN i = 2 THEN value END) AS x2
            FROM smp WHERE n >= 2 GROUP BY 1, 2, 3),
          rec AS (
            SELECT ts_g, event_type, n, 2 AS j,
              0.5 * x2 + (1 - 0.5) * (x1 + (x2 - x1)) AS s,
              0.3 * ((0.5 * x2 + (1 - 0.5) * (x1 + (x2 - x1))) - x1)
                + (1 - 0.3) * (x2 - x1) AS b
            FROM base
            UNION ALL
            SELECT r.ts_g, r.event_type, r.n, r.j + 1,
              0.5 * p.value + (1 - 0.5) * (r.s + r.b),
              0.3 * ((0.5 * p.value + (1 - 0.5) * (r.s + r.b)) - r.s)
                + (1 - 0.3) * r.b
            FROM rec r JOIN smp p ON p.ts_g = r.ts_g
              AND p.event_type = r.event_type AND p.i = r.j + 1
            WHERE r.j < r.n)
          SELECT ts_g, event_type, round(s, 6) AS val
          FROM rec WHERE j = n ORDER BY ts_g, event_type"""
  )
}
