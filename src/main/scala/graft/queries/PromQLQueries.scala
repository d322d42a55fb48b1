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
    // Native-histogram family (reference promql/src/functions/
    // native_histogram.rs): per-row construction, distributed agg_sum via a
    // typed Aggregator (real partial/final merge), then count/sum/avg/
    // quantile/fraction extraction. Synthetic layout: schema 0, buckets at
    // indices 0..3 (bounds 2^-1..2^3), counts derived from event_id so the
    // DuckDB oracle can replicate the estimator arithmetic exactly.
    "promql_native_histogram" -> ((s, d) => {
      import org.apache.spark.sql.{Encoder, Encoders}
      import org.apache.spark.sql.expressions.Aggregator
      implicit val histEnc: Encoder[NativeHistogram] = Encoders.product[NativeHistogram]
      implicit val pairEnc: Encoder[(String, NativeHistogram)] =
        Encoders.product[(String, NativeHistogram)]
      implicit val outEnc: Encoder[(String, Double, Double, Double, Double,
        Double, Double, Double, Double, Double, Double)] =
        Encoders.product[(String, Double, Double, Double, Double, Double,
          Double, Double, Double, Double, Double)]
      def mkHist(id: Long, value: Double): NativeHistogram = {
        val buckets = Array.tabulate(4)(i => ((id + i) % 7 + 1).toDouble)
        val zero = (id % 3).toDouble
        NativeHistogram(schema = 0, zeroThreshold = 0.001, zeroCount = zero,
          count = zero + buckets.sum, sum = value,
          posIndex = Array(0, 1, 2, 3), posBuckets = buckets,
          negIndex = Array.empty, negBuckets = Array.empty,
          customValues = Array.empty)
      }
      val histAgg = new Aggregator[(String, NativeHistogram), NativeHistogram, NativeHistogram] {
        def zero: NativeHistogram = NativeHistogram.empty(0, 0.001)
        def reduce(b: NativeHistogram, a: (String, NativeHistogram)): NativeHistogram = b.add(a._2)
        def merge(a: NativeHistogram, b: NativeHistogram): NativeHistogram = a.add(b)
        def finish(r: NativeHistogram): NativeHistogram = r
        def bufferEncoder: Encoder[NativeHistogram] = histEnc
        def outputEncoder: Encoder[NativeHistogram] = histEnc
      }
      val ds = T(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .as[(Long, String, Double)](Encoders.product[(Long, String, Double)])
        .map(r => (r._2, mkHist(r._1, r._3)))(pairEnc)
      ds.groupByKey(_._1)(Encoders.STRING)
        .agg(histAgg.toColumn.name("h"))
        .map { case (typ, h) =>
          val b = h.posIndex.zip(h.posBuckets).toMap
          (typ, h.count, h.sum, h.avg, h.zeroCount, b(0), b(1), b(2), b(3),
            h.quantile(0.5), h.fraction(2.0, 8.0))
        }(outEnc)
        .toDF("event_type", "h_count", "h_sum", "h_avg", "h_zero",
          "b0", "b1", "b2", "b3", "h_q50", "h_frac")
        .select(col("event_type"), col("h_count"),
          round(col("h_sum"), 4).as("h_sum"), round(col("h_avg"), 6).as("h_avg"),
          col("h_zero"), col("b0"), col("b1"), col("b2"), col("b3"),
          round(col("h_q50"), 9).as("h_q50"), round(col("h_frac"), 9).as("h_frac"))
        .orderBy(col("event_type"))
    }),

    // classic le-bucket histogram_quantile (HistogramFold): cumulative
    // buckets 10/100/1000/+Inf built per event_type at one instant, then
    // the real PromQL.histogramQuantile path; DuckDB replays the
    // Prometheus interpolation arithmetic in the same operation order.
    "promql_histogram_quantile" -> ((s, d) => {
      val b = T(s, d, "events").groupBy(col("event_type")).agg(
        sum(when(col("value") <= 10, 1L).otherwise(0L)).cast("double").as("b1"),
        sum(when(col("value") <= 100, 1L).otherwise(0L)).cast("double").as("b2"),
        sum(when(col("value") <= 1000, 1L).otherwise(0L)).cast("double").as("b3"),
        count(lit(1)).cast("double").as("bi"))
      val iv = PromQL.InstantVector(
        b.select(col("event_type"), lit(Start).as("__ts"), explode(array(
          struct(lit("10").as("le"), col("b1").as("__val")),
          struct(lit("100").as("le"), col("b2").as("__val")),
          struct(lit("1000").as("le"), col("b3").as("__val")),
          struct(lit("+Inf").as("le"), col("bi").as("__val")))).as("x"))
          .select(col("event_type"), col("__ts"), col("x.le"), col("x.__val")),
        Seq("event_type", "le"))
      PromQL.histogramQuantile(iv, 0.9).df
        .select(col("event_type"), col("__val").as("phi90"))
        .orderBy(col("event_type"))
    }),

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

    // The oracle replays the reset accumulation in the engine's exact
    // association order (ordered list_reduce seeded with last-first) —
    // pre-summing resets separately left a 1-ulp gap that straddled
    // rounding-grid lines at sf0.1 (many true rates are exact decimals
    // on this synthetic data). A sub-ulp residue remains somewhere in
    // the extrapolation chain, so the pin rounds at 5dp, which is
    // straddle-free at both sf0.01 and sf0.1 on the ordered oracle.
    "promql_sum_rate" -> ((s, d) => {
      ev(s, d, "sum by (event_type) (rate(events_value[15m]))")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 5).as("val"))
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
    }),

    "promql_changes_resets" -> ((s, d) => {
      val ch = ev(s, d, "changes(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("changes"))
      val rs = ev(s, d, "resets(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("resets"))
      ch.join(rs, Seq("ts_g", "event_type"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_idelta_irate" -> ((s, d) => {
      val ir = ev(s, d, "irate(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("irate"))
      val id = ev(s, d, "idelta(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("idelta"))
      ir.join(id, Seq("ts_g", "event_type"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_deriv_predict" -> ((s, d) => {
      val de = ev(s, d, "deriv(events_value[30m])")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("deriv"))
      val pl = ev(s, d, "predict_linear(events_value[30m], 600)")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 4).as("predict"))
      de.join(pl, Seq("ts_g", "event_type"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_quantile_over_time" -> ((s, d) => {
      ev(s, d, "quantile_over_time(0.9, events_value[30m])")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("val"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_over_time" -> ((s, d) => {
      val av = ev(s, d, "avg_over_time(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 6).as("avg_v"))
      val su = ev(s, d, "sum_over_time(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"),
          round(col("__val"), 4).as("sum_v"))
      val cn = ev(s, d, "count_over_time(events_value[15m])")
        .select(col("__ts").as("ts_g"), col("event_type"), col("__val").as("cnt"))
      av.join(su, Seq("ts_g", "event_type")).join(cn, Seq("ts_g", "event_type"))
        .orderBy(col("ts_g"), col("event_type"))
    }),

    "promql_absent" -> ((s, d) => {
      ev(s, d, """absent(events_value{event_type="nosuch"})""")
        .select(col("__ts").as("ts_g"), col("__val").as("val"))
        .orderBy(col("ts_g"))
    })
  )

  /** Range-vector CTE: left-open window (ts_g - range, ts_g], samples
    * ordered (ts_ms, value) — the engine's sort_array(struct(ts, v)). */
  private def rangeCte(rangeMs: Long) =
    s"""WITH grid AS (SELECT unnest(generate_series($Start, $End, $Step)) AS ts_g),
        rv AS (
          SELECT g.ts_g, e.event_type,
                 epoch_ns(e.ts) // 1000000 AS ts_ms, e.value
          FROM grid g JOIN events e
            ON (epoch_ns(e.ts) // 1000000) <= g.ts_g
           AND (epoch_ns(e.ts) // 1000000) > g.ts_g - $rangeMs)"""

  private val instantCte =
    s"""WITH grid AS (SELECT unnest(generate_series($Start, $End, $Step)) AS ts_g),
        iv AS (
          SELECT g.ts_g, e.event_type,
                 arg_max(e.value, epoch_ns(e.ts) // 1000000) AS val
          FROM grid g JOIN events e
            ON (epoch_ns(e.ts) // 1000000) <= g.ts_g
           AND (epoch_ns(e.ts) // 1000000) > g.ts_g - 300000
          GROUP BY g.ts_g, e.event_type)"""

  val oracles: Map[String, String] = Map(
    // replicates the native-histogram estimator arithmetic: schema-0 bounds
    // 2^(i-1)..2^i, exponential interpolation for the quantile, boundary-
    // exact fraction ranks (2 and 8 are bucket bounds)
    "promql_native_histogram" ->
      """WITH h AS (
           SELECT event_type,
             CAST(event_id % 3 AS DOUBLE) AS zero,
             CAST((event_id + 0) % 7 + 1 AS DOUBLE) AS c0,
             CAST((event_id + 1) % 7 + 1 AS DOUBLE) AS c1,
             CAST((event_id + 2) % 7 + 1 AS DOUBLE) AS c2,
             CAST((event_id + 3) % 7 + 1 AS DOUBLE) AS c3,
             value AS s
           FROM events),
         g AS (
           SELECT event_type, sum(zero) AS zero,
             sum(c0) AS c0, sum(c1) AS c1, sum(c2) AS c2, sum(c3) AS c3,
             sum(s) AS s, sum(zero + c0 + c1 + c2 + c3) AS cnt
           FROM h GROUP BY event_type)
         SELECT event_type,
           cnt AS h_count,
           round(s, 4) AS h_sum,
           round(s / cnt, 6) AS h_avg,
           zero AS h_zero, c0 AS b0, c1 AS b1, c2 AS b2, c3 AS b3,
           round(CASE
             WHEN zero >= 0.5 * cnt THEN 0.001 * (0.5 * cnt / zero)
             WHEN zero + c0 >= 0.5 * cnt THEN power(2.0, -1 + (0.5 * cnt - zero) / c0)
             WHEN zero + c0 + c1 >= 0.5 * cnt THEN power(2.0, 0 + (0.5 * cnt - zero - c0) / c1)
             WHEN zero + c0 + c1 + c2 >= 0.5 * cnt THEN power(2.0, 1 + (0.5 * cnt - zero - c0 - c1) / c2)
             ELSE power(2.0, 2 + (0.5 * cnt - zero - c0 - c1 - c2) / c3) END, 9) AS h_q50,
           round((c2 + c3) / cnt, 9) AS h_frac
         FROM g ORDER BY event_type""",

    // same op order as PromFunctions.histogramQuantile: target = q*total,
    // first bucket with cum >= target, then le*target/c (first bucket,
    // le > 0) or prevLe + (le-prevLe)*(target-prevC)/(c-prevC); target
    // beyond the last finite bucket returns the second-last le.
    "promql_histogram_quantile" ->
      """WITH b AS (SELECT event_type,
             CAST(SUM(CASE WHEN value <= 10 THEN 1 ELSE 0 END) AS DOUBLE) AS b1,
             CAST(SUM(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS DOUBLE) AS b2,
             CAST(SUM(CASE WHEN value <= 1000 THEN 1 ELSE 0 END) AS DOUBLE) AS b3,
             CAST(COUNT(*) AS DOUBLE) AS bi
           FROM events GROUP BY 1)
         SELECT event_type, CASE
             WHEN bi = 0 THEN NULL
             WHEN 0.9 * bi <= b1 THEN 10 * (0.9 * bi) / b1
             WHEN 0.9 * bi <= b2 THEN 10 + (100 - 10) * ((0.9 * bi) - b1) / (b2 - b1)
             WHEN 0.9 * bi <= b3 THEN 100 + (1000 - 100) * ((0.9 * bi) - b2) / (b3 - b2)
             ELSE 1000 END AS phi90
         FROM b ORDER BY event_type""",
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
              ORDER BY val DESC, event_type DESC) AS rn FROM iv) t
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
              list(CAST(CASE WHEN pv IS NOT NULL AND value < pv THEN pv ELSE 0.0 END AS DOUBLE)
                   ORDER BY ts_ms, value) AS reset_terms
            FROM ordd GROUP BY 1, 2),
          c1 AS (
            SELECT ts_g, event_type, n,
              -- bit-identical to the engine's fold: start from
              -- (last - first), then add reset terms IN TIME ORDER
              -- (the 0.0 non-reset terms are exact no-ops), instead of
              -- pre-summing resets in arbitrary order — association
              -- order was the 1-ulp source behind rounding-grid
              -- straddles at sf0.1
              list_reduce(list_prepend(CAST(v_last - v_first AS DOUBLE), reset_terms),
                          (a, b) -> a + b) AS rv0, v_first,
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
              5) AS val
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
          FROM rec WHERE j = n ORDER BY ts_g, event_type""",

    "promql_changes_resets" ->
      s"""${rangeCte(900000)},
          ordd AS (
            SELECT *, lag(value) OVER (PARTITION BY ts_g, event_type
              ORDER BY ts_ms, value) AS pv
            FROM rv)
          SELECT ts_g, event_type,
            CAST(COUNT(CASE WHEN pv IS NOT NULL AND value <> pv THEN 1 END) AS DOUBLE) AS changes,
            CAST(COUNT(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 END) AS DOUBLE) AS resets
          FROM ordd GROUP BY 1, 2 ORDER BY 1, 2""",

    "promql_idelta_irate" ->
      s"""${rangeCte(900000)},
          ordd AS (
            SELECT *, row_number() OVER (PARTITION BY ts_g, event_type
              ORDER BY ts_ms DESC, value DESC) AS rn
            FROM rv),
          t2 AS (
            SELECT ts_g, event_type, COUNT(*) AS n,
              MAX(CASE WHEN rn = 1 THEN value END) AS vb,
              MAX(CASE WHEN rn = 2 THEN value END) AS va,
              MAX(CASE WHEN rn = 1 THEN ts_ms END) AS tb,
              MAX(CASE WHEN rn = 2 THEN ts_ms END) AS ta
            FROM ordd WHERE rn <= 2 GROUP BY 1, 2)
          SELECT ts_g, event_type,
            round((CASE WHEN vb < va THEN vb ELSE vb - va END)
              / ((tb - ta) / 1000.0), 6) AS irate,
            round(vb - va, 6) AS idelta
          FROM t2 WHERE n = 2 AND tb > ta ORDER BY 1, 2""",

    // PromFunctions.linearRegression algebra verbatim: x is seconds
    // relative to the evaluation timestamp (= window end = ts_g)
    "promql_deriv_predict" ->
      s"""${rangeCte(1800000)},
          st AS (
            SELECT ts_g, event_type, COUNT(*) AS n,
              SUM((ts_ms - ts_g) / 1000.0) AS sx, SUM(value) AS sy,
              SUM(((ts_ms - ts_g) / 1000.0) * value) AS sxy,
              SUM(((ts_ms - ts_g) / 1000.0) * ((ts_ms - ts_g) / 1000.0)) AS sxx
            FROM rv GROUP BY 1, 2),
          c AS (
            SELECT *, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope
            FROM st WHERE n >= 2 AND sxx - sx * sx / n <> 0)
          SELECT ts_g, event_type, round(slope, 6) AS deriv,
            round((sy / n - slope * sx / n) + slope * 600, 4) AS predict
          FROM c ORDER BY 1, 2""",

    // PromFunctions.promQuantile: rank = q*(n-1) over values sorted asc,
    // linear interpolation between floor/ceil ranks
    "promql_quantile_over_time" ->
      s"""${rangeCte(1800000)},
          smp AS (
            SELECT ts_g, event_type, value,
              row_number() OVER (PARTITION BY ts_g, event_type ORDER BY value) AS r,
              COUNT(*) OVER (PARTITION BY ts_g, event_type) AS n
            FROM rv),
          pq AS (
            SELECT ts_g, event_type, n,
              MAX(CASE WHEN r = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 THEN value END) AS vlo,
              MAX(CASE WHEN r = CAST(ceil(0.9 * (n - 1)) AS BIGINT) + 1 THEN value END) AS vhi
            FROM smp GROUP BY 1, 2, 3)
          SELECT ts_g, event_type,
            round(vlo + (vhi - vlo) * (0.9 * (n - 1) - floor(0.9 * (n - 1))), 6) AS val
          FROM pq ORDER BY 1, 2""",

    "promql_over_time" ->
      s"""${rangeCte(900000)}
          SELECT ts_g, event_type,
            round(SUM(value) / COUNT(*), 6) AS avg_v,
            round(SUM(value), 4) AS sum_v,
            CAST(COUNT(*) AS DOUBLE) AS cnt
          FROM rv GROUP BY 1, 2 ORDER BY 1, 2""",

    "promql_absent" ->
      s"""SELECT ts_g, 1.0 AS val
          FROM (SELECT unnest(generate_series($Start, $End, $Step)) AS ts_g)
          ORDER BY ts_g"""
  )
}
