package graft.queries

import org.apache.spark.sql.functions._
import graft.aggregates._
import QueryDsl._

/** Sketch/custom aggregate surface (SURVEY.md §2.4). hll/uddsketch have
  * no DuckDB equivalent -> rows-only checks plus a sanity column the
  * spec suite pins; count_hash and geo_path proxies are oracle-checked.
  */
object SketchQueries {

  val queries: Map[String, Q] = Map(
    // hll build -> merge -> count roundtrip, checked against the exact
    // distinct count (metamorphic oracle: precision-14 HLL has 0.81%
    // standard error, so a 5% envelope is a real regression tripwire
    // while staying data-independent). The exact count is recomputed by
    // the DuckDB oracle; the envelope flag must come back TRUE.
    "sketch_hll" -> ((s, d) => {
      val ev = T(s, d, "events")
      val perType = ev.groupBy(col("event_type"), col("user_id") % 8)
        .agg(Hll.hllAgg(col("user_id")).as("state"))
      val est = perType.groupBy(col("event_type"))
        .agg(Hll.hllCount(Hll.hllMergeAgg(col("state"))).as("approx_users"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n_users"),
          (abs(col("approx_users") - col("n_users")) <=
            col("n_users") * 0.05).as("within_5pct"))
        .orderBy(col("event_type"))
    }),

    // uddsketch quantiles checked against exact rank-based quantiles
    // (percentile_disc — the sketch's own ceil(q*n) inverse-CDF
    // semantics, so the envelope measures only bucket error): α=0.01
    // with collapse headroom -> 10% relative-error envelope
    "sketch_uddsketch" -> ((s, d) => {
      val sk = T(s, d, "events").groupBy(col("event_type"))
        .agg(UddSketch.uddsketchState(128, 0.01, col("value")).as("state"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("e50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("e90"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("e99"))
      def ok(q: Double, exact: String) =
        (abs(UddSketch.uddsketchCalc(q, col("state")) - col(exact)) <=
          abs(col(exact)) * 0.1 + 1e-6)
      sk.select(col("event_type"),
          round(col("e50"), 4).as("p50_exact"),
          ok(0.5, "e50").as("p50_ok"),
          ok(0.9, "e90").as("p90_ok"),
          ok(0.99, "e99").as("p99_ok"))
        .orderBy(col("event_type"))
    }),

    "agg_count_hash" -> ((s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(VectorAggs.countHash(col("l_partkey"), col("l_suppkey")).as("n_hash"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_vec_sum" -> ((s, d) => {
      T(s, d, "embeddings").groupBy(col("label"))
        .agg(VectorAggs.vecSumAgg(col("embedding")).as("vsum"),
             VectorAggs.vecAvgAgg(col("embedding")).as("vavg"))
        .select(col("label").cast("long").as("label"),
          round(graft.functions.VectorFunctions.vecElemSum(col("vsum")), 4).as("sum_of_sums"),
          round(graft.functions.VectorFunctions.vecElemSum(col("vavg")), 4).as("sum_of_avgs"))
        .orderBy(col("label"))
    }),

    "agg_geo_path" -> ((s, d) => {
      // geo_path ordering proxy with hash-stable string output
      val ev = T(s, d, "events").filter(col("user_id") <= 30)
      ev.groupBy(col("user_id"))
        .agg(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id")))),
            p => p.getField("event_id"))).as("path"))
        .orderBy(col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // metamorphic oracles: the exact side is recomputed in DuckDB and
    // the sketch-error envelope flags are pinned TRUE — any estimate
    // drifting out of tolerance hash-mismatches
    "sketch_hll" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
                true AS within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",

    "sketch_uddsketch" ->
      """SELECT event_type,
                round(quantile_disc(value, 0.5), 4) AS p50_exact,
                true AS p50_ok, true AS p90_ok, true AS p99_ok
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_count_hash" ->
      """SELECT l_returnflag, COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_hash
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_geo_path" ->
      """SELECT user_id, string_agg(event_id, ',' ORDER BY ts, event_id) AS path
         FROM events WHERE user_id <= 30
         GROUP BY user_id ORDER BY user_id""",

    // vec_sum/vec_avg accumulate per-element in double and emit float32;
    // the oracle mirrors that exactly (double sum -> FLOAT cast -> double
    // elem-sum) so the hash compare is deterministic
    "agg_vec_sum" ->
      """WITH ex AS (
           SELECT label, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding) AS x
           FROM embeddings),
         el AS (
           SELECT label, i,
             CAST(SUM(CAST(x AS DOUBLE)) AS FLOAT) AS s_el,
             CAST(SUM(CAST(x AS DOUBLE)) / COUNT(*) AS FLOAT) AS a_el
           FROM ex GROUP BY 1, 2)
         SELECT CAST(label AS BIGINT) AS label,
           round(SUM(CAST(s_el AS DOUBLE)), 4) AS sum_of_sums,
           round(SUM(CAST(a_el AS DOUBLE)), 4) AS sum_of_avgs
         FROM el GROUP BY 1 ORDER BY 1"""
  )
}
