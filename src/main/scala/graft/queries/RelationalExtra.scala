package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.StringFunctions
import QueryDsl._

/** Second relational coverage wave — the SURVEY §2.4/§2.8 rows the
  * reference corpus leaves "supported-but-unpinned": GROUPING SETS /
  * CUBE / ROLLUP, correlation/covariance, bool/bit aggregates,
  * arg_min/arg_max, MySQL-compat string functions, date arithmetic.
  * Group-subtotal nulls are coalesced to a sentinel on BOTH sides so
  * the row-sorted hash compare is stable. */
object RelationalExtra {

  private val All = "(all)"

  val queries: Map[String, Q] = Map(
    // array_agg (DataFusion built-in, SURVEY §2.4): order-insensitive
    // via distinct + sort, string-joined so the hash compare is exact
    "agg_array" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(array_join(sort_array(collect_set(col("l_linenumber"))), ",").as("line_nos"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // approx_distinct / approx_median (SURVEY §2.4): sketches differ
    // across engines, so the pinned contract is "within tolerance of the
    // exact answer" — the exact values hash-compare, the approximations
    // are checked as booleans both engines must agree on (oracle: TRUE).
    "agg_approx" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("appx_nd"),
          countDistinct(col("l_partkey")).as("exact_nd"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("appx_med"),
          expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("appx_nd") - col("exact_nd")).cast("double") / col("exact_nd") <= 0.05)
            .as("nd_ok"),
          (abs(col("appx_med") - col("exact_med")) / col("exact_med") <= 0.02).as("med_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // exact multi-quantile with linear interpolation (rank = q*(n-1))
    "agg_percentile_exact" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.25D)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5D)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9D)"), 6).as("p90"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_rollup" -> ((s, d) => {
      T(s, d, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderpriority"), lit(All)).as("pri"),
          coalesce(col("o_orderstatus"), lit(All)).as("status"),
          col("n"), col("sum_price"))
        .orderBy(col("pri"), col("status"))
    }),

    "agg_cube" -> ((s, d) => {
      T(s, d, "customer")
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
        .select(coalesce(col("c_mktsegment"), lit(All)).as("seg"),
          coalesce(col("c_nationkey").cast("long"), lit(-1L)).as("nation"),
          col("n"), col("sum_bal"))
        .orderBy(col("seg"), col("nation"))
    }),

    "agg_grouping_sets" -> ((s, d) => {
      T(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderpriority, '(all)') AS pri,
               coalesce(o_orderstatus, '(all)') AS status,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY pri, status""")
    }),

    "agg_corr_covar" -> ((s, d) => {
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covs_qd"),
          round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("covp_qd"))
        .orderBy(col("l_returnflag"))
    }),

    // UInt64 fidelity, pinned as behavior (SURVEY §7.3(e); the engine's
    // decision is Decimal(20,0) — GraftDdl.scala maps UINT64 there):
    // values straddling the 2^63 boundary roundtrip, ORDER unsigned
    // (a signed-long misreading would invert min/max across the
    // boundary), and SUM exactly with no wrap, matching DuckDB's
    // native HUGEINT arithmetic digit for digit. u64-typed outputs are
    // emitted as decimal-digit strings so the cross-engine compare is
    // representation-free.
    "agg_uint64_boundary" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      // u = 2^63 - 500 + (event_id % 1000): half the values below the
      // signed-long boundary, half above it
      val u = (lit(new java.math.BigDecimal("9223372036854775308"))
        .cast(DecimalType(20, 0)) +
        (col("event_id") % 1000).cast(DecimalType(20, 0)))
        .cast(DecimalType(20, 0))
      T(s, d, "events")
        .select((col("event_id") % 4).as("grp"), u.as("u"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"),
          min(col("u")).cast("string").as("min_u64"),
          max(col("u")).cast("string").as("max_u64"),
          sum(col("u")).cast(DecimalType(38, 0)).cast("string").as("sum_u64"))
        .orderBy(col("grp"))
    }),

    "agg_bool_bit" -> ((s, d) => {
      T(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(bool_and(col("o_totalprice") > 1000).as("all_big"),
          bool_or(col("o_orderstatus") === "F").as("any_ship"),
          bit_and(col("o_custkey")).as("band"),
          bit_or(col("o_custkey")).as("bor"),
          bit_xor(col("o_custkey")).as("bxor"))
        .orderBy(col("o_orderpriority"))
    }),

    "agg_arg_minmax" -> ((s, d) => {
      T(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(min_by(col("o_orderkey"),
            format_string("%020.4f|%020d", col("o_totalprice"), col("o_orderkey")))
            .as("cheapest_key"),
          max_by(col("o_orderkey"),
            format_string("%020.4f|%020d", col("o_totalprice"), col("o_orderkey")))
            .as("dearest_key"))
        .orderBy(col("o_orderpriority"))
    }),

    "fn_string_mysql" -> ((s, d) => {
      T(s, d, "nation").select(col("n_nationkey").cast("long").as("k"),
        StringFunctions.elt((col("n_nationkey") % 3) + 1,
          lit("alpha"), lit("beta"), lit("gamma")).as("elt_v"),
        StringFunctions.insert(col("n_name"), lit(2), lit(3), lit("XY")).as("ins_v"),
        StringFunctions.locateF(lit("A"), col("n_name")).cast("long").as("loc_a"),
        concat(StringFunctions.space(col("n_nationkey") % 3), col("n_name")).as("padded"))
        .orderBy(col("k"))
    }),

    "fn_vector_full" -> ((s, d) => {
      import graft.functions.VectorFunctions._
      // double-cast before elementwise math so both engines do the same
      // IEEE754 arithmetic (float ops would diverge past round(5))
      val e1 = T(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
      val e2 = T(s, d, "embeddings")
        .select((col("vec_id") - 1).as("vec_id"),
          col("embedding").cast("array<double>").as("b"))
      e1.join(e2, "vec_id")
        .select(col("vec_id"),
          round(vecElemSum(vecAdd(col("a"), col("b"))), 5).as("add_sum"),
          round(vecElemSum(vecSub(col("a"), col("b"))), 5).as("sub_sum"),
          round(vecElemSum(vecMul(col("a"), col("b"))), 5).as("mul_sum"),
          round(vecElemSum(vecScalarAdd(lit(2.0f), col("a"))), 5).as("sadd_sum"),
          round(vecElemSum(vecScalarMul(lit(3.0f), col("a"))), 5).as("smul_sum"),
          round(vecKthElem(col("a"), 5), 5).as("kth5"),
          round(vecElemSum(vecSubvector(col("a"), lit(8), lit(16))), 5).as("subv_sum"),
          round(vecElemAvg(col("a")), 5).as("elem_avg"),
          size(parseVec(vecToString(col("a")))).cast("long").as("roundtrip_dim"))
        .orderBy(col("vec_id"))
    }),

    "fn_json_extra" -> ((s, d) => {
      import graft.functions.JsonFunctions._
      T(s, d, "events").select(col("event_id"),
        concat_ws(",", jsonObjectKeys(col("props"))).as("keys"),
        jsonToString(col("props")).as("round"),
        jsonGetFloat(col("props"), "$.k").as("k_float"),
        jsonIsObject(col("props")).as("is_obj"),
        jsonIsArray(col("props")).as("is_arr"))
        .orderBy(col("event_id"))
    }),

    "cte_recursive" -> ((s, d) => {
      T(s, d, "nation").createOrReplaceTempView("nation_rec")
      s.sql("""
        WITH RECURSIVE r(n) AS (
          SELECT 0
          UNION ALL
          SELECT n + 1 FROM r WHERE n < 10
        )
        SELECT r.n, count(nt.n_nationkey) AS n_nations
        FROM r LEFT JOIN nation_rec nt ON nt.n_regionkey = r.n % 5
        GROUP BY r.n ORDER BY r.n""")
    }),

    "window_range_frame" -> ((s, d) => {
      // RANGE frame over a value column: peers within ±100.0 of each
      // order's total price count toward the frame
      T(s, d, "orders").createOrReplaceTempView("orders_rf")
      s.sql("""
        SELECT o_orderkey,
               count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS peers
        FROM orders_rf ORDER BY o_orderkey""")
    }),

    "fn_date_arith" -> ((s, d) => {
      T(s, d, "orders").select(col("o_orderkey"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(date_sub(col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").as("minus7"),
        (unix_millis(col("o_orderdate").cast("timestamp")) / 1000).cast("long").as("unixtime"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_end"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "agg_array" ->
      """SELECT l_returnflag, l_linestatus,
           array_to_string(list_sort(list_distinct(array_agg(l_linenumber))), ',') AS line_nos,
           COUNT(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "agg_approx" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_nd,
           TRUE AS nd_ok, TRUE AS med_ok
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "agg_percentile_exact" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.5), 6) AS p50,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "agg_rollup" ->
      """SELECT coalesce(o_orderpriority, '(all)') AS pri,
           coalesce(o_orderstatus, '(all)') AS status, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         ORDER BY pri, status""",

    "agg_cube" ->
      """SELECT coalesce(c_mktsegment, '(all)') AS seg,
           coalesce(CAST(c_nationkey AS BIGINT), -1) AS nation, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
         ORDER BY seg, nation""",

    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderpriority, '(all)') AS pri,
           coalesce(o_orderstatus, '(all)') AS status, COUNT(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
         ORDER BY pri, status""",

    "agg_corr_covar" ->
      """SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_discount), 6) AS covs_qd,
           round(covar_pop(l_quantity, l_discount), 6) AS covp_qd
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // DuckDB computes the same u64 values in native HUGEINT — exact
    // unsigned ordering + sums; both engines emit decimal-digit strings
    "agg_uint64_boundary" ->
      """WITH v AS (SELECT event_id % 4 AS grp,
             9223372036854775308::HUGEINT + (event_id % 1000) AS u
           FROM events)
         SELECT grp, COUNT(*) AS n,
           CAST(MIN(u) AS VARCHAR) AS min_u64,
           CAST(MAX(u) AS VARCHAR) AS max_u64,
           CAST(SUM(u) AS VARCHAR) AS sum_u64
         FROM v GROUP BY grp ORDER BY grp""",

    "agg_bool_bit" ->
      """SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_big,
           bool_or(o_orderstatus = 'F') AS any_ship,
           bit_and(o_custkey) AS band, bit_or(o_custkey) AS bor,
           bit_xor(o_custkey) AS bxor
         FROM orders GROUP BY 1 ORDER BY 1""",

    "agg_arg_minmax" ->
      """SELECT o_orderpriority,
           arg_min(o_orderkey, printf('%020.4f|%020d', o_totalprice, o_orderkey)) AS cheapest_key,
           arg_max(o_orderkey, printf('%020.4f|%020d', o_totalprice, o_orderkey)) AS dearest_key
         FROM orders GROUP BY 1 ORDER BY 1""",

    "fn_string_mysql" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
           (['alpha', 'beta', 'gamma'])[CAST(n_nationkey % 3 + 1 AS INT)] AS elt_v,
           substr(n_name, 1, 1) || 'XY' || substr(n_name, 5) AS ins_v,
           CAST(strpos(n_name, 'A') AS BIGINT) AS loc_a,
           repeat(' ', CAST(n_nationkey % 3 AS INT)) || n_name AS padded
         FROM nation ORDER BY k""",

    "fn_vector_full" ->
      """WITH j AS (
           SELECT e1.vec_id, CAST(e1.embedding AS DOUBLE[]) AS a,
                  CAST(e2.embedding AS DOUBLE[]) AS b
           FROM embeddings e1
           JOIN (SELECT vec_id - 1 AS vec_id, embedding FROM embeddings) e2
             USING (vec_id))
         SELECT vec_id,
           round(list_sum(list_transform(list_zip(a, b), x -> x[1] + x[2])), 5) AS add_sum,
           round(list_sum(list_transform(list_zip(a, b), x -> x[1] - x[2])), 5) AS sub_sum,
           round(list_sum(list_transform(list_zip(a, b), x -> x[1] * x[2])), 5) AS mul_sum,
           round(list_sum(list_transform(a, x -> x + 2.0)), 5) AS sadd_sum,
           round(list_sum(list_transform(a, x -> x * 3.0)), 5) AS smul_sum,
           round(a[6], 5) AS kth5,
           round(list_sum(a[9:16]), 5) AS subv_sum,
           round(list_sum(a) / len(a), 5) AS elem_avg,
           CAST(len(a) AS BIGINT) AS roundtrip_dim
         FROM j ORDER BY vec_id""",

    "fn_json_extra" ->
      """SELECT event_id, array_to_string(json_keys(props), ',') AS keys,
           to_json(json(props))::VARCHAR AS round,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_float,
           json_type(json(props)) = 'OBJECT' AS is_obj,
           json_type(json(props)) = 'ARRAY' AS is_arr
         FROM events ORDER BY event_id""",

    "cte_recursive" ->
      """WITH RECURSIVE r(n) AS (
           SELECT 0 UNION ALL SELECT n + 1 FROM r WHERE n < 10
         )
         SELECT r.n, count(nt.n_nationkey) AS n_nations
         FROM r LEFT JOIN nation nt ON nt.n_regionkey = r.n % 5
         GROUP BY r.n ORDER BY r.n""",

    "window_range_frame" ->
      """SELECT o_orderkey,
           count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS peers
         FROM orders ORDER BY o_orderkey""",

    "fn_date_arith" ->
      """SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d') AS minus7,
           CAST(epoch(o_orderdate) AS BIGINT) AS unixtime,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT) AS days_to_end
         FROM orders ORDER BY o_orderkey"""
  )
}
