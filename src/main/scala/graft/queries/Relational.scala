package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDsl._

/** Core relational surface (SURVEY.md §2.2/§2.3/§2.4/§2.7): the
  * reference inherits these wholesale from DataFusion; we inherit them
  * from Catalyst. Each entry has a DuckDB oracle; outputs are limited
  * to BIGINT / DOUBLE / STRING for hash-stable comparison.
  *
  * Scale notes (100 TB): every groupBy here is a hash partial+final
  * aggregate (map-side combine); join build sides that are small
  * (region/nation/customer at any SF ratio) are broadcast explicitly.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // ---- scans / projection / filter (§2.2) -------------------------
    "scan_filter_project" -> ((s, d) => {
      T(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
                col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
                col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(500)
    }),

    // ---- aggregates (§2.4) ------------------------------------------
    "agg_groupby" -> ((s, d) => {
      // Money columns are 2-dp-grid doubles, so the three sums run as
      // exact LONG adds (see QueryDsl.cents) — the Decimal(28,4)/(38,8)
      // buffer-add path made this the slowest TSBS-family aggregate at
      // 5x its siblings on the same scan. price2*(100−disc2) is the
      // EXACT 4-dp product, which is also what the oracle's per-row
      // CAST(price*(1.0−disc) AS DECIMAL(38,8)) yields (double error
      // ~4e-11 « the 5e-9 rounding half-step, any rounding mode), so
      // the full 4-dp pin holds with no round() cap. The oracle rescales
      // its (38,8) sum to scale 4 before the double cast: at scale 4 the
      // unscaled sum stays < 2^53, making both engines' decimal→double
      // conversions single correct roundings of the same rational.
      val qty2   = cents(col("l_quantity"))
      val price2 = cents(col("l_extendedprice"))
      val disc2  = cents(col("l_discount"))
      T(s, d, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(qty2).as("__sq"),
        sum(price2).as("__sp"),
        sum(price2 * (lit(100L) - disc2)).as("__sd"),
        count(col("l_quantity")).as("__nq"),
        count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          fromScaled(col("__sq"), 2).as("sum_qty"),
          fromScaled(col("__sp"), 2).as("sum_base_price"),
          fromScaled(col("__sd"), 4).as("sum_disc_price"),
          (fromScaled(col("__sq"), 2) / col("__nq")).as("avg_qty"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "agg_distinct" -> ((s, d) => {
      T(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_sp"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_minmax" -> ((s, d) => {
      T(s, d, "orders").groupBy(col("o_orderpriority")).agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(ms(col("o_orderdate"))).as("min_date_ms"),
        max(ms(col("o_orderdate"))).as("max_date_ms"))
        .orderBy(col("o_orderpriority"))
    }),

    "agg_median" -> ((s, d) => {
      T(s, d, "events").groupBy(col("event_type")).agg(
        round(expr("percentile(value, 0.5)"), 3).as("median_value"),
        count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Exact variance via decimal moments: var_pop = (Σx² − (Σx)²/n)/n,
    // evaluated with identical double-op structure in both engines.
    "agg_var_exact" -> ((s, d) => {
      T(s, d, "events").groupBy(col("event_type")).agg(
        dsum8(col("value") * col("value")).as("sx2"),
        dsum(col("value")).as("sx"),
        count(lit(1)).as("n"))
        .select(col("event_type"),
          ((col("sx2") - col("sx") * col("sx") / col("n")) / col("n")).as("var_pop"),
          col("n"))
        .orderBy(col("event_type"))
    }),

    // ---- joins (§2.3) ------------------------------------------------
    "join_inner" -> ((s, d) => {
      val o = T(s, d, "orders"); val c = T(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    "join_left" -> ((s, d) => {
      val c = T(s, d, "customer"); val o = T(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    "join_right" -> ((s, d) => {
      val o = T(s, d, "orders"); val n = T(s, d, "nation"); val c = T(s, d, "customer")
      // right join exercised via orders ⟖ customer (every customer kept)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy(col("n_name"))
    }),

    "join_full" -> ((s, d) => {
      // full outer on a key split: orders with key%3=0 vs key%3<=1
      val l = T(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("lp"))
      val r = T(s, d, "orders").filter(col("o_orderkey") % 3 <= 1)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("rp"))
      l.join(r, l("k") === r("k"), "full")
        .select(
          coalesce(l("k"), r("k")).as("k2"),
          coalesce(col("lp"), lit(-1.0)).as("lp"),
          coalesce(col("rp"), lit(-1.0)).as("rp"))
        .orderBy(col("k2"))
    }),

    "join_semi" -> ((s, d) => {
      val c = T(s, d, "customer")
      val o = T(s, d, "orders").filter(col("o_totalprice") > 40000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    "join_anti" -> ((s, d) => {
      val c = T(s, d, "customer"); val o = T(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_cross" -> ((s, d) => {
      val r = T(s, d, "region"); val n = T(s, d, "nation")
      r.crossJoin(broadcast(n))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "join_inequality" -> ((s, d) => {
      // theta join: suppliers paired with customers of strictly higher balance
      val sup = T(s, d, "supplier").filter(col("s_acctbal") > 9000)
      val c = T(s, d, "customer").filter(col("c_acctbal") > 9900)
      sup.join(c, col("c_acctbal") > col("s_acctbal"))
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_richer"))
        .orderBy(col("s_suppkey"))
    }),

    "join_multiway" -> ((s, d) => {
      // TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue per order
      val c = T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = T(s, d, "orders")
      val l = T(s, d, "lineitem")
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(dsum8(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ---- window functions (§2.7) --------------------------------------
    "window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority"))))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"),
                col("rk").cast("long").as("rk"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "window_agg_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, d, "lineitem")
        .withColumn("running_qty",
          sum(col("l_quantity").cast("decimal(28,4)")).over(w).cast("double"))
        .filter(col("l_suppkey") <= 20)
        .select(col("l_suppkey"), col("l_orderkey"),
                col("l_linenumber").cast("long").as("l_linenumber"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    "window_leadlag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      // events.ts is read as BIGINT nanoseconds (nanosAsLong) — integer
      // division keeps the arithmetic exact at any epoch.
      val tsMs = expr("ts div 1000000")
      T(s, d, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("gap_ms", tsMs - lag(tsMs, 1).over(w))
        .filter(col("user_id") <= 50)
        .select(col("user_id"), col("event_id"),
                coalesce(col("prev_value"), lit(-1.0)).as("prev_value"),
                coalesce(col("gap_ms"), lit(-1L)).as("gap_ms"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "window_ntile" -> ((s, d) => {
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      T(s, d, "customer")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("quartile"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
        .select(col("quartile").cast("long").as("quartile"), col("n"), col("sum_bal"))
        .orderBy(col("quartile"))
    }),

    "window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T(s, d, "events")
        .withColumn("first_type", first(col("event_type")).over(w))
        .withColumn("last_value", last(col("value")).over(w))
        .groupBy(col("user_id"), col("first_type"), col("last_value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // ---- set operations (§2.7) ----------------------------------------
    "setop_union_all" -> ((s, d) => {
      val a = T(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"))
      val b = T(s, d, "orders").filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey").as("k"))
      a.union(b).groupBy(col("k")).agg(count(lit(1)).as("n")).orderBy(col("k"))
    }),

    "setop_intersect" -> ((s, d) => {
      val a = T(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k"))
      val b = T(s, d, "lineitem").filter(col("l_linestatus") === "F")
        .select(col("l_orderkey").as("k"))
      a.intersect(b).orderBy(col("k"))
    }),

    "setop_except" -> ((s, d) => {
      val a = T(s, d, "orders").select(col("o_custkey").as("k"))
      val b = T(s, d, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      a.except(b).orderBy(col("k"))
    }),

    // ---- sorts / limits (§2.7) -----------------------------------------
    "orderby_limit" -> ((s, d) => {
      T(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(20)
    }),

    "groupby_orderby_limit" -> ((s, d) => {
      // TSBS groupby-orderby-limit shape on events
      T(s, d, "events").groupBy(col("user_id"))
        .agg(max(col("value")).as("max_value"), count(lit(1)).as("n"))
        .orderBy(col("max_value").desc, col("user_id"))
        .limit(10)
    }),

    "lastpoint" -> ((s, d) => {
      // TSBS lastpoint: latest event per user (ts normalized to ms)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      T(s, d, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"),
                expr("ts div 1000000").as("ts_ms"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ---- subqueries / CTE (§2.7, corpus subquery/ cte/) -----------------
    "subquery_in" -> ((s, d) => {
      val rich = T(s, d, "customer").filter(col("c_acctbal") > 9500)
        .select(col("c_custkey"))
      T(s, d, "orders")
        .join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    "subquery_scalar" -> ((s, d) => {
      val o = T(s, d, "orders")
      val avgPrice = o.agg(davg(col("o_totalprice")).as("a"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("a") * 2)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "cte_basic" -> ((s, d) => {
      Tables.register(s, d, "orders", "customer")
      s.sql("""
        WITH big AS (SELECT o_custkey, count(*) AS n_big
                     FROM orders WHERE o_totalprice > 50000 GROUP BY o_custkey)
        SELECT c_mktsegment, CAST(sum(n_big) AS BIGINT) AS total_big
        FROM big JOIN customer ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // ---- expressions (§2.2/§2.8) -----------------------------------------
    "case_when" -> ((s, d) => {
      T(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 1000, "small")
            .when(col("o_totalprice") < 100000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"), col("o_orderstatus"))
    }),

    "string_fns" -> ((s, d) => {
      T(s, d, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name8"),
          length(col("p_name")).cast("long").as("name_len"),
          locate("a", col("p_name")).cast("long").as("first_a"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
        .orderBy(col("p_partkey"))
    }),

    "date_fns" -> ((s, d) => {
      T(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          ms(col("o_orderdate")).as("ts_ms"))
        .orderBy(col("o_orderkey"))
    }),

    "json_get" -> ((s, d) => {
      // reference json_get_int / json path access (§2.8 JSON)
      T(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_int"))
        .filter(col("k_int") % 7 === 0)
        .orderBy(col("event_id"))
    }),

    "time_bucket_agg" -> ((s, d) => {
      // tumbling per-hour bucket per event_type (flow/RANGE tumbling shape)
      T(s, d, "events")
        .groupBy(expr("ts div 3600000000000").as("bucket"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
             max(col("value")).as("max_value"))
        .withColumn("bucket_ms", col("bucket") * 3600000L)
        .drop("bucket")
        .orderBy(col("bucket_ms"), col("event_type"))
    }),

    "sample_det" -> ((s, d) => {
      // deterministic Bernoulli-style sample (TABLESAMPLE REPEATABLE §2.2)
      T(s, d, "lineitem")
        .filter((col("l_orderkey") * 9973 + col("l_linenumber")) % 100 < 10)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracles: Map[String, String] = Map(
    "scan_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber LIMIT 500""",

    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_sp
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_minmax" ->
      """SELECT o_orderpriority, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           MIN(epoch_ms(o_orderdate)) AS min_date_ms, MAX(epoch_ms(o_orderdate)) AS max_date_ms
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_median" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 3) AS median_value, COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_var_exact" ->
      """SELECT event_type,
           (CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)) / COUNT(*) AS var_pop,
           COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "join_inner" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",

    "join_right" ->
      """SELECT n_name, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "join_full" ->
      """SELECT COALESCE(l.k, r.k) AS k2, COALESCE(l.lp, -1.0) AS lp, COALESCE(r.rp, -1.0) AS rp
         FROM (SELECT o_orderkey AS k, o_totalprice AS lp FROM orders WHERE o_orderkey % 3 = 0) l
         FULL JOIN (SELECT o_orderkey AS k, o_totalprice AS rp FROM orders WHERE o_orderkey % 3 <= 1) r
         ON l.k = r.k ORDER BY k2""",

    "join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 40000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",

    "join_inequality" ->
      """SELECT s_suppkey, COUNT(*) AS n_richer
         FROM (SELECT * FROM supplier WHERE s_acctbal > 9000) s
         JOIN (SELECT * FROM customer WHERE c_acctbal > 9900) c ON c.c_acctbal > s.s_acctbal
         GROUP BY s_suppkey ORDER BY s_suppkey""",

    "join_multiway" ->
      """SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, rn, rk FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
             CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS rk
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "window_agg_frame" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem QUALIFY l_suppkey <= 20
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",

    "window_leadlag" ->
      """SELECT user_id, event_id,
           COALESCE(lag(value, 1) OVER w, -1.0) AS prev_value,
           COALESCE(epoch_ms(CAST(ts AS TIMESTAMP)) - lag(epoch_ms(CAST(ts AS TIMESTAMP)), 1) OVER w, -1) AS gap_ms
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         QUALIFY user_id <= 50
         ORDER BY user_id, event_id""",

    "window_ntile" ->
      """SELECT CAST(quartile AS BIGINT) AS quartile, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
         FROM (SELECT c_acctbal, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
               FROM customer) t
         GROUP BY quartile ORDER BY quartile""",

    "window_firstlast" ->
      """SELECT user_id, first_type, last_value, COUNT(*) AS n FROM (
           SELECT user_id,
             first_value(event_type) OVER w AS first_type,
             last_value(value) OVER w AS last_value
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
         GROUP BY user_id, first_type, last_value ORDER BY user_id""",

    "setop_union_all" ->
      """SELECT k, COUNT(*) AS n FROM (
           SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 100000) t
         GROUP BY k ORDER BY k""",

    "setop_intersect" ->
      """SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
         INTERSECT
         SELECT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F'
         ORDER BY k""",

    "setop_except" ->
      """SELECT o_custkey AS k FROM orders
         EXCEPT
         SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
         ORDER BY k""",

    "orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    "groupby_orderby_limit" ->
      """SELECT user_id, MAX(value) AS max_value, COUNT(*) AS n
         FROM events GROUP BY user_id ORDER BY max_value DESC, user_id LIMIT 10""",

    "lastpoint" ->
      """SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id""",

    "subquery_in" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                                      / COUNT(o_totalprice) FROM orders) * 2
         ORDER BY o_orderkey""",

    "cte_basic" ->
      """WITH big AS (SELECT o_custkey, count(*) AS n_big
                      FROM orders WHERE o_totalprice > 50000 GROUP BY o_custkey)
         SELECT c_mktsegment, CAST(sum(n_big) AS BIGINT) AS total_big
         FROM big JOIN customer ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "case_when" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                     WHEN o_totalprice < 100000 THEN 'medium'
                     ELSE 'large' END AS bucket,
                o_orderstatus, COUNT(*) AS n
         FROM orders GROUP BY bucket, o_orderstatus ORDER BY bucket, o_orderstatus""",

    "string_fns" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, substring(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_type, '^(\w+)', 1) AS type_head
         FROM part ORDER BY p_partkey""",

    "date_fns" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           epoch_ms(o_orderdate) AS ts_ms
         FROM orders ORDER BY o_orderkey""",

    "json_get" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
         ORDER BY event_id""",

    "time_bucket_agg" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value,
           MAX(value) AS max_value,
           (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 AS bucket_ms
         FROM events
         GROUP BY bucket_ms, event_type ORDER BY bucket_ms, event_type""",

    "sample_det" ->
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
         WHERE (l_orderkey * 9973 + l_linenumber) % 100 < 10
         GROUP BY l_returnflag ORDER BY l_returnflag"""
  )

  /** Temp-view helper for SQL-built queries. */
  private object Tables {
    def register(s: org.apache.spark.sql.SparkSession, d: String, names: String*): Unit =
      names.foreach(n => graft.Tables.load(s, d, n).createOrReplaceTempView(n))
  }
}
