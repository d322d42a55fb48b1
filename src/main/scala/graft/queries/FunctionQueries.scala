package graft.queries

import org.apache.spark.sql.functions._
import graft.functions._
import QueryDsl._

/** Oracle-checked queries exercising the §2.8 function registry on the
  * driver testdata. Double-valued vector math is rounded to 6 dp on both
  * sides (sequential double accumulation differs across engines at
  * ~1e-14; rounding makes the hash stable).
  */
object FunctionQueries {

  val queries: Map[String, Q] = Map(
    "fn_vector" -> ((s, d) => {
      val e1 = T(s, d, "embeddings").select(col("vec_id"), col("embedding").as("a"))
      val e2 = T(s, d, "embeddings")
        .select((col("vec_id") - 1).as("vec_id"), col("embedding").as("b"))
      e1.join(e2, "vec_id")
        .select(col("vec_id"),
          VectorFunctions.vecDim(col("a")).cast("long").as("dim"),
          round(VectorFunctions.vecDotProduct(col("a"), col("b")), 6).as("dot"),
          round(VectorFunctions.vecCosDistance(col("a"), col("b")), 6).as("cos_dist"),
          round(VectorFunctions.vecL2sqDistance(col("a"), col("b")), 6).as("l2sq"),
          round(VectorFunctions.vecNorm(col("a")), 6).as("norm_a"),
          round(VectorFunctions.vecElemSum(col("a")), 6).as("sum_a"))
        .orderBy(col("vec_id"))
    }),

    "fn_ipv4" -> ((s, d) => {
      val df = T(s, d, "events")
        .withColumn("ip", concat_ws(".",
          col("user_id") % 200 + 1, col("user_id") * 7 % 256,
          col("user_id") * 13 % 256, col("event_id") % 256))
        .dropDuplicates("ip")
      df.select(col("ip"),
        IpFunctions.ipv4StringToNum(col("ip")).as("ip_num"),
        IpFunctions.ipv4NumToString(IpFunctions.ipv4StringToNum(col("ip"))).as("ip_rt"),
        IpFunctions.ipv4InRange(col("ip"), lit("100.0.0.0/6")).as("in_range"),
        IpFunctions.ipv4ToCidr(col("ip"), lit(8)).as("cidr8"))
        .orderBy(col("ip"))
    }),

    "fn_json_types" -> ((s, d) => {
      T(s, d, "events").select(col("event_id"),
        JsonFunctions.jsonGetInt(col("props"), "$.k").as("k_int"),
        JsonFunctions.jsonIsInt(col("props"), "$.k").as("k_is_int"),
        JsonFunctions.jsonPathExists(col("props"), "$.k").as("has_k"),
        JsonFunctions.jsonPathExists(col("props"), "$.zz").as("has_zz"))
        .orderBy(col("event_id"))
    }),

    "fn_text_match" -> ((s, d) => {
      T(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextMatch.matchesTerm(col("text"), lit("spark")).as("has_spark"),
          TextMatch.matches(col("text"), "spark merge").as("spark_or_merge"),
          TextMatch.matches(col("text"), "+spark -merge").as("spark_not_merge"))
        .groupBy(col("lang"))
        .agg(count(when(col("has_spark"), 1)).as("n_spark"),
             count(when(col("spark_or_merge"), 1)).as("n_or"),
             count(when(col("spark_not_merge"), 1)).as("n_must"))
        .orderBy(col("lang"))
    }),

    "fn_geo" -> ((s, d) => {
      // derive deterministic coordinates from keys (no geo column in testdata)
      val df = T(s, d, "customer").select(col("c_custkey"),
        (col("c_custkey") % 180 - 90 + lit(0.5)).cast("double").as("lat"),
        (col("c_custkey") % 360 - 180 + lit(0.25)).cast("double").as("lng"))
      df.select(col("c_custkey"),
        GeoFunctions.stDistance(col("lat"), col("lng"), lit(0.0), lit(0.0)).as("eucl"),
        GeoFunctions.wktPointFromLatLng(col("lat"), col("lng")).as("wkt"),
        GeoFunctions.geohash(col("lat"), col("lng"), lit(8)).as("gh"))
        .drop("gh") // geohash is spec-tested; DuckDB has no equivalent
        .orderBy(col("c_custkey"))
    }),

    "fn_h3" -> ((s, d) => {
      // H3 cell math over derived coordinates. DuckDB has no H3, so the
      // oracle checks (a) identity invariants that hold for every cell —
      // counted per-row, expected == count(*) — and (b) literal pins taken
      // from the reference's own golden corpus (function/geo.result).
      val cellU = udf((lat: Double, lng: Double, r: Int) => H3.latLngToCell(lat, lng, r))
      val parentU = udf((c: Long, r: Int) => H3.parent(c, r))
      val centerChildU = udf((c: Long, r: Int) => H3.centerChild(c, r))
      val strRtU = udf((c: Long) => H3.stringToCell(H3.cellToString(c)) == c)
      val centerRtU = udf((c: Long) => {
        val (lat, lng) = H3.cellToLatLng(c)
        H3.latLngToCell(lat, lng, H3.resolution(c)) == c
      })
      val posRtU = udf((c: Long, pos: Long) => {
        val child = H3.childPosToCell(pos, c, H3.resolution(c) + 2)
        H3.cellToChildPos(child, H3.resolution(c)) == pos &&
          H3.parent(child, H3.resolution(c)) == c
      })
      val diskOkU = udf((c: Long) => {
        val n = H3.gridDisk(c, 1).length
        n == 7 || (n == 6 && H3.isPentagon(c))
      })
      val pts = T(s, d, "customer").select(col("c_custkey"),
        (col("c_custkey") % 160 - 80 + lit(0.37)).cast("double").as("lat"),
        (col("c_custkey") % 346 - 173 + lit(0.11)).cast("double").as("lng"))
      val cells = pts.select(col("c_custkey"),
        cellU(col("lat"), col("lng"), lit(8)).as("cell8"),
        cellU(col("lat"), col("lng"), lit(6)).as("cell6"))
      cells.agg(
        count(lit(1)).as("n"),
        sum(when(parentU(centerChildU(col("cell6"), lit(9)), lit(6)) === col("cell6"), 1L).otherwise(0L)).as("parent_ok"),
        sum(when(strRtU(col("cell8")), 1L).otherwise(0L)).as("str_ok"),
        sum(when(centerRtU(col("cell8")), 1L).otherwise(0L)).as("rt_ok"),
        sum(when(posRtU(col("cell6"), col("c_custkey") % 41), 1L).otherwise(0L)).as("pos_ok"),
        sum(when(diskOkU(col("cell6")), 1L).otherwise(0L)).as("disk_ok"))
        .withColumn("pin_cell8", lit(H3.latLngToCell(37.76938, -122.3889, 8)))
        .withColumn("pin_parent6", lit(H3.parent(613196570438926335L, 6)))
        .withColumn("pin_child_at", lit(H3.childPosToCell(25, 613196570438926335L, 11)))
        .withColumn("pin_disk3_last", lit(H3.gridDisk(613196570438926335L, 3).last))
        .withColumn("pin_path4", lit(H3.gridPathCells(604189371209351167L, 604189641255419903L)(4)))
        .withColumn("pin_dist", lit(H3.gridDistance(604189371209351167L, 604189641255419903L).toLong))
        .withColumn("pin_pent_size", lit(H3.childrenSize(H3.stringToCell("8009fffffffffff"), 3)))
        .withColumn("pin_sphere_km", round(
          lit(H3.distanceSphereKm(604189371209351167L, 604189641255419903L)), 5))
    }),

    "fn_math_clamp" -> ((s, d) => {
      T(s, d, "events").select(col("event_id"),
        MathFunctions.clamp(col("value"), lit(50.0), lit(150.0)).as("clamped"),
        MathFunctions.clampMin(col("value"), lit(100.0)).as("clo"),
        MathFunctions.clampMax(col("value"), lit(100.0)).as("chi"),
        MathFunctions.iff(col("value") > 100, lit("hi"), lit("lo")).as("band"),
        MathFunctions.mod(col("event_id"), lit(7L)).as("m7"))
        .orderBy(col("event_id"))
    }),

    "fn_anomaly_zscore" -> ((s, d) => {
      // grouped transform, not a window: event_type has a handful of
      // values, so a window would serialize each group through one task
      AnomalyFunctions.withAnomalyScoreZscore(
          T(s, d, "events"), "value", Seq("event_type"), "score")
        .filter(col("score") > 2.0)
        .select(col("event_id"), round(col("score"), 4).as("score"))
        .orderBy(col("event_id"))
    }),

    "fn_anomaly_mad_iqr" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      val scored = AnomalyFunctions.withAnomalyScoreMad(
        T(s, d, "events"), "value", Seq("event_type"), "mad_score")
        .withColumn("iqr_score", AnomalyFunctions.anomalyScoreIqr(col("value"), w))
      scored.filter(col("mad_score") > 3.0 || col("iqr_score") > 0.0)
        .select(col("event_id"), round(col("mad_score"), 4).as("mad_score"),
          round(col("iqr_score"), 4).as("iqr_score"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "fn_vector" ->
      """SELECT e1.vec_id,
           CAST(len(e1.embedding) AS BIGINT) AS dim,
           round(list_dot_product(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 6) AS dot,
           round(1.0 - list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 6) AS cos_dist,
           round(list_distance(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])) ** 2, 6) AS l2sq,
           round(sqrt(list_dot_product(CAST(e1.embedding AS DOUBLE[]), CAST(e1.embedding AS DOUBLE[]))), 6) AS norm_a,
           round(list_sum(CAST(e1.embedding AS DOUBLE[])), 6) AS sum_a
         FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
         ORDER BY e1.vec_id""",

    "fn_ipv4" ->
      """WITH ips AS (
           SELECT DISTINCT ip FROM (
             SELECT CAST(user_id % 200 + 1 AS VARCHAR) || '.' ||
                    CAST(user_id * 7 % 256 AS VARCHAR) || '.' ||
                    CAST(user_id * 13 % 256 AS VARCHAR) || '.' ||
                    CAST(event_id % 256 AS VARCHAR) AS ip
             FROM events) t),
         parsed AS (
           SELECT ip,
             CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 +
             CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 +
             CAST(string_split(ip, '.')[3] AS BIGINT) * 256 +
             CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
           FROM ips)
         SELECT ip, ip_num,
           CAST(ip_num // 16777216 % 256 AS VARCHAR) || '.' ||
           CAST(ip_num // 65536 % 256 AS VARCHAR) || '.' ||
           CAST(ip_num // 256 % 256 AS VARCHAR) || '.' ||
           CAST(ip_num % 256 AS VARCHAR) AS ip_rt,
           (ip_num // 67108864) = (1677721600 // 67108864) AS in_range,
           CAST(ip_num // 16777216 AS VARCHAR) || '.0.0.0/8' AS cidr8
         FROM parsed ORDER BY ip""",

    "fn_json_types" ->
      """SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_type(props, '$.k') IN ('BIGINT','UBIGINT') AS k_is_int,
           json_extract(props, '$.k') IS NOT NULL AS has_k,
           json_extract(props, '$.zz') IS NOT NULL AS has_zz
         FROM events ORDER BY event_id""",

    "fn_text_match" ->
      """SELECT lang,
           COUNT(CASE WHEN regexp_matches(text, '(^|[^a-zA-Z0-9])spark([^a-zA-Z0-9]|$)') THEN 1 END) AS n_spark,
           COUNT(CASE WHEN regexp_matches(lower(text), '(^|[^a-z0-9])spark([^a-z0-9]|$)')
                        OR regexp_matches(lower(text), '(^|[^a-z0-9])merge([^a-z0-9]|$)') THEN 1 END) AS n_or,
           COUNT(CASE WHEN regexp_matches(lower(text), '(^|[^a-z0-9])spark([^a-z0-9]|$)')
                        AND NOT regexp_matches(lower(text), '(^|[^a-z0-9])merge([^a-z0-9]|$)') THEN 1 END) AS n_must
         FROM documents GROUP BY lang ORDER BY lang""",

    "fn_geo" ->
      """SELECT c_custkey,
           sqrt((0.0 - (c_custkey % 180 - 90 + 0.5)) * (0.0 - (c_custkey % 180 - 90 + 0.5))
              + (0.0 - (c_custkey % 360 - 180 + 0.25)) * (0.0 - (c_custkey % 360 - 180 + 0.25))) AS eucl,
           'POINT(' || CAST(CAST(c_custkey % 360 - 180 + 0.25 AS DOUBLE) AS VARCHAR) || ' ' ||
                       CAST(CAST(c_custkey % 180 - 90 + 0.5 AS DOUBLE) AS VARCHAR) || ')' AS wkt
         FROM customer ORDER BY c_custkey""",

    "fn_h3" ->
      """SELECT count(*) AS n, count(*) AS parent_ok, count(*) AS str_ok,
           count(*) AS rt_ok, count(*) AS pos_ok, count(*) AS disk_ok,
           CAST(613196570438926335 AS BIGINT) AS pin_cell8,
           CAST(604189371209351167 AS BIGINT) AS pin_parent6,
           CAST(626707369319059455 AS BIGINT) AS pin_child_at,
           CAST(613196570216628223 AS BIGINT) AS pin_disk3_last,
           CAST(604189638034194431 AS BIGINT) AS pin_path4,
           CAST(9 AS BIGINT) AS pin_dist,
           CAST(286 AS BIGINT) AS pin_pent_size,
           CAST(55.05017 AS DOUBLE) AS pin_sphere_km
         FROM customer""",

    "fn_math_clamp" ->
      """SELECT event_id,
           least(greatest(value, 50.0), 150.0) AS clamped,
           greatest(value, 100.0) AS clo,
           least(value, 100.0) AS chi,
           CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END AS band,
           event_id % 7 AS m7
         FROM events ORDER BY event_id""",

    "fn_anomaly_zscore" ->
      """WITH s AS (
           SELECT event_id, value,
             avg(value) OVER (PARTITION BY event_type) AS m,
             stddev_samp(value) OVER (PARTITION BY event_type) AS sd,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_id, round(abs(value - m) / sd, 4) AS score
         FROM s WHERE n >= 2 AND sd > 0 AND abs(value - m) / sd > 2
         ORDER BY event_id""",

    // exact-quantile MAD + IQR fence scores (anomaly/{mad,iqr}.rs):
    //   mad = |x-med| / (1.4826 * median(|xi-med|)); iqr = distance
    //   beyond the 1.5*IQR fences scaled by IQR, 0 inside
    "fn_anomaly_mad_iqr" ->
      """WITH g AS (
           SELECT event_type,
             quantile_cont(value, 0.5) AS med,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
           FROM events GROUP BY 1),
         m AS (
           SELECT e.event_type,
             1.4826 * quantile_cont(abs(e.value - g.med), 0.5) AS madn
           FROM events e JOIN g USING (event_type) GROUP BY 1),
         s AS (
           SELECT e.event_id, e.value, g.med, g.q1, g.q3, m.madn,
             g.q3 - g.q1 AS iqr,
             g.q1 - 1.5 * (g.q3 - g.q1) AS lo,
             g.q3 + 1.5 * (g.q3 - g.q1) AS hi
           FROM events e JOIN g USING (event_type) JOIN m USING (event_type)),
         sc AS (
           SELECT event_id,
             CASE WHEN madn = 0
                  THEN CASE WHEN value = med THEN 0 ELSE 1e308*10 END
                  ELSE abs(value - med) / madn END AS mad_score,
             CASE WHEN value >= lo AND value <= hi THEN 0
                  WHEN iqr = 0 THEN 1e308*10
                  WHEN value < lo THEN (lo - value) / iqr
                  ELSE (value - hi) / iqr END AS iqr_score
           FROM s)
         SELECT event_id, round(mad_score, 4) AS mad_score,
                round(iqr_score, 4) AS iqr_score
         FROM sc WHERE mad_score > 3.0 OR iqr_score > 0.0
         ORDER BY event_id"""
  )
}
