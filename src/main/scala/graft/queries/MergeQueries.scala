package graft.queries

import org.apache.spark.sql.functions._
import graft.model.{Catalog, MergeMode, TableSpec}
import QueryDsl._

/** Merge-mode read views (SURVEY.md §1.1) checked against DuckDB.
  * events has unique (user_id, ts) keys, so a unioned second write
  * per selected key makes the dedup semantics fully deterministic:
  * last_row must take the whole newer row, last_non_null must merge
  * per field. */
object MergeQueries {

  private def spec(mode: MergeMode) = TableSpec(
    name = "events_m", path = "", timeIndex = "ts",
    tags = Seq("user_id"), mergeMode = mode, seqColumn = Some("seq"))

  val queries: Map[String, Q] = Map(
    "merge_last_row" -> ((s, d) => {
      val ev = T(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      val base = ev.withColumn("seq", lit(0L))
      val rewrite = ev.filter(col("user_id") % 10 === 0)
        .withColumn("value", col("value") * 2)
        .withColumn("event_type", lit("rewritten"))
        .withColumn("seq", lit(1L))
      val merged = Catalog.readView(base.unionByName(rewrite), spec(MergeMode.LastRow))
      merged.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .orderBy(col("event_type"))
    }),

    "merge_last_non_null" -> ((s, d) => {
      val ev = T(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      val base = ev.withColumn("v2", lit(null).cast("double")).withColumn("seq", lit(0L))
      val patch = ev.filter(col("user_id") % 7 === 0)
        .withColumn("v2", col("value") * 3)
        .withColumn("value", lit(null).cast("double")) // must NOT erase value
        .withColumn("seq", lit(1L))
      val merged = Catalog.readView(base.unionByName(patch), spec(MergeMode.LastNonNull))
      merged.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"),
          dsum(coalesce(col("v2"), lit(0.0))).as("sum_v2"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "merge_last_row" ->
      """WITH raw AS (
           SELECT user_id, ts, event_type, value, 0 AS seq FROM events
           UNION ALL
           SELECT user_id, ts, 'rewritten', value * 2, 1 FROM events
           WHERE user_id % 10 = 0
         ), merged AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id, ts ORDER BY seq DESC) AS rn
             FROM raw) WHERE rn = 1
         )
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_v
         FROM merged GROUP BY 1 ORDER BY 1""",

    "merge_last_non_null" ->
      """WITH patch AS (
           SELECT user_id, ts, value * 3 AS v2 FROM events WHERE user_id % 7 = 0
         )
         SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(CAST(COALESCE(p.v2, 0) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v2
         FROM events e LEFT JOIN patch p USING (user_id, ts)
         GROUP BY 1 ORDER BY 1"""
  )
}
