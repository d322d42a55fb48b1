package graft.queries

import org.apache.spark.sql.functions._
import graft.model.{Catalog, MergeMode, TableSpec}
import graft.sql.GraftSession
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
    }),

    // ADMIN compact_table on a merge table (SURVEY §7.3(c)): the
    // Parquet is rewritten to the merged snapshot mid-protocol, and a
    // THIRD batch arrives AFTER the compaction — the oracle replays
    // the whole write history with no compaction at all, so a match
    // proves read-view equivalence across the compact boundary (the
    // delta+snapshot read path in Catalog.compactionAwareRead).
    // PlanShapeSpec separately pins that the fully-compacted scan is
    // window-free.
    "merge_compacted_read" -> ((s, d) => {
      val g = new GraftSession(s)
      T(g.spark, d, "events")
        .select(col("user_id"), expr("CAST(ts DIV 1000000 AS BIGINT)").as("tsk"),
          col("event_type"), col("value"))
        .createOrReplaceTempView("ev_src")
      g.sql("""CREATE TABLE evm (ts TIMESTAMP TIME INDEX,
          user_id BIGINT PRIMARY KEY, event_type STRING, value DOUBLE)
          WITH ('merge_mode'='last_row')""")
      g.sql("INSERT INTO evm SELECT tsk, user_id, event_type, value FROM ev_src")
      g.sql("""INSERT INTO evm SELECT tsk, user_id, 'rewritten', value * 2
          FROM ev_src WHERE user_id % 10 = 0""")
      g.sql("ADMIN compact_table('evm')")
      g.sql("""INSERT INTO evm SELECT tsk, user_id, 'post_compact', value * 3
          FROM ev_src WHERE user_id % 7 = 0""")
      g.sql("""SELECT event_type, count(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_v
          FROM evm GROUP BY event_type ORDER BY event_type""")
    }),

    // Same protocol under merge_mode=last_non_null: batch 2 patches v2
    // while erasing nothing (its value/event_type are NULL), the
    // compaction materializes that per-field merge, then batch 3
    // overwrites value after the compaction — so the final view mixes
    // all three write generations per field.
    "merge_compacted_read_nn" -> ((s, d) => {
      val g = new GraftSession(s)
      T(g.spark, d, "events")
        .select(col("user_id"), expr("CAST(ts DIV 1000000 AS BIGINT)").as("tsk"),
          col("event_type"), col("value"))
        .createOrReplaceTempView("ev_src")
      g.sql("""CREATE TABLE evnn (ts TIMESTAMP TIME INDEX,
          user_id BIGINT PRIMARY KEY, event_type STRING, value DOUBLE,
          v2 DOUBLE) WITH ('merge_mode'='last_non_null')""")
      g.sql("""INSERT INTO evnn SELECT tsk, user_id, event_type, value,
          CAST(NULL AS DOUBLE) FROM ev_src""")
      g.sql("""INSERT INTO evnn SELECT tsk, user_id, CAST(NULL AS STRING),
          CAST(NULL AS DOUBLE), value * 3 FROM ev_src WHERE user_id % 10 = 0""")
      g.sql("ADMIN compact_table('evnn')")
      g.sql("""INSERT INTO evnn SELECT tsk, user_id, 'post_compact',
          value * 5, CAST(NULL AS DOUBLE) FROM ev_src WHERE user_id % 7 = 0""")
      g.sql("""SELECT event_type, count(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
          CAST(SUM(CAST(COALESCE(v2, 0) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v2
          FROM evnn GROUP BY event_type ORDER BY event_type""")
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
         GROUP BY 1 ORDER BY 1""",

    "merge_compacted_read" ->
      """WITH raw AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS tsk,
                  event_type, value, 0 AS seq FROM events
           UNION ALL
           SELECT user_id, epoch_ns(ts) // 1000000, 'rewritten',
                  value * 2, 1 FROM events WHERE user_id % 10 = 0
           UNION ALL
           SELECT user_id, epoch_ns(ts) // 1000000, 'post_compact',
                  value * 3, 2 FROM events WHERE user_id % 7 = 0
         ), merged AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id, tsk ORDER BY seq DESC) AS rn
             FROM raw) WHERE rn = 1
         )
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_v
         FROM merged GROUP BY 1 ORDER BY 1""",

    "merge_compacted_read_nn" ->
      """WITH raw AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS tsk, event_type,
                  value, CAST(NULL AS DOUBLE) AS v2, 0 AS seq FROM events
           UNION ALL
           SELECT user_id, epoch_ns(ts) // 1000000, CAST(NULL AS VARCHAR),
                  CAST(NULL AS DOUBLE), value * 3, 1
           FROM events WHERE user_id % 10 = 0
           UNION ALL
           SELECT user_id, epoch_ns(ts) // 1000000, 'post_compact',
                  value * 5, CAST(NULL AS DOUBLE), 2
           FROM events WHERE user_id % 7 = 0
         ), merged AS (
           SELECT DISTINCT user_id, tsk,
             first_value(event_type IGNORE NULLS) OVER w AS event_type,
             first_value(value IGNORE NULLS) OVER w AS value,
             first_value(v2 IGNORE NULLS) OVER w AS v2
           FROM raw
           WINDOW w AS (PARTITION BY user_id, tsk ORDER BY seq DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         )
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(CAST(COALESCE(v2, 0) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v2
         FROM merged GROUP BY 1 ORDER BY 1"""
  )
}
