package graft.queries

import org.apache.spark.sql.functions._
import graft.logquery.LogQuery._
import QueryDsl._

/** Log query engine coverage (SURVEY.md §2.9) — the HTTP log-search IR
  * planned over the events table, checked against DuckDB. */
object LogQueryQueries {

  private def eventsMs(s: org.apache.spark.sql.SparkSession, d: String) =
    T(s, d, "events").withColumn("ts_ms", expr("ts div 1000000"))

  val queries: Map[String, Q] = Map(
    "logquery_search" -> ((s, d) => {
      val q = Query(
        timeFilter = Some(TimeFilter(Some("2024-01-01"), Some("2024-02-01"))),
        filters = Some(And(Seq(
          Cond("event_type", Seq(Prefix("c"))),
          Cond("props", Seq(Contains("k")))))),
        exprs = Seq(
          Decompose(NamedIdent("props"), "json", Seq("k" -> "long")),
          FilterExpr(Cond("k", Seq(GreatThan("50"))))),
        columns = Seq("event_id", "event_type", "k"))
      plan(eventsMs(s, d), "ts_ms", q).orderBy(col("event_id"))
    }),

    "logquery_agg" -> ((s, d) => {
      val q = Query(
        timeFilter = Some(TimeFilter(None, Some("2024-01-02T00:00:00"), Some("1d"))),
        exprs = Seq(AggrFunc(
          Seq(AggFunc("count", Seq(NamedIdent("event_id")), Some("n")),
            AggFunc("min", Seq(NamedIdent("value")), Some("min_v")),
            AggFunc("max", Seq(NamedIdent("value")), Some("max_v"))),
          by = Seq(NamedIdent("event_type")))))
      plan(eventsMs(s, d), "ts_ms", q)
        .withColumnRenamed("event_type", "event_type")
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "logquery_search" ->
      """SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events
         WHERE epoch_ns(ts) // 1000000 >= 1704067200000
           AND epoch_ns(ts) // 1000000 < 1706745600000
           AND event_type LIKE 'c%' AND props LIKE '%k%'
           AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
         ORDER BY event_id""",

    "logquery_agg" ->
      """SELECT event_type, COUNT(event_id) AS n,
           MIN(value) AS min_v, MAX(value) AS max_v
         FROM events
         WHERE epoch_ns(ts) // 1000000 >= 1704067200000
           AND epoch_ns(ts) // 1000000 < 1704153600000
         GROUP BY event_type ORDER BY event_type"""
  )
}
