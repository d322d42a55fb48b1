package graft.queries

import org.apache.spark.sql.functions._
import graft.ingest.Protocols
import QueryDsl._

/** Protocol-ingest coverage (SURVEY.md §2.1): events rows are encoded
  * as InfluxDB line protocol, decoded back through the real parser,
  * pivoted to the wide table model, and hash-compared against DuckDB
  * computing the same aggregate from the original columns. */
object IngestQueries {

  val queries: Map[String, Q] = Map(
    "ingest_influx_lp" -> ((s, d) => {
      // encode: events,type=<event_type> value=<v>,user=<id>i <ts_ns>
      val lines = T(s, d, "events").select(concat(
        lit("events,type="), col("event_type"),
        lit(" value="), col("value").cast("decimal(18,4)"),
        lit(",user="), col("user_id"), lit("i "),
        col("ts")).as("line"))
      val wide = Protocols.pivotMeasurement(
        Protocols.fromInfluxLines(lines, "line"), "events")
      wide.groupBy(col("type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_v"),
          sum(col("user").cast("long")).as("sum_user"),
          max(expr("ts div 1000000")).as("max_ts_ms"))
        .orderBy(col("type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "ingest_influx_lp" ->
      """SELECT event_type AS type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
