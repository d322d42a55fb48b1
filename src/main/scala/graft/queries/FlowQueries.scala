package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.Flow
import graft.streaming.Flow.FlowDef
import QueryDsl._

/** Continuous-query (flow) coverage — SURVEY.md §2.10. The batch
  * equivalent of a tumbling flow runs through the real refresh + upsert
  * path: a first refresh writes stale partial aggregates, a second full
  * refresh must overwrite every dirty window, and the final sink
  * contents are hash-compared against the plain GROUP BY oracle.
  * Streaming-mode semantics (watermark expiry, late-data overwrite) are
  * pinned by FlowSpec with a MemoryStream source.
  */
object FlowQueries {

  /** Temp dir (streaming sink + state-store checkpoint) deleted at JVM
    * exit — repeated Verify/Bench invocations otherwise accumulate
    * parquet + state data under /tmp. */
  private def tempDirCleanedOnExit(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    "flow_tumble" -> ((s, d) => {
      val sink = tempDirCleanedOnExit("graft_flow") + "/sink"
      // events.ts is BIGINT nanoseconds (nanosAsLong)
      val ev = T(s, d, "events").withColumn("t", timestamp_micros(expr("ts div 1000")))
      // time-bucket partitioned sink: refreshes rewrite only dirty days
      val flow = FlowDef(
        name = "flow_tumble", sink = sink,
        keys = Seq("event_type", "window_start"),
        partitionBy = Seq("window_day"),
        transform = df =>
          df.groupBy(Flow.tumble(col("t"), "1 hour").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
            .select(col("event_type"),
              unix_millis(col("w.start")).as("window_start"),
              col("n"), col("total"))
            .withColumn("window_day", expr("window_start div 86400000")))
      Flow.refreshOnce(ev.filter(col("user_id") < 500), flow) // stale first pass
      Flow.refreshOnce(ev, flow) // full refresh must overwrite every window
      s.read.parquet(sink)
        .select("event_type", "window_start", "n", "total")
        .orderBy(col("event_type"), col("window_start"))
    }),

    "flow_stream_dedup" -> ((s, d) => {
      // dedup-at-ingest through the REAL Structured Streaming engine:
      // a parquet file stream drained under Trigger.AvailableNow, with
      // state-store dropDuplicates emitting each key exactly once into
      // an append sink — the streaming counterpart of the §1.1 last_row
      // merge view. Output is the KEY SET (which row survives per key
      // is engine-arbitrary, the key set is not), so the oracle is a
      // plain DISTINCT. Global distinct needs unbounded state by
      // definition; time-scoped keys at 100 TB use
      // dropDuplicatesWithinWatermark to expire state instead.
      val tmp = tempDirCleanedOnExit("graft_sdedup")
      val path = s"$d/events.parquet"
      // the file stream source requires a DIRECTORY: stream the sf dir
      // with a glob pinning the one table (no copy)
      val src = s.readStream.schema(s.read.parquet(path).schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
      val q = src.select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$tmp/sink")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/sink")
        .orderBy(col("user_id"), col("event_type"))
    }),

    "flow_tumble_origin" -> ((s, d) => {
      // shifted grid: tumble(ts, 1h, origin 30m)
      val ev = T(s, d, "events").withColumn("t", timestamp_micros(expr("ts div 1000")))
      ev.groupBy(Flow.tumble(col("t"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), unix_millis(col("w.start")).as("window_start"), col("n"))
        .orderBy(col("event_type"), col("window_start"))
    })
  )

  val oracles: Map[String, String] = Map(
    "flow_tumble" ->
      """SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600000 AS window_start,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "flow_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",

    "flow_tumble_origin" ->
      """SELECT event_type,
           ((epoch_ns(ts) - 1800000000000) // 3600000000000) * 3600000 + 1800000 AS window_start,
           COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
