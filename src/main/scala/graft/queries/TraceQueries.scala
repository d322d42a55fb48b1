package graft.queries

import org.apache.spark.sql.functions._
import graft.ingest.{OtlpLogs, OtlpTrace}
import graft.trace.Jaeger
import QueryDsl._

/** OTLP traces/logs ingest + the Jaeger query API (SURVEY.md §2.1):
  * table rows are encoded into real OTLP protobuf payloads executor-side,
  * decoded back through the real parser, and the result (or a Jaeger
  * query over it) is hash-compared against DuckDB replicating the same
  * deterministic generator in SQL. */
object TraceQueries {

  /** big-endian fixed-width id bytes; hex(be(v, n)) == printf("%0{2n}x", v). */
  private def be(v: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var i = 0
    // bytes beyond the long stay zero (Long >>> wraps its shift at 64)
    while (i < n && i < 8) { a(n - 1 - i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    a
  }

  /** events rows → deterministic spans (trace=user, span=event) encoded as
    * ExportTraceServiceRequest payloads, one ResourceSpans per event_type
    * present in each ~400-row batch. */
  private def spanFrames(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    val src = T(s, d, "events").select(
      col("event_type").as("etype"), col("event_id").cast("long").as("eid"),
      col("user_id").cast("long").as("uid"),
      // µs-quantized: DuckDB reads the parquet ns timestamp at µs
      // precision, so the oracle's epoch_ns(ts) carries three zero digits
      expr("ts div 1000 * 1000").as("ts_ns"))
    val payloads = src.as[(String, Long, Long, Long)].mapPartitions { it =>
      it.grouped(400).map { chunk =>
        val groups = chunk.groupBy(_._1).toSeq.sortBy(_._1).map { case (etype, rows) =>
          val spans = rows.map { case (_, eid, uid, ts) =>
            OtlpTrace.SpanIn(
              traceId = be(uid, 16), spanId = be(eid, 8),
              parentSpanId = if (eid % 5 == 0) Array.emptyByteArray else be(uid, 8),
              name = s"op_${eid % 7}", kind = (eid % 6).toInt,
              startNano = ts, endNano = ts + uid * 1000 + eid % 997,
              attrs = Seq("bucket" -> (uid % 4).toString),
              statusCode = (eid % 3).toInt,
              statusMessage = if (eid % 3 == 2) "boom" else "")
          }
          OtlpTrace.ResourceSpansIn(
            resourceAttrs = Seq("service.name" -> s"svc_$etype"),
            scopes = Seq(OtlpTrace.ScopeSpansIn("graft.gen", "1.0", Nil, spans)))
        }
        OtlpTrace.encodeRequest(groups)
      }
    }.toDF("body")
    OtlpTrace.fromPayloads(payloads, "body")
  }

  val queries: Map[String, Q] = Map(
    // spans round-trip → per-service aggregate over ids / kinds / status /
    // durations vs DuckDB replicating the generator arithmetic.
    "ingest_otlp_trace" -> ((s, d) => {
      spanFrames(s, d)
        .groupBy(col("service_name"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("trace_id")).as("n_traces"),
          sum(col("duration_nano")).as("sum_dur"),
          countDistinct(col("span_kind")).as("n_kinds"),
          sum(when(col("span_status_code") === "STATUS_CODE_ERROR", 1L).otherwise(0L)).as("n_err"),
          sum(when(col("parent_span_id").isNull, 1L).otherwise(0L)).as("n_roots"),
          max(col("ts_ns")).as("max_ts"))
        .orderBy(col("service_name"))
    }),

    // documents rows → OTLP LogRecords (identity schema) → per-language
    // aggregate over severity / body length / flags / jsonb attributes.
    "ingest_otlp_logs" -> ((s, d) => {
      import s.implicits._
      val src = T(s, d, "documents").select(
        col("doc_id").cast("long").as("id"), col("lang"), col("text"))
      val payloads = src.as[(Long, String, String)].mapPartitions { it =>
        it.grouped(300).map { chunk =>
          val scopes = chunk.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, rows) =>
            OtlpLogs.ScopeLogsIn(s"scope_$lang", "2.1", Nil, "http://schema/scope",
              rows.map { case (id, lg, text) =>
                OtlpLogs.LogIn(tsNano = id * 1000000L + 1L,
                  severityNumber = (id % 24 + 1).toInt, severityText = "INFO",
                  body = Some(text),
                  attrs = Seq("lang" -> lg, "even" -> (id % 2 == 0).toString),
                  flags = id % 2,
                  traceId = be(id, 16), spanId = be(id, 8))
              })
          }
          OtlpLogs.encodeRequest(Seq(OtlpLogs.ResourceLogsIn(
            Seq("service.name" -> "doc_ingest"), "http://schema/res", scopes)))
        }
      }.toDF("body")
      OtlpLogs.fromPayloads(payloads, "body")
        .groupBy(get_json_object(col("log_attributes"), "$.lang").as("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("severity_number")).as("sum_sev"),
          sum(length(col("body"))).as("sum_len"),
          sum(col("trace_flags")).as("sum_flags"),
          max(col("ts_ns")).as("max_ts"))
        .orderBy(col("lang"))
    }),

    // Jaeger get_operations: distinct (span_name, kind) of one service,
    // kind rendered the HTTP-layer way (`server`, not `SPAN_KIND_SERVER`).
    "jaeger_operations" -> ((s, d) =>
      Jaeger.getOperations(spanFrames(s, d), "svc_click")
        .orderBy(col("span_name"), col("span_kind"))),

    // Jaeger find_traces two-phase query: service + tag + min-duration
    // filters pick the trace ids; every span of those traces comes back.
    "jaeger_find_traces" -> ((s, d) =>
      Jaeger.findTraces(spanFrames(s, d),
        Jaeger.TraceQuery(serviceName = "svc_error",
          tags = Map("bucket" -> "1"), minDurationNs = Some(50000L),
          limit = Some(1000000)))
        .select(col("trace_id"), col("span_id"), col("service_name"),
          col("span_name"), col("duration_nano"), col("ts_ns"))
        .orderBy(col("ts_ns").desc, col("span_id")))
  )

  private val spanCte =
    """WITH spans AS (
         SELECT 'svc_' || event_type AS service_name,
                printf('%032x', user_id) AS trace_id,
                printf('%016x', event_id) AS span_id,
                'op_' || (event_id % 7) AS span_name,
                user_id * 1000 + event_id % 997 AS duration_nano,
                epoch_ns(ts) AS ts_ns,
                CAST(user_id % 4 AS VARCHAR) AS bucket,
                event_id % 3 AS status, event_id % 6 AS kind,
                event_id % 5 = 0 AS is_root
         FROM events)"""

  val oracles: Map[String, String] = Map(
    "ingest_otlp_trace" -> s"""$spanCte
      SELECT service_name, COUNT(*) AS n,
        CAST(COUNT(DISTINCT trace_id) AS BIGINT) AS n_traces,
        CAST(SUM(duration_nano) AS BIGINT) AS sum_dur,
        CAST(COUNT(DISTINCT kind) AS BIGINT) AS n_kinds,
        CAST(SUM(CASE WHEN status = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
        CAST(SUM(CASE WHEN is_root THEN 1 ELSE 0 END) AS BIGINT) AS n_roots,
        MAX(ts_ns) AS max_ts
      FROM spans GROUP BY 1 ORDER BY 1""",
    "ingest_otlp_logs" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(doc_id % 24 + 1) AS BIGINT) AS sum_sev,
           CAST(SUM(length(text)) AS BIGINT) AS sum_len,
           CAST(SUM(doc_id % 2) AS BIGINT) AS sum_flags,
           MAX(doc_id * 1000000 + 1) AS max_ts
         FROM documents GROUP BY 1 ORDER BY 1""",
    "jaeger_operations" -> s"""$spanCte
      SELECT DISTINCT span_name,
        CASE kind WHEN 0 THEN 'unspecified' WHEN 1 THEN 'internal'
                  WHEN 2 THEN 'server' WHEN 3 THEN 'client'
                  WHEN 4 THEN 'producer' WHEN 5 THEN 'consumer' END AS span_kind
      FROM spans WHERE service_name = 'svc_click'
      ORDER BY span_name, span_kind""",
    "jaeger_find_traces" -> s"""$spanCte,
      ids AS (SELECT DISTINCT trace_id FROM spans
              WHERE service_name = 'svc_error' AND bucket = '1'
                AND duration_nano >= 50000)
      SELECT s.trace_id, s.span_id, s.service_name, s.span_name,
             s.duration_nano, s.ts_ns
      FROM spans s WHERE s.trace_id IN (SELECT trace_id FROM ids)
      ORDER BY s.ts_ns DESC, s.span_id"""
  )
}
