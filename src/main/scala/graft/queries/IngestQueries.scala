package graft.queries

import org.apache.spark.sql.functions._
import graft.ingest.{ArrowFlight, LogIngest, OtlpMetrics, Protocols, PromRemoteWrite}
import QueryDsl._

/** Protocol-ingest coverage (SURVEY.md §2.1): events rows are encoded
  * into each real wire format (InfluxDB line protocol, snappy+protobuf
  * Prometheus remote-write, protobuf OTLP metrics), decoded back through
  * the real parser, and hash-compared against DuckDB computing the same
  * aggregate from the original columns — a full codec round-trip per
  * protocol. */
object IngestQueries {

  val queries: Map[String, Q] = Map(
    "ingest_influx_lp" -> ((s, d) => {
      // encode: events,type=<event_type> value=<v>,user=<id>i <ts_ns>
      // ×10 line replication: at sf0.1 the raw table is only 100k rows,
      // so the measured rows/s was job-overhead-bound, not parser-bound
      // (the parser sustains 3M rows/s at volume — BENCH_NOTES r6);
      // ingesting 1M lines is the honest sustained-load measurement.
      // The DuckDB oracle scales its aggregates ×10 to match.
      val lines = T(s, d, "events").select(concat(
        lit("events,type="), col("event_type"),
        lit(" value="), col("value").cast("decimal(18,4)"),
        lit(",user="), col("user_id"), lit("i "),
        col("ts")).as("line"))
        .crossJoin(s.range(10)).select(col("line"))
      val wide = Protocols.influxPivoted(lines, "line", "events")
      wide.groupBy(col("type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_v"),
          sum(col("user").cast("long")).as("sum_user"),
          max(expr("ts div 1000000")).as("max_ts_ms"))
        .orderBy(col("type"))
    }),

    // events rows → Loki JSON push payloads (one per ~200-row executor-side
    // batch, one stream per payload chunk) → the real parser → aggregate
    // over labels / line / structured metadata vs DuckDB on the raw columns.
    "ingest_loki" -> ((s, d) => {
      import s.implicits._
      val src = T(s, d, "events").select(
        col("event_type").as("etype"), col("ts").cast("long").as("ts_ns"),
        col("value").cast("decimal(18,4)").cast("string").as("v"),
        col("user_id").cast("long").as("uid"))
      val payloads = src.as[(String, Long, String, Long)].mapPartitions { it =>
        it.grouped(200).map { chunk =>
          chunk.groupBy(_._1).toSeq.sortBy(_._1).map { case (etype, rows) =>
            val values = rows.map { case (_, ts, v, uid) =>
              s"""["$ts","val=$v",{"user":"$uid"}]"""
            }.mkString(",")
            s"""{"stream":{"service":"$etype","env":"prod"},"values":[$values]}"""
          }.mkString("""{"streams":[""", ",", "]}")
        }
      }.toDF("body")
      LogIngest.fromLokiPush(payloads, "body")
        .groupBy(element_at(col("labels"), "service").as("service"))
        .agg(count(lit(1)).as("n"),
          dsum(regexp_extract(col("line"), "val=(.*)", 1).cast("decimal(18,4)")).as("sum_v"),
          sum(get_json_object(col("structured_metadata"), "$.user").cast("long")).as("sum_user"),
          max(expr("ts_ns div 1000000")).as("max_ts_ms"))
        .orderBy(col("service"))
    }),

    // documents rows → ES _bulk NDJSON payloads (create/index commands with
    // per-language _index routing) → the real parser → per-table aggregate
    // of the JSON docs vs DuckDB on the raw columns.
    "ingest_es_bulk" -> ((s, d) => {
      import s.implicits._
      val src = T(s, d, "documents").select(
        col("doc_id").cast("long"), col("lang"), length(col("text")).cast("long").as("len"))
      val payloads = src.as[(Long, String, Long)].mapPartitions { it =>
        it.grouped(250).map { chunk =>
          chunk.map { case (id, lang, len) =>
            val cmd = if (id % 2 == 0) "create" else "index"
            s"""{"$cmd":{"_index":"logs_$lang"}}
               |{"doc_id":$id,"len":$len,"message":"doc $id"}""".stripMargin
          }.mkString("\n")
        }
      }.toDF("body")
      LogIngest.fromEsBulk(payloads, "body")
        .groupBy(col("table"))
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("doc"), "$.doc_id").cast("long")).as("sum_id"),
          sum(get_json_object(col("doc"), "$.len").cast("long")).as("sum_len"))
        .orderBy(col("table"))
    }),

    // events rows → Splunk HEC /event batches (concatenated JSON objects,
    // ~250 per payload) → the real HEC parser → reference row mapping
    // (index→table, fields/host/sourcetype→tags, event+rest→data) →
    // per-table aggregate vs DuckDB on the raw columns.
    "ingest_splunk_hec" -> ((s, d) => {
      import s.implicits._
      val src = T(s, d, "events").select(
        col("event_type").as("etype"), expr("ts div 1000000").as("ts_ms"),
        col("value").cast("decimal(18,4)").cast("string").as("v"),
        col("user_id").cast("long").as("uid"))
      val payloads = src.as[(String, Long, String, Long)].mapPartitions { it =>
        it.grouped(250).map { chunk =>
          chunk.map { case (etype, ms, v, uid) =>
            s"""{"time":$ms,"index":"splunk_$etype","host":"h${uid % 4}",""" +
              s""""sourcetype":"events","fields":{"type":"$etype"},""" +
              s""""event":"val=$v","user":$uid}"""
          }.mkString("")
        }
      }.toDF("body")
      LogIngest.fromSplunkHec(payloads, "body")
        .groupBy(col("table"))
        .agg(count(lit(1)).as("n"),
          dsum(regexp_extract(col("event"), "val=(.*)", 1).cast("decimal(18,4)")).as("sum_v"),
          sum(get_json_object(col("extras"), "$.user").cast("long")).as("sum_user"),
          countDistinct(element_at(col("tags"), "host")).as("n_hosts"),
          max(col("ts_ms")).as("max_ts_ms"))
        .orderBy(col("table"))
    }),

    // events rows → Arrow IPC record batches wrapped as gRPC-framed
    // FlightData protobufs (the reference's DoPut bulk-insert wire format,
    // ref servers/src/grpc/flight.rs:242) → the real columnar decoder →
    // per-type aggregate vs DuckDB on the raw columns. Encode and decode
    // both run executor-side; one payload per ~500-row batch.
    "ingest_flight" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val flightSchema = StructType(Seq(
        StructField("etype", StringType), StructField("ts_ms", LongType),
        StructField("v", DoubleType), StructField("uid", LongType)))
      // ×10 row replication — same sustained-load rationale as
      // ingest_influx_lp (oracle aggregates scale ×10)
      val src = T(s, d, "events").select(
        col("event_type").as("etype"),
        expr("ts div 1000000").as("ts_ms"),
        col("value").cast("decimal(18,4)").cast("double").as("v"),
        col("user_id").cast("long").as("uid"))
        .crossJoin(s.range(10)).select("etype", "ts_ms", "v", "uid")
      val payloads = src.as[(String, Long, Double, Long)].mapPartitions { it =>
        it.grouped(500).map { chunk =>
          ArrowFlight.encodePayload(flightSchema,
            chunk.map(t => Seq[Any](t._1, t._2, t._3, t._4)))
        }
      }.toDF("body")
      ArrowFlight.fromPayloads(payloads, "body", flightSchema)
        .groupBy(col("etype").as("type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("v")).as("sum_v"),
          sum(col("uid")).as("sum_user"),
          max(col("ts_ms")).as("max_ts_ms"))
        .orderBy(col("type"))
    }),

    // events rows → OpenTSDB `put` lines (ms timestamps) → the real
    // telnet-style parser → per-type aggregate vs DuckDB raw columns.
    "ingest_opentsdb" -> ((s, d) => {
      val lines = T(s, d, "events").select(concat(
        lit("put events_value "), expr("ts div 1000000"), lit(" "),
        col("value").cast("decimal(18,4)"),
        lit(" type="), col("event_type"),
        lit(" user="), col("user_id")).as("line"))
      Protocols.fromOpenTsdbLines(lines, "line")
        .where(col("measurement") === "events_value")
        .groupBy(element_at(col("tags"), "type").as("type"))
        .agg(count(lit(1)).as("n"),
          dsum(element_at(col("fields_num"), "value")).as("sum_v"),
          sum(element_at(col("tags"), "user").cast("long")).as("sum_user"),
          max(expr("ts_ns div 1000000")).as("max_ts_ms"))
        .orderBy(col("type"))
    }),

    // events rows → snappy-compressed protobuf WriteRequest payloads (one
    // per ~500-row executor-side batch) → the real remote-write parser →
    // same aggregate as DuckDB on the raw columns.
    "ingest_prom_remote_write" -> ((s, d) => {
      import s.implicits._
      val src = T(s, d, "events").select(
        col("event_type").as("etype"),
        expr("ts div 1000000").as("ts_ms"),
        col("value").cast("decimal(18,4)").cast("double").as("v"),
        col("user_id").cast("long").as("uid"))
      val payloads = src.as[(String, Long, Double, Long)].mapPartitions { it =>
        it.grouped(500).map { chunk =>
          PromRemoteWrite.compress(PromRemoteWrite.encodeWriteRequest(
            chunk.map { case (t, ms, v, u) =>
              PromRemoteWrite.Series(
                Map(PromRemoteWrite.NameLabel -> "events_value", "type" -> t, "user" -> u.toString),
                Seq(ms -> v))
            }))
        }
      }.toDF("body")
      PromRemoteWrite.fromPayloads(payloads, "body")
        .where(col("metric") === "events_value")
        .groupBy(element_at(col("labels"), "type").as("type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_v"),
          sum(element_at(col("labels"), "user").cast("long")).as("sum_user"),
          max(col("ts_ms")).as("max_ts_ms"))
        .orderBy(col("type"))
    }),

    // events rows → protobuf OTLP gauge data points → the real OTLP
    // parser → reference row mapping (attrs=tags, ns→ms) → aggregate.
    "ingest_otlp_metrics" -> ((s, d) => {
      import s.implicits._
      val src = T(s, d, "events").select(
        col("event_type").as("etype"), col("ts").as("ts_ns"),
        col("value").cast("decimal(18,4)").cast("double").as("v"),
        col("user_id").cast("long").as("uid"))
      val payloads = src.as[(String, Long, Double, Long)].mapPartitions { it =>
        it.grouped(500).map { chunk =>
          OtlpMetrics.encodeRequest(Seq(OtlpMetrics.Metric("events_value", "gauge",
            points = chunk.map { case (t, ns, v, u) =>
              OtlpMetrics.DataPoint(Map("type" -> t, "user" -> u.toString), ns, v)
            })))
        }
      }.toDF("body")
      OtlpMetrics.fromPayloads(payloads, "body")
        .where(col("metric") === "events_value")
        .groupBy(element_at(col("labels"), "type").as("type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_v"),
          sum(element_at(col("labels"), "user").cast("long")).as("sum_user"),
          max(col("ts_ms")).as("max_ts_ms"))
        .orderBy(col("type"))
    }),

    // events rows → per-(batch, type) OTLP histograms (bounds 10/100/1000)
    // → parser → the reference's %metric%_bucket/_sum/_count tables with
    // cumulative `le` counts (servers/src/otlp/metrics.rs:600-717); bucket
    // counts and sums re-aggregate across batches to DuckDB's totals.
    "ingest_otlp_histogram" -> ((s, d) => {
      import s.implicits._
      val bounds = Seq(10.0, 100.0, 1000.0)
      val src = T(s, d, "events").select(
        col("event_type").as("etype"), col("ts").as("ts_ns"),
        col("value").cast("decimal(18,4)").cast("double").as("v"))
      val payloads = src.as[(String, Long, Double)].mapPartitions { it =>
        it.grouped(500).map { chunk =>
          val hists = chunk.groupBy(_._1).toSeq.map { case (t, rows) =>
            val counts = Array.fill(bounds.length + 1)(0L)
            var sum = BigDecimal(0)
            var maxTs = 0L
            rows.foreach { case (_, ns, v) =>
              val i = bounds.indexWhere(v <= _) match { case -1 => bounds.length; case i => i }
              counts(i) += 1
              sum += BigDecimal(v)
              if (ns > maxTs) maxTs = ns
            }
            OtlpMetrics.HistPoint(Map("type" -> t), maxTs, rows.length.toLong,
              Some(sum.toDouble), counts.toSeq, bounds)
          }
          OtlpMetrics.encodeRequest(Seq(OtlpMetrics.Metric("events_hist", "histogram", hist = hists)))
        }
      }.toDF("body")
      OtlpMetrics.fromPayloads(payloads, "body")
        .groupBy(col("metric"),
          element_at(col("labels"), "type").as("type"),
          coalesce(element_at(col("labels"), "le"), lit("")).as("le"))
        .agg(dsum(col("value")).as("val"))
        .orderBy(col("metric"), col("type"), col("le"))
    })
  )

  val oracles: Map[String, String] = Map(
    // ×10: mirrors the query-side line replication
    "ingest_influx_lp" ->
      """SELECT event_type AS type, 10 * COUNT(*) AS n,
           CAST(10 * SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(10 * SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    "ingest_loki" ->
      """SELECT event_type AS service, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    "ingest_es_bulk" ->
      """SELECT 'logs_' || lang AS "table", COUNT(*) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           CAST(SUM(length(text)) AS BIGINT) AS sum_len
         FROM documents GROUP BY 1 ORDER BY 1""",
    "ingest_opentsdb" ->
      """SELECT event_type AS type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    "ingest_splunk_hec" ->
      """SELECT 'splunk_' || event_type AS "table", COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(user_id) AS BIGINT) AS sum_user,
           CAST(COUNT(DISTINCT user_id % 4) AS BIGINT) AS n_hosts,
           MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    "ingest_prom_remote_write" ->
      """SELECT event_type AS type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    // ×10: mirrors the query-side row replication
    "ingest_flight" ->
      """SELECT event_type AS type, 10 * COUNT(*) AS n,
           CAST(10 * SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(10 * SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    "ingest_otlp_metrics" ->
      """SELECT event_type AS type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v,
           CAST(SUM(user_id) AS BIGINT) AS sum_user, MAX(epoch_ns(ts) // 1000000) AS max_ts_ms
         FROM events GROUP BY 1 ORDER BY 1""",
    "ingest_otlp_histogram" ->
      """WITH e AS (SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v FROM events)
         SELECT metric, type, le, val FROM (
           SELECT 'events_hist_bucket' AS metric, event_type AS type, '10' AS le,
                  CAST(COUNT(*) FILTER (WHERE v <= 10) AS DOUBLE) AS val FROM e GROUP BY event_type
           UNION ALL
           SELECT 'events_hist_bucket', event_type, '100',
                  CAST(COUNT(*) FILTER (WHERE v <= 100) AS DOUBLE) FROM e GROUP BY event_type
           UNION ALL
           SELECT 'events_hist_bucket', event_type, '1000',
                  CAST(COUNT(*) FILTER (WHERE v <= 1000) AS DOUBLE) FROM e GROUP BY event_type
           UNION ALL
           SELECT 'events_hist_bucket', event_type, 'inf',
                  CAST(COUNT(*) AS DOUBLE) FROM e GROUP BY event_type
           UNION ALL
           SELECT 'events_hist_count', event_type, '',
                  CAST(COUNT(*) AS DOUBLE) FROM e GROUP BY event_type
           UNION ALL
           SELECT 'events_hist_sum', event_type, '',
                  CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) FROM e GROUP BY event_type
         ) ORDER BY metric, type, le"""
  )
}
