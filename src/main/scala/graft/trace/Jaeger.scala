package graft.trace

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jaeger HTTP query API over the OTLP span table, mirroring the
  * reference's DataFusion plans (`frontend/src/instance/jaeger.rs`):
  *
  *   - get_services: SELECT DISTINCT service_name           (jaeger.rs:80)
  *   - get_operations: distinct (span_name, span_kind) for a service,
  *     optional kind filter, span_name ASC, limit 2000      (jaeger.rs:97-143)
  *   - get_trace: spans of one trace id, ts DESC            (jaeger.rs:145-190)
  *   - find_traces: two-phase — DISTINCT trace_id under the filters
  *     (service/operation/time/duration/tags, limit 2000), then all spans
  *     of those traces                                      (jaeger.rs:194-321)
  *
  * Tag filters follow flatten_tag_filters (jaeger.rs:626-670): `error:true`
  * matches span_status_code = STATUS_CODE_ERROR, anything else matches the
  * span attribute with a resource-attribute fallback.
  *
  * Scale: the trace-id phase is a shuffle-free scan + partial-distinct with
  * an early limit; the span fetch broadcasts the bounded id set (≤ limit
  * ids) instead of shuffling the span table.
  */
object Jaeger {

  val DefaultLimit = 2000

  /** `SPAN_KIND_SERVER` → `server` (HTTP layer rendering, http/jaeger.rs). */
  def normalizeSpanKind(k: Column): Column =
    lower(regexp_replace(k, "^SPAN_KIND_", ""))

  def getServices(spans: DataFrame): DataFrame =
    spans.select(col("service_name")).where(col("service_name").isNotNull).distinct()
      .orderBy(col("service_name"))

  def getOperations(spans: DataFrame, serviceName: String,
                    spanKind: Option[String] = None,
                    limit: Int = DefaultLimit): DataFrame = {
    var df = spans.where(col("service_name") === serviceName)
    spanKind.foreach { k =>
      df = df.where(col("span_kind") === s"SPAN_KIND_${k.toUpperCase(java.util.Locale.ROOT)}")
    }
    df.select(col("span_name"), col("span_kind")).distinct()
      .orderBy(col("span_name")).limit(limit)
      .withColumn("span_kind", normalizeSpanKind(col("span_kind")))
  }

  def getTrace(spans: DataFrame, traceId: String,
               startTimeNs: Option[Long] = None,
               endTimeNs: Option[Long] = None): DataFrame = {
    var df = spans.where(col("trace_id") === traceId)
    startTimeNs.foreach(t => df = df.where(col("ts_ns") >= t))
    endTimeNs.foreach(t => df = df.where(col("ts_ns") <= t))
    df.orderBy(col("ts_ns").desc)
  }

  final case class TraceQuery(
      serviceName: String,
      operationName: Option[String] = None,
      startTimeNs: Option[Long] = None,
      endTimeNs: Option[Long] = None,
      minDurationNs: Option[Long] = None,
      maxDurationNs: Option[Long] = None,
      tags: Map[String, String] = Map.empty,
      limit: Option[Int] = None)

  private def filtersOf(q: TraceQuery): Column = {
    var f = col("service_name") === q.serviceName
    q.operationName.foreach(o => f = f && col("span_name") === o)
    q.startTimeNs.foreach(t => f = f && col("ts_ns") >= t)
    q.endTimeNs.foreach(t => f = f && col("ts_ns") <= t)
    q.minDurationNs.foreach(d => f = f && col("duration_nano") >= d)
    q.maxDurationNs.foreach(d => f = f && col("duration_nano") <= d)
    q.tags.foreach { case (k, v) =>
      f = f && (if (k == "error" && v == "true")
        col("span_status_code") === "STATUS_CODE_ERROR"
      else coalesce(element_at(col("span_attributes"), k),
        element_at(col("resource_attributes"), k)) === v)
    }
    f
  }

  /** Matching trace ids only (phase 1 of find_traces). */
  def findTraceIds(spans: DataFrame, q: TraceQuery): DataFrame =
    spans.where(filtersOf(q)).select(col("trace_id")).distinct()
      .limit(q.limit.getOrElse(DefaultLimit))

  /** All spans of every matching trace (phase 2 joins the bounded id set
    * back — broadcast, no span-table shuffle). Time bounds re-apply to the
    * span fetch like the reference's second query. */
  def findTraces(spans: DataFrame, q: TraceQuery): DataFrame = {
    val ids = findTraceIds(spans, q)
    var df = spans.join(broadcast(ids), Seq("trace_id"), "left_semi")
    q.startTimeNs.foreach(t => df = df.where(col("ts_ns") >= t))
    q.endTimeNs.foreach(t => df = df.where(col("ts_ns") <= t))
    df.orderBy(col("ts_ns").desc)
  }
}
