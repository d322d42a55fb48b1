package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import ProtoWire.{Reader, Writer}

/** OTLP traces ingest: ExportTraceServiceRequest protobuf → one row per
  * span, following the reference's v1 trace-table mapping
  * (`servers/src/otlp/trace/span.rs:205-241` parse_span,
  * `servers/src/otlp/trace/v1.rs:339-465` write_span_to_row):
  *
  *   - trace/span/parent ids → lowercase hex strings (parent empty → null)
  *   - span kind / status code → prost enum names (`SPAN_KIND_*`,
  *     `STATUS_CODE_*`; absent status → ("",""))
  *   - service_name tag ← resource attribute `service.name`
  *   - span/scope/resource attributes kept as map columns (the reference
  *     flattens them into `span_attributes.<k>` dynamic columns; a map is
  *     the schema-stable Spark equivalent of the same key space)
  *   - events/links → JSON text columns with the reference's serde shape
  *     (event time as `%Y-%m-%d %H:%M:%S%.f%z` UTC, span.rs:153)
  *   - ts = start_time_unix_nano (time index), duration_nano = end - start
  */
object OtlpTrace {

  /** prost enum accessor falls back to the default variant on unknown
    * wire values (span.rs:212 span.kind()). */
  private val KindNames = Array("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
    "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER")
  private val StatusNames = Array("STATUS_CODE_UNSET", "STATUS_CODE_OK", "STATUS_CODE_ERROR")
  private def kindName(k: Int) = KindNames(if (k >= 0 && k < KindNames.length) k else 0)
  private def statusName(c: Int) = StatusNames(if (c >= 0 && c < StatusNames.length) c else 0)

  // ---- input model (encode side: test traffic generator / exporter) ----
  final case class EventIn(name: String, tsNano: Long, attrs: Seq[(String, String)] = Nil)
  final case class LinkIn(traceId: Array[Byte], spanId: Array[Byte],
                          traceState: String = "", attrs: Seq[(String, String)] = Nil)
  final case class SpanIn(traceId: Array[Byte], spanId: Array[Byte],
                          parentSpanId: Array[Byte], name: String, kind: Int,
                          startNano: Long, endNano: Long,
                          attrs: Seq[(String, String)] = Nil,
                          events: Seq[EventIn] = Nil, links: Seq[LinkIn] = Nil,
                          statusCode: Int = -1, statusMessage: String = "",
                          traceState: String = "")
  final case class ScopeSpansIn(scopeName: String, scopeVersion: String,
                                scopeAttrs: Seq[(String, String)], spans: Seq[SpanIn])
  final case class ResourceSpansIn(resourceAttrs: Seq[(String, String)],
                                   scopes: Seq[ScopeSpansIn])

  // ---- output row (decode side) ----------------------------------------
  final case class SpanRow(
      service_name: String, trace_id: String, span_id: String, parent_span_id: String,
      span_kind: String, span_name: String,
      span_status_code: String, span_status_message: String,
      trace_state: String, scope_name: String, scope_version: String,
      ts_ns: Long, ts_end_ns: Long, duration_nano: Long,
      span_attributes: Map[String, String], scope_attributes: Map[String, String],
      resource_attributes: Map[String, String],
      span_events: String, span_links: String)

  // ---- encode -----------------------------------------------------------
  private def writeAttrs(w: Writer, field: Int, attrs: Seq[(String, String)]): Unit =
    attrs.foreach { case (k, v) =>
      w.message(field) { kv => kv.string(1, k); kv.message(2)(_.string(1, v)) }
    }

  def encodeRequest(resources: Seq[ResourceSpansIn]): Array[Byte] = {
    val w = new Writer
    resources.foreach { res =>
      w.message(1) { rs =>                       // ResourceSpans
        rs.message(1)(writeAttrs(_, 1, res.resourceAttrs)) // Resource.attributes
        res.scopes.foreach { sc =>
          rs.message(2) { ss =>                  // ScopeSpans
            ss.message(1) { is =>                // InstrumentationScope
              is.string(1, sc.scopeName); is.string(2, sc.scopeVersion)
              writeAttrs(is, 3, sc.scopeAttrs)
            }
            sc.spans.foreach { sp =>
              ss.message(2) { s =>               // Span
                s.bytes(1, sp.traceId); s.bytes(2, sp.spanId)
                if (sp.traceState.nonEmpty) s.string(3, sp.traceState)
                if (sp.parentSpanId != null && sp.parentSpanId.nonEmpty)
                  s.bytes(4, sp.parentSpanId)
                s.string(5, sp.name); s.int(6, sp.kind.toLong)
                s.fixed64(7, sp.startNano); s.fixed64(8, sp.endNano)
                writeAttrs(s, 9, sp.attrs)
                sp.events.foreach { e =>
                  s.message(11) { ew =>
                    ew.fixed64(1, e.tsNano); ew.string(2, e.name)
                    writeAttrs(ew, 3, e.attrs)
                  }
                }
                sp.links.foreach { l =>
                  s.message(13) { lw =>
                    lw.bytes(1, l.traceId); lw.bytes(2, l.spanId)
                    if (l.traceState.nonEmpty) lw.string(3, l.traceState)
                    writeAttrs(lw, 4, l.attrs)
                  }
                }
                if (sp.statusCode >= 0) s.message(15) { st =>
                  if (sp.statusMessage.nonEmpty) st.string(2, sp.statusMessage)
                  st.int(3, sp.statusCode.toLong)
                }
              }
            }
          }
        }
      }
    }
    w.result()
  }

  // ---- decode -----------------------------------------------------------
  private[ingest] def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** KeyValue list entry as (key, json-rendered value, string value): the
    * json rendering feeds the events/links columns (typed, reference serde
    * shape), the string value feeds the map columns. */
  private[ingest] def readAttr(r: Reader): Option[(String, String, String)] = {
    val kv = r.readMessage()
    var k: String = null; var json = "null"; var s = ""
    while (kv.hasNext) kv.readTag() match {
      case (1, 2) => k = kv.readString()
      case (2, 2) =>
        val av = kv.readMessage()
        while (av.hasNext) av.readTag() match {
          case (1, 2) => s = av.readString(); json = jsonStr(s)
          case (2, 0) => s = (av.readVarint() != 0).toString; json = s
          case (3, 0) => s = av.readVarint().toString; json = s
          case (4, 1) => val d = av.readDouble(); s = d.toString; json = renderDouble(d)
          case (_, w) => av.skip(w)
        }
      case (_, w) => kv.skip(w)
    }
    if (k == null) None else Some((k, json, s))
  }

  private def renderDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  private[ingest] def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private[ingest] def attrsJson(attrs: Seq[(String, String, String)]): String =
    attrs.map { case (k, j, _) => s"${jsonStr(k)}:$j" }.mkString("{", ",", "}")

  /** chrono `%Y-%m-%d %H:%M:%S%.f%z` in UTC: `%.f` prints the shortest of
    * 3/6/9 fractional digits, nothing when the fraction is zero. */
  private[graft] def isoNano(ns: Long): String = {
    val sec = Math.floorDiv(ns, 1000000000L)
    val frac = Math.floorMod(ns, 1000000000L)
    val t = java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)
    val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    val fracStr =
      if (frac == 0) ""
      else if (frac % 1000000 == 0) f".${frac / 1000000}%03d"
      else if (frac % 1000 == 0) f".${frac / 1000}%06d"
      else f".$frac%09d"
    s"$base$fracStr+0000"
  }

  private final case class RawEvent(name: String, tsNano: Long, attrs: Seq[(String, String, String)])
  private final case class RawLink(traceId: String, spanId: String, traceState: String,
                                   attrs: Seq[(String, String, String)])

  private def eventJson(e: RawEvent): String =
    s"""{"name":${jsonStr(e.name)},"time":${jsonStr(isoNano(e.tsNano))},"attributes":${attrsJson(e.attrs)}}"""
  private def linkJson(l: RawLink): String =
    s"""{"trace_id":${jsonStr(l.traceId)},"span_id":${jsonStr(l.spanId)},""" +
      s""""trace_state":${jsonStr(l.traceState)},"attributes":${attrsJson(l.attrs)}}"""

  def parseRequest(body: Array[Byte]): Seq[SpanRow] = {
    val out = Vector.newBuilder[SpanRow]
    val root = new Reader(body)
    while (root.hasNext) root.readTag() match {
      case (1, 2) =>                                       // ResourceSpans
        val rs = root.readMessage()
        var resAttrs = Vector.empty[(String, String, String)]
        val scopes = Vector.newBuilder[Reader]
        // resource may follow scope_spans on the wire; buffer scope readers
        while (rs.hasNext) rs.readTag() match {
          case (1, 2) =>                                   // Resource
            val res = rs.readMessage()
            while (res.hasNext) res.readTag() match {
              case (1, 2) => resAttrs ++= readAttr(res)
              case (_, w) => res.skip(w)
            }
          case (2, 2) => scopes += rs.readMessage()        // ScopeSpans
          case (_, w) => rs.skip(w)
        }
        val serviceName = resAttrs.find(_._1 == "service.name").map(_._3).orNull
        val resMap = resAttrs.map(a => a._1 -> a._3).toMap
        scopes.result().foreach { ss =>
          var scopeName = ""; var scopeVersion = ""
          var scopeAttrs = Vector.empty[(String, String, String)]
          val spans = Vector.newBuilder[Reader]
          while (ss.hasNext) ss.readTag() match {
            case (1, 2) =>                                 // InstrumentationScope
              val is = ss.readMessage()
              while (is.hasNext) is.readTag() match {
                case (1, 2) => scopeName = is.readString()
                case (2, 2) => scopeVersion = is.readString()
                case (3, 2) => scopeAttrs ++= readAttr(is)
                case (_, w) => is.skip(w)
              }
            case (2, 2) => spans += ss.readMessage()       // Span
            case (_, w) => ss.skip(w)
          }
          val scopeMap = scopeAttrs.map(a => a._1 -> a._3).toMap
          spans.result().foreach { s =>
            var traceId = Array.emptyByteArray; var spanId = Array.emptyByteArray
            var parent = Array.emptyByteArray; var traceState = ""; var name = ""
            var kind = 0; var start = 0L; var end = 0L
            var attrs = Vector.empty[(String, String, String)]
            val events = Vector.newBuilder[RawEvent]
            val links = Vector.newBuilder[RawLink]
            var statusCode = -1; var statusMsg = ""
            while (s.hasNext) s.readTag() match {
              case (1, 2) => traceId = s.readBytes()
              case (2, 2) => spanId = s.readBytes()
              case (3, 2) => traceState = s.readString()
              case (4, 2) => parent = s.readBytes()
              case (5, 2) => name = s.readString()
              case (6, 0) => kind = s.readVarint().toInt
              case (7, 1) => start = s.readFixed64()
              case (8, 1) => end = s.readFixed64()
              case (9, 2) => attrs ++= readAttr(s)
              case (11, 2) =>
                val e = s.readMessage()
                var en = ""; var et = 0L
                var ea = Vector.empty[(String, String, String)]
                while (e.hasNext) e.readTag() match {
                  case (1, 1) => et = e.readFixed64()
                  case (2, 2) => en = e.readString()
                  case (3, 2) => ea ++= readAttr(e)
                  case (_, w) => e.skip(w)
                }
                events += RawEvent(en, et, ea)
              case (13, 2) =>
                val l = s.readMessage()
                var lt = Array.emptyByteArray; var lsp = Array.emptyByteArray
                var lst = ""; var la = Vector.empty[(String, String, String)]
                while (l.hasNext) l.readTag() match {
                  case (1, 2) => lt = l.readBytes()
                  case (2, 2) => lsp = l.readBytes()
                  case (3, 2) => lst = l.readString()
                  case (4, 2) => la ++= readAttr(l)
                  case (_, w) => l.skip(w)
                }
                links += RawLink(hex(lt), hex(lsp), lst, la)
              case (15, 2) =>
                val st = s.readMessage()
                statusCode = 0
                while (st.hasNext) st.readTag() match {
                  case (2, 2) => statusMsg = st.readString()
                  case (3, 0) => statusCode = st.readVarint().toInt
                  case (_, w) => st.skip(w)
                }
              case (_, w) => s.skip(w)
            }
            val (code, msg) =
              if (statusCode < 0) ("", "") else (statusName(statusCode), statusMsg)
            out += SpanRow(
              service_name = serviceName,
              trace_id = hex(traceId), span_id = hex(spanId),
              parent_span_id = if (parent.isEmpty) null else hex(parent),
              span_kind = kindName(kind), span_name = name,
              span_status_code = code, span_status_message = msg,
              trace_state = traceState,
              scope_name = scopeName, scope_version = scopeVersion,
              ts_ns = start, ts_end_ns = end, duration_nano = end - start,
              span_attributes = attrs.map(a => a._1 -> a._3).toMap,
              scope_attributes = scopeMap, resource_attributes = resMap,
              span_events = events.result().map(eventJson).mkString("[", ",", "]"),
              span_links = links.result().map(linkJson).mkString("[", ",", "]"))
          }
        }
      case (_, w) => root.skip(w)
    }
    out.result()
  }

  /** Distributed ingest over a binary payload column (executor-side
    * decode, nothing on the driver). */
  def fromPayloads(df: DataFrame, bodyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Array[Byte]] = df.select(bodyCol).as[Array[Byte]]
    ds.flatMap(parseRequest(_)).toDF()
  }
}
