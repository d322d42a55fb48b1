package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import ProtoWire.{Reader, Writer}

/** OTLP logs ingest: ExportLogsServiceRequest protobuf → one row per
  * LogRecord in the reference's identity schema
  * (`servers/src/otlp/logs.rs:199-313` build_otlp_logs_identity_schema,
  * `logs.rs:405-465` build_otlp_build_in_row):
  *
  *   - ts = time_unix_nano, falling back to observed_time_unix_nano when 0
  *   - trace/span ids → lowercase hex strings
  *   - body: string values verbatim, other AnyValue kinds JSON-rendered
  *     (`logs.rs:1053` log_body_to_string); absent body → null
  *   - log/scope/resource attributes → jsonb text with SORTED keys (the
  *     reference's jsonb object is a BTreeMap)
  *   - scope_name is a tag in the reference; absent scope fields → null
  */
object OtlpLogs {

  // ---- input model (encode side) ----------------------------------------
  final case class LogIn(tsNano: Long, observedNano: Long = 0L,
                         severityNumber: Int = 0, severityText: String = "",
                         body: Option[String] = None,
                         attrs: Seq[(String, String)] = Nil, flags: Long = 0L,
                         traceId: Array[Byte] = Array.emptyByteArray,
                         spanId: Array[Byte] = Array.emptyByteArray)
  final case class ScopeLogsIn(scopeName: String, scopeVersion: String,
                               scopeAttrs: Seq[(String, String)],
                               schemaUrl: String, logs: Seq[LogIn])
  final case class ResourceLogsIn(resourceAttrs: Seq[(String, String)],
                                  schemaUrl: String, scopes: Seq[ScopeLogsIn])

  // ---- output row --------------------------------------------------------
  final case class LogRow(
      ts_ns: Long, trace_id: String, span_id: String,
      severity_text: String, severity_number: Int, body: String,
      log_attributes: String, trace_flags: Long,
      scope_name: String, scope_version: String, scope_attributes: String,
      scope_schema_url: String, resource_attributes: String,
      resource_schema_url: String)

  // ---- encode ------------------------------------------------------------
  private def writeAttrs(w: Writer, field: Int, attrs: Seq[(String, String)]): Unit =
    attrs.foreach { case (k, v) =>
      w.message(field) { kv => kv.string(1, k); kv.message(2)(_.string(1, v)) }
    }

  def encodeRequest(resources: Seq[ResourceLogsIn]): Array[Byte] = {
    val w = new Writer
    resources.foreach { res =>
      w.message(1) { rl =>                          // ResourceLogs
        rl.message(1)(writeAttrs(_, 1, res.resourceAttrs))
        res.scopes.foreach { sc =>
          rl.message(2) { sl =>                     // ScopeLogs
            sl.message(1) { is =>
              is.string(1, sc.scopeName); is.string(2, sc.scopeVersion)
              writeAttrs(is, 3, sc.scopeAttrs)
            }
            sc.logs.foreach { lg =>
              sl.message(2) { lr =>                 // LogRecord
                if (lg.tsNano != 0) lr.fixed64(1, lg.tsNano)
                if (lg.severityNumber != 0) lr.int(2, lg.severityNumber.toLong)
                if (lg.severityText.nonEmpty) lr.string(3, lg.severityText)
                lg.body.foreach(b => lr.message(5)(_.string(1, b)))
                writeAttrs(lr, 6, lg.attrs)
                if (lg.flags != 0) lr.fixed32(8, lg.flags.toInt)
                if (lg.traceId.nonEmpty) lr.bytes(9, lg.traceId)
                if (lg.spanId.nonEmpty) lr.bytes(10, lg.spanId)
                if (lg.observedNano != 0) lr.fixed64(11, lg.observedNano)
              }
            }
            if (sc.schemaUrl.nonEmpty) sl.string(3, sc.schemaUrl)
          }
        }
        if (res.schemaUrl.nonEmpty) rl.string(3, res.schemaUrl)
      }
    }
    w.result()
  }

  // ---- decode ------------------------------------------------------------
  import OtlpTrace.{hex, jsonStr, readAttr}

  /** jsonb object text: keys sorted (BTreeMap semantics in the reference). */
  private def jsonbAttrs(attrs: Seq[(String, String, String)]): String =
    attrs.sortBy(_._1).map { case (k, j, _) => s"${jsonStr(k)}:$j" }
      .mkString("{", ",", "}")

  def parseRequest(body: Array[Byte]): Seq[LogRow] = {
    val out = Vector.newBuilder[LogRow]
    val root = new Reader(body)
    while (root.hasNext) root.readTag() match {
      case (1, 2) =>                                 // ResourceLogs
        val rl = root.readMessage()
        var resAttrs = Vector.empty[(String, String, String)]
        var resUrl = ""
        val scopes = Vector.newBuilder[Reader]
        while (rl.hasNext) rl.readTag() match {
          case (1, 2) =>
            val res = rl.readMessage()
            while (res.hasNext) res.readTag() match {
              case (1, 2) => resAttrs ++= readAttr(res)
              case (_, w) => res.skip(w)
            }
          case (2, 2) => scopes += rl.readMessage()
          case (3, 2) => resUrl = rl.readString()
          case (_, w) => rl.skip(w)
        }
        val resJson = jsonbAttrs(resAttrs)
        scopes.result().foreach { sl =>
          var scopeName: String = null; var scopeVersion: String = null
          var scopeAttrs = Vector.empty[(String, String, String)]
          var scopeUrl = ""
          val logs = Vector.newBuilder[Reader]
          while (sl.hasNext) sl.readTag() match {
            case (1, 2) =>
              val is = sl.readMessage()
              while (is.hasNext) is.readTag() match {
                case (1, 2) => scopeName = is.readString()
                case (2, 2) => scopeVersion = is.readString()
                case (3, 2) => scopeAttrs ++= readAttr(is)
                case (_, w) => is.skip(w)
              }
            case (2, 2) => logs += sl.readMessage()
            case (3, 2) => scopeUrl = sl.readString()
            case (_, w) => sl.skip(w)
          }
          val scopeJson = jsonbAttrs(scopeAttrs)
          logs.result().foreach { lr =>
            var ts = 0L; var observed = 0L; var sevNum = 0; var sevText = ""
            var bodyStr: String = null; var flags = 0L
            var traceId = Array.emptyByteArray; var spanId = Array.emptyByteArray
            var attrs = Vector.empty[(String, String, String)]
            while (lr.hasNext) lr.readTag() match {
              case (1, 1) => ts = lr.readFixed64()
              case (2, 0) => sevNum = lr.readVarint().toInt
              case (3, 2) => sevText = lr.readString()
              case (5, 2) =>
                // body AnyValue: string verbatim, scalars rendered
                val av = lr.readMessage()
                while (av.hasNext) av.readTag() match {
                  case (1, 2) => bodyStr = av.readString()
                  case (2, 0) => bodyStr = (av.readVarint() != 0).toString
                  case (3, 0) => bodyStr = av.readVarint().toString
                  case (4, 1) => bodyStr = av.readDouble().toString
                  case (_, w) => av.skip(w)
                }
              case (6, 2) => attrs ++= readAttr(lr)
              case (8, 5) => flags = lr.readFixed32().toLong & 0xffffffffL
              case (9, 2) => traceId = lr.readBytes()
              case (10, 2) => spanId = lr.readBytes()
              case (11, 1) => observed = lr.readFixed64()
              case (_, w) => lr.skip(w)
            }
            out += LogRow(
              ts_ns = if (ts != 0) ts else observed,
              trace_id = hex(traceId), span_id = hex(spanId),
              severity_text = sevText, severity_number = sevNum,
              body = bodyStr, log_attributes = jsonbAttrs(attrs),
              trace_flags = flags,
              scope_name = scopeName, scope_version = scopeVersion,
              scope_attributes = scopeJson, scope_schema_url = scopeUrl,
              resource_attributes = resJson, resource_schema_url = resUrl)
          }
        }
      case (_, w) => root.skip(w)
    }
    out.result()
  }

  /** Distributed ingest over a binary payload column. */
  def fromPayloads(df: DataFrame, bodyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Array[Byte]] = df.select(bodyCol).as[Array[Byte]]
    ds.flatMap(parseRequest(_)).toDF()
  }
}
