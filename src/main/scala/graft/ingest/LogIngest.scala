package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Log-protocol ingest decoders: Loki JSON push and Elasticsearch `_bulk`
  * (reference `servers/src/http/loki.rs` and `servers/src/elasticsearch.rs`).
  * Both are payload → rows transforms over `mapPartitions` with one shared
  * Jackson mapper per partition; malformed payload items are dropped,
  * mirroring the reference's per-item error accounting.
  */
object LogIngest {

  /** Loki raw-ingest row model (loki.rs:62-95): timestamp, whole line,
    * labels as tags, structured metadata as one JSON column. */
  final case class LokiRow(
      labels: Map[String, String],
      ts_ns: Long,
      line: String,
      structured_metadata: String)

  /** ES bulk item: `_index` routes to the table; the document rides whole
    * (optionally narrowed to `msg_field`, elasticsearch.rs:385). */
  final case class EsRow(table: String, doc: String)

  /** Splunk HEC `/event` row (splunk.rs:215-277): `index` routes the table,
    * `time` is the timestamp, host/source/sourcetype + flattened `fields`
    * are tags, `event` + any remaining keys are data (kept as JSON text). */
  final case class HecRow(
      table: String,
      ts_ms: Long,
      tags: Map[String, String],
      event: String,
      extras: String)

  /** Splunk HEC `/raw` row (splunk.rs:102-145): verbatim segment text as
    * `message`, request-level host/source/sourcetype as tags. */
  final case class HecRawRow(ts_ms: Long, message: String, tags: Map[String, String])

  /** `{"streams":[{"stream":{labels},"values":[["<ts_ns>","line",{meta}?],..]}]}` */
  def fromLokiPush(df: DataFrame, jsonCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(jsonCol).cast("string")).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { payload =>
        val parsed =
          try Option(mapper.readTree(payload))
          catch { case _: Exception => None }
        parsed.toSeq.flatMap { root =>
          val streams = root.path("streams")
          if (!streams.isArray) Seq.empty
          else {
            import scala.jdk.CollectionConverters._
            streams.elements.asScala.flatMap { s =>
              val labels = {
                val st = s.path("stream")
                if (!st.isObject) Map.empty[String, String]
                else st.fieldNames.asScala
                  .map(n => n -> st.get(n).asText).toMap
              }
              s.path("values").elements.asScala.flatMap { v =>
                if (!v.isArray || v.size < 2) None
                else {
                  val ts =
                    try Some(v.get(0).asText.toLong)
                    catch { case _: NumberFormatException => None }
                  ts.map { t =>
                    val meta =
                      if (v.size >= 3 && v.get(2).isObject) v.get(2).toString else null
                    LokiRow(labels, t, v.get(1).asText, meta)
                  }
                }
              }
            }.toSeq
          }
        }
      }
    }.toDF()
  }

  /** HEC `time`: epoch seconds (optionally fractional); values past 1e12 are
    * read as milliseconds (splunk.rs:161-183). Returns millis, or None. */
  private def parseHecTimeMs(n: JsonNode): Option[Long] = {
    val v: Option[Double] = n match {
      case _ if n.isNumber => Some(n.asDouble)
      case _ if n.isTextual =>
        try Some(n.asText.trim.toDouble) catch { case _: NumberFormatException => None }
      case _ => None
    }
    v.filter(d => !d.isNaN && !d.isInfinite).map { d =>
      if (d >= 1e12) d.toLong else math.floor(d * 1000.0).toLong
    }
  }

  /** Table-name sanitization (splunk.rs:303-332): keep `[A-Za-z0-9_:\-.@#]`,
    * map the rest to `_`, force a legal first char. */
  private def sanitizeIndex(raw: String): Option[String] = {
    val t = raw.trim
    if (t.isEmpty) None
    else {
      val body = t.map(c =>
        if (c.isLetterOrDigit && c <= 0x7f || "_:-.@#".contains(c)) c else '_')
      val firstOk = body.headOption.exists(c =>
        (c.isLetter && c <= 0x7f) || c == '_' || c == ':' || c == '-')
      Some(if (firstOk) body else "_" + body)
    }
  }

  /** Splunk HEC `/services/collector/event` batch: JSON objects concatenated
    * with any/no separator, or one top-level array (splunk.rs:153-158).
    * Per-event validation mirrors the reference: non-object events and
    * events with a missing/blank `event` field or an unparseable non-null
    * `time` are dropped (codes 12/13/6). `defaultTsMs` stands in for the
    * reference's ingest-time fallback (deterministic in tests). */
  def fromSplunkHec(df: DataFrame, jsonCol: String,
      queryTable: Option[String] = None,
      defaultTsMs: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(jsonCol).cast("string")).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper()
      import scala.jdk.CollectionConverters._
      it.flatMap { payload =>
        val values =
          try {
            val reader = mapper.readerFor(classOf[JsonNode]).readValues[JsonNode](payload)
            val buf = scala.collection.mutable.ArrayBuffer[JsonNode]()
            while (reader.hasNext) buf += reader.next()
            // a top-level array is one batch: flatten it
            buf.toSeq.flatMap(n => if (n.isArray) n.elements.asScala.toSeq else Seq(n))
          } catch { case _: Exception => Seq.empty[JsonNode] }
        values.flatMap { ev =>
          if (!ev.isObject) None
          else {
            val eventNode = Option(ev.get("event"))
            val blank = eventNode.forall(e =>
              e.isNull || (e.isTextual && e.asText.trim.isEmpty))
            val timeNode = Option(ev.get("time")).filterNot(_.isNull)
            val badTime = timeNode.exists(parseHecTimeMs(_).isEmpty)
            if (blank || badTime) None // codes 12/13/6: reject the event
            else {
              val ts = timeNode.flatMap(parseHecTimeMs).getOrElse(defaultTsMs)
              val table = Option(ev.get("index")).filter(_.isTextual)
                .flatMap(n => sanitizeIndex(n.asText))
                .orElse(queryTable).getOrElse("splunk_logs")
              val tags = scala.collection.mutable.LinkedHashMap[String, String]()
              Option(ev.get("fields")).filter(_.isObject).foreach { f =>
                f.fieldNames.asScala.foreach { k =>
                  val v = f.get(k)
                  tags(k) = if (v.isTextual) v.asText else v.toString
                }
              }
              Seq("host", "source", "sourcetype").foreach { k =>
                Option(ev.get(k)).filterNot(_.isNull).foreach { v =>
                  tags(k) = if (v.isTextual) v.asText else v.toString
                }
              }
              val consumed = Set("time", "index", "fields", "event",
                "host", "source", "sourcetype")
              val extras = ev.fieldNames.asScala.filterNot(consumed)
                .map(k => s""""$k":${ev.get(k).toString}""").mkString("{", ",", "}")
              val eText = eventNode.map(e =>
                if (e.isTextual) e.asText else e.toString).get
              Some(HecRow(table, ts, tags.toMap, eText, extras))
            }
          }
        }
      }
    }.toDF()
  }

  /** Splunk HEC `/services/collector/raw`: without `linebreaker` the whole
    * body is ONE event; with it, split on the literal delimiter and drop
    * whitespace-only segments (splunk.rs:85-100). Request-level metadata
    * becomes tags on every row. */
  def fromSplunkRaw(df: DataFrame, bodyCol: String,
      linebreaker: Option[String] = None,
      metadata: Map[String, String] = Map.empty,
      tsMs: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val meta = metadata.filter { case (k, _) =>
      k == "host" || k == "source" || k == "sourcetype" }
    df.select(col(bodyCol).cast("string")).as[String].mapPartitions { it =>
      it.flatMap { body =>
        val segments = linebreaker.filter(_.nonEmpty) match {
          case Some(lb) => body.split(java.util.regex.Pattern.quote(lb), -1)
            .toSeq.filter(_.trim.nonEmpty)
          case None => if (body.trim.isEmpty) Seq.empty else Seq(body)
        }
        segments.map(s => HecRawRow(tsMs, s, meta))
      }
    }.toDF()
  }

  /** Elasticsearch `_bulk` NDJSON: alternating command ({"create"/"index":
    * {"_index": t}}) and document objects (whitespace-separated JSON values,
    * like the reference's streaming serde read). */
  def fromEsBulk(df: DataFrame, ndjsonCol: String,
      indexFromUrl: Option[String] = None,
      msgField: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(ndjsonCol).cast("string")).as[String].mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { payload =>
        val docs =
          try {
            val reader = mapper.readerFor(classOf[JsonNode]).readValues[JsonNode](payload)
            val buf = scala.collection.mutable.ArrayBuffer[JsonNode]()
            while (reader.hasNext) buf += reader.next()
            buf.toSeq
          } catch { case _: Exception => Seq.empty[JsonNode] }
        docs.grouped(2).flatMap {
          case Seq(cmd, doc) =>
            val action =
              if (cmd.has("create")) Some(cmd.get("create"))
              else if (cmd.has("index")) Some(cmd.get("index"))
              else None
            action.flatMap { a =>
              val idx = Option(a.get("_index")).filter(_.isTextual).map(_.asText)
                .orElse(indexFromUrl)
              idx.map { table =>
                val value = msgField match {
                  case Some(f) if doc.isObject && doc.has(f) =>
                    val m = doc.get(f)
                    if (m.isTextual) {
                      try {
                        val inner = mapper.readTree(m.asText)
                        if (inner.isObject || inner.isArray) inner.toString
                        else s"""{"$f":${m.toString}}"""
                      } catch { case _: Exception => s"""{"$f":${m.toString}}""" }
                    } else s"""{"$f":${m.toString}}"""
                  case _ => doc.toString
                }
                EsRow(table, value)
              }
            }
          case _ => None // trailing command without a document
        }
      }
    }.toDF()
  }
}
