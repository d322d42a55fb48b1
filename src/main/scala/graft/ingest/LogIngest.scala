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
