package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Protocol ingest decoders (SURVEY.md §2.1) — the write-path parsers
  * the reference exposes as HTTP/gRPC endpoints (servers/src/
  * influxdb.rs, opentsdb.rs). Each parser is a pure line → row
  * transform usable identically over a batch frame or a streaming
  * source (`readStream.format("socket"|"kafka")...`); the result feeds
  * the same row model the SQL INSERT path uses (tags → Tag columns,
  * fields → Field columns, timestamp → TIME INDEX).
  *
  * Not ported: protobuf-framed protocols (OTLP, Prometheus
  * remote-write) — the wire decoding is a codec concern; their row
  * payloads map onto the same (tags, ts, fields) shape below.
  */
object Protocols {

  /** One decoded sample line. Numeric/bool/string fields are kept in
    * separate maps so the pivot can type columns faithfully. */
  final case class Sample(
      measurement: String,
      tags: Map[String, String],
      fields_num: Map[String, Double],
      fields_str: Map[String, String],
      fields_bool: Map[String, Boolean],
      ts_ns: Long)

  // ---- InfluxDB line protocol ----------------------------------------

  /** Split on a separator outside quotes, honoring backslash escapes. */
  private def splitUnescaped(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0; var inQuotes = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur += c += s.charAt(i + 1); i += 2 }
      else {
        if (c == '"') inQuotes = !inQuotes
        if (c == sep && !inQuotes) { out += cur.result(); cur.clear() }
        else cur += c
        i += 1
      }
    }
    out += cur.result()
    out.result()
  }

  private def unescape(s: String): String =
    s.replace("\\,", ",").replace("\\ ", " ").replace("\\=", "=")
      .replace("\\\"", "\"").replace("\\\\", "\\")

  /** Parse one line of InfluxDB line protocol:
    * `measurement[,tag=v...] field=value[,field=value...] [timestamp_ns]`.
    * Returns null for comments/blank/garbage lines (callers drop them).
    */
  def parseInfluxLine(line: String, defaultTsNs: Long): Option[Sample] = {
    if (line == null) return None
    val trimmed = line.trim
    if (trimmed.isEmpty || trimmed.startsWith("#")) return None
    try {
      val parts = splitUnescaped(trimmed, ' ').filter(_.nonEmpty)
      if (parts.size < 2) return None
      val head = splitUnescaped(parts(0), ',')
      val measurement = unescape(head.head)
      val tags = head.tail.map { t =>
        val Array(k, v) = splitUnescaped(t, '=').toArray
        unescape(k) -> unescape(v)
      }.toMap
      val num = Map.newBuilder[String, Double]
      val str = Map.newBuilder[String, String]
      val bool = Map.newBuilder[String, Boolean]
      splitUnescaped(parts(1), ',').foreach { f =>
        val eq = f.indexOf('=')
        val k = unescape(f.substring(0, eq))
        val v = f.substring(eq + 1)
        if (v.startsWith("\"")) str += k -> unescape(v.substring(1, v.length - 1))
        else if (v == "t" || v == "T" || v == "true" || v == "True" || v == "TRUE")
          bool += k -> true
        else if (v == "f" || v == "F" || v == "false" || v == "False" || v == "FALSE")
          bool += k -> false
        else if (v.endsWith("i") || v.endsWith("u"))
          num += k -> v.dropRight(1).toDouble
        else num += k -> v.toDouble
      }
      val ts = if (parts.size >= 3) parts(2).toLong else defaultTsNs
      Some(Sample(measurement, tags, num.result(), str.result(), bool.result(), ts))
    } catch { case _: Exception => None }
  }

  /** Lines frame (one string column) → decoded samples. Malformed lines
    * are dropped, matching the reference's per-line error accounting. */
  def fromInfluxLines(df: DataFrame, lineCol: String,
      defaultTsNs: Long = 0L): DataFrame = {
    val parse = udf((s: String) => parseInfluxLine(s, defaultTsNs))
    df.select(parse(col(lineCol)).as("r")).filter(col("r").isNotNull).select("r.*")
  }

  // ---- OpenTSDB `put` ------------------------------------------------

  /** `put <metric> <ts_s_or_ms> <value> tag=v [tag=v...]`
    * (servers/src/opentsdb.rs codec). */
  def fromOpenTsdbLines(df: DataFrame, lineCol: String): DataFrame = {
    val parse = udf { (s: String) =>
      if (s == null) None
      else {
        val p = s.trim.split("\\s+")
        if (p.length < 4 || p(0) != "put") None
        else try {
          val tsRaw = p(2).toLong
          // heuristic from the reference: 13+ digits = ms, else seconds
          val tsNs = if (tsRaw >= 1000000000000L) tsRaw * 1000000L
                     else tsRaw * 1000000000L
          val tags = p.drop(4).map { t =>
            val Array(k, v) = t.split("=", 2); k -> v
          }.toMap
          Some(Sample(p(1), tags, Map("value" -> p(3).toDouble),
            Map.empty[String, String], Map.empty[String, Boolean], tsNs))
        } catch { case _: Exception => None }
      }
    }
    df.select(parse(col(lineCol)).as("r"))
      .filter(col("r").isNotNull).select("r.*")
  }

  // ---- pivot to the table model --------------------------------------

  /** Decoded samples of ONE measurement → a wide table: tag columns +
    * typed field columns + `ts` (ns). Column sets are discovered from
    * the data (the reference auto-creates/alters the schema on write —
    * operator/src/insert.rs). Two passes: a cheap distinct-keys scan,
    * then one projection — no per-row schema negotiation. */
  def pivotMeasurement(samples: DataFrame, measurement: String): DataFrame = {
    val m = samples.filter(col("measurement") === measurement)
    // one aggregation job discovers all four key sets (a per-map
    // distinct would rescan — and reparse — the input four times)
    def keySet(mapCol: String) =
      array_sort(array_distinct(flatten(collect_list(map_keys(col(mapCol))))))
    val ks = m.select(keySet("tags"), keySet("fields_num"),
      keySet("fields_str"), keySet("fields_bool")).head()
    def names(i: Int): Seq[String] = ks.getSeq[String](i)
    val cols =
      names(0).map(k => col("tags").getItem(k).as(k)) ++
      names(1).map(k => col("fields_num").getItem(k).as(k)) ++
      names(2).map(k => col("fields_str").getItem(k).as(k)) ++
      names(3).map(k => col("fields_bool").getItem(k).as(k))
    m.select(cols :+ col("ts_ns").as("ts"): _*)
  }
}
