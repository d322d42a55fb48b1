package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.xerial.snappy.Snappy

/** Prometheus remote-write ingest: snappy-compressed protobuf
  * `WriteRequest` payloads → the narrow sample model
  * (metric, labels, ts_ms, value), matching the reference's row mapping
  * (`servers/src/prom_store.rs:460-548`: `__name__` label selects the
  * table, remaining labels are tags, `greptime_value` f64 field,
  * `greptime_timestamp` in milliseconds; snappy decompress at
  * `prom_store.rs:549`).
  *
  * Wire schema (public prompb/remote.proto + types.proto):
  *   WriteRequest { repeated TimeSeries timeseries = 1 }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2 }
  *   Label        { string name = 1; string value = 2 }
  *   Sample       { double value = 1; int64 timestamp = 2 }  // ms
  */
object PromRemoteWrite {

  final case class Series(labels: Map[String, String], samples: Seq[(Long, Double)])
  final case class SampleRow(metric: String, labels: Map[String, String], ts_ms: Long, value: Double)

  val NameLabel = "__name__"

  // ---- encode (test traffic generator; also a valid remote-write client) --
  def encodeWriteRequest(series: Seq[Series]): Array[Byte] = {
    val w = new ProtoWire.Writer
    series.foreach { ts =>
      w.message(1) { tw =>
        ts.labels.toSeq.sortBy(_._1).foreach { case (n, v) =>
          tw.message(1) { lw => lw.string(1, n); lw.string(2, v) }
        }
        ts.samples.foreach { case (t, v) =>
          tw.message(2) { sw => sw.double(1, v); sw.int(2, t) }
        }
      }
    }
    w.result()
  }

  def compress(raw: Array[Byte]): Array[Byte] = Snappy.compress(raw)

  // ---- decode ----------------------------------------------------------
  def parseWriteRequest(body: Array[Byte], snappyCompressed: Boolean = true): Seq[Series] = {
    val raw = if (snappyCompressed) Snappy.uncompress(body) else body
    val r = new ProtoWire.Reader(raw)
    val out = Vector.newBuilder[Series]
    while (r.hasNext) {
      val (field, wire) = r.readTag()
      if (field == 1 && wire == 2) {
        val tr = r.readMessage()
        val labels = Map.newBuilder[String, String]
        val samples = Vector.newBuilder[(Long, Double)]
        while (tr.hasNext) {
          val (f, w2) = tr.readTag()
          (f, w2) match {
            case (1, 2) =>
              val lr = tr.readMessage()
              var n = ""; var v = ""
              while (lr.hasNext) lr.readTag() match {
                case (1, 2) => n = lr.readString()
                case (2, 2) => v = lr.readString()
                case (_, ww) => lr.skip(ww)
              }
              labels += n -> v
            case (2, 2) =>
              val sr = tr.readMessage()
              var value = 0.0; var t = 0L
              while (sr.hasNext) sr.readTag() match {
                case (1, 1) => value = sr.readDouble()
                case (2, 0) => t = sr.readVarint()
                case (_, ww) => sr.skip(ww)
              }
              samples += ((t, value))
            case (_, ww) => tr.skip(ww)
          }
        }
        out += Series(labels.result(), samples.result())
      } else r.skip(wire)
    }
    out.result()
  }

  /** Distributed ingest: a DataFrame with one binary remote-write body per
    * row → narrow samples. Decoding runs per-partition on executors; at
    * 100 TB the payload column arrives pre-partitioned from the receiver
    * (Kafka / file source) and nothing is collected to the driver. */
  def fromPayloads(df: DataFrame, bodyCol: String, snappyCompressed: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Array[Byte]] = df.select(bodyCol).as[Array[Byte]]
    ds.flatMap { body =>
      parseWriteRequest(body, snappyCompressed).flatMap { s =>
        val metric = s.labels.getOrElse(NameLabel, "")
        val tags = s.labels - NameLabel
        s.samples.map { case (t, v) => SampleRow(metric, tags, t, v) }
      }
    }.toDF()
  }
}
