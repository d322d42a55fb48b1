package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}

/** OTLP metrics ingest: protobuf `ExportMetricsServiceRequest` payloads →
  * the narrow sample model, following the reference's table mapping
  * (`servers/src/otlp/metrics.rs`):
  *   - gauge/sum   → table `name`, f64 value            (metrics.rs:532-604)
  *   - histogram   → `name_bucket` rows with a `le` tag holding the bucket
  *     upper bound ("inf" for the overflow bucket) and CUMULATIVE counts,
  *     plus `name_sum` / `name_count`                    (metrics.rs:600-717)
  *   - summary     → `name` rows with a `quantile` tag, plus `name_sum` /
  *     `name_count`                                      (metrics.rs:718-846)
  *   - data-point attributes become tags; time_unix_nano → milliseconds
  *     (metrics.rs:435-458)
  *
  * Wire schema is the public opentelemetry-proto metrics.proto; field
  * numbers inline below.
  */
object OtlpMetrics {
  import ProtoWire.{Reader, Writer}

  final case class DataPoint(attrs: Map[String, String], tsNano: Long, value: Double)
  final case class HistPoint(attrs: Map[String, String], tsNano: Long, count: Long,
                             sum: Option[Double], bucketCounts: Seq[Long], bounds: Seq[Double])
  final case class Metric(name: String, kind: String, // gauge | sum | histogram
                          points: Seq[DataPoint] = Nil, hist: Seq[HistPoint] = Nil)
  final case class SampleRow(metric: String, labels: Map[String, String], ts_ms: Long, value: Double)

  /** Rust `{}` Display for f64 tags (`le`, `quantile`): integral values
    * print without a fractional part, infinity prints "inf". */
  def f64Tag(v: Double): String =
    if (v.isPosInfinity) "inf"
    else if (v.isNegInfinity) "-inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  // ---- encode (test traffic generator / OTLP exporter) -----------------
  private def writeAttrs(w: Writer, field: Int, attrs: Map[String, String]): Unit =
    attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      w.message(field) { kv =>
        kv.string(1, k)                      // KeyValue.key
        kv.message(2)(_.string(1, v))        // KeyValue.value -> AnyValue.string_value
      }
    }

  private def writeNumberPoint(w: Writer, p: DataPoint): Unit = {
    w.fixed64(3, p.tsNano)                   // time_unix_nano
    w.double(4, p.value)                     // as_double
    writeAttrs(w, 7, p.attrs)                // attributes
  }

  def encodeRequest(metrics: Seq[Metric]): Array[Byte] = {
    val w = new Writer
    w.message(1) { rm =>                     // ResourceMetrics
      rm.message(2) { sm =>                  // ScopeMetrics
        metrics.foreach { m =>
          sm.message(2) { mw =>              // Metric
            mw.string(1, m.name)
            m.kind match {
              case "gauge" =>
                mw.message(5) { g => m.points.foreach(p => g.message(1)(writeNumberPoint(_, p))) }
              case "sum" =>
                mw.message(7) { s =>
                  m.points.foreach(p => s.message(1)(writeNumberPoint(_, p)))
                  s.int(2, 2L)               // aggregation_temporality = CUMULATIVE
                  s.int(3, 1L)               // is_monotonic
                }
              case "histogram" =>
                mw.message(9) { h =>
                  m.hist.foreach { p =>
                    h.message(1) { dp =>     // HistogramDataPoint
                      dp.fixed64(3, p.tsNano)
                      dp.fixed64(4, p.count)
                      p.sum.foreach(dp.double(5, _))
                      dp.packedFixed64(6, p.bucketCounts)
                      dp.packedDouble(7, p.bounds)
                      writeAttrs(dp, 9, p.attrs)
                    }
                  }
                  h.int(2, 2L)
                }
            }
          }
        }
      }
    }
    w.result()
  }

  // ---- decode ----------------------------------------------------------
  private def readAttrs(r: Reader): Map[String, String] = {
    // KeyValue { key=1, value=2 AnyValue{string=1,bool=2,int=3,double=4} }
    val kv = r.readMessage()
    var k: String = null; var v = ""
    while (kv.hasNext) kv.readTag() match {
      case (1, 2) => k = kv.readString()
      case (2, 2) =>
        val av = kv.readMessage()
        while (av.hasNext) av.readTag() match {
          case (1, 2) => v = av.readString()
          case (2, 0) => v = (av.readVarint() != 0).toString
          case (3, 0) => v = av.readVarint().toString
          case (4, 1) => v = av.readDouble().toString
          case (_, w) => av.skip(w)
        }
      case (_, w) => kv.skip(w)
    }
    // a KeyValue with no key field is dropped, not emitted as "" -> ""
    if (k == null) Map.empty else Map(k -> v)
  }

  private def readNumberPoint(r: Reader): DataPoint = {
    var attrs = Map.empty[String, String]; var ts = 0L; var value = 0.0
    while (r.hasNext) r.readTag() match {
      case (3, 1) => ts = r.readFixed64()
      case (4, 1) => value = r.readDouble()
      case (6, 1) => value = r.readFixed64().toDouble // as_int (sfixed64)
      case (7, 2) => attrs = attrs ++ readAttrs(r)
      case (_, w) => r.skip(w)
    }
    DataPoint(attrs, ts, value)
  }

  private def readHistPoint(r: Reader): HistPoint = {
    var attrs = Map.empty[String, String]; var ts = 0L; var count = 0L
    var sum: Option[Double] = None
    var buckets: Seq[Long] = Nil; var bounds: Seq[Double] = Nil
    while (r.hasNext) r.readTag() match {
      case (3, 1) => ts = r.readFixed64()
      case (4, 1) => count = r.readFixed64()
      case (5, 1) => sum = Some(r.readDouble())
      case (6, 2) => buckets = r.packedFixed64()
      case (6, 1) => buckets = buckets :+ r.readFixed64() // unpacked fallback
      case (7, 2) => bounds = r.packedDouble()
      case (7, 1) => bounds = bounds :+ r.readDouble()
      case (9, 2) => attrs = attrs ++ readAttrs(r)
      case (_, w) => r.skip(w)
    }
    HistPoint(attrs, ts, count, sum, buckets, bounds)
  }

  def parseRequest(body: Array[Byte]): Seq[Metric] = {
    val out = Vector.newBuilder[Metric]
    val root = new Reader(body)
    while (root.hasNext) root.readTag() match {
      case (1, 2) => // ResourceMetrics
        val rm = root.readMessage()
        while (rm.hasNext) rm.readTag() match {
          case (2, 2) => // ScopeMetrics
            val sm = rm.readMessage()
            while (sm.hasNext) sm.readTag() match {
              case (2, 2) => // Metric
                val mr = sm.readMessage()
                var name = ""
                var kind = ""
                val pts = Vector.newBuilder[DataPoint]
                val hps = Vector.newBuilder[HistPoint]
                while (mr.hasNext) mr.readTag() match {
                  case (1, 2) => name = mr.readString()
                  case (5, 2) | (7, 2) =>
                    kind = "number"
                    val g = mr.readMessage()
                    while (g.hasNext) g.readTag() match {
                      case (1, 2) => pts += readNumberPoint(g.readMessage())
                      case (_, w) => g.skip(w)
                    }
                  case (9, 2) =>
                    kind = "histogram"
                    val h = mr.readMessage()
                    while (h.hasNext) h.readTag() match {
                      case (1, 2) => hps += readHistPoint(h.readMessage())
                      case (_, w) => h.skip(w)
                    }
                  case (_, w) => mr.skip(w)
                }
                out += Metric(name, kind, pts.result(), hps.result())
              case (_, w) => sm.skip(w)
            }
          case (_, w) => rm.skip(w)
        }
      case (_, w) => root.skip(w)
    }
    out.result()
  }

  /** One parsed request → reference-shaped narrow rows (see object doc). */
  def toRows(metrics: Seq[Metric]): Seq[SampleRow] = metrics.flatMap { m =>
    m.kind match {
      case "histogram" => m.hist.flatMap { p =>
        val ms = p.tsNano / 1000000L
        var acc = 0L
        val bucketRows = p.bucketCounts.zipWithIndex.map { case (c, i) =>
          acc += c
          // exactly one `inf` bucket at index bounds.length; malformed
          // points with extra counts get rows with NO le tag (matching
          // the reference), not duplicate inf rows
          val tags =
            if (i < p.bounds.length) p.attrs + ("le" -> f64Tag(p.bounds(i)))
            else if (i == p.bounds.length) p.attrs + ("le" -> "inf")
            else p.attrs
          SampleRow(m.name + "_bucket", tags, ms, acc.toDouble)
        }
        val sumRow = p.sum.map(s => SampleRow(m.name + "_sum", p.attrs, ms, s)).toSeq
        bucketRows ++ sumRow :+ SampleRow(m.name + "_count", p.attrs, ms, p.count.toDouble)
      }
      case _ => m.points.map(p => SampleRow(m.name, p.attrs, p.tsNano / 1000000L, p.value))
    }
  }

  /** Distributed ingest over a binary payload column (executor-side decode,
    * nothing collected to the driver). */
  def fromPayloads(df: DataFrame, bodyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Array[Byte]] = df.select(bodyCol).as[Array[Byte]]
    ds.flatMap(body => toRows(parseRequest(body))).toDF()
  }
}
