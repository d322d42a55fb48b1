package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.arrow.flatbuf.{Message, MessageHeader}
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types._

/** Arrow Flight `DoPut` bulk ingest (ref `servers/src/grpc/flight.rs:242-330`,
  * `common/grpc/src/flight.rs`): the reference's highest-throughput write path
  * receives a gRPC stream of `FlightData` messages — the first frame carries
  * the Arrow IPC schema in `data_header`, each subsequent frame one IPC
  * `RecordBatch` (flatbuffer metadata in `data_header`, buffer bytes in
  * `data_body`) — and inserts the decoded rows.
  *
  * Here a whole DoPut stream is modeled as one binary payload: standard gRPC
  * wire framing (1-byte compressed flag + 4-byte big-endian length per
  * message, the public gRPC over-HTTP/2 spec) around `FlightData` protobufs
  * (public `arrow/flight/Flight.proto`: field 2 `data_header`, field 3
  * `app_metadata`, field 1000 `data_body`). Decoding reassembles the Arrow
  * IPC stream from the frames and hands it to Arrow Java's
  * `ArrowStreamReader` — the same columnar format the reference consumes, no
  * per-row text parsing anywhere on the path.
  *
  * Scale notes: payloads decode executor-side via `mapPartitions` with a
  * per-partition allocator; nothing is collected to the driver, and one
  * payload (one client stream) is the unit of parallelism, matching how a
  * fleet of Flight clients would fan out over ingest nodes.
  */
object ArrowFlight {

  /** One FlightData protobuf frame. */
  final case class Frame(header: Array[Byte], body: Array[Byte], appMetadata: Array[Byte] = Array.empty)

  // ---------------------------------------------------------------- protobuf

  def encodeFrame(f: Frame): Array[Byte] = {
    val w = new ProtoWire.Writer
    if (f.header.nonEmpty) w.bytes(2, f.header)
    if (f.appMetadata.nonEmpty) w.bytes(3, f.appMetadata)
    if (f.body.nonEmpty) w.bytes(1000, f.body)
    w.result()
  }

  def decodeFrame(buf: Array[Byte]): Frame = {
    val r = new ProtoWire.Reader(buf)
    var header, body, meta: Array[Byte] = Array.empty[Byte]
    while (r.hasNext) r.readTag() match {
      case (2, 2)    => header = r.readBytes()
      case (3, 2)    => meta = r.readBytes()
      case (1000, 2) => body = r.readBytes()
      case (_, w)    => r.skip(w)
    }
    Frame(header, body, meta)
  }

  // ------------------------------------------------------------ gRPC framing

  /** [0x00][len be32][message] per message — the public gRPC wire format. */
  def grpcFrame(messages: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    messages.foreach { m =>
      out.write(0)
      val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(m.length).array()
      out.write(len); out.write(m, 0, m.length)
    }
    out.toByteArray
  }

  def grpcUnframe(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < payload.length) {
      if (pos + 5 > payload.length) throw new IllegalArgumentException(s"truncated gRPC frame header at $pos")
      if (payload(pos) != 0) throw new IllegalArgumentException("compressed gRPC frames unsupported")
      val len = ByteBuffer.wrap(payload, pos + 1, 4).order(ByteOrder.BIG_ENDIAN).getInt
      if (len < 0 || pos + 5 + len > payload.length) throw new IllegalArgumentException(s"bad gRPC frame length $len at $pos")
      out += java.util.Arrays.copyOfRange(payload, pos + 5, pos + 5 + len)
      pos += 5 + len
    }
    out.toSeq
  }

  // -------------------------------------------------- IPC stream (re)assembly

  private def align8(n: Int): Int = (n + 7) & ~7

  /** FlightData frames → Arrow IPC stream bytes: each frame becomes
    * [0xFFFFFFFF][metalen le32][header pad8][body], closed by the EOS marker
    * (continuation + zero length) — the published Arrow IPC streaming format. */
  def toIpcStream(frames: Seq[Frame]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    frames.foreach { f =>
      val padded = align8(f.header.length)
      le32(0xFFFFFFFF); le32(padded)
      out.write(f.header, 0, f.header.length)
      var i = f.header.length
      while (i < padded) { out.write(0); i += 1 }
      out.write(f.body, 0, f.body.length)
    }
    le32(0xFFFFFFFF); le32(0)
    out.toByteArray
  }

  /** Split a complete Arrow IPC stream into FlightData frames (what a Flight
    * client does before putting frames on the wire). Handles the v5
    * continuation-marker encapsulation; body size comes from the flatbuffer
    * `Message.bodyLength` (spec: always a multiple of 8). */
  def fromIpcStream(stream: Array[Byte]): Seq[Frame] = {
    val out = ArrayBuffer.empty[Frame]
    val bb = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    var done = false
    while (!done && bb.remaining() >= 4) {
      var metaLen = bb.getInt
      if (metaLen == -1) { // continuation marker
        if (bb.remaining() < 4) throw new IllegalArgumentException("truncated IPC stream")
        metaLen = bb.getInt
      }
      if (metaLen == 0) done = true
      else {
        if (metaLen < 0 || metaLen > bb.remaining()) throw new IllegalArgumentException(s"bad IPC metadata length $metaLen")
        val header = new Array[Byte](metaLen)
        bb.get(header)
        val msg = Message.getRootAsMessage(ByteBuffer.wrap(header))
        val bodyLen = msg.bodyLength()
        if (bodyLen < 0 || bodyLen > bb.remaining()) throw new IllegalArgumentException(s"bad IPC body length $bodyLen")
        val body = new Array[Byte](bodyLen.toInt)
        bb.get(body)
        out += Frame(header, body)
        // dictionaries/schema/batches all pass through as opaque frames
        if (msg.headerType() != MessageHeader.Schema && msg.headerType() != MessageHeader.RecordBatch &&
            msg.headerType() != MessageHeader.DictionaryBatch)
          throw new IllegalArgumentException(s"unsupported IPC message type ${msg.headerType()}")
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------------ decode

  /** Spark ↔ Arrow schema mapping for the ingest surface (the reference's
    * gRPC column types, `api/src/v1/column.rs`). */
  def toArrowSchema(schema: StructType): ArrowSchema = {
    val fields = schema.fields.map { f =>
      val t: ArrowType = f.dataType match {
        case LongType      => new ArrowType.Int(64, true)
        case IntegerType   => new ArrowType.Int(32, true)
        case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType    => ArrowType.Utf8.INSTANCE
        case BooleanType   => ArrowType.Bool.INSTANCE
        case BinaryType    => ArrowType.Binary.INSTANCE
        case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
        case other         => throw new IllegalArgumentException(s"unsupported flight ingest type $other")
      }
      new Field(f.name, new FieldType(f.nullable, t, null), java.util.Collections.emptyList[Field]())
    }
    new ArrowSchema(java.util.Arrays.asList(fields: _*))
  }

  private def cellValue(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector        => x.get(i)
      case x: IntVector           => x.get(i)
      case x: Float8Vector        => x.get(i)
      case x: Float4Vector        => x.get(i)
      case x: VarCharVector       => new String(x.get(i), "UTF-8")
      case x: BitVector           => x.get(i) == 1
      case x: VarBinaryVector     => x.get(i)
      case x: TimeStampMicroTZVector => java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(x.get(i), java.time.temporal.ChronoUnit.MICROS))
      case x: TimeStampMicroVector   => java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(x.get(i), java.time.temporal.ChronoUnit.MICROS))
      case other => throw new IllegalArgumentException(s"unsupported flight vector ${other.getClass.getSimpleName}")
    }
  }

  /** Decode one DoPut payload into external rows matching `schema` (by
    * position; names are validated). */
  def decodePayload(payload: Array[Byte], schema: StructType): Iterator[Row] = {
    val frames = grpcUnframe(payload).map(decodeFrame)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(toIpcStream(frames)), alloc)
    val rows = ArrayBuffer.empty[Row]
    try {
      val root = reader.getVectorSchemaRoot
      val got = root.getSchema.getFields
      if (got.size != schema.length)
        throw new IllegalArgumentException(s"flight schema arity ${got.size} != expected ${schema.length}")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (got.get(i).getName != f.name)
          throw new IllegalArgumentException(s"flight column ${got.get(i).getName} != expected ${f.name}")
      }
      while (reader.loadNextBatch()) {
        val vectors = (0 until schema.length).map(root.getVector)
        var r = 0
        while (r < root.getRowCount) {
          rows += Row.fromSeq(vectors.map(v => cellValue(v, r)))
          r += 1
        }
      }
    } finally {
      reader.close(); alloc.close()
    }
    rows.iterator
  }

  /** Distributed ingest: a DataFrame of binary DoPut payloads → typed rows.
    * Executor-side decode, one allocator per task, nothing on the driver. */
  def fromPayloads(df: DataFrame, bodyCol: String, schema: StructType): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[Array[Byte]] = df.select(bodyCol).as[Array[Byte]]
    ds.mapPartitions(it => it.flatMap(decodePayload(_, schema)))(Encoders.row(schema))
  }

  // ------------------------------------------------------------------ encode

  /** Rows → one DoPut payload (schema frame + one RecordBatch frame per
    * `batchRows`). This is the client-SDK side, used by tests and the
    * round-trip CORRECTNESS entry. */
  def encodePayload(schema: StructType, rows: Seq[Seq[Any]], batchRows: Int = 4096): Array[Byte] = {
    val arrowSchema = toArrowSchema(schema)
    val alloc = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val ipc = new java.io.ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, ipc)
    try {
      writer.start()
      rows.grouped(math.max(1, batchRows)).foreach { chunk =>
        root.allocateNew()
        chunk.zipWithIndex.foreach { case (row, r) =>
          schema.fields.indices.foreach { c =>
            val vec = root.getVector(c)
            row(c) match {
              case null => vec.asInstanceOf[FieldVector] match {
                case v: BigIntVector => v.setNull(r)
                case v: IntVector => v.setNull(r)
                case v: Float8Vector => v.setNull(r)
                case v: Float4Vector => v.setNull(r)
                case v: VarCharVector => v.setNull(r)
                case v: BitVector => v.setNull(r)
                case v: VarBinaryVector => v.setNull(r)
                case v: TimeStampMicroTZVector => v.setNull(r)
                case v => throw new IllegalArgumentException(s"unsupported null for ${v.getClass}")
              }
              case x: Long => vec.asInstanceOf[BigIntVector].setSafe(r, x)
              case x: Int => vec.asInstanceOf[IntVector].setSafe(r, x)
              case x: Double => vec.asInstanceOf[Float8Vector].setSafe(r, x)
              case x: Float => vec.asInstanceOf[Float4Vector].setSafe(r, x)
              case x: String => vec.asInstanceOf[VarCharVector].setSafe(r, x.getBytes("UTF-8"))
              case x: Boolean => vec.asInstanceOf[BitVector].setSafe(r, if (x) 1 else 0)
              case x: Array[Byte] => vec.asInstanceOf[VarBinaryVector].setSafe(r, x)
              case x: java.sql.Timestamp =>
                val micros = x.getTime * 1000L + (x.getNanos % 1000000) / 1000
                vec.asInstanceOf[TimeStampMicroTZVector].setSafe(r, micros)
              case other => throw new IllegalArgumentException(s"unsupported flight value $other")
            }
          }
        }
        root.setRowCount(chunk.length)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close(); root.close(); alloc.close()
    }
    grpcFrame(fromIpcStream(ipc.toByteArray).map(encodeFrame))
  }
}
