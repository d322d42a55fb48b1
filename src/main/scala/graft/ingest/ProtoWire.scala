package graft.ingest

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format codec (public encoding spec:
  * varint / fixed64 / length-delimited / fixed32). No generated code —
  * the ingest adapters walk messages by field number, mirroring how the
  * reference consumes the same wire payloads
  * (`servers/src/prom_store.rs:460`, `servers/src/otlp/metrics.rs:99`).
  */
object ProtoWire {

  // ---- writer ----------------------------------------------------------
  final class Writer {
    private val out = new ByteArrayOutputStream()

    def varint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      this
    }
    private def tag(field: Int, wire: Int): Writer = varint((field.toLong << 3) | wire)

    def int(field: Int, v: Long): Writer = { tag(field, 0); varint(v) }
    def double(field: Int, v: Double): Writer = {
      tag(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def fixed64(field: Int, v: Long): Writer = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def fixed32(field: Int, v: Int): Writer = {
      tag(field, 5)
      var i = 0
      while (i < 4) { out.write(((v >>> (8 * i)) & 0xff)); i += 1 }
      this
    }
    def bytes(field: Int, v: Array[Byte]): Writer = { tag(field, 2); varint(v.length.toLong); out.write(v, 0, v.length); this }
    def string(field: Int, v: String): Writer = bytes(field, v.getBytes("UTF-8"))
    def message(field: Int)(body: Writer => Unit): Writer = {
      val w = new Writer; body(w); bytes(field, w.result())
    }
    /** packed repeated fixed64 (e.g. HistogramDataPoint.bucket_counts). */
    def packedFixed64(field: Int, vs: Seq[Long]): Writer = {
      val w = new Writer
      vs.foreach { v => var i = 0; while (i < 8) { w.out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
      bytes(field, w.result())
    }
    /** packed repeated double (e.g. HistogramDataPoint.explicit_bounds). */
    def packedDouble(field: Int, vs: Seq[Double]): Writer = packedFixed64(field, vs.map(java.lang.Double.doubleToLongBits))

    def result(): Array[Byte] = out.toByteArray
  }

  // ---- reader ----------------------------------------------------------
  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    def hasNext: Boolean = pos < end

    // Decodes untrusted network payloads on executors: every length and
    // read is bounds-checked against the enclosing message's `end` so a
    // malformed buffer fails with a clear error instead of silently
    // reading sibling bytes or throwing ArrayIndexOutOfBounds.
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"malformed protobuf payload: $what at offset $pos (limit $end)")
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > end) fail(s"$n bytes needed")

    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (shift <= 63) {
        if (pos >= end) fail("truncated varint")
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      fail("varint over 10 bytes")
    }
    /** returns (fieldNumber, wireType) */
    def readTag(): (Int, Int) = { val t = readVarint(); ((t >>> 3).toInt, (t & 7).toInt) }

    def readFixed64(): Long = {
      need(8)
      var acc = 0L; var i = 0
      while (i < 8) { acc |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; acc
    }
    def readDouble(): Double = java.lang.Double.longBitsToDouble(readFixed64())
    def readFixed32(): Int = {
      need(4)
      var acc = 0; var i = 0
      while (i < 4) { acc |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; acc
    }
    private def readLen(): Int = {
      val len = readVarint()
      if (len < 0 || len > Int.MaxValue) fail(s"bad length $len")
      need(len.toInt); len.toInt
    }
    /** length-delimited payload as a sub-reader (no copy). */
    def readMessage(): Reader = {
      val len = readLen()
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def readBytes(): Array[Byte] = {
      val len = readLen()
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len; a
    }
    def readString(): String = {
      val len = readLen()
      val s = new String(buf, pos, len, "UTF-8")
      pos += len; s
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => need(8); pos += 8
      case 2 => pos += readLen()
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    /** drain a packed fixed64 payload. */
    def packedFixed64(): Seq[Long] = {
      val sub = readMessage()
      val b = Vector.newBuilder[Long]
      while (sub.hasNext) b += sub.readFixed64()
      b.result()
    }
    def packedDouble(): Seq[Double] = packedFixed64().map(java.lang.Double.longBitsToDouble)
  }
}
