package graft.aggregates

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-compatible replica of the reference's `approx_distinct`
  * (DataFusion `functions-aggregate/src/approx_distinct.rs` +
  * `hyperloglog.rs`): a redis-style dense HyperLogLog with 2^14
  * registers fed by ahash's fallback hasher under DataFusion's fixed
  * seeds, estimated with the Ertl tau/sigma formula. Both the hash
  * (ahash fallback: folded-multiply update, rotate-23 large update)
  * and the estimator are published open-source algorithms; the golden
  * corpus (aggregate/approx_distinct.result) pins their exact ±1
  * estimates, so the sketch must match bit-for-bit, not just
  * statistically.
  */
object AHash {
  final val Multiple = 6364136223846793005L
  // ahash random_state.rs PI2 block (second 256 bits of pi); with_seeds
  // XORs the caller's seeds against it
  private final val Pi2 = Array(
    0x452821e638d01377L, 0xbe5466cf34e90c6cL,
    0xc0ac29b7c97c50ddL, 0x3f84d5b5b5470917L)
  // DataFusion hyperloglog.rs fixed SEED quadruple
  private final val Seeds = Array(
    0x885f6cab121d01a3L, 0x71e4379f2976ad8fL,
    0xbf30173dd28a8816L, 0x0eaea5d736d733a4L)
  final val K0 = Seeds(0) ^ Pi2(0)
  final val K1 = Seeds(1) ^ Pi2(1)
  final val K2 = Seeds(2) ^ Pi2(2)
  final val K3 = Seeds(3) ^ Pi2(3)

  /** 128-bit multiply folded to 64 bits: lo ^ unsigned-hi. */
  @inline def foldedMultiply(s: Long, by: Long): Long = {
    val lo = s * by
    val hi = Math.multiplyHigh(s, by) + ((s >> 63) & by) + ((by >> 63) & s)
    lo ^ hi
  }

  @inline private def readLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }
  @inline private def readIntLE(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** hash_one of an integer primitive: ahash's specialized AHasherU64
    * path (`RandomState::hash_as_u64` — buffer starts at k1, pad at k0,
    * finish is a bare folded multiply with no rotation). Verified
    * bit-exact against the reference corpus's pinned HLL estimates
    * (aggregate/approx_distinct.result: groups of 200 i32 keys
    * estimate 199/200/201 exactly as pinned). */
  @inline private def hashAsU64(d: Long): Long = {
    val buffer = foldedMultiply(d ^ K1, Multiple)
    foldedMultiply(buffer, K0)
  }

  def hashLong(v: Long): Long = hashAsU64(v)
  /** write_u32 zero-extends (Rust `i as u32 as u64`). */
  def hashInt(v: Int): Long = hashAsU64(v & 0xFFFFFFFFL)
  def hashShort(v: Short): Long = hashAsU64(v & 0xFFFFL)
  def hashByte(v: Byte): Long = hashAsU64(v & 0xFFL)

  /** hash_one of &str — ahash's AHasherStr specialize wrapper over the
    * fallback AHasher: short inputs (≤8 bytes) fold directly into the
    * buffer with the extra key and bump pad by the length; longer
    * inputs run the general write() (length mix + 128-bit block
    * updates); str's trailing write_u8(0xFF) is a no-op in this
    * wrapper. finish keeps the fallback's rotate-by-low-bits. */
  def hashBytesStr(bytes: Array[Byte]): Long = {
    var buffer = K0
    var pad = K1
    @inline def largeUpdate(lo: Long, hi: Long): Unit = {
      val combined = foldedMultiply(lo ^ K2, hi ^ K3)
      buffer = java.lang.Long.rotateLeft((buffer + pad) ^ combined, 23)
    }
    val len = bytes.length
    if (len > 8) {
      buffer = (buffer + len) * Multiple
      if (len > 16) {
        largeUpdate(readLongLE(bytes, len - 16), readLongLE(bytes, len - 8))
        var off = 0
        while (len - off > 16) {
          largeUpdate(readLongLE(bytes, off), readLongLE(bytes, off + 8))
          off += 16
        }
      } else largeUpdate(readLongLE(bytes, 0), readLongLE(bytes, len - 8))
    } else {
      val (lo, hi) =
        if (len >= 4) (readIntLE(bytes, 0), readIntLE(bytes, len - 4))
        else if (len >= 2)
          ((bytes(0) & 0xFFL) | ((bytes(1) & 0xFFL) << 8), bytes(len - 1) & 0xFFL)
        else if (len == 1) (bytes(0) & 0xFFL, bytes(0) & 0xFFL)
        else (0L, 0L)
      buffer = foldedMultiply(lo ^ buffer, hi ^ K3)
      pad = pad + len
    }
    val rot = (buffer & 63).toInt
    java.lang.Long.rotateLeft(foldedMultiply(buffer, pad), rot)
  }
}

object ApproxDistinct {
  final val HllBits = 14
  final val NumRegisters = 1 << HllBits // 16384
  final val HllQ = 64 - HllBits // 50

  def addHash(registers: Array[Byte], hash: Long): Unit = {
    val idx = (hash & (NumRegisters - 1)).toInt
    val w = (hash >>> HllBits) | (1L << HllQ)
    val p = (java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
    if (p > registers(idx)) registers(idx) = p
  }

  /** Ertl "New cardinality estimation algorithms for HyperLogLog
    * sketches" estimator, as in redis hllCount / DataFusion count(). */
  def count(registers: Array[Byte]): Long = {
    val m = NumRegisters.toDouble
    val hist = new Array[Int](HllQ + 2)
    var i = 0
    while (i < NumRegisters) { hist(registers(i) & 0xFF) += 1; i += 1 }
    var z = m * tau((m - hist(HllQ + 1)) / m)
    var j = HllQ
    while (j >= 1) { z += hist(j); z *= 0.5; j -= 1 }
    z += m * sigma(hist(0) / m)
    math.round(0.5 / math.log(2.0) * m * m / z)
  }

  private def tau(x0: Double): Double =
    if (x0 == 0.0 || x0 == 1.0) 0.0
    else {
      var x = x0; var y = 1.0; var z = 1.0 - x
      var zPrev = -1.0
      while (z != zPrev) {
        x = math.sqrt(x)
        zPrev = z
        y *= 0.5
        val d = 1.0 - x
        z -= d * d * y
      }
      z / 3.0
    }

  private def sigma(x0: Double): Double =
    if (x0 == 1.0) Double.PositiveInfinity
    else {
      var x = x0; var y = 1.0; var z = x
      var zPrev = -1.0
      while (z != zPrev) {
        x *= x
        zPrev = z
        z += x * y
        y += y
      }
      z
    }

  /** UDAF over pre-hashed inputs (see [[Ahash64]]); null hashes are
    * nulls in the source column and are skipped, as the reference does. */
  val agg: Aggregator[java.lang.Long, Array[Byte], Long] =
    new Aggregator[java.lang.Long, Array[Byte], Long] {
      def zero: Array[Byte] = new Array[Byte](NumRegisters)
      def reduce(b: Array[Byte], a: java.lang.Long): Array[Byte] = {
        if (a != null) addHash(b, a.longValue())
        b
      }
      def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
        var i = 0
        while (i < NumRegisters) {
          if (b2(i) > b1(i)) b1(i) = b2(i); i += 1
        }
        b1
      }
      def finish(r: Array[Byte]): Long = count(r)
      def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
      def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
    }
}

/** `__ahash64(x)`: the ahash-fallback hash the reference's
  * approx_distinct feeds its HLL, dispatched on the input's Spark type
  * the way Rust's `Hash` impl dispatches on the native type. Registered
  * as a Catalyst expression so one SQL rewrite covers every column
  * type without per-type UDFs.
  */
case class Ahash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "__ahash64"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType | _: TimestampType | TimestampNTZType =>
      AHash.hashLong(input.asInstanceOf[Long])
    case IntegerType | DateType => AHash.hashInt(input.asInstanceOf[Int])
    case ShortType => AHash.hashShort(input.asInstanceOf[Short])
    case ByteType => AHash.hashByte(input.asInstanceOf[Byte])
    case BooleanType =>
      AHash.hashByte(if (input.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
    case StringType =>
      AHash.hashBytesStr(input.asInstanceOf[UTF8String].getBytes)
    case BinaryType => AHash.hashBytesStr(input.asInstanceOf[Array[Byte]])
    case FloatType =>
      AHash.hashInt(java.lang.Float.floatToRawIntBits(input.asInstanceOf[Float]))
    case DoubleType =>
      AHash.hashLong(java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double]))
    case dt => throw new IllegalArgumentException(
      s"approx_distinct: unsupported input type $dt")
  }

  override protected def withNewChildInternal(newChild: Expression): Ahash64 =
    copy(child = newChild)
}
