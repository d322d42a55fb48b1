package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog sketch aggregates — reference
  * common/function/src/aggrs/approximate/hll.rs:42-130 (`hll`,
  * `hll_merge`) and scalars/hll_count.rs (`hll_count`).
  *
  * Classic HLL (public algorithm: Flajolet et al., and the HLL++ bias
  * rules for the small range): precision 14 -> 16384 registers, one
  * byte each, xxhash64 of the value's string form. The serialized state
  * is the raw register array, so `merge` (register-wise max) is
  * associative and the distributed partial/final split is exact.
  */
object Hll {
  val Precision = 14
  val M: Int = 1 << Precision // 16384

  def emptyState: Array[Byte] = new Array[Byte](M)

  def add(state: Array[Byte], value: String): Array[Byte] = {
    if (value != null) {
      // xxhash64 seed 42 — any fixed seed works; state is engine-internal
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(value.getBytes("UTF-8"),
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, value.length, 42L)
      val idx = (h >>> (64 - Precision)).toInt
      val rest = h << Precision
      val rank = (if (rest == 0) 64 - Precision else java.lang.Long.numberOfLeadingZeros(rest) + 1)
      if (rank > (state(idx) & 0xff)) state(idx) = rank.toByte
    }
    state
  }

  def mergeStates(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  /** Cardinality estimate with linear-counting small-range correction. */
  def count(state: Array[Byte]): Long = {
    if (state == null || state.length != M) return 0L
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = state(i) & 0xff
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val e = alpha * M.toDouble * M.toDouble / sum
    val est =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.round(est)
  }

  /** hll(col): build a sketch from raw values. */
  val hll: Aggregator[String, Array[Byte], Array[Byte]] =
    new Aggregator[String, Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = emptyState
      def reduce(b: Array[Byte], a: String): Array[Byte] = add(b, a)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeStates(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** hll_merge(state_col): merge pre-built sketches. */
  val hllMerge: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = emptyState
      def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
        if (a == null || a.length != M) b else mergeStates(b, a)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeStates(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  private lazy val hllUdaf = udaf(hll, Encoders.STRING)
  private lazy val hllMergeUdaf = udaf(hllMerge, Encoders.BINARY)
  private lazy val hllCountUdf =
    org.apache.spark.sql.functions.udf((s: Array[Byte]) => count(s))

  /** Column API mirroring the reference SQL surface. */
  def hllAgg(c: Column): Column = hllUdaf(c.cast("string"))
  def hllMergeAgg(c: Column): Column = hllMergeUdaf(c)
  def hllCount(c: Column): Column = hllCountUdf(c)
}
