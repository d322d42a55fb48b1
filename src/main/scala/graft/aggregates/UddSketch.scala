package graft.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDDSketch quantile sketch — reference
  * common/function/src/aggrs/approximate/uddsketch.rs (uddsketch_state /
  * uddsketch_merge) + scalars/uddsketch_calc.rs (uddsketch_calc).
  *
  * Public algorithm (Epicoco et al., "UDDSketch: Accurate Tracking of
  * Quantiles in Data Streams"): log-γ bucketing with γ = (1+α)/(1-α);
  * when the bucket count exceeds `maxBuckets`, uniform collapse γ -> γ²
  * (bucket k -> ceil(k/2)), which keeps a bounded relative error.
  * State: (α, zeros, negative buckets, positive buckets).
  */
object UddSketch {

  final case class State(
      alpha: Double,
      maxBuckets: Int,
      zeros: Long,
      pos: Map[Int, Long],
      neg: Map[Int, Long]) {

    def gamma: Double = (1 + alpha) / (1 - alpha)

    def total: Long = zeros + pos.valuesIterator.sum + neg.valuesIterator.sum

    private def bucketOf(x: Double): Int =
      math.ceil(math.log(x) / math.log(gamma)).toInt

    def insert(x: Double): State =
      if (x.isNaN) this
      else if (x == 0.0) copy(zeros = zeros + 1)
      else if (x > 0) copy(pos = bump(pos, bucketOf(x))).compressIfNeeded()
      else copy(neg = bump(neg, bucketOf(-x))).compressIfNeeded()

    private def bump(m: Map[Int, Long], k: Int): Map[Int, Long] =
      m.updated(k, m.getOrElse(k, 0L) + 1)

    private def nBuckets: Int = pos.size + neg.size

    def compressIfNeeded(): State = {
      var s = this
      while (s.nBuckets > s.maxBuckets) s = s.collapse()
      s
    }

    /** Uniform collapse: γ -> γ², bucket k -> ceil(k/2). */
    def collapse(): State = {
      def half(m: Map[Int, Long]): Map[Int, Long] =
        m.groupMapReduce { case (k, _) => Math.ceil(k / 2.0).toInt } (_._2)(_ + _)
      copy(alpha = 2 * alpha / (1 + alpha * alpha), pos = half(pos), neg = half(neg))
    }

    def mergeWith(o: State): State = {
      // align γ by collapsing the finer sketch until the αs match
      var (a, b) = (this, o)
      if (a.total == 0) return b
      if (b.total == 0) return a
      while (a.alpha < b.alpha - 1e-12) a = a.collapse()
      while (b.alpha < a.alpha - 1e-12) b = b.collapse()
      def add(x: Map[Int, Long], y: Map[Int, Long]): Map[Int, Long] =
        (x.keySet ++ y.keySet).iterator
          .map(k => k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))).toMap
      State(a.alpha, a.maxBuckets, a.zeros + b.zeros,
        add(a.pos, b.pos), add(a.neg, b.neg)).compressIfNeeded()
    }

    /** Bucket midpoint estimate 2γ^k/(γ+1). */
    private def valueOf(k: Int): Double = 2 * math.pow(gamma, k) / (gamma + 1)

    def quantile(q: Double): Double = {
      val n = total
      if (n == 0) return Double.NaN
      // reference rank convention (uddsketch crate): 1-based
      // floor(q*n)+1, capped at n — q=0.5 over 10 values picks the 6th
      val target = math.min(n, math.floor(q * n).toLong + 1)
      var seen = 0L
      // negatives ascending = most-negative first (largest |bucket| first)
      for ((k, c) <- neg.toSeq.sortBy(-_._1)) {
        seen += c
        if (seen >= target) return -valueOf(k)
      }
      seen += zeros
      if (seen >= target && zeros > 0) return 0.0
      for ((k, c) <- pos.toSeq.sortBy(_._1)) {
        seen += c
        if (seen >= target) return valueOf(k)
      }
      pos.keys.maxOption.map(valueOf).getOrElse(0.0)
    }
  }

  def empty(maxBuckets: Int, alpha: Double): State =
    State(alpha, maxBuckets, 0L, Map.empty, Map.empty)

  // ---- serialization (compact string form; driver-agnostic) ----------
  def serialize(s: State): String = {
    def m(x: Map[Int, Long]) = x.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")
    s"${s.alpha};${s.maxBuckets};${s.zeros};${m(s.pos)};${m(s.neg)}"
  }
  def deserialize(str: String): State = {
    val parts = str.split(";", -1)
    def m(x: String): Map[Int, Long] =
      if (x.isEmpty) Map.empty
      else x.split(",").map { kv => val Array(k, v) = kv.split(":"); k.toInt -> v.toLong }.toMap
    State(parts(0).toDouble, parts(1).toInt, parts(2).toLong, m(parts(3)), m(parts(4)))
  }

  /** uddsketch_state(maxBuckets, alpha, col) */
  def stateAgg(maxBuckets: Int, alpha: Double): Aggregator[java.lang.Double, State, String] =
    new Aggregator[java.lang.Double, State, String] {
      def zero: State = empty(maxBuckets, alpha)
      def reduce(b: State, a: java.lang.Double): State =
        if (a == null) b else b.insert(a.doubleValue())
      def merge(a: State, b: State): State = a.mergeWith(b)
      def finish(r: State): String = serialize(r)
      def bufferEncoder: Encoder[State] = Encoders.kryo[State]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** uddsketch_merge(maxBuckets, alpha, state_col) */
  def mergeAgg(maxBuckets: Int, alpha: Double): Aggregator[String, State, String] =
    new Aggregator[String, State, String] {
      def zero: State = empty(maxBuckets, alpha)
      def reduce(b: State, a: String): State =
        if (a == null) b
        else {
          val st = deserialize(a)
          // reference rejects merging under mismatched sketch parameters
          // (aggrs/approximate/uddsketch.rs — planning error)
          if (st.maxBuckets != maxBuckets || st.alpha != alpha)
            throw new IllegalArgumentException(
              s"Merging UDDSketch with different parameters: arguments=($maxBuckets, $alpha) " +
                s"vs actual input=(${st.maxBuckets}, ${st.alpha})")
          b.mergeWith(st)
        }
      def merge(a: State, b: State): State = a.mergeWith(b)
      def finish(r: State): String = serialize(r)
      def bufferEncoder: Encoder[State] = Encoders.kryo[State]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** uddsketch_calc(q, state) scalar. */
  def calc(q: Double, state: String): Double = deserialize(state).quantile(q)

  def uddsketchState(maxBuckets: Int, alpha: Double, c: Column): Column =
    udaf(stateAgg(maxBuckets, alpha), Encoders.DOUBLE)(c.cast("double"))
  def uddsketchCalc(q: Double, c: Column): Column =
    org.apache.spark.sql.functions.udf((s: String) => calc(q, s)).apply(c)
}
