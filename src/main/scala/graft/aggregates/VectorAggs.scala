package graft.aggregates

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.reflect.runtime.universe.TypeTag

/** Element-wise vector aggregates + geo path + count_hash — reference
  * common/function/src/aggrs/vector/{sum,avg,product}.rs,
  * aggrs/geo/geo_path.rs, aggrs/count_hash.rs (SURVEY.md §2.4).
  *
  * Aggregator.merge gives the distributed partial/final split for free —
  * the reference generates `__state`/`__merge` wrappers for this
  * (aggrs/aggr_wrapper.rs); Spark does it natively.
  */
object VectorAggs {

  private type Vec = Seq[Float]
  private case class Buf(var acc: Array[Double], var n: Long)

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()

  private def elementwise(op: (Double, Double) => Double,
      avg: Boolean): Aggregator[Vec, Buf, Vec] =
    new Aggregator[Vec, Buf, Vec] {
      def zero: Buf = Buf(Array.empty, 0L)
      def reduce(b: Buf, a: Vec): Buf = {
        if (a == null) b
        else if (b.acc.isEmpty) Buf(a.iterator.map(_.toDouble).toArray, 1L)
        else {
          var i = 0
          while (i < b.acc.length && i < a.length) {
            b.acc(i) = op(b.acc(i), a(i)); i += 1
          }
          b.n += 1; b
        }
      }
      def merge(x: Buf, y: Buf): Buf =
        if (x.acc.isEmpty) y
        else if (y.acc.isEmpty) x
        else {
          var i = 0
          while (i < x.acc.length && i < y.acc.length) {
            x.acc(i) = op(x.acc(i), y.acc(i)); i += 1
          }
          x.n += y.n; x
        }
      def finish(r: Buf): Vec =
        if (r.acc.isEmpty) null
        else if (avg) r.acc.map(v => (v / r.n).toFloat).toSeq
        else r.acc.map(_.toFloat).toSeq
      def bufferEncoder: Encoder[Buf] = enc[Buf]
      def outputEncoder: Encoder[Vec] = enc[Vec]
    }

  def vecSumAgg(c: Column): Column = udaf(elementwise(_ + _, avg = false), enc[Vec])(c)
  def vecAvgAgg(c: Column): Column = udaf(elementwise(_ + _, avg = true), enc[Vec])(c)
  def vecProductAgg(c: Column): Column = udaf(elementwise(_ * _, avg = false), enc[Vec])(c)

  /** count_hash(cols...): count of distinct 64-bit hashes — a cheaper
    * count-distinct whose only error source is hash collision
    * (aggrs/count_hash.rs). Pure composition, fully distributed. */
  def countHash(cols: Column*): Column = count_distinct(xxhash64(cols: _*))

  /** geo_path(ts, lat, lng): per-group path ordered by time
    * (aggrs/geo/geo_path.rs) — struct of lat[]/lng[] sorted by ts. */
  def geoPath(ts: Column, lat: Column, lng: Column): Column = {
    val sorted = array_sort(collect_list(struct(ts, lat.as("lat"), lng.as("lng"))))
    struct(
      transform(sorted, p => p.getField("lat")).as("lat"),
      transform(sorted, p => p.getField("lng")).as("lng"))
  }

  /** json_encode_path: path as a JSON string [[lng,lat],...] (reference
    * aggrs/geo/encoding.rs emits (lng, lat) coordinate order). */
  def jsonEncodePath(ts: Column, lat: Column, lng: Column): Column = {
    val sorted = array_sort(collect_list(struct(ts, lat.as("lat"), lng.as("lng"))))
    to_json(transform(sorted, p => array(p.getField("lng"), p.getField("lat"))))
  }
}
