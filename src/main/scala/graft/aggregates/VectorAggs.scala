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

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()

  // Buffer is a plain tuple (acc, n): a private case class here would
  // break codegen'd SafeProjection (private ctor unreachable from the
  // generated class) and silently drop to interpreted projection.
  private type Buf = (Array[Double], Long)

  private def elementwise(op: (Double, Double) => Double,
      avg: Boolean): Aggregator[Vec, Buf, Vec] =
    new Aggregator[Vec, Buf, Vec] {
      def zero: Buf = (Array.empty, 0L)
      def reduce(b: Buf, a: Vec): Buf = {
        if (a == null) b
        else if (b._1.isEmpty) (a.iterator.map(_.toDouble).toArray, 1L)
        else {
          val acc = b._1
          var i = 0
          while (i < acc.length && i < a.length) {
            acc(i) = op(acc(i), a(i)); i += 1
          }
          (acc, b._2 + 1)
        }
      }
      def merge(x: Buf, y: Buf): Buf =
        if (x._1.isEmpty) y
        else if (y._1.isEmpty) x
        else {
          val acc = x._1
          var i = 0
          while (i < acc.length && i < y._1.length) {
            acc(i) = op(acc(i), y._1(i)); i += 1
          }
          (acc, x._2 + y._2)
        }
      def finish(r: Buf): Vec =
        if (r._1.isEmpty) null
        else if (avg) r._1.map(v => (v / r._2).toFloat).toSeq
        else r._1.map(_.toFloat).toSeq
      def bufferEncoder: Encoder[Buf] = enc[Buf]
      def outputEncoder: Encoder[Vec] = enc[Vec]
    }

  def vecSumAgg(c: Column): Column = udaf(elementwise(_ + _, avg = false), enc[Vec])(c)
  def vecAvgAgg(c: Column): Column = udaf(elementwise(_ + _, avg = true), enc[Vec])(c)
  def vecProductAgg(c: Column): Column = udaf(elementwise(_ * _, avg = false), enc[Vec])(c)

  /** SQL-registrable forms (function/vector/vector.sql aggregates over
    * a parsed array<float> column). */
  def vecSumUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(elementwise(_ + _, avg = false), enc[Vec])
  def vecAvgUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(elementwise(_ + _, avg = true), enc[Vec])
  def vecProductUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(elementwise(_ * _, avg = false), enc[Vec])

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
