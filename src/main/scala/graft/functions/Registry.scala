package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** SQL-surface registration for the function library (reference
  * common/function/src/function_registry.rs:203-252). Column-native
  * functions (vector/json/ip4/math/string/geo-measure) are usable from
  * Scala without registration; this registers UDF-backed names so
  * `spark.sql` queries can call them like the reference's SQL surface.
  */
object Registry {

  def registerAll(spark: SparkSession): Unit = {
    // fulltext
    spark.udf.register("matches_term",
      (text: String, term: String) => TextMatch.termMatches(text, term, caseSensitive = true))
    spark.udf.register("matches",
      (text: String, query: String) =>
        if (text == null || query == null) false else TextMatch.compile(query)(text))

    // geo
    spark.udf.register("geohash",
      (lat: Double, lng: Double, p: Int) => GeoFunctions.geohashEncode(lat, lng, p))

    // ipv6 (ipv4 variants are Column-native; SQL wrappers for parity)
    spark.udf.register("ipv4_num_to_string", (n: Long) =>
      Seq(n >> 24 & 255, n >> 16 & 255, n >> 8 & 255, n & 255).mkString("."))
    spark.udf.register("ipv4_string_to_num", (s: String) =>
      s.split('.').foldLeft(0L)((acc, p) => acc * 256 + p.toLong))

    // vector helpers for SQL (native Column API is the perf path)
    spark.udf.register("vec_dim", (v: Seq[Float]) => if (v == null) -1 else v.length)
    spark.udf.register("vec_norm", (v: Seq[Float]) =>
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
    spark.udf.register("vec_dot_product", (a: Seq[Float], b: Seq[Float]) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y })
  }
}
