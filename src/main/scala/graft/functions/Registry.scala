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
    // sketch aggregates (reference aggrs/approximate/{hll,uddsketch}.rs);
    // uddsketch_state/_merge are registered per-parameter-pair by
    // GraftSession.rewriteUddsketch (Spark UDAFs are monomorphic)
    import org.apache.spark.sql.{functions => F, Encoders}
    spark.udf.register("hll", F.udaf(graft.aggregates.Hll.hll, Encoders.STRING))
    spark.udf.register("hll_merge", F.udaf(graft.aggregates.Hll.hllMerge, Encoders.BINARY))
    spark.udf.register("hll_count",
      udf((s: Array[Byte]) => graft.aggregates.Hll.count(s)))
    spark.udf.register("uddsketch_calc",
      udf((q: Double, s: String) => graft.aggregates.UddSketch.calc(q, s)))

    // fulltext
    spark.udf.register("matches_term",
      (text: String, term: String) => TextMatch.termMatches(text, term, caseSensitive = true))
    spark.udf.register("matches",
      (text: String, query: String) =>
        if (text == null || query == null) false else TextMatch.compile(query)(text))

    // geo
    spark.udf.register("geohash",
      (lat: Double, lng: Double, p: Int) => GeoFunctions.geohashEncode(lat, lng, p))

    // WKT relations/measure (reference geo/{measure,relation}.rs) —
    // st_distance_sphere_m over WKT rejects non-points like the reference
    spark.udf.register("st_area", (wkt: String) =>
      if (wkt == null) null else java.lang.Double.valueOf(GeoWkt.area(GeoWkt.parse(wkt))))
    spark.udf.register("st_distance", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(GeoWkt.distance(GeoWkt.parse(a), GeoWkt.parse(b))))
    spark.udf.register("st_distance_sphere_m", (a: String, b: String) =>
      if (a == null || b == null) null
      else (GeoWkt.parse(a), GeoWkt.parse(b)) match {
        case (GeoWkt.GPoint(p), GeoWkt.GPoint(q)) =>
          java.lang.Double.valueOf(GeoFunctions.haversineM(p.y, p.x, q.y, q.x))
        case _ => throw new IllegalArgumentException(
          "Great circle distance between non-point objects are not supported for now.")
      })
    spark.udf.register("st_contains", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoWkt.contains(GeoWkt.parse(a), GeoWkt.parse(b))))
    spark.udf.register("st_within", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoWkt.within(GeoWkt.parse(a), GeoWkt.parse(b))))
    spark.udf.register("st_intersects", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoWkt.intersects(GeoWkt.parse(a), GeoWkt.parse(b))))

    // s2 cells (reference geo/s2.rs). Ids are UInt64 -> Decimal(20,0)
    // so values above Long.MaxValue print unsigned like the reference.
    def cellOf(o: AnyRef): Long = o match {
      case d: java.math.BigDecimal => d.toBigInteger.longValue
      case n: java.lang.Number => n.longValue
      case s: String => java.lang.Long.parseUnsignedLong(s)
      case other => throw new IllegalArgumentException(s"bad cell: $other")
    }
    def unsignedDec(id: Long): java.math.BigDecimal =
      new java.math.BigDecimal(java.lang.Long.toUnsignedString(id))
    spark.udf.register("s2_latlng_to_cell",
      new org.apache.spark.sql.api.java.UDF2[java.lang.Double, java.lang.Double, java.math.BigDecimal] {
        def call(lat: java.lang.Double, lng: java.lang.Double): java.math.BigDecimal =
          if (lat == null || lng == null) null
          else unsignedDec(S2.latLngToCell(lat, lng))
      }, org.apache.spark.sql.types.DecimalType(20, 0))
    spark.udf.register("s2_cell_level",
      new org.apache.spark.sql.api.java.UDF1[AnyRef, java.lang.Integer] {
        def call(cell: AnyRef): java.lang.Integer =
          if (cell == null) null else Int.box(S2.level(cellOf(cell)))
      }, org.apache.spark.sql.types.IntegerType)
    spark.udf.register("s2_cell_to_token",
      new org.apache.spark.sql.api.java.UDF1[AnyRef, String] {
        def call(cell: AnyRef): String =
          if (cell == null) null else S2.token(cellOf(cell))
      }, org.apache.spark.sql.types.StringType)
    spark.udf.register("s2_cell_parent",
      new org.apache.spark.sql.api.java.UDF2[AnyRef, AnyRef, java.math.BigDecimal] {
        def call(cell: AnyRef, level: AnyRef): java.math.BigDecimal =
          if (cell == null || level == null) null
          else unsignedDec(S2.parent(cellOf(cell), cellOf(level).toInt))
      }, org.apache.spark.sql.types.DecimalType(20, 0))

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
