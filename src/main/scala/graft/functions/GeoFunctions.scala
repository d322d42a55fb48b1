package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial functions — reference common/function/src/scalars/geo
  * (SURVEY.md §2.8): geohash encode/neighbours, the st_* point
  * measures, and WKT points. The h3_* cell functions live in
  * [[H3]]/[[Registry]] (from-scratch indexing) and the s2_* family in
  * [[S2]].
  */
object GeoFunctions {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash encoding (public algorithm). */
  def geohashEncode(lat: Double, lng: Double, precision: Int): String = {
    var latLo = -90.0; var latHi = 90.0
    var lngLo = -180.0; var lngHi = 180.0
    val sb = new StringBuilder
    var bit = 0; var ch = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lngLo + lngHi) / 2
        if (lng >= mid) { ch = ch << 1 | 1; lngLo = mid } else { ch = ch << 1; lngHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch << 1 | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb += Base32(ch); bit = 0; ch = 0 }
    }
    sb.toString
  }

  def geohashDecodeCenter(h: String): (Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lngLo = -180.0; var lngHi = 180.0
    var even = true
    h.foreach { c =>
      val cd = Base32.indexOf(c)
      (4 to 0 by -1).foreach { b =>
        val bit = (cd >> b) & 1
        if (even) { val mid = (lngLo + lngHi) / 2; if (bit == 1) lngLo = mid else lngHi = mid }
        else { val mid = (latLo + latHi) / 2; if (bit == 1) latLo = mid else latHi = mid }
        even = !even
      }
    }
    ((latLo + latHi) / 2, (lngLo + lngHi) / 2)
  }

  private def neighbour(h: String, dLat: Int, dLng: Int): String = {
    val (lat, lng) = geohashDecodeCenter(h)
    val latErr = 180.0 / (1L << (h.length * 5 / 2 + (if (h.length % 2 == 1) 2 else 0)))
    // cell sizes: lon bits = ceil(5n/2), lat bits = floor(5n/2)
    val latBits = h.length * 5 / 2
    val lngBits = h.length * 5 - latBits
    val latSz = 180.0 / (1L << latBits)
    val lngSz = 360.0 / (1L << lngBits)
    val nlat = lat + dLat * latSz
    val nlng0 = lng + dLng * lngSz
    val nlng = if (nlng0 > 180) nlng0 - 360 else if (nlng0 < -180) nlng0 + 360 else nlng0
    if (nlat > 90 || nlat < -90) null else geohashEncode(nlat, nlng, h.length)
  }

  private val geohashUdf = udf((lat: Double, lng: Double, p: Int) => geohashEncode(lat, lng, p))
  private val neighboursUdf = udf { (h: String) =>
    if (h == null) null
    else Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
      .map { case (a, b) => neighbour(h, a, b) }.filter(_ != null)
  }

  def geohash(lat: Column, lng: Column, precision: Column): Column =
    geohashUdf(lat, lng, precision.cast("int"))

  def geohashNeighbours(h: Column): Column = neighboursUdf(h)

  /** neighbours of the cell containing (lat, lng) in the reference's output
    * order n, nw, w, sw, s, se, e, ne (geo/geohash.rs:232). */
  def neighboursOf(lat: Double, lng: Double, precision: Int): Array[String] = {
    val h = geohashEncode(lat, lng, precision)
    Array((1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1))
      .map { case (a, b) => neighbour(h, a, b) }.filter(_ != null)
  }

  /** Haversine great-circle distance in meters (st_distance_sphere_m),
    * pure Column math (codegen'd). */
  def stDistanceSphereM(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val r = lit(6371008.8) // geo crate MEAN_EARTH_RADIUS (pins the golden)
    val p1 = radians(lat1); val p2 = radians(lat2)
    val dp = radians(lat2 - lat1); val dl = radians(lng2 - lng1)
    val a = sin(dp / 2) * sin(dp / 2) + cos(p1) * cos(p2) * sin(dl / 2) * sin(dl / 2)
    lit(2.0) * r * asin(sqrt(a))
  }

  /** Scalar haversine (same MEAN_EARTH_RADIUS as the Column version). */
  def haversineM(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val r = 6371008.8
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1); val dl = math.toRadians(lng2 - lng1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2.0 * r * math.asin(math.sqrt(a))
  }

  /** Euclidean degree distance between two points (st_distance on points). */
  def stDistance(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column =
    sqrt((lat2 - lat1) * (lat2 - lat1) + (lng2 - lng1) * (lng2 - lng1))

  /** wkt_point_from_latlng(lat, lng) -> 'POINT(lng lat)' */
  def wktPointFromLatLng(lat: Column, lng: Column): Column =
    concat(lit("POINT("), lng.cast("string"), lit(" "), lat.cast("string"), lit(")"))
}
