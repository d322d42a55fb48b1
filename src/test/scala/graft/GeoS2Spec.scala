package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoWkt, S2}

/** Pins the S2 cell scheme and WKT relations to the reference's own
  * golden outputs (tests/cases/standalone/common/function/geo.result:
  * s2 block at :318-335, st_* block at :395-435). */
class GeoS2Spec extends AnyFunSuite {

  test("s2_latlng_to_cell matches reference golden") {
    val cell = S2.latLngToCell(37.76938, -122.3889)
    assert(java.lang.Long.toUnsignedString(cell) == "9263763445276221387")
    assert(S2.token(cell) == "808f7fc59ef01fcb")
    assert(S2.level(cell) == 30)
    assert(java.lang.Long.toUnsignedString(S2.parent(cell, 3)) ==
      "9277415232383221760")
  }

  private val polygon1 =
    "POLYGON ((-121.491698 38.653343, -121.582353 38.556757, -121.469721 38.449287, -121.315883 38.541721, -121.491698 38.653343))"

  test("st_area matches reference golden") {
    assert(GeoWkt.area(GeoWkt.parse("POINT(-122.3889 37.76938)")) == 0.0)
    assert(math.abs(GeoWkt.area(GeoWkt.parse(polygon1)) - 0.027022178074000106) < 1e-15)
  }

  test("st_distance point-point and point-polygon match reference goldens") {
    val p1 = GeoWkt.parse("POINT(-122.3889 37.76938)")
    val p2 = GeoWkt.parse("POINT(-121.4247 38.5216)")
    assert(math.abs(GeoWkt.distance(p1, p2) - 1.2229131483470166) < 1e-14)
    assert(math.abs(GeoWkt.distance(p1, GeoWkt.parse(polygon1)) - 1.1271559800391486) < 1e-13)
  }

  test("st_contains / st_within / st_intersects match reference goldens") {
    val p1 = GeoWkt.parse("POINT(-122.01325 37.383287)")
    val poly1 = GeoWkt.parse(
      "POLYGON ((-122.031661 37.428252, -122.139829 37.387072, -122.135365 37.361971, -122.057759 37.332222, -121.987707 37.328946, -121.943754 37.333041, -121.919373 37.349145, -121.945814 37.376705, -121.975689 37.417345, -121.998696 37.409164, -122.031661 37.428252))")
    val poly2 = GeoWkt.parse(polygon1)
    val poly3 = GeoWkt.parse(
      "POLYGON ((-122.089628 37.450332, -122.20535 37.378342, -122.093062 37.36088, -122.044301 37.372886, -122.089628 37.450332))")
    assert(GeoWkt.contains(poly1, p1))
    assert(!GeoWkt.contains(poly2, p1))
    assert(GeoWkt.within(p1, poly1))
    assert(!GeoWkt.within(p1, poly2))
    assert(!GeoWkt.intersects(poly1, poly2))
    assert(GeoWkt.intersects(poly1, poly3))
  }

  test("haversine uses the geo crate mean earth radius") {
    assert(math.abs(graft.functions.GeoFunctions.haversineM(
      37.76938, -122.3889, 38.5216, -121.4247) - 118766.03647159638) < 1e-7)
  }

  test("s2 cells are hierarchical and tokens round-trip level") {
    val cell = S2.latLngToCell(0.0, 0.0)
    for (l <- 0 to 29) {
      val p = S2.parent(cell, l)
      assert(S2.level(p) == l)
      // parent at level l+1 refines the parent at level l
      assert(S2.parent(S2.parent(cell, l + 1), l) == p)
    }
  }
}
