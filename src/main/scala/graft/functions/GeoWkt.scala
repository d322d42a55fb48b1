package graft.functions

/** Planar WKT geometry ops — reference
  * common/function/src/scalars/geo/{measure.rs (st_area, st_distance),
  * relation.rs (st_contains/st_within/st_intersects)}. The reference
  * delegates to the `geo` crate; semantics here follow the same public
  * definitions: planar euclidean coordinates (degrees), unsigned
  * shoelace area (holes subtracted), min-distance between geometries,
  * boundary-inclusive containment.
  *
  * Supported geometry subset: POINT, LINESTRING, POLYGON (outer ring +
  * holes) and their MULTI* wrappers — the shapes the reference's own
  * corpus (function/geo.sql) exercises.
  */
object GeoWkt {

  final case class Pt(x: Double, y: Double)
  sealed trait Geom
  final case class GPoint(p: Pt) extends Geom
  final case class GLine(pts: IndexedSeq[Pt]) extends Geom
  final case class GPolygon(rings: IndexedSeq[IndexedSeq[Pt]]) extends Geom
  final case class GMulti(gs: IndexedSeq[Geom]) extends Geom

  // ---- parsing --------------------------------------------------------

  /** Parse a WKT string; throws IllegalArgumentException on garbage
    * (the reference surfaces parse errors as query errors too). */
  def parse(wkt: String): Geom = {
    val s = wkt.trim
    val open = s.indexOf('(')
    require(open > 0, s"invalid WKT: $wkt")
    val tag = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open).trim
    tag match {
      case "POINT" => GPoint(parsePoint(stripParens(body)))
      case "LINESTRING" => GLine(parseRing(stripParens(body)))
      case "POLYGON" => GPolygon(splitGroups(stripParens(body)))
      case "MULTIPOINT" =>
        // both `(1 2, 3 4)` and `((1 2), (3 4))` forms are valid WKT
        val inner = stripParens(body)
        GMulti(splitTop(inner, ',').map(p =>
          GPoint(parsePoint(p.replaceAll("[()]", " ")))).toIndexedSeq)
      case "MULTILINESTRING" =>
        GMulti(splitGroups(stripParens(body)).map(r => GLine(r)).toIndexedSeq)
      case "MULTIPOLYGON" =>
        GMulti(splitPolygons(stripParens(body)).map(GPolygon).toIndexedSeq)
      case other => throw new IllegalArgumentException(s"unsupported WKT type $other")
    }
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    require(t.startsWith("(") && t.endsWith(")"), s"invalid WKT body: $s")
    t.substring(1, t.length - 1)
  }

  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case c if c == sep && depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  private def splitGroups(s: String): IndexedSeq[IndexedSeq[Pt]] =
    splitTop(s, ',').map(g => parseRing(stripParens(g))).toIndexedSeq

  private def splitPolygons(s: String): IndexedSeq[IndexedSeq[IndexedSeq[Pt]]] =
    splitTop(s, ',').map(g => splitGroups(stripParens(g))).toIndexedSeq

  private def parseRing(s: String): IndexedSeq[Pt] =
    splitTop(s, ',').map(parsePoint).toIndexedSeq

  private def parsePoint(s: String): Pt = {
    val parts = s.trim.split("\\s+")
    require(parts.length >= 2, s"invalid WKT coordinate: $s")
    Pt(parts(0).toDouble, parts(1).toDouble)
  }

  // ---- area -----------------------------------------------------------

  /** Shoelace relative to the first vertex (the geo crate's
    * `twice_signed_ring_area` shifts by the first point for float
    * accuracy — matching it bit-for-bit on the reference goldens). */
  private def ringSignedArea(r: IndexedSeq[Pt]): Double = {
    if (r.length < 3) return 0.0
    val p0 = r.head
    var a = 0.0
    var i = 0
    while (i < r.length - 1) {
      val ax = r(i).x - p0.x; val ay = r(i).y - p0.y
      val bx = r(i + 1).x - p0.x; val by = r(i + 1).y - p0.y
      a += ax * by - bx * ay
      i += 1
    }
    a / 2.0
  }

  /** Unsigned area (geo crate `unsigned_area`): |outer| - sum(|holes|);
    * points/lines have zero area. */
  def area(g: Geom): Double = g match {
    case GPoint(_) | GLine(_) => 0.0
    case GPolygon(rings) =>
      if (rings.isEmpty) 0.0
      else math.abs(ringSignedArea(rings.head)) -
        rings.tail.map(r => math.abs(ringSignedArea(r))).sum
    case GMulti(gs) => gs.map(area).sum
  }

  // ---- distance -------------------------------------------------------

  private def segDist(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l2 = dx * dx + dy * dy
    val t =
      if (l2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2))
    math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
  }

  private def ringsOf(g: Geom): Seq[IndexedSeq[Pt]] = g match {
    case GPoint(p) => Seq(IndexedSeq(p))
    case GLine(pts) => Seq(pts)
    case GPolygon(rings) => rings
    case GMulti(gs) => gs.flatMap(ringsOf)
  }

  private def pointDist(p: Pt, g: Geom): Double = g match {
    case GPoint(q) => math.hypot(p.x - q.x, p.y - q.y)
    case GLine(pts) =>
      pts.sliding(2).map(s => if (s.length == 2) segDist(p, s(0), s(1))
        else math.hypot(p.x - s(0).x, p.y - s(0).y)).min
    case poly: GPolygon =>
      if (containsPoint(poly, p)) 0.0
      else poly.rings.flatMap(r => r.sliding(2).filter(_.length == 2)
        .map(s => segDist(p, s(0), s(1)))).min
    case GMulti(gs) => gs.map(pointDist(p, _)).min
  }

  private def segIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Double =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    def onSeg(p: Pt, q: Pt, r: Pt): Boolean =
      math.min(p.x, r.x) <= q.x && q.x <= math.max(p.x, r.x) &&
        math.min(p.y, r.y) <= q.y && q.y <= math.max(p.y, r.y)
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) true
    else (o1 == 0 && onSeg(a, c, b)) || (o2 == 0 && onSeg(a, d, b)) ||
      (o3 == 0 && onSeg(c, a, d)) || (o4 == 0 && onSeg(c, b, d))
  }

  private def segments(g: Geom): Seq[(Pt, Pt)] =
    ringsOf(g).flatMap(r => r.sliding(2).collect { case s if s.length == 2 => (s(0), s(1)) })

  /** Min euclidean distance between geometries (0 when intersecting). */
  def distance(a: Geom, b: Geom): Double = (a, b) match {
    case (GPoint(p), _) => pointDist(p, b)
    case (_, GPoint(q)) => pointDist(q, a)
    case _ =>
      if (intersects(a, b)) 0.0
      else {
        val dists =
          for ((s1, e1) <- segments(a); (s2, e2) <- segments(b))
            yield math.min(
              math.min(segDist(s1, s2, e2), segDist(e1, s2, e2)),
              math.min(segDist(s2, s1, e1), segDist(e2, s1, e1)))
        dists.min
      }
  }

  // ---- relations ------------------------------------------------------

  /** Boundary-inclusive point-in-polygon (ray cast + boundary check),
    * holes excluded. */
  def containsPoint(poly: GPolygon, p: Pt): Boolean = {
    def inRing(r: IndexedSeq[Pt]): Boolean = {
      var inside = false
      var i = 0
      val n = r.length - 1
      while (i < n) {
        val a = r(i); val b = r(i + 1)
        if (segDist(p, a, b) == 0.0) return true // on boundary
        if ((a.y > p.y) != (b.y > p.y)) {
          val xCross = a.x + (p.y - a.y) / (b.y - a.y) * (b.x - a.x)
          if (p.x < xCross) inside = !inside
        }
        i += 1
      }
      inside
    }
    if (poly.rings.isEmpty) false
    else inRing(poly.rings.head) && !poly.rings.tail.exists { hole =>
      // strictly inside a hole -> outside (hole boundary still counts)
      var inside = false
      var i = 0
      val n = hole.length - 1
      var onBoundary = false
      while (i < n && !onBoundary) {
        val a = hole(i); val b = hole(i + 1)
        if (segDist(p, a, b) == 0.0) onBoundary = true
        else if ((a.y > p.y) != (b.y > p.y)) {
          val xCross = a.x + (p.y - a.y) / (b.y - a.y) * (b.x - a.x)
          if (p.x < xCross) inside = !inside
        }
        i += 1
      }
      inside && !onBoundary
    }
  }

  private def allPoints(g: Geom): Seq[Pt] = g match {
    case GPoint(p) => Seq(p)
    case GLine(pts) => pts
    case GPolygon(rings) => rings.flatten
    case GMulti(gs) => gs.flatMap(allPoints)
  }

  /** a contains b: every point of b inside/on a, and no boundary
    * crossing that exits (sufficient for the convex-ish corpus shapes;
    * full DE-9IM is out of scope). */
  def contains(a: Geom, b: Geom): Boolean = (a, b) match {
    case (poly: GPolygon, GPoint(p)) => containsPoint(poly, p)
    case (poly: GPolygon, _) =>
      allPoints(b).forall(p => containsPoint(poly, p)) &&
        !segments(b).exists { case (s, e) =>
          // midpoint escape check catches edges that dip outside
          !containsPoint(poly, Pt((s.x + e.x) / 2, (s.y + e.y) / 2))
        }
    case (GPoint(p), GPoint(q)) => p == q
    case (GMulti(gs), _) => gs.exists(g => contains(g, b))
    case _ => false
  }

  def within(a: Geom, b: Geom): Boolean = contains(b, a)

  def intersects(a: Geom, b: Geom): Boolean = (a, b) match {
    case (GPoint(p), _) => pointDist(p, b) == 0.0
    case (_, GPoint(q)) => pointDist(q, a) == 0.0
    case (GMulti(gs), _) => gs.exists(g => intersects(g, b))
    case (_, GMulti(gs)) => gs.exists(g => intersects(a, g))
    case _ =>
      segments(a).exists { case (s1, e1) =>
        segments(b).exists { case (s2, e2) => segIntersect(s1, e1, s2, e2) }
      } || (a match {
        case poly: GPolygon => allPoints(b).headOption.exists(p => containsPoint(poly, p))
        case _ => false
      }) || (b match {
        case poly: GPolygon => allPoints(a).headOption.exists(p => containsPoint(poly, p))
        case _ => false
      })
  }
}
