package graft.functions

import scala.collection.mutable.ArrayBuffer

/** H3 hierarchical geospatial index — a from-scratch Scala implementation of
  * the public H3 cell-indexing algorithm (h3geo.org), covering the function
  * surface of reference `common/function/src/scalars/geo/h3.rs:82-1265`
  * (which delegates to the `h3o` crate; we re-derive the math instead).
  *
  * Only three small seed tables are hand-written from the published spec:
  * icosahedron face centers, per-face class-II i-axis azimuths, and the 122
  * base-cell home positions. The large adjacency tables the C library
  * hard-codes (faceNeighbors, faceIjkBaseCells, baseCellNeighbors, aperture-7
  * digit adjacency) are DERIVED at class-load from the seed geometry and
  * integer lattice math, then cross-validated (vertex alignment, neighbor
  * symmetry, exhaustive res-2 round-trips in H3Spec) so a transcription error
  * fails fast rather than silently mis-indexing.
  */
object H3 {

  // ------------------------------------------------------------------
  // constants
  // ------------------------------------------------------------------
  val MaxRes = 15
  private val NumBaseCells = 122
  private val NumFaces = 20
  private val Eps = 1e-16 // C EPSILON: hex2d/azimuth zero guard
  private val Sqrt7 = math.sqrt(7.0)
  private val Sin60 = math.sqrt(3.0) / 2.0
  // rotation between class II and class III grids: asin(sqrt(3/28))
  private val Ap7RotRads = math.asin(math.sqrt(3.0 / 28.0))
  // res-0 hexagon edge length in gnomonic units (1/phi^2)
  private val Res0UGnomonic = 0.38196601125010500003
  private val EarthRadiusKm = 6371.007180918475

  // direction digits: 0 center, 1 K, 2 J, 3 JK, 4 I, 5 IK, 6 IJ, 7 invalid
  private val CenterDigit = 0
  private val KDigit = 1
  private val JKDigit = 3
  private val IDigit = 4
  private val IKDigit = 5
  private val InvalidDigit = 7

  // ------------------------------------------------------------------
  // integer IJK lattice coordinates (redundant 3-axis hex coords)
  // ------------------------------------------------------------------
  final case class IJK(i: Int, j: Int, k: Int) {
    def +(o: IJK): IJK = IJK(i + o.i, j + o.j, k + o.k)
    def -(o: IJK): IJK = IJK(i - o.i, j - o.j, k - o.k)
    def *(s: Int): IJK = IJK(i * s, j * s, k * s)
    def sum: Int = i + j + k
    def normalize: IJK = {
      var (a, b, c) = (i, j, k)
      if (a < 0) { b -= a; c -= a; a = 0 }
      if (b < 0) { a -= b; c -= b; b = 0 }
      if (c < 0) { a -= c; b -= c; c = 0 }
      val min = math.min(a, math.min(b, c))
      if (min > 0) { a -= min; b -= min; c -= min }
      IJK(a, b, c)
    }
  }

  private val UnitVecs: Array[IJK] = Array(
    IJK(0, 0, 0), IJK(0, 0, 1), IJK(0, 1, 0), IJK(0, 1, 1),
    IJK(1, 0, 0), IJK(1, 0, 1), IJK(1, 1, 0))

  private def unitIjkToDigit(c: IJK): Int = {
    val n = c.normalize
    val idx = UnitVecs.indexOf(n)
    if (idx < 0) InvalidDigit else idx
  }

  /** rotate a single direction digit 60 degrees ccw / cw */
  private def rotDigitCcw(d: Int): Int = d match {
    case 1 => 5; case 5 => 4; case 4 => 6; case 6 => 2; case 2 => 3; case 3 => 1
    case other => other
  }
  private def rotDigitCw(d: Int): Int = d match {
    case 1 => 3; case 3 => 2; case 2 => 6; case 6 => 4; case 4 => 5; case 5 => 1
    case other => other
  }

  /** rotate IJK coords 60 degrees ccw / cw about the origin */
  private def ijkRotate60ccw(c: IJK): IJK =
    (UnitVecs(6) * c.i + UnitVecs(3) * c.j + UnitVecs(5) * c.k).normalize // i->ij, j->jk, k->ik
  private def ijkRotate60cw(c: IJK): IJK =
    (UnitVecs(5) * c.i + UnitVecs(6) * c.j + UnitVecs(3) * c.k).normalize // i->ik, j->ij, k->jk

  /** aperture-7 down-sampling: coords of this center in the next-finer grid.
    * downAp7 = counter-clockwise (entering class III), downAp7r = clockwise.
    */
  private def downAp7(c: IJK): IJK =
    (IJK(3, 0, 1) * c.i + IJK(1, 3, 0) * c.j + IJK(0, 1, 3) * c.k).normalize
  private def downAp7r(c: IJK): IJK =
    (IJK(3, 1, 0) * c.i + IJK(0, 3, 1) * c.j + IJK(1, 0, 3) * c.k).normalize

  /** aperture-7 up-sampling: nearest coarser-grid center containing coords */
  private def upAp7(c: IJK): IJK = {
    val i = c.i - c.k; val j = c.j - c.k
    IJK(math.round((3 * i - j) / 7.0).toInt, math.round((i + 2 * j) / 7.0).toInt, 0).normalize
  }
  private def upAp7r(c: IJK): IJK = {
    val i = c.i - c.k; val j = c.j - c.k
    IJK(math.round((2 * i + j) / 7.0).toInt, math.round((3 * j - i) / 7.0).toInt, 0).normalize
  }

  private def ijkDistance(a: IJK, b: IJK): Int = {
    val d = (a - b).normalize
    math.max(math.abs(d.i), math.max(math.abs(d.j), math.abs(d.k)))
  }

  // cube coords for hex-line interpolation
  private def ijkToCube(c: IJK): (Double, Double, Double) = {
    val i = -c.i + c.k; val j = c.j - c.k
    (i.toDouble, j.toDouble, (-i - j).toDouble)
  }
  private def cubeToIjk(x: Long, y: Long, z: Long): IJK =
    IJK(-x.toInt, y.toInt, 0).normalize
  private def cubeRound(x: Double, y: Double, z: Double): (Long, Long, Long) = {
    var ri = math.round(x); var rj = math.round(y); var rk = math.round(z)
    val iD = math.abs(ri - x); val jD = math.abs(rj - y); val kD = math.abs(rk - z)
    if (iD > jD && iD > kD) ri = -rj - rk
    else if (jD > kD) rj = -ri - rk
    else rk = -ri - rj
    (ri, rj, rk)
  }

  // ------------------------------------------------------------------
  // hex2d <-> IJK
  // ------------------------------------------------------------------
  private def ijkToHex2d(c: IJK): (Double, Double) = {
    val i = c.i - c.k; val j = c.j - c.k
    (i - 0.5 * j, j * Sin60)
  }

  /** snap a continuous hex-plane point to the containing cell's IJK coords */
  private def hex2dToCoordIJK(x: Double, y: Double): IJK = {
    var hi = 0; var hj = 0
    val a1 = math.abs(x); val a2 = math.abs(y)
    val x2 = a2 / Sin60
    val x1 = a1 + x2 / 2.0
    val m1 = x1.toInt; val m2 = x2.toInt
    val r1 = x1 - m1; val r2 = x2 - m2
    if (r1 < 0.5) {
      if (r1 < 1.0 / 3.0) {
        hi = m1
        hj = if (r2 < (1.0 + r1) / 2.0) m2 else m2 + 1
      } else {
        hj = if (r2 < (1.0 - r1)) m2 else m2 + 1
        hi = if ((1.0 - r1) <= r2 && r2 < (2.0 * r1)) m1 + 1 else m1
      }
    } else {
      if (r1 < 2.0 / 3.0) {
        hj = if (r2 < (1.0 - r1)) m2 else m2 + 1
        hi = if ((2.0 * r1 - 1.0) < r2 && r2 < (1.0 - r1)) m1 else m1 + 1
      } else {
        hi = m1 + 1
        hj = if (r2 < (r1 / 2.0)) m2 else m2 + 1
      }
    }
    // fold across the axes if necessary
    if (x < 0.0) {
      if (hj % 2 == 0) { val axisi = hj / 2; hi = hi - 2 * (hi - axisi) }
      else { val axisi = (hj + 1) / 2; hi = hi - (2 * (hi - axisi) + 1) }
    }
    var res = IJK(hi, hj, 0)
    if (y < 0.0) res = IJK(res.i - (2 * res.j + 1) / 2, -res.j, res.k)
    res.normalize
  }

  // ------------------------------------------------------------------
  // spherical geometry
  // ------------------------------------------------------------------
  final case class Geo(lat: Double, lng: Double) // radians

  private def posAngle(a: Double): Double = {
    val tau = 2.0 * math.Pi
    var r = a % tau
    if (r < 0.0) r += tau
    r
  }
  private def constrainLng(l: Double): Double = {
    var lng = l
    while (lng > math.Pi) lng -= 2.0 * math.Pi
    while (lng < -math.Pi) lng += 2.0 * math.Pi
    lng
  }

  private def geoAzimuth(p1: Geo, p2: Geo): Double =
    math.atan2(
      math.cos(p2.lat) * math.sin(p2.lng - p1.lng),
      math.cos(p1.lat) * math.sin(p2.lat) -
        math.sin(p1.lat) * math.cos(p2.lat) * math.cos(p2.lng - p1.lng))

  /** destination point at (azimuth, angular distance) from p1 */
  private def geoAzDistance(p1: Geo, azimuth: Double, distance: Double): Geo = {
    if (distance < Eps) return p1
    val az = posAngle(azimuth)
    if (az < Eps || math.abs(az - math.Pi) < Eps) { // due north/south
      val lat = if (az < Eps) p1.lat + distance else p1.lat - distance
      if (math.abs(lat - math.Pi / 2) < Eps) Geo(math.Pi / 2, 0.0)
      else if (math.abs(lat + math.Pi / 2) < Eps) Geo(-math.Pi / 2, 0.0)
      else Geo(lat, constrainLng(p1.lng))
    } else {
      var sinlat = math.sin(p1.lat) * math.cos(distance) +
        math.cos(p1.lat) * math.sin(distance) * math.cos(az)
      sinlat = math.max(-1.0, math.min(1.0, sinlat))
      val lat = math.asin(sinlat)
      if (math.abs(lat - math.Pi / 2) < Eps) Geo(math.Pi / 2, 0.0)
      else if (math.abs(lat + math.Pi / 2) < Eps) Geo(-math.Pi / 2, 0.0)
      else {
        var sinlng = math.sin(az) * math.sin(distance) / math.cos(lat)
        var coslng = (math.cos(distance) - math.sin(p1.lat) * sinlat) /
          (math.cos(p1.lat) * math.cos(lat))
        sinlng = math.max(-1.0, math.min(1.0, sinlng))
        coslng = math.max(-1.0, math.min(1.0, coslng))
        Geo(lat, constrainLng(p1.lng + math.atan2(sinlng, coslng)))
      }
    }
  }

  private def geoToVec3(g: Geo): (Double, Double, Double) = {
    val r = math.cos(g.lat)
    (math.cos(g.lng) * r, math.sin(g.lng) * r, math.sin(g.lat))
  }
  private def sqDist3(a: (Double, Double, Double), b: (Double, Double, Double)): Double = {
    val dx = a._1 - b._1; val dy = a._2 - b._2; val dz = a._3 - b._3
    dx * dx + dy * dy + dz * dz
  }
  private def angularDist(a: Geo, b: Geo): Double = {
    val sl = math.sin((b.lat - a.lat) / 2); val sg = math.sin((b.lng - a.lng) / 2)
    val h = sl * sl + math.cos(a.lat) * math.cos(b.lat) * sg * sg
    2.0 * math.asin(math.sqrt(math.min(1.0, h)))
  }

  // ------------------------------------------------------------------
  // seed table 1: icosahedron face centers (lat, lng radians).
  // Published H3 spec data (h3geo.org / lib faceijk); geometry-validated in
  // initTables (pairwise angles must match a regular icosahedron).
  // ------------------------------------------------------------------
  private val faceCenterGeo: Array[Geo] = Array(
    Geo(0.803582649718989942, 1.248397419617396099), // 0
    Geo(1.307747883455638156, 2.536945009877921159), // 1
    Geo(1.054751253523952054, -1.347517358900396623), // 2
    Geo(0.600191595538186799, -0.450603909469755746), // 3
    Geo(0.491715428198773866, 0.401988202911306943), // 4
    Geo(0.172745327415618701, 1.678146885280433686), // 5
    Geo(0.605929321571350690, 2.953923329812411617), // 6
    Geo(0.427370518328979641, -1.888876200336285401), // 7
    Geo(-0.079066118549212831, -0.733429513380867741), // 8
    Geo(-0.230961644455383637, 0.506495587332349035), // 9
    Geo(0.079066118549212831, 2.408163140208925497), // 10
    Geo(0.230961644455383637, -2.635097066257444203), // 11
    Geo(-0.172745327415618701, -1.463445768309359553), // 12
    Geo(-0.605929321571350690, -0.187669323777381622), // 13
    Geo(-0.427370518328979641, 1.252716453253507838), // 14
    Geo(-0.600191595538186799, 2.690988744120037492), // 15
    Geo(-0.491715428198773866, -2.739604450678486295), // 16
    Geo(-0.803582649718989942, -1.893195233972397139), // 17
    Geo(-1.307747883455638156, -0.604647643711872080), // 18
    Geo(-1.054751253523952054, 1.794075294689396615)) // 19

  // seed table 2: azimuth (radians) from each face center to its class-II
  // i-axis (which points at an icosahedron vertex; validated in initTables).
  private val faceAxisAzimuth: Array[Double] = Array(
    5.619958268523939882, // 0
    5.760339081714187279, // 1
    0.780213654393430055, // 2
    0.430469363979999913, // 3
    6.130269123335111400, // 4
    2.692877706530642877, // 5
    2.982963003477243874, // 6
    3.532912002790141181, // 7
    3.494305004259568154, // 8
    3.003214169499538391, // 9
    5.930472956509811562, // 10
    0.138378484090254847, // 11
    0.448714947059150361, // 12
    0.158629650112549365, // 13
    5.891865957979238535, // 14
    2.711123289609793325, // 15
    3.294508837434268316, // 16
    3.804819692245439833, // 17
    3.664438879055192436, // 18
    2.361378999196363184) // 19

  // seed table 3: base cell home positions {face, i, j, k} plus, for the 12
  // pentagons, the faces on which their digit system is clockwise-offset.
  private final case class BaseCellSeed(face: Int, coord: IJK, cwOffset: (Int, Int))
  private val PentagonBaseCells = Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
  private def isBaseCellPentagon(bc: Int): Boolean = PentagonBaseCells.contains(bc)
  private def isPolarPentagon(bc: Int): Boolean = bc == 4 || bc == 117

  private val baseCellSeed: Array[BaseCellSeed] = {
    def h(face: Int, i: Int, j: Int, k: Int) = BaseCellSeed(face, IJK(i, j, k), (-1, -1))
    def p(face: Int, a: Int, b: Int) = BaseCellSeed(face, IJK(2, 0, 0), (a, b))
    Array(
      h(1, 1, 0, 0), h(2, 1, 1, 0), h(1, 0, 0, 0), h(2, 1, 0, 0), // 0-3
      p(0, -1, -1), // 4 polar pentagon
      h(1, 1, 1, 0), h(1, 0, 0, 1), h(2, 0, 0, 0), h(0, 1, 0, 0), h(2, 0, 1, 0), // 5-9
      h(1, 0, 1, 0), h(1, 0, 1, 1), h(3, 1, 0, 0), h(3, 1, 1, 0), // 10-13
      p(11, 2, 6), // 14
      h(4, 1, 0, 0), h(0, 0, 0, 0), h(6, 0, 1, 0), h(0, 0, 0, 1), h(2, 0, 1, 1), // 15-19
      h(7, 0, 0, 1), h(2, 0, 0, 1), h(0, 1, 1, 0), h(6, 0, 0, 1), // 20-23
      p(10, 1, 5), // 24
      h(6, 0, 0, 0), h(3, 0, 0, 0), h(11, 1, 0, 0), h(4, 1, 1, 0), h(3, 0, 1, 0), // 25-29
      h(0, 0, 1, 1), h(4, 0, 0, 0), h(5, 0, 1, 0), h(0, 0, 1, 0), h(7, 0, 1, 0), // 30-34
      h(11, 1, 1, 0), h(7, 0, 0, 0), h(10, 1, 0, 0), // 35-37
      p(12, 3, 7), // 38
      h(6, 1, 0, 1), h(7, 1, 0, 1), h(4, 0, 0, 1), h(3, 0, 0, 1), h(3, 0, 1, 1), // 39-43
      h(4, 0, 1, 0), h(6, 1, 0, 0), h(11, 0, 0, 0), h(8, 0, 0, 1), h(5, 0, 0, 1), // 44-48
      p(14, 0, 9), // 49
      h(5, 0, 0, 0), h(12, 1, 0, 0), h(10, 1, 1, 0), h(4, 0, 1, 1), h(12, 1, 1, 0), // 50-54
      h(7, 1, 0, 0), h(11, 0, 1, 0), h(10, 0, 0, 0), // 55-57
      p(13, 4, 8), // 58
      h(10, 0, 0, 1), h(11, 0, 0, 1), h(9, 0, 1, 0), h(8, 0, 1, 0), // 59-62
      p(6, 11, 15), // 63
      h(8, 0, 0, 0), h(9, 0, 0, 1), h(14, 1, 0, 0), h(5, 1, 0, 1), h(16, 0, 1, 1), // 64-68
      h(8, 1, 0, 1), h(5, 1, 0, 0), h(12, 0, 0, 0), // 69-71
      p(7, 12, 16), // 72
      h(12, 0, 1, 0), h(10, 0, 1, 0), h(9, 0, 0, 0), h(13, 1, 0, 0), h(16, 0, 0, 1), // 73-77
      h(15, 0, 1, 1), h(15, 0, 1, 0), h(16, 0, 1, 0), h(14, 1, 1, 0), h(13, 1, 1, 0), // 78-82
      p(5, 10, 19), // 83
      h(8, 1, 0, 0), h(14, 0, 0, 0), h(9, 1, 0, 1), h(14, 0, 0, 1), h(17, 0, 0, 1), // 84-88
      h(12, 0, 0, 1), h(16, 0, 0, 0), h(17, 0, 1, 1), h(15, 0, 0, 1), h(16, 1, 0, 1), // 89-93
      h(9, 1, 0, 0), h(15, 0, 0, 0), h(13, 0, 0, 0), // 94-96
      p(8, 13, 17), // 97
      h(13, 0, 1, 0), h(17, 1, 0, 1), h(19, 0, 1, 0), h(14, 0, 1, 0), h(19, 0, 1, 1), // 98-102
      h(17, 0, 1, 0), h(13, 0, 0, 1), h(17, 0, 0, 0), h(16, 1, 0, 0), // 103-106
      p(9, 14, 18), // 107
      h(15, 1, 0, 1), h(15, 1, 0, 0), h(18, 0, 1, 1), h(18, 0, 0, 1), h(19, 0, 0, 1), // 108-112
      h(17, 1, 0, 0), h(19, 0, 0, 0), h(18, 0, 1, 0), h(18, 1, 0, 1), // 113-116
      p(19, -1, -1), // 117 polar pentagon
      h(19, 1, 0, 0), h(18, 0, 0, 0), h(19, 1, 0, 1), h(18, 1, 0, 0)) // 118-121
  }

  // ------------------------------------------------------------------
  // gnomonic projection: geo <-> continuous hex-plane coords on a face
  // ------------------------------------------------------------------
  private lazy val faceCenterPoint: Array[(Double, Double, Double)] =
    faceCenterGeo.map(geoToVec3)

  private def geoToClosestFace(g: Geo): (Int, Double) = {
    val v = geoToVec3(g)
    var face = 0; var sqd = 5.0
    var f = 0
    while (f < NumFaces) {
      val d = sqDist3(faceCenterPoint(f), v)
      if (d < sqd) { face = f; sqd = d }
      f += 1
    }
    (face, sqd)
  }

  /** geo -> hex2d coords on a given face at resolution res */
  private def geoToHex2dOnFace(g: Geo, face: Int, res: Int): (Double, Double) = {
    val sqd = sqDist3(faceCenterPoint(face), geoToVec3(g))
    var r = math.acos(math.max(-1.0, math.min(1.0, 1.0 - sqd / 2.0)))
    if (r < Eps) return (0.0, 0.0)
    var theta = posAngle(faceAxisAzimuth(face) - posAngle(geoAzimuth(faceCenterGeo(face), g)))
    if (isClassIII(res)) theta = posAngle(theta - Ap7RotRads)
    r = math.tan(r) / Res0UGnomonic
    var i = 0
    while (i < res) { r *= Sqrt7; i += 1 }
    (r * math.cos(theta), r * math.sin(theta))
  }

  /** geo -> hex2d coords on the nearest face at resolution res */
  private def geoToHex2d(g: Geo, res: Int): (Int, Double, Double) = {
    val (face, _) = geoToClosestFace(g)
    val (x, y) = geoToHex2dOnFace(g, face, res)
    (face, x, y)
  }

  /** continuous hex2d coords on a face -> geo at resolution res */
  private def hex2dToGeo(x: Double, y: Double, face: Int, res: Int): Geo = {
    var r = math.sqrt(x * x + y * y)
    if (r < Eps) return faceCenterGeo(face)
    var theta = math.atan2(y, x)
    var i = 0
    while (i < res) { r /= Sqrt7; i += 1 }
    r = math.atan(r * Res0UGnomonic)
    if (isClassIII(res)) theta = posAngle(theta + Ap7RotRads)
    theta = posAngle(faceAxisAzimuth(face) - theta)
    geoAzDistance(faceCenterGeo(face), theta, r)
  }

  private def isClassIII(res: Int): Boolean = (res & 1) == 1

  private final case class FaceIJK(face: Int, coord: IJK)

  private def faceIjkToGeo(f: FaceIJK, res: Int): Geo = {
    val (x, y) = ijkToHex2d(f.coord)
    hex2dToGeo(x, y, f.face, res)
  }
  private def geoToFaceIjk(g: Geo, res: Int): FaceIJK = {
    val (face, x, y) = geoToHex2d(g, res)
    FaceIJK(face, hex2dToCoordIJK(x, y))
  }

  // ------------------------------------------------------------------
  // H3 index bit layout
  // ------------------------------------------------------------------
  private val ModeOffset = 59
  private val ResOffset = 52
  private val BcOffset = 45
  private val H3Init = (1L << 45) - 1 // all 15 digits = 7

  private def getRes(h: Long): Int = ((h >>> ResOffset) & 0xF).toInt
  private def setRes(h: Long, r: Int): Long = (h & ~(0xFL << ResOffset)) | (r.toLong << ResOffset)
  private def getBaseCellBits(h: Long): Int = ((h >>> BcOffset) & 0x7F).toInt
  private def setBaseCell(h: Long, bc: Int): Long = (h & ~(0x7FL << BcOffset)) | (bc.toLong << BcOffset)
  private def digitOffset(r: Int): Int = (MaxRes - r) * 3
  private def getDigit(h: Long, r: Int): Int = ((h >>> digitOffset(r)) & 7L).toInt
  private def setDigit(h: Long, r: Int, d: Int): Long =
    (h & ~(7L << digitOffset(r))) | (d.toLong << digitOffset(r))
  private def newIndex(res: Int): Long =
    setRes(H3Init | (1L << ModeOffset), res)

  private def leadingNonZeroDigit(h: Long): Int = {
    val res = getRes(h)
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d != 0) return d
      r += 1
    }
    CenterDigit
  }

  private def rotate60ccw(h0: Long): Long = {
    var h = h0
    val res = getRes(h)
    var r = 1
    while (r <= res) { h = setDigit(h, r, rotDigitCcw(getDigit(h, r))); r += 1 }
    h
  }
  private def rotate60cw(h0: Long): Long = {
    var h = h0
    val res = getRes(h)
    var r = 1
    while (r <= res) { h = setDigit(h, r, rotDigitCw(getDigit(h, r))); r += 1 }
    h
  }
  private def rotatePent60ccw(h0: Long): Long = {
    var h = h0
    val res = getRes(h)
    var found = false
    var r = 1
    while (r <= res) {
      h = setDigit(h, r, rotDigitCcw(getDigit(h, r)))
      if (!found && getDigit(h, r) != 0) {
        found = true
        if (leadingNonZeroDigit(h) == KDigit) h = rotate60ccw(h)
      }
      r += 1
    }
    h
  }
  private def rotatePent60cw(h0: Long): Long = {
    var h = h0
    val res = getRes(h)
    var found = false
    var r = 1
    while (r <= res) {
      h = setDigit(h, r, rotDigitCw(getDigit(h, r)))
      if (!found && getDigit(h, r) != 0) {
        found = true
        if (leadingNonZeroDigit(h) == KDigit) h = rotate60cw(h)
      }
      r += 1
    }
    h
  }

  def isPentagon(h: Long): Boolean =
    isBaseCellPentagon(getBaseCellBits(h)) && leadingNonZeroDigit(h) == CenterDigit

  // ------------------------------------------------------------------
  // derived adjacency tables
  // ------------------------------------------------------------------
  private final case class FaceOrient(face: Int, translate: IJK, ccwRot60: Int)

  private def maxDimCII(res: Int): Int = 2 * math.pow(7, res / 2).toInt
  private def unitScaleCII(res: Int): Int = math.pow(7, res / 2).toInt

  /** Everything derived from the seed tables, built once and validated. */
  private object Tables {
    // --- geometric seed validation: regular-icosahedron invariants ---
    private val adjacentAngle = math.acos(math.sqrt(5.0) / 3.0) // adjacent face centers
    for (f <- 0 until NumFaces) {
      val near = (0 until NumFaces).filter(g =>
        g != f && math.abs(angularDist(faceCenterGeo(f), faceCenterGeo(g)) - adjacentAngle) < 1e-9)
      require(near.size == 3, s"face $f: expected 3 adjacent faces, got ${near.size} (bad faceCenterGeo)")
    }

    // icosahedron vertices are validated against pentagon centers further
    // down (after baseCellCenter is built): every face corner coordinate
    // (2,0,0)/(0,2,0)/(0,0,2) must coincide with a pentagon's home-derived
    // center, which cross-checks faceAxisAzimuth and baseCellSeed together.

    // --- faceNeighbors: per-face per-quadrant lattice transform, fitted from
    //     shared-edge lattice points (exact on the edge) over 18 candidates ---
    // quadrant indices like the C library: 1=IJ (k==0), 2=KI (k>0,j==0), 3=JK (k>0,j>0)
    val faceNeighbors: Array[Array[FaceOrient]] = {
      val fitRes = 2 // class II, maxDim 14, unitScale 7
      val maxD = maxDimCII(fitRes); val scale = unitScaleCII(fitRes)
      val out = Array.ofDim[FaceOrient](NumFaces, 4)
      for (f <- 0 until NumFaces) {
        out(f)(0) = FaceOrient(f, IJK(0, 0, 0), 0)
        // edge sample points per quadrant (on-face, exact in both systems)
        val edges: Map[Int, Seq[IJK]] = Map(
          1 -> (3 to 11 by 2).map(m => IJK(maxD - m, m, 0)), // IJ edge: corners i/j
          2 -> (3 to 11 by 2).map(m => IJK(m, 0, maxD - m)), // KI edge: corners k/i
          3 -> (3 to 11 by 2).map(m => IJK(0, m, maxD - m))) // JK edge: corners j/k
        for (q <- 1 to 3) {
          val pts = edges(q)
          val mid = faceIjkToGeo(FaceIJK(f, pts(pts.size / 2)), fitRes)
          // target face: second-nearest face center to the edge midpoint
          val byDist = (0 until NumFaces).sortBy(g => angularDist(faceCenterGeo(g), mid))
          val g = if (byDist.head == f) byDist(1) else byDist.head
          // same edge points, in g's coordinate system (exact: mirror symmetry
          // makes the two projections agree pointwise along the shared edge)
          val ptsG = pts.map { p =>
            val geo = faceIjkToGeo(FaceIJK(f, p), fitRes)
            val (gx, gy) = geoToHex2dOnFace(geo, g, fitRes)
            hex2dToCoordIJK(gx, gy)
          }
          // solve c_G = rot_ccw^r(c_F) + t*scale for (r, t); diffs compared in
          // unique 2-axis form since redundant IJK reps of a vector differ
          val fits = for {
            r <- 0 to 5
            rotated = pts.map { p =>
              var c = p; var i = 0
              while (i < r) { c = ijkRotate60ccw(c); i += 1 }
              c
            }
            diffs = rotated.zip(ptsG).map { case (a, b) =>
              val d = b - a
              (d.i - d.k, d.j - d.k)
            }
            if diffs.distinct.size == 1
            t = IJK(diffs.head._1, diffs.head._2, 0).normalize
            if t.i % scale == 0 && t.j % scale == 0 && t.k % scale == 0
          } yield FaceOrient(g, IJK(t.i / scale, t.j / scale, t.k / scale), r)
          require(fits.size == 1, s"face $f quadrant $q -> $g: ${fits.size} transform fits: $fits")
          out(f)(q) = fits.head
        }
      }
      out
    }

    // --- base cell geometry ---
    val baseCellCenter: Array[Geo] =
      baseCellSeed.map(s => faceIjkToGeo(FaceIJK(s.face, s.coord), 0))
    require(PentagonBaseCells.forall(bc => baseCellSeed(bc).coord == IJK(2, 0, 0)),
      "pentagon home coords must be the i-axis vertex")
    // every face corner must coincide with a pentagon center (each pentagon
    // covers 5 corners) — cross-checks azimuths and base cell homes together
    locally {
      var cornerHits = 0
      for (f <- 0 until NumFaces; corner <- Seq(IJK(2, 0, 0), IJK(0, 2, 0), IJK(0, 0, 2))) {
        val g = faceIjkToGeo(FaceIJK(f, corner), 0)
        val hit = PentagonBaseCells.exists(bc => angularDist(g, baseCellCenter(bc)) < 1e-9)
        require(hit, s"face $f corner $corner is not a pentagon center (bad seed tables)")
        cornerHits += 1
      }
      require(cornerHits == 60, s"corner coverage $cornerHits != 60")
    }

    private def nearestBaseCell(g: Geo): (Int, Double) = {
      var best = -1; var bd = 1e9
      var bc = 0
      while (bc < NumBaseCells) {
        val d = angularDist(g, baseCellCenter(bc))
        if (d < bd) { best = bc; bd = d }
        bc += 1
      }
      (best, bd)
    }

    /** resolve raw res-0 face coords (components 0..2, possibly overflowing the
      * face) to (cell, accumulated ccw rotations, final face)
      */
    private def resolveRes0(face0: Int, raw: IJK): (Int, Int, Int) = {
      var face = face0; var c = raw.normalize; var rots = 0; var iter = 0
      val trace = ArrayBuffer[(Int, IJK)]((face, c))
      while (c.sum > 2 && iter < 4) {
        val q = if (c.k > 0) { if (c.j > 0) 3 else 2 } else 1
        val fo = faceNeighbors(face)(q)
        var cc = c
        var i = 0
        while (i < fo.ccwRot60) { cc = ijkRotate60ccw(cc); i += 1 }
        c = (cc + fo.translate).normalize
        face = fo.face
        rots += fo.ccwRot60
        iter += 1
        trace += ((face, c))
      }
      require(c.sum <= 2, s"res0 overage did not resolve: face $face0 $raw trace=${trace.toList} " +
        s"neighbors=${faceNeighbors(face0).toList}")
      val g = faceIjkToGeo(FaceIJK(face, c), 0)
      val (cell, d) = nearestBaseCell(g)
      require(d < 1e-9, s"no base cell at face $face $c (nearest $cell at $d rad)")
      (cell, rots, face)
    }

    // --- faceIjkBaseCells equivalent: (face, i, j, k in 0..2) -> (cell, ccwRot60).
    //     Hexagon rotations from face-transform composition; pentagon rotations
    //     fitted below by round-trip consistency. ---
    val fijkCell: Array[Array[Array[Array[Int]]]] = Array.ofDim[Int](NumFaces, 3, 3, 3)
    val fijkRot: Array[Array[Array[Array[Int]]]] = Array.ofDim[Int](NumFaces, 3, 3, 3)
    private val pentagonEntries = ArrayBuffer[(Int, Int, Int, Int)]()
    for (f <- 0 until NumFaces; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2) {
      val (cell, rots, finalFace) = resolveRes0(f, IJK(i, j, k))
      fijkCell(f)(i)(j)(k) = cell
      if (isBaseCellPentagon(cell)) {
        fijkRot(f)(i)(j)(k) = -1 // fit below
        pentagonEntries += ((f, i, j, k))
      } else {
        val home = baseCellSeed(cell)
        val rotHome =
          if (home.face == finalFace) 0
          else {
            val q = (1 to 3).find(qq => faceNeighbors(finalFace)(qq).face == home.face)
            require(q.isDefined, s"hexagon $cell home ${home.face} not adjacent to $finalFace")
            faceNeighbors(finalFace)(q.get).ccwRot60
          }
        fijkRot(f)(i)(j)(k) = (rots + rotHome) % 6
      }
    }

    // fit pentagon rotations: every pentagon-resolved entry gets the unique
    // rotation under which all res-1..3 descendants of pentagons round-trip
    // (cell center -> geo -> cell). cellToGeo is independent of this table.
    locally {
      // group sample cells by the raw (face, ijk) entry their geo lookup uses
      def entryOf(g: Geo, res: Int): (Int, IJK) = {
        var fijk = geoToFaceIjk(g, res)
        var c = fijk.coord
        var r = res
        while (r > 0) { c = if (isClassIII(r)) upAp7(c) else upAp7r(c); r -= 1 }
        (fijk.face, c)
      }
      val samples = ArrayBuffer[(Long, Geo, Int, IJK)]()
      for (bc <- PentagonBaseCells; res <- 1 to 4) {
        def rec(cell: Long, r: Int): Unit =
          if (r == res) {
            val g = cellToLatLngInternal(cell)
            val (ef, ec) = entryOf(g, res)
            if (ec.i <= 2 && ec.j <= 2 && ec.k <= 2 && isBaseCellPentagon(fijkCell(ef)(ec.i)(ec.j)(ec.k)))
              samples += ((cell, g, ef, ec))
          } else {
            val ds = if (isPentagon(cell)) Seq(0, 2, 3, 4, 5, 6) else (0 to 6)
            ds.foreach { d => rec(setDigit(setRes(cell, r + 1), r + 1, d), r + 1) }
          }
        rec(setBaseCell(newIndex(0), bc), 0)
      }
      val byEntry = samples.groupBy(s => (s._3, s._4))
      for (((f, c), ss) <- byEntry) {
        val fits = (0 to 5).filter { cand =>
          fijkRot(f)(c.i)(c.j)(c.k) = cand
          ss.forall { case (cell, g, _, _) => latLngToCellInternal(g, getRes(cell)) == cell }
        }
        // pentagon digit rotation is a 5-cycle (rotatePent60ccw^5 == id), so
        // fits {0,5} are genuinely equivalent; any other fit must be unique
        require(fits.size == 1 || fits.toList == List(0, 5),
          s"pentagon entry face $f $c: inconsistent rotation fits ${fits.toList}")
        fijkRot(f)(c.i)(c.j)(c.k) = fits.min
      }
      for ((f, i, j, k) <- pentagonEntries)
        require(fijkRot(f)(i)(j)(k) >= 0, s"pentagon entry face $f ($i,$j,$k) never sampled")
    }

    // --- base cell neighbors ---
    // Hexagons: exact flat-lattice stepping from the home position (overage
    // transforms are exact). Pentagons sit on vertices where the lattice has
    // a 60-degree disclination, so flat stepping is unreliable; their rows are
    // reconstructed from the hexagon rows (set, by symmetry), azimuth order
    // around the vertex (directions), and res-2 traversal fitting (rotations).
    val baseCellNeighbors: Array[Array[Int]] = Array.fill(NumBaseCells, 7)(-1)
    val baseCellNeighborRots: Array[Array[Int]] = Array.fill(NumBaseCells, 7)(0)
    for (bc <- 0 until NumBaseCells if !isBaseCellPentagon(bc)) {
      baseCellNeighbors(bc)(0) = bc
      val seed = baseCellSeed(bc)
      for (d <- 1 to 6) {
        val stepped = (seed.coord + UnitVecs(d)).normalize
        var face = seed.face; var c = stepped; var rots = 0; var iter = 0
        while (c.sum > 2 && iter < 4) {
          val q = if (c.k > 0) { if (c.j > 0) 3 else 2 } else 1
          val fo = faceNeighbors(face)(q)
          var cc = c
          var i = 0
          while (i < fo.ccwRot60) { cc = ijkRotate60ccw(cc); i += 1 }
          c = (cc + fo.translate).normalize
          face = fo.face
          rots += fo.ccwRot60
          iter += 1
        }
        val g = faceIjkToGeo(FaceIJK(face, c), 0)
        val (n, dist) = nearestBaseCell(g)
        require(dist < 1e-9, s"base cell $bc dir $d: no neighbor at face $face $c")
        val rotHome =
          if (isBaseCellPentagon(n)) fijkRot(face)(c.i)(c.j)(c.k)
          else if (baseCellSeed(n).face == face) 0
          else {
            val q = (1 to 3).find(qq => faceNeighbors(face)(qq).face == baseCellSeed(n).face)
            require(q.isDefined, s"neighbor $n home not adjacent to face $face")
            faceNeighbors(face)(q.get).ccwRot60
          }
        baseCellNeighbors(bc)(d) = n
        baseCellNeighborRots(bc)(d) = (rots + rotHome) % 6
      }
      val ns = (1 to 6).map(baseCellNeighbors(bc)(_))
      require(ns.distinct.size == 6, s"base cell $bc: bad neighbor set $ns")
    }

    for (bc <- 0 until NumBaseCells if isBaseCellPentagon(bc)) {
      baseCellNeighbors(bc)(0) = bc
      // neighbor set: hexagons that point at this pentagon (their rows are exact)
      val s = (0 until NumBaseCells).filter(h => !isBaseCellPentagon(h) &&
        (1 to 6).exists(d => baseCellNeighbors(h)(d) == bc))
      require(s.size == 5, s"pentagon $bc: neighbor set $s")
      // direction assignment via a table-independent anchor: the res-1 child
      // with digit d sits against edge d, so the set member nearest to that
      // child's center (placed by h3ToFaceIjk, which only uses faceNeighbors)
      // is the direction-d neighbor
      val res1 = setRes(setBaseCell(newIndex(0), bc), 1)
      for (d <- Seq(2, JKDigit, IDigit, IKDigit, 6)) {
        val childGeo = cellToLatLngInternal(setDigit(res1, 1, d))
        val byDist = s.sortBy(n => angularDist(childGeo, baseCellCenter(n)))
        val margin = angularDist(childGeo, baseCellCenter(byDist(1))) -
          angularDist(childGeo, baseCellCenter(byDist(0)))
        require(margin > 0.02, s"pentagon $bc dir $d: ambiguous neighbor (margin $margin)")
        baseCellNeighbors(bc)(d) = byDist.head
      }
      val ns = (1 to 6).map(baseCellNeighbors(bc)(_)).filter(_ >= 0)
      require(ns.distinct.size == 5, s"pentagon $bc: bad direction assignment $ns")
    }

    // neighbor symmetry (pentagon rows now included)
    for (bc <- 0 until NumBaseCells; d <- 1 to 6; n = baseCellNeighbors(bc)(d); if n >= 0 && n != bc)
      require((1 to 6).exists(dd => baseCellNeighbors(n)(dd) == bc),
        s"asymmetric neighbors $bc->$n: row($bc)=${baseCellNeighbors(bc).toList} " +
        s"row($n)=${baseCellNeighbors(n).toList}")

    // --- aperture-7 digit adjacency (single-step move tables), computed from
    //     integer lattice math for both grid classes ---
    // (newDigit, carryDir) for moving a child at digit a one step in direction d
    val newDigit: Array[Array[Array[Int]]] = Array.ofDim[Int](2, 7, 7)
    val newAdjustment: Array[Array[Array[Int]]] = Array.ofDim[Int](2, 7, 7)
    for (cls <- 0 to 1) { // 0 = child grid class II, 1 = child grid class III
      val down: IJK => IJK = if (cls == 1) downAp7 else downAp7r
      val up: IJK => IJK = if (cls == 1) upAp7 else upAp7r
      for (a <- 0 to 6; d <- 0 to 6) {
        if (d == 0) { newDigit(cls)(a)(d) = a; newAdjustment(cls)(a)(d) = 0 }
        else {
          val pos = (UnitVecs(a) + UnitVecs(d)).normalize
          val parent = up(pos)
          val digit = unitIjkToDigit((pos - down(parent)).normalize)
          val adj = unitIjkToDigit(parent)
          require(digit != InvalidDigit && adj != InvalidDigit, s"digit adjacency broke at $a $d")
          newDigit(cls)(a)(d) = digit
          newAdjustment(cls)(a)(d) = adj
        }
      }
    }

    // --- fit pentagon-source crossing rotations: for each pentagon row entry,
    //     the unique digit rotation under which every res-2 boundary step out
    //     of the pentagon lands geometrically adjacent to its source ---
    locally {
      def res2Cells(bc: Int): Seq[Long] = {
        val out = ArrayBuffer[Long]()
        def rec(c: Long, r: Int): Unit =
          if (r == 2) out += c
          else {
            val ds = if (isPentagon(c)) Seq(0, 2, 3, 4, 5, 6) else (0 to 6)
            ds.foreach(d => rec(setDigit(setRes(c, r + 1), r + 1, d), r + 1))
          }
        rec(setBaseCell(newIndex(0), bc), 0)
        out.toSeq
      }
      // which base-cell direction does a step (cell, dir) aggregate to?
      // (None if absorbed inside the base cell; mirrors neighborRotations)
      def aggDir(cell: Long, dir0: Int): Option[Int] = {
        var dir = dir0
        var r = getRes(cell) - 1
        while (r >= -1) {
          if (r == -1) return Some(dir)
          val oldDigit = getDigit(cell, r + 1)
          val cls = if (isClassIII(r + 1)) 1 else 0
          val adj = newAdjustment(cls)(oldDigit)(dir)
          if (adj != CenterDigit) { dir = adj; r -= 1 }
          else return None
        }
        None
      }
      for (p <- PentagonBaseCells) {
        val cells = res2Cells(p)
        val anchor = baseCellNeighbors(p)(JKDigit)
        val spacingR2 = angularDist(baseCellCenter(p), baseCellCenter(anchor)) / 7.0
        for (d <- Seq(JKDigit, IKDigit, IDigit, 6, 2)) {
          val samples = for { x <- cells; dd <- 1 to 6; a <- aggDir(x, dd) if a == d } yield (x, dd)
          require(samples.nonEmpty, s"pentagon $p dir $d: no fitting samples")
          val fits = (0 to 5).filter { cand =>
            baseCellNeighborRots(p)(d) = cand
            samples.forall { case (x, dd) =>
              try {
                val (y, _) = neighborRotations(x, dd, 0)
                val dist = angularDist(cellToLatLngInternal(x), cellToLatLngInternal(y))
                dist > 0.4 * spacingR2 && dist < 1.6 * spacingR2 &&
                  latLngToCellInternal(cellToLatLngInternal(y), 2) == y
              } catch { case _: IllegalArgumentException => false }
            }
          }
          require(fits.size == 1, s"pentagon $p dir $d: rotation fits ${fits.toList}")
          baseCellNeighborRots(p)(d) = fits.head
        }
      }
    }

    def getBaseCellDirection(from: Int, to: Int): Int =
      (1 to 6).find(d => baseCellNeighbors(from)(d) == to).getOrElse(InvalidDigit)
  }

  // ------------------------------------------------------------------
  // core conversions
  // ------------------------------------------------------------------
  /** cell -> face coords; mirrors the public _h3ToFaceIjk algorithm */
  private def h3ToFaceIjk(h0: Long): FaceIJK = {
    var h = h0
    val baseCell = getBaseCellBits(h)
    if (isBaseCellPentagon(baseCell) && leadingNonZeroDigit(h) == IKDigit)
      h = rotate60cw(h)
    val seed = baseCellSeed(baseCell)
    var coord = seed.coord
    val res = getRes(h)
    // descend digits from the base cell home
    val possibleOverage =
      isBaseCellPentagon(baseCell) || !(res == 0 || (coord == IJK(0, 0, 0)))
    var r = 1
    while (r <= res) {
      coord = if (isClassIII(r)) downAp7(coord) else downAp7r(coord)
      coord = (coord + UnitVecs(getDigit(h, r))).normalize
      r += 1
    }
    var fijk = FaceIJK(seed.face, coord)
    if (!possibleOverage) return fijk

    val origCoord = coord
    var workRes = res
    if (isClassIII(workRes)) { fijk = FaceIJK(fijk.face, downAp7r(fijk.coord)); workRes += 1 }
    val pentLeading4 = isBaseCellPentagon(baseCell) && leadingNonZeroDigit(h) == IDigit
    val (adj1, overflowed) = adjustOverage(fijk, workRes, pentLeading4)
    fijk = adj1
    if (overflowed) {
      if (isBaseCellPentagon(baseCell)) {
        var again = true
        while (again) {
          val (a, o) = adjustOverage(fijk, workRes, pentLeading4 = false)
          fijk = a; again = o
        }
      }
      if (workRes != res) fijk = FaceIJK(fijk.face, upAp7r(fijk.coord))
    } else if (workRes != res) {
      fijk = FaceIJK(fijk.face, origCoord)
    }
    fijk
  }

  /** shift coords that overflow the face onto the adjacent face (class II res) */
  private def adjustOverage(fijk: FaceIJK, res: Int, pentLeading4: Boolean): (FaceIJK, Boolean) = {
    val maxDim = maxDimCII(res)
    var c = fijk.coord
    if (c.sum <= maxDim) return (fijk, false)
    val q = if (c.k > 0) { if (c.j > 0) 3 else 2 } else 1
    if (q == 2 && pentLeading4) {
      // translate to pentagon center, rotate out of the missing sequence
      val origin = IJK(maxDim, 0, 0)
      c = (ijkRotate60cw(c - origin) + origin)
    }
    val fo = Tables.faceNeighbors(fijk.face)(q)
    var cc = c
    var i = 0
    while (i < fo.ccwRot60) { cc = ijkRotate60ccw(cc); i += 1 }
    val out = (cc + fo.translate * unitScaleCII(res)).normalize
    (FaceIJK(fo.face, out), true)
  }

  private def cellToLatLngInternal(h: Long): Geo =
    faceIjkToGeo(h3ToFaceIjk(h), getRes(h))

  /** geo -> cell; mirrors the public _faceIjkToH3 algorithm */
  private def latLngToCellInternal(g: Geo, res: Int): Long = {
    val fijk = geoToFaceIjk(g, res)
    var h = setRes(newIndex(res), res)
    var coord = fijk.coord
    var r = res
    while (r > 0) {
      val last = coord
      val (parent, center) =
        if (isClassIII(r)) { val p = upAp7(coord); (p, downAp7(p)) }
        else { val p = upAp7r(coord); (p, downAp7r(p)) }
      h = setDigit(h, r, unitIjkToDigit((last - center).normalize))
      coord = parent
      r -= 1
    }
    require(coord.i <= 2 && coord.j <= 2 && coord.k <= 2, s"input out of face range: $coord")
    val baseCell = Tables.fijkCell(fijk.face)(coord.i)(coord.j)(coord.k)
    val numRots = Tables.fijkRot(fijk.face)(coord.i)(coord.j)(coord.k)
    h = setBaseCell(h, baseCell)
    if (isBaseCellPentagon(baseCell)) {
      if (leadingNonZeroDigit(h) == KDigit) {
        val seed = baseCellSeed(baseCell)
        h = if (fijk.face == seed.cwOffset._1 || fijk.face == seed.cwOffset._2) rotate60cw(h)
            else rotate60ccw(h)
      }
      var i = 0
      while (i < numRots) { h = rotatePent60ccw(h); i += 1 }
    } else {
      var i = 0
      while (i < numRots) { h = rotate60ccw(h); i += 1 }
    }
    h
  }

  // ------------------------------------------------------------------
  // neighbor traversal
  // ------------------------------------------------------------------
  /** returns (neighbor, updatedRotations); throws on pentagon-undefined moves */
  private def neighborRotations(origin: Long, dir0: Int, rotations0: Int): (Long, Int) = {
    var out = origin
    var dir = dir0
    var rotations = rotations0
    var i = 0
    while (i < rotations) { dir = rotDigitCcw(dir); i += 1 }
    var newRotations = 0
    val oldBaseCell = getBaseCellBits(out)
    val oldLeadingDigit = leadingNonZeroDigit(out)
    var r = getRes(out) - 1
    var done = false
    while (!done) {
      if (r == -1) {
        val nbc = Tables.baseCellNeighbors(oldBaseCell)(dir)
        if (nbc == -1) {
          // deleted k vertex: this edge actually borders the ik neighbor
          out = setBaseCell(out, Tables.baseCellNeighbors(oldBaseCell)(IKDigit))
          newRotations = Tables.baseCellNeighborRots(oldBaseCell)(IKDigit)
          out = rotate60ccw(out)
          rotations += 1
        } else {
          out = setBaseCell(out, nbc)
          newRotations = Tables.baseCellNeighborRots(oldBaseCell)(dir)
        }
        done = true
      } else {
        val oldDigit = getDigit(out, r + 1)
        if (oldDigit == InvalidDigit) throw new IllegalArgumentException("invalid cell digit")
        val cls = if (isClassIII(r + 1)) 1 else 0
        val nd = Tables.newDigit(cls)(oldDigit)(dir)
        val adj = Tables.newAdjustment(cls)(oldDigit)(dir)
        out = setDigit(out, r + 1, nd)
        if (adj != CenterDigit) { dir = adj; r -= 1 }
        else done = true
      }
    }
    val newBaseCell = getBaseCellBits(out)
    if (isBaseCellPentagon(newBaseCell)) {
      var alreadyAdjustedK = false
      if (leadingNonZeroDigit(out) == KDigit) {
        if (oldBaseCell != newBaseCell) {
          // traversed into the deleted k subsequence of a pentagon base cell
          val seed = baseCellSeed(newBaseCell)
          val homeFace = baseCellSeed(oldBaseCell).face
          out = if (homeFace == seed.cwOffset._1 || homeFace == seed.cwOffset._2) rotate60cw(out)
                else rotate60ccw(out)
          alreadyAdjustedK = true
        } else {
          if (oldLeadingDigit == CenterDigit)
            throw new IllegalArgumentException("pentagon: k direction is deleted")
          else if (oldLeadingDigit == JKDigit) { out = rotate60ccw(out); rotations += 1 }
          else if (oldLeadingDigit == IKDigit) { out = rotate60cw(out); rotations += 5 }
          else throw new IllegalArgumentException("pentagon distortion")
        }
      }
      var i2 = 0
      while (i2 < newRotations) { out = rotatePent60ccw(out); i2 += 1 }
      if (oldBaseCell != newBaseCell) {
        if (isPolarPentagon(newBaseCell)) {
          if (oldBaseCell != 118 && oldBaseCell != 8 && leadingNonZeroDigit(out) != JKDigit)
            rotations += 1
        } else if (leadingNonZeroDigit(out) == IKDigit && !alreadyAdjustedK) {
          rotations += 1
        }
      }
    } else {
      var i2 = 0
      while (i2 < newRotations) { out = rotate60ccw(out); i2 += 1 }
    }
    (out, (rotations + newRotations) % 6)
  }

  private val DiskDirections = Array(2, 3, 1, 5, 4, 6) // J JK K IK I IJ
  private val NextRingDirection = IDigit

  /** spiral gridDisk (fast path). Bails whenever the cursor touches a
    * pentagon BASE cell: the spiral threads a direction-frame rotation
    * across steps, and pentagon-crossing frame rotations are only pinned
    * modulo the pentagon's 5-fold digit symmetry — the BFS fallback uses a
    * fresh frame per step, where that ambiguity is immaterial. (The C
    * library similarly aborts its unsafe spiral near pentagons.)
    */
  private def gridDiskUnsafe(origin0: Long, k: Int): Array[Long] = {
    val out = ArrayBuffer[Long](origin0)
    if (isBaseCellPentagon(getBaseCellBits(origin0)))
      throw new IllegalArgumentException("pentagon")
    var origin = origin0
    var ring = 1; var direction = 0; var i = 0; var rotations = 0
    def checkPent(): Unit =
      if (isBaseCellPentagon(getBaseCellBits(origin)))
        throw new IllegalArgumentException("pentagon")
    while (ring <= k) {
      if (direction == 0 && i == 0) {
        val (o, rot) = neighborRotations(origin, NextRingDirection, rotations)
        origin = o; rotations = rot
        checkPent()
      }
      val (o, rot) = neighborRotations(origin, DiskDirections(direction), rotations)
      origin = o; rotations = rot
      out += origin
      i += 1
      if (i == ring) {
        i = 0; direction += 1
        if (direction == 6) { ring += 1; direction = 0 }
      }
      checkPent()
    }
    out.toArray
  }

  /** BFS fallback near pentagons: ring-ordered, ascending within a ring */
  private def gridDiskSafe(origin: Long, k: Int): Array[Long] = {
    val seen = scala.collection.mutable.LinkedHashMap[Long, Int](origin -> 0)
    var frontier = List(origin)
    for (ring <- 1 to k) {
      val next = ArrayBuffer[Long]()
      for (cell <- frontier; d <- 1 to 6) {
        val n =
          try Some(neighborRotations(cell, d, 0)._1)
          catch { case _: IllegalArgumentException => None }
        n.foreach { nn => if (!seen.contains(nn)) { seen(nn) = ring; next += nn } }
      }
      frontier = next.distinct.sorted.toList
      frontier.foreach(c => seen(c) = math.min(seen(c), ring))
    }
    seen.keys.toArray
  }

  // ------------------------------------------------------------------
  // local IJK (hexagon-only; pentagons raise like the C library's E_PENTAGON)
  // ------------------------------------------------------------------
  private def cellToLocalIjk(origin: Long, h3in: Long): IJK = {
    val res = getRes(origin)
    require(res == getRes(h3in), "resolution mismatch")
    val originBaseCell = getBaseCellBits(origin)
    val baseCell = getBaseCellBits(h3in)
    if (isBaseCellPentagon(originBaseCell) || isBaseCellPentagon(baseCell))
      throw new IllegalArgumentException("H3 error: pentagon distortion is not supported")
    var h = h3in
    var dir = CenterDigit
    if (originBaseCell != baseCell) {
      dir = Tables.getBaseCellDirection(originBaseCell, baseCell)
      if (dir == InvalidDigit)
        throw new IllegalArgumentException("H3 error: cells are too far apart")
      val rots = Tables.baseCellNeighborRots(originBaseCell)(dir)
      var i = 0
      while (i < rots) { h = rotate60cw(h); i += 1 }
    }
    // unfold digits in origin's base-cell coordinate space
    var coord = IJK(0, 0, 0)
    var r = 1
    while (r <= res) {
      coord = if (isClassIII(r)) downAp7(coord) else downAp7r(coord)
      coord = (coord + UnitVecs(getDigit(h, r))).normalize
      r += 1
    }
    if (dir != CenterDigit) {
      var offset = UnitVecs(dir)
      var r2 = 1
      while (r2 <= res) {
        offset = if (isClassIII(r2)) downAp7(offset) else downAp7r(offset)
        r2 += 1
      }
      coord = (coord + offset).normalize
    }
    coord
  }

  private def localIjkToCell(origin: Long, ijk: IJK): Long = {
    val res = getRes(origin)
    val originBaseCell = getBaseCellBits(origin)
    if (isBaseCellPentagon(originBaseCell))
      throw new IllegalArgumentException("H3 error: pentagon distortion is not supported")
    var h = setBaseCell(newIndex(res), originBaseCell)
    var coord = ijk
    var r = res
    while (r > 0) {
      val last = coord
      val (parent, center) =
        if (isClassIII(r)) { val p = upAp7(coord); (p, downAp7(p)) }
        else { val p = upAp7r(coord); (p, downAp7r(p)) }
      h = setDigit(h, r, unitIjkToDigit((last - center).normalize))
      coord = parent
      r -= 1
    }
    if (coord != IJK(0, 0, 0)) {
      val dir = unitIjkToDigit(coord)
      if (dir == InvalidDigit)
        throw new IllegalArgumentException("H3 error: cells are too far apart")
      val nbc = Tables.baseCellNeighbors(originBaseCell)(dir)
      if (nbc < 0 || isBaseCellPentagon(nbc))
        throw new IllegalArgumentException("H3 error: pentagon distortion is not supported")
      val rots = Tables.baseCellNeighborRots(originBaseCell)(dir)
      var i = 0
      while (i < rots) { h = rotate60ccw(h); i += 1 }
      h = setBaseCell(h, nbc)
    }
    h
  }

  // ------------------------------------------------------------------
  // public API
  // ------------------------------------------------------------------
  def checkResolution(res: Int): Int = {
    if (res < 0 || res > MaxRes)
      throw new IllegalArgumentException(
        s"H3 error: invalid resolution (got Some($res)): out of range")
    res
  }

  def latLngToCell(latDeg: Double, lngDeg: Double, res: Int): Long = {
    checkResolution(res)
    if (latDeg.isNaN || lngDeg.isNaN || math.abs(latDeg) > 90.0)
      throw new IllegalArgumentException(s"H3 error: invalid coordinate ($latDeg, $lngDeg)")
    latLngToCellInternal(Geo(math.toRadians(latDeg), math.toRadians(lngDeg)), res)
  }

  def cellToLatLng(cell: Long): (Double, Double) = {
    val g = cellToLatLngInternal(cell)
    (math.toDegrees(g.lat), math.toDegrees(constrainLng(g.lng)))
  }

  def cellToString(cell: Long): String = java.lang.Long.toHexString(cell)

  def stringToCell(s: String): Long = {
    val v =
      try java.lang.Long.parseUnsignedLong(s.trim, 16)
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"H3 error: invalid cell index '$s'")
      }
    validateCell(v)
  }

  def validateCell(v: Long): Long = {
    val mode = ((v >>> ModeOffset) & 0xF).toInt
    val highBit = (v >>> 63) & 1L
    val reserved = (v >>> 56) & 7L
    val res = getRes(v)
    val bc = getBaseCellBits(v)
    var ok = highBit == 0 && mode == 1 && reserved == 0 && bc < NumBaseCells
    if (ok) {
      var r = 1
      while (r <= res && ok) { if (getDigit(v, r) == InvalidDigit) ok = false; r += 1 }
      while (r <= MaxRes && ok) { if (getDigit(v, r) != InvalidDigit) ok = false; r += 1 }
      if (ok && isBaseCellPentagon(bc) && leadingNonZeroDigit(v) == KDigit) ok = false
    }
    if (!ok) throw new IllegalArgumentException(s"H3 error: invalid cell index $v")
    v
  }

  def resolution(cell: Long): Int = getRes(cell)
  def baseCellNumber(cell: Long): Int = getBaseCellBits(cell)

  def parent(cell: Long, parentRes: Int): Long = {
    checkResolution(parentRes)
    val res = getRes(cell)
    if (parentRes > res)
      throw new IllegalArgumentException("H3 error: parent resolution above cell resolution")
    var h = setRes(cell, parentRes)
    var r = parentRes + 1
    while (r <= res) { h = setDigit(h, r, InvalidDigit); r += 1 }
    h
  }

  def centerChild(cell: Long, childRes: Int): Long = {
    checkResolution(childRes)
    val res = getRes(cell)
    if (childRes < res)
      throw new IllegalArgumentException("H3 error: child resolution below cell resolution")
    var h = setRes(cell, childRes)
    var r = res + 1
    while (r <= childRes) { h = setDigit(h, r, CenterDigit); r += 1 }
    h
  }

  def children(cell: Long, childRes: Int): Array[Long] = {
    checkResolution(childRes)
    val res = getRes(cell)
    if (childRes < res)
      throw new IllegalArgumentException("H3 error: child resolution below cell resolution")
    val out = ArrayBuffer[Long]()
    def rec(c: Long, r: Int): Unit =
      if (r == childRes) out += c
      else {
        val ds = if (isPentagon(c)) Seq(0, 2, 3, 4, 5, 6) else (0 to 6)
        ds.foreach(d => rec(setDigit(setRes(c, r + 1), r + 1, d), r + 1))
      }
    rec(cell, res)
    out.toArray
  }

  def childrenSize(cell: Long, childRes: Int): Long = {
    checkResolution(childRes)
    val n = childRes - getRes(cell)
    if (n < 0)
      throw new IllegalArgumentException("H3 error: child resolution below cell resolution")
    val hexCount = math.pow(7, n).toLong
    if (isPentagon(cell)) 1L + 5L * (hexCount - 1) / 6L else hexCount
  }

  def cellToChildPos(cell: Long, parentRes: Int): Long = {
    checkResolution(parentRes)
    val res = getRes(cell)
    if (parentRes > res)
      throw new IllegalArgumentException("H3 error: parent resolution above cell resolution")
    val parentCell = parent(cell, parentRes)
    if (!isPentagon(parentCell)) {
      var pos = 0L
      var r = parentRes + 1
      while (r <= res) { pos = pos * 7 + getDigit(cell, r); r += 1 }
      pos
    } else {
      var pos = 0L
      var onPentagon = true
      var r = parentRes + 1
      while (r <= res) {
        val d = getDigit(cell, r)
        val hexBelow = math.pow(7, res - r).toLong
        val pentBelow = 1L + 5L * (hexBelow - 1) / 6L
        if (onPentagon) {
          if (d == KDigit) throw new IllegalArgumentException("H3 error: invalid pentagon digit")
          if (d > 0) pos += pentBelow + (d - 2).toLong * hexBelow
          onPentagon = d == 0
        } else pos += d.toLong * hexBelow
        r += 1
      }
      pos
    }
  }

  def childPosToCell(pos: Long, cell: Long, childRes: Int): Long = {
    checkResolution(childRes)
    val res = getRes(cell)
    if (childRes < res)
      throw new IllegalArgumentException("H3 error: child resolution below cell resolution")
    if (pos < 0 || pos >= childrenSize(cell, childRes))
      throw new IllegalArgumentException("H3 error: child position out of range")
    var h = setRes(cell, childRes)
    var remaining = pos
    var onPentagon = isPentagon(cell)
    var r = res + 1
    while (r <= childRes) {
      val hexBelow = math.pow(7, childRes - r).toLong
      if (onPentagon) {
        val pentBelow = 1L + 5L * (hexBelow - 1) / 6L
        if (remaining < pentBelow) h = setDigit(h, r, 0)
        else {
          remaining -= pentBelow
          val d = 2 + (remaining / hexBelow).toInt
          remaining %= hexBelow
          h = setDigit(h, r, d)
          onPentagon = false
        }
      } else {
        h = setDigit(h, r, (remaining / hexBelow).toInt)
        remaining %= hexBelow
      }
      r += 1
    }
    h
  }

  def gridDisk(cell: Long, k: Int): Array[Long] = {
    if (k < 0) throw new IllegalArgumentException("H3 error: negative k")
    try gridDiskUnsafe(cell, k)
    catch { case _: IllegalArgumentException => gridDiskSafe(cell, k) }
  }

  def gridDistance(a: Long, b: Long): Int =
    ijkDistance(cellToLocalIjk(a, a), cellToLocalIjk(a, b))

  def gridPathCells(a: Long, b: Long): Array[Long] = {
    val startIjk = cellToLocalIjk(a, a)
    val endIjk = cellToLocalIjk(a, b)
    val distance = ijkDistance(startIjk, endIjk)
    val (sx, sy, sz) = ijkToCube(startIjk)
    val (ex, ey, ez) = ijkToCube(endIjk)
    val d = math.max(1, distance).toDouble
    val (ix, iy, iz) = ((ex - sx) / d, (ey - sy) / d, (ez - sz) / d)
    (0 to distance).map { n =>
      val (cx, cy, cz) = cubeRound(sx + ix * n, sy + iy * n, sz + iz * n)
      localIjkToCell(a, cubeToIjk(cx, cy, cz))
    }.toArray
  }

  def cellsContains(cells: Seq[Long], cell: Long): Boolean =
    cells.exists { container =>
      val res = getRes(container)
      getRes(cell) >= res && parent(cell, res) == container
    }

  def distanceSphereKm(a: Long, b: Long): Double = {
    val ga = cellToLatLngInternal(a); val gb = cellToLatLngInternal(b)
    angularDist(ga, gb) * EarthRadiusKm
  }

  def distanceDegree(a: Long, b: Long): Double = {
    val (alat, alng) = cellToLatLng(a); val (blat, blng) = cellToLatLng(b)
    math.sqrt((alat - blat) * (alat - blat) + (alng - blng) * (alng - blng))
  }

  /** exhaustive invariant check used by the spec: every res-1/res-2 cell
    * round-trips center -> geo -> cell, covering all 122 base cells, all
    * faces, pentagons, and cross-face overage paths.
    */
  def selfCheck(): Unit = {
    for (bc <- 0 until NumBaseCells) {
      val res0 = setBaseCell(newIndex(0), bc)
      for (res <- 1 to 2; child <- children(res0, res)) {
        val (lat, lng) = cellToLatLng(child)
        val back = latLngToCell(lat, lng, res)
        require(back == child,
          f"round-trip failed: base $bc cell $child%x -> ($lat, $lng) -> $back%x")
      }
    }
  }
}
