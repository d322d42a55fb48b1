package graft.functions

/** S2 cell-ID functions — reference
  * common/function/src/scalars/geo/s2.rs (s2_latlng_to_cell,
  * s2_cell_level, s2_cell_to_token, s2_cell_parent). Implements the
  * public s2geometry.io cell-id scheme: unit-sphere point -> cube face
  * -> quadratic (u,v)->(s,t) transform -> leaf (i,j) -> Hilbert-curve
  * position, 64-bit id = 3 face bits + 60 position bits + sentinel.
  *
  * Ids are unsigned 64-bit; the SQL surface exposes them as
  * Decimal(20,0) so values above Long.MaxValue print like the
  * reference's UInt64 (golden: cell 9263763445276221387, token
  * 808f7fc59ef01fcb for (37.76938, -122.3889)).
  */
object S2 {

  val MaxLevel = 30
  private val LookupBits = 4
  private val SwapMask = 0x01
  private val InvertMask = 0x02

  private val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val PosToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIJ = new Array[Int](1 << (2 * LookupBits + 2))

  private def initLookup(level: Int, i: Int, j: Int, origOrientation: Int,
      pos: Int, orientation: Int): Unit = {
    if (level == LookupBits) {
      val ij = (i << LookupBits) + j
      lookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
      lookupIJ((pos << 2) + origOrientation) = (ij << 2) + orientation
    } else {
      val r = PosToIJ(orientation)
      var subPos = 0
      while (subPos < 4) {
        val ij = r(subPos)
        initLookup(level + 1, (i << 1) + (ij >> 1), (j << 1) + (ij & 1),
          origOrientation, (pos << 2) + subPos,
          orientation ^ PosToOrientation(subPos))
        subPos += 1
      }
    }
  }
  initLookup(0, 0, 0, 0, 0, 0)
  initLookup(0, 0, 0, SwapMask, 0, SwapMask)
  initLookup(0, 0, 0, InvertMask, 0, InvertMask)
  initLookup(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)

  /** (x,y,z) -> face 0..5 (largest-magnitude axis, sign-split). */
  private def face(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val f = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val comp = f match { case 0 => x; case 1 => y; case _ => z }
    if (comp < 0) f + 3 else f
  }

  private def faceUV(f: Int, x: Double, y: Double, z: Double): (Double, Double) =
    f match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }

  /** Quadratic projection u in [-1,1] -> s in [0,1] (s2geometry's
    * S2_QUADRATIC_PROJECTION UVtoST). */
  private def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  private def stToIJ(s: Double): Int = {
    val m = 1 << MaxLevel
    math.max(0, math.min(m - 1, math.floor(m * s).toInt))
  }

  /** Leaf cell id for (lat, lng) in degrees. Unsigned value in a Long. */
  def latLngToCell(latDeg: Double, lngDeg: Double): Long = {
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lngDeg)
    val cosphi = math.cos(phi)
    val x = math.cos(theta) * cosphi
    val y = math.sin(theta) * cosphi
    val z = math.sin(phi)
    val f = face(x, y, z)
    val (u, v) = faceUV(f, x, y, z)
    fromFaceIJ(f, stToIJ(uvToST(u)), stToIJ(uvToST(v)))
  }

  def fromFaceIJ(f: Int, i: Int, j: Int): Long = {
    var n: Long = f.toLong << 60
    var bits = f & SwapMask
    var k = 7
    val mask = (1 << LookupBits) - 1
    while (k >= 0) {
      bits += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      bits += (((j >> (k * LookupBits)) & mask) << 2)
      bits = lookupPos(bits)
      n |= (bits >> 2).toLong << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  /** Cell level from id (unsigned semantics; leaf = 30). */
  def level(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  /** Ancestor at `level` (id's own level must be >= level). */
  def parent(id: Long, level: Int): Long = {
    val newLsb = 1L << (2 * (MaxLevel - level))
    (id & -newLsb) | newLsb
  }

  /** Hex token: 16 lowercase hex digits with trailing zeros stripped. */
  def token(id: Long): String = {
    val hex = f"${id}%016x"
    val t = hex.reverse.dropWhile(_ == '0').reverse
    if (t.isEmpty) "X" else t
  }
}
