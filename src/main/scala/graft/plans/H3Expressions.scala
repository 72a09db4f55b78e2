package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** H3-style hexagonal hierarchical cells (`geo_point_to_h3cell` /
  * `geo_h3cell_to_central_point` / `geo_h3cell_neighbors`; reference KQL
  * surface `/root/reference/README.md:33-34`), built from the PUBLIC H3
  * framework: icosahedral gnomonic projection + aperture-7 hexagon
  * subdivision with the published Class II/III rotation alternation, the
  * published IJK coordinate machinery (normalization, unit-vector digits,
  * up/down-aperture-7 transforms), and the published index bit layout
  * (mode 1, 4-bit resolution, base cell, 3 bits per digit, unused digits
  * = 7) rendered as the 15-hex-digit token form.
  *
  * DOCUMENTED DEVIATIONS from canonical libh3 (this build is offline — the
  * canonical 122-base-cell enumeration and Dymaxion orientation tables are
  * large published DATA, not derivable math, so tokens are NOT
  * interchange-compatible with libh3):
  *  - the icosahedron is constructed exactly from the golden-ratio vertex
  *    coordinates (0, ±1, ±φ) — a mathematically exact icosahedron with a
  *    deterministic, hand-checkable orientation rather than H3's Dymaxion
  *    placement;
  *  - base cells are the 20 faces (face id in the base-cell field), not
  *    H3's 122 res-0 cells; every finer resolution is the published
  *    aperture-7 subdivision of the face-centered hexagon;
  *  - cells at face boundaries belong to the face that wins the
  *    deterministic max-dot-product tie-break, like geohash cells at the
  *    antimeridian; neighbor rings near face edges re-encode through 3D
  *    (the S2 FromFaceIJWrap treatment) and are geometrically adjacent but
  *    not guaranteed bit-symmetric across a face seam (documented; use S2
  *    or geohash keys for seam-robust spatial joins).
  *
  * What IS exact and proven (H3Spec): token round-trips, center-re-encode
  * identity at every resolution, the parent/child aperture-7 hierarchy,
  * the published IJK digit adjacency, 6-neighbor rings with symmetric
  * interior adjacency, and hand-derived index vectors (face centers at
  * res 0; the center digit path is all-0; aperture alignment).
  */
object H3Expressions {

  private final val MaxRes = 15

  // ---- exact icosahedron (golden ratio construction) -------------------

  private val phi = (1.0 + math.sqrt(5.0)) / 2.0

  /** 12 vertices: cyclic permutations of (0, ±1, ±φ), normalized. */
  private val verts: Array[(Double, Double, Double)] = {
    val raw = Array(
      (0.0, 1.0, phi), (0.0, 1.0, -phi), (0.0, -1.0, phi), (0.0, -1.0, -phi),
      (1.0, phi, 0.0), (1.0, -phi, 0.0), (-1.0, phi, 0.0), (-1.0, -phi, 0.0),
      (phi, 0.0, 1.0), (phi, 0.0, -1.0), (-phi, 0.0, 1.0), (-phi, 0.0, -1.0))
    raw.map { case (x, y, z) =>
      val n = math.sqrt(x * x + y * y + z * z); (x / n, y / n, z / n)
    }
  }

  private def dot(a: (Double, Double, Double), b: (Double, Double, Double)): Double =
    a._1 * b._1 + a._2 * b._2 + a._3 * b._3
  private def cross(a: (Double, Double, Double), b: (Double, Double, Double)) =
    (a._2 * b._3 - a._3 * b._2, a._3 * b._1 - a._1 * b._3, a._1 * b._2 - a._2 * b._1)
  private def norm(a: (Double, Double, Double)) = {
    val n = math.sqrt(dot(a, a)); (a._1 / n, a._2 / n, a._3 / n)
  }

  /** 20 faces as sorted vertex-index triples of mutually adjacent vertices
    * (adjacent ⇔ max pairwise dot product), enumerated lexicographically —
    * a deterministic, derivation-checkable face order. */
  private val faces: Array[(Int, Int, Int)] = {
    val adjDot = verts.combinations(2).map(p => dot(p(0), p(1))).max
    val out = for {
      a <- 0 until 12; b <- a + 1 until 12; c <- b + 1 until 12
      if dot(verts(a), verts(b)) > adjDot - 1e-9 &&
        dot(verts(b), verts(c)) > adjDot - 1e-9 &&
        dot(verts(a), verts(c)) > adjDot - 1e-9
    } yield (a, b, c)
    require(out.size == 20, s"icosahedron construction yielded ${out.size} faces")
    out.toArray
  }

  private val faceCenter: Array[(Double, Double, Double)] = faces.map {
    case (a, b, c) => norm((verts(a)._1 + verts(b)._1 + verts(c)._1,
      verts(a)._2 + verts(b)._2 + verts(c)._2,
      verts(a)._3 + verts(b)._3 + verts(c)._3))
  }

  /** Face-tangent orthonormal basis: u toward the face's first vertex. */
  private val faceU: Array[(Double, Double, Double)] = faces.indices.map { f =>
    val c = faceCenter(f); val v = verts(faces(f)._1)
    val d = dot(v, c)
    norm((v._1 - d * c._1, v._2 - d * c._2, v._3 - d * c._3))
  }.toArray
  private val faceW: Array[(Double, Double, Double)] =
    faces.indices.map(f => cross(faceCenter(f), faceU(f))).toArray

  /** Res-0 hexagon circumradius in gnomonic plane units: the face triangle's
    * circumradius is tan(angle center→vertex); the res-0 hex must cover the
    * whole face, so its INradius is the triangle circumradius (inradius =
    * circumradius·√3/2 for a hexagon). */
  private val res0R: Double = {
    val triCircum = math.tan(math.acos(dot(faceCenter(0), verts(faces(0)._1))))
    triCircum * 2.0 / math.sqrt(3.0)
  }

  // per-resolution scale (aperture 7: linear √7 per level) and rotation
  // (Class III resolutions are rotated asin(√(3/28)) ≈ 19.106°, alternating
  // — the published aperture-7 rotation)
  private val ap7Rot = math.asin(math.sqrt(3.0 / 28.0))

  // ---- published IJK machinery ----------------------------------------

  /** Published unit IJK vectors per digit 0..6 (CENTER, K, J, JK, I, IK, IJ). */
  private[graft] val UnitVecs: Array[(Int, Int, Int)] = Array(
    (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1), (1, 1, 0))

  private def ijkNormalize(i0: Int, j0: Int, k0: Int): (Int, Int, Int) = {
    var i = i0; var j = j0; var k = k0
    val m = math.min(i, math.min(j, k))
    i -= m; j -= m; k -= m
    (i, j, k)
  }

  /** Planar hex coords of an IJK cell center (published _ijkToHex2d). */
  private def ijkToHex2d(i: Int, j: Int, k: Int): (Double, Double) = {
    val ii = i - k; val jj = j - k
    (ii - 0.5 * jj, jj * math.sqrt(3.0) / 2.0)
  }

  /** 2D → containing hex IJK via exact cube rounding (axial→cube round —
    * the standard published hex-rounding algorithm). */
  private def hex2dToIjk(x: Double, y: Double): (Int, Int, Int) = {
    val jf = y * 2.0 / math.sqrt(3.0)
    val if_ = x + 0.5 * jf
    // cube coords (q, r, s) = (if_, -jf? ) — use axial (q=if_, r=jf) with
    // cube s = -q + ... : here i/j axes are 60° apart: cube = (i, j, 0) with
    // redundancy; round via the three candidates
    val ri = math.round(if_).toInt
    val rj = math.round(jf).toInt
    // exact containment = nearest hex center (hexes are the Voronoi cells of
    // their centers); the true nearest is within ±1 of the axial round
    var best = (0, 0); var bestD = Double.MaxValue
    var ci = ri - 1
    while (ci <= ri + 1) {
      var cj = rj - 1
      while (cj <= rj + 1) {
        val (cx, cy) = ijkToHex2d(ci, cj, 0)
        val d = (cx - x) * (cx - x) + (cy - y) * (cy - y)
        if (d < bestD) { bestD = d; best = (ci, cj) }
        cj += 1
      }
      ci += 1
    }
    ijkNormalize(best._1, best._2, 0)
  }

  /** Published down-aperture-7 transforms (Class II / Class III). */
  private def downAp7(i: Int, j: Int, k: Int): (Int, Int, Int) =
    ijkNormalize(3 * i + 0 * j + 1 * k, 1 * i + 3 * j + 0 * k, 0 * i + 1 * j + 3 * k)
  private def downAp7r(i: Int, j: Int, k: Int): (Int, Int, Int) =
    ijkNormalize(3 * i + 1 * j + 0 * k, 0 * i + 3 * j + 1 * k, 1 * i + 0 * j + 3 * k)

  private def ijkAdd(a: (Int, Int, Int), b: (Int, Int, Int)): (Int, Int, Int) =
    ijkNormalize(a._1 + b._1, a._2 + b._2, a._3 + b._3)
  private def ijkSub(a: (Int, Int, Int), b: (Int, Int, Int)): (Int, Int, Int) =
    ijkNormalize(a._1 - b._1, a._2 - b._2, a._3 - b._3)

  /** Published up-aperture-7 (exact rational rounding). Derivation: in
    * axial (i, j) coordinates downAp7 is the matrix [[3, −1], [1, 2]]
    * (det 7) and downAp7r is [[2, 1], [−1, 3]]; each up is the rounded
    * inverse of its down. */
  private def upAp7(i0: Int, j0: Int, k0: Int): (Int, Int, Int) = {
    val i = i0 - k0; val j = j0 - k0
    ijkNormalize(math.round((2 * i + j) / 7.0).toInt,
      math.round((3 * j - i) / 7.0).toInt, 0)
  }
  private def upAp7r(i0: Int, j0: Int, k0: Int): (Int, Int, Int) = {
    val i = i0 - k0; val j = j0 - k0
    ijkNormalize(math.round((3 * i - j) / 7.0).toInt,
      math.round((i + 2 * j) / 7.0).toInt, 0)
  }

  // ---- point ↔ face plane ---------------------------------------------

  private def lngLatToXyz(lngDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg); val th = math.toRadians(lngDeg)
    (math.cos(phi) * math.cos(th), math.cos(phi) * math.sin(th), math.sin(phi))
  }

  private def bestFace(p: (Double, Double, Double)): Int = {
    var f = 0; var bd = -2.0; var bi = 0
    while (f < 20) {
      val d = dot(p, faceCenter(f))
      if (d > bd + 1e-15) { bd = d; bi = f } // deterministic first-wins ties
      f += 1
    }
    bi
  }

  /** Gnomonic projection of p onto face f's tangent plane, in res-r hex
    * grid units (x along faceU, y along faceW, rotated per Class III). */
  private def toFaceGrid(p: (Double, Double, Double), f: Int, res: Int): (Double, Double) = {
    val c = faceCenter(f)
    val d = dot(p, c)
    require(d > 1e-9, "point projects behind the face plane")
    val q = (p._1 / d - c._1, p._2 / d - c._2, p._3 / d - c._3)
    val x0 = dot(q, faceU(f)); val y0 = dot(q, faceW(f))
    // scale: res-r hex circumradius = res0R / √7^res; grid unit = hex
    // center spacing = circumradius·√3
    val scale = math.pow(math.sqrt(7.0), res) / (res0R * math.sqrt(3.0))
    // lattice orientation alternates between the two aperture-7 classes:
    // Class II (even res) aligned with the face axes, Class III (odd res)
    // rotated +asin(√(3/28)) — the published alternation, NOT cumulative
    val rot = if (res % 2 == 1) -ap7Rot else 0.0
    val cr = math.cos(rot); val sr = math.sin(rot)
    ((x0 * cr - y0 * sr) * scale, (x0 * sr + y0 * cr) * scale)
  }

  /** Inverse: res-r grid coords on face f back to a unit-sphere point. */
  private def fromFaceGrid(f: Int, res: Int, gx: Double, gy: Double): (Double, Double, Double) = {
    val scale = math.pow(math.sqrt(7.0), res) / (res0R * math.sqrt(3.0))
    val rot = if (res % 2 == 1) ap7Rot else 0.0
    val cr = math.cos(rot); val sr = math.sin(rot)
    val x0 = (gx * cr - gy * sr) / scale; val y0 = (gx * sr + gy * cr) / scale
    val c = faceCenter(f); val u = faceU(f); val w = faceW(f)
    norm((c._1 + x0 * u._1 + y0 * w._1,
      c._2 + x0 * u._2 + y0 * w._2,
      c._3 + x0 * u._3 + y0 * w._3))
  }

  private def xyzToLngLat(p: (Double, Double, Double)): (Double, Double) =
    (math.toDegrees(math.atan2(p._2, p._1)),
      math.toDegrees(math.atan2(p._3, math.sqrt(p._1 * p._1 + p._2 * p._2))))

  // ---- index form ------------------------------------------------------

  /** Published H3 bit layout: [1 bit reserved=0][4 mode=1][3 reserved]
    * [4 res][7 base cell][15 × 3-bit digits, unused = 7]. Deviation
    * (documented in the object doc): the base-cell field carries the FACE
    * (0..19) and the 3 reserved bits carry the face-overage digit — the
    * res-0 unit-vector remainder a face-edge leaf walks up to (real H3
    * absorbs this into its 122-base-cell table, which is published data
    * this offline build cannot reproduce). */
  private def pack(res: Int, base: Int, overage: Int, digits: Array[Int]): Long = {
    var v = (1L << 59) | (overage.toLong << 56) | (res.toLong << 52) |
      (base.toLong << 45)
    var r = 0
    while (r < MaxRes) {
      val d = if (r < res) digits(r) else 7
      v |= d.toLong << (3 * (14 - r))
      r += 1
    }
    v
  }

  private def unpack(v: Long): (Int, Int, Int, Array[Int]) = {
    require(((v >>> 59) & 0xF) == 1L, "not an h3-mode index")
    val overage = ((v >>> 56) & 7L).toInt
    val res = ((v >>> 52) & 0xF).toInt
    val base = ((v >>> 45) & 0x7F).toInt
    val digits = Array.tabulate(res)(r => ((v >>> (3 * (14 - r))) & 7L).toInt)
    (res, base, overage, digits)
  }

  private[graft] def token(v: Long): String = f"$v%015x"
  private[graft] def fromToken(t: String): Long =
    java.lang.Long.parseUnsignedLong(t, 16)

  // ---- core encode / decode -------------------------------------------

  /** Leaf IJK of a point on face f at resolution res (grid-rounded). */
  private def pointToIjk(p: (Double, Double, Double), f: Int, res: Int): (Int, Int, Int) = {
    val (gx, gy) = toFaceGrid(p, f, res)
    hex2dToIjk(gx, gy)
  }

  /** Digit path from a res-level IJK: walk up with the published aperture-7
    * inverse, digit r = child − downAp7(parent) as a unit vector. Returns
    * (overage digit, digits): the res-0 remainder of a face-edge leaf is a
    * unit vector (or center), carried in the index's reserved bits. */
  private def ijkToDigits(ijkRes: (Int, Int, Int), res: Int): (Int, Array[Int]) = {
    val digits = new Array[Int](res)
    var cur = ijkRes
    var r = res
    while (r > 0) {
      val classIII = (r % 2) == 1
      val parent = if (classIII) upAp7r(cur._1, cur._2, cur._3)
                   else upAp7(cur._1, cur._2, cur._3)
      val center = if (classIII) downAp7r(parent._1, parent._2, parent._3)
                   else downAp7(parent._1, parent._2, parent._3)
      val diff = ijkSub(cur, center)
      val digit = UnitVecs.indexOf(diff)
      require(digit >= 0, s"non-unit aperture-7 residue $diff at res $r")
      digits(r - 1) = digit
      cur = parent
      r -= 1
    }
    val overage = UnitVecs.indexOf(cur)
    require(overage >= 0, s"face overage beyond the unit ring: $cur")
    (overage, digits)
  }

  /** None when the res-0 overage exceeds the unit ring (the cell is not
    * representable on this face — a far-out lattice candidate near a seam;
    * the canonical encode skips it and the owning face's copy wins). */
  private def ijkToDigitsOpt(ijkRes: (Int, Int, Int), res: Int): Option[(Int, Array[Int])] =
    try Some(ijkToDigits(ijkRes, res)) catch { case _: IllegalArgumentException => None }

  private def digitsToIjk(overage: Int, digits: Array[Int]): (Int, Int, Int) = {
    var cur = UnitVecs(overage)
    var r = 1
    while (r <= digits.length) {
      val classIII = (r % 2) == 1
      cur = if (classIII) downAp7r(cur._1, cur._2, cur._3)
            else downAp7(cur._1, cur._2, cur._3)
      cur = ijkAdd(cur, UnitVecs(digits(r - 1)))
      r += 1
    }
    cur
  }

  /** Angular circumradius of a res-r hexagon (for candidate-face pruning). */
  private def hexAngle(res: Int): Double =
    math.atan(res0R / math.pow(math.sqrt(7.0), res))

  /** CANONICAL cell of a point: the nearest hex center across every
    * candidate face's lattice (the Voronoi partition of the union of the 20
    * face lattices — globally well-defined, no face-ownership seams; cells
    * near a seam are hexes clipped by the neighboring lattice, documented).
    * Candidate faces are those within the best face's angle plus two hex
    * radii; within a face the planar round plus its 6-ring guards the
    * gnomonic planar-vs-sphere metric skew. Deterministic: strict < with
    * face-then-ring order breaks exact ties. */
  private def canonicalCell(p: (Double, Double, Double), res: Int): Long = {
    var bestD = Double.MaxValue
    var bestFaceId = -1
    var bestPacked = 0L
    val bd = {
      var f = 0; var m = -2.0
      while (f < 20) { val d = dot(p, faceCenter(f)); if (d > m) m = d; f += 1 }
      m
    }
    val maxAngle = math.acos(math.max(-1.0, math.min(1.0, bd))) +
      2.0 * hexAngle(res) + 0.09
    // clamp to 60°: the nearest lattice center is never on a face tilted
    // further than that (gnomonic blow-up guard)
    val cosMin = math.max(math.cos(math.min(math.Pi, maxAngle)), 0.5)
    var f = 0
    while (f < 20) {
      if (dot(p, faceCenter(f)) >= cosMin) {
        val ijk0 = pointToIjk(p, f, res)
        var d = 0
        while (d < 7) {
          val u = UnitVecs(d)
          val c = ijkNormalize(ijk0._1 + u._1, ijk0._2 + u._2, ijk0._3 + u._3)
          val (gx, gy) = ijkToHex2d(c._1, c._2, c._3)
          val cp = fromFaceGrid(f, res, gx, gy)
          val dx = cp._1 - p._1; val dy = cp._2 - p._2; val dz = cp._3 - p._3
          val dist = dx * dx + dy * dy + dz * dz
          // a cell is canonical on ONE face only: the one that owns its
          // center. Near-seam cells are representable on two faces' lattices
          // (at res 0 the overage ring lands almost exactly on the adjacent
          // face's center) — without this filter the Voronoi tie between the
          // near-duplicate centers would fall arbitrarily.
          if (dist < bestD && bestFace(cp) == f)
            ijkToDigitsOpt(c, res).foreach { case (ov, digits) =>
              bestD = dist; bestFaceId = f; bestPacked = pack(res, f, ov, digits)
            }
          d += 1
        }
      }
      f += 1
    }
    require(bestFaceId >= 0, "no representable cell candidate (unreachable)")
    bestPacked
  }

  def encode(lngDeg: Double, latDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"h3 resolution must be 0..15, got $res")
    canonicalCell(lngLatToXyz(lngDeg, latDeg), res)
  }

  def centerLngLat(v: Long): (Double, Double) = {
    val (res, base, ov, digits) = unpack(v)
    val ijk = digitsToIjk(ov, digits)
    val (gx, gy) = ijkToHex2d(ijk._1, ijk._2, ijk._3)
    xyzToLngLat(fromFaceGrid(base, res, gx, gy))
  }

  /** 6-neighbor ring: IJK unit-vector steps on the cell's own face grid;
    * each neighbor CENTER re-encodes canonically through 3D (the S2
    * FromFaceIJWrap treatment), so rings near a face seam step onto the
    * adjacent face's grid. Deduped, own cell excluded. */
  def neighbors(v: Long): Seq[Long] = {
    val (res, base, ov, digits) = unpack(v)
    val ijk = digitsToIjk(ov, digits)
    (1 to 6).map { d =>
      val n = ijkAdd(ijk, UnitVecs(d))
      val (gx, gy) = ijkToHex2d(n._1, n._2, n._3)
      // the neighbor position re-encodes CANONICALLY through 3D, so rings
      // near a face seam step onto the winning lattice
      canonicalCell(fromFaceGrid(base, res, gx, gy), res)
    }.distinct.filterNot(_ == v)
  }

  /** Resolution of a cell (the index's res field). */
  def level(v: Long): Int = {
    val (res, _, _, _) = unpack(v); res
  }

  /** Ancestor at `res` levels coarser — by construction the digit path of a
    * cell EXTENDS its parent's (the up-walk defines the digits), so the
    * parent is the digit-path prefix with the same face and overage. */
  def parent(v: Long, targetRes: Int): Long = {
    val (res, base, ov, digits) = unpack(v)
    require(targetRes >= 0 && targetRes <= res,
      s"h3 parent resolution $targetRes out of range for a res-$res cell")
    pack(targetRes, base, ov, digits.take(targetRes))
  }

  /** The 7 aperture-7 children: digit-path extensions 0..6. */
  def children(v: Long): Seq[Long] = {
    val (res, base, ov, digits) = unpack(v)
    require(res < MaxRes, s"res-$res cell has no finer children")
    (0 to 6).map(d => pack(res + 1, base, ov, digits :+ d))
  }

  /** Distance rings 0..n: ring 0 is the cell, ring k the cells first
    * reached at BFS depth k over the 6-neighbor adjacency (6k cells per
    * ring for interior hexes). */
  def rings(v: Long, n: Int): Seq[Seq[Long]] = {
    require(n >= 0 && n <= 16, s"h3 rings: n must be 0..16, got $n")
    val seen = scala.collection.mutable.HashSet(v)
    var frontier = Seq(v)
    Seq(Seq(v)) ++ (1 to n).map { _ =>
      val next = frontier.flatMap(neighbors).distinct.filter(seen.add)
      frontier = next
      next
    }
  }

  // SQL entry points follow Kusto's invalid-geo-input contract: a bad
  // token or out-of-range resolution yields NULL, never a failed query
  // (the same posture as centerPoint's NaN). May return null.
  def parentToken(t: UTF8String, res: Int): UTF8String =
    try UTF8String.fromString(token(parent(fromToken(t.toString), res)))
    catch { case _: Exception => null }

  def childrenTokens(t: UTF8String): GenericArrayData =
    try new GenericArrayData(children(fromToken(t.toString))
      .map(c => UTF8String.fromString(token(c))).toArray[Any])
    catch { case _: Exception => null }

  def ringsTokens(t: UTF8String, n: Int): GenericArrayData =
    try new GenericArrayData(rings(fromToken(t.toString), n).map { ring =>
      new GenericArrayData(ring.map(c => UTF8String.fromString(token(c))).toArray[Any])
    }.toArray[Any])
    catch { case _: Exception => null }

  // test hooks (H3Spec proves the published aperture-7 identity directly)
  private[graft] def testDownAp7(i: Int, j: Int, k: Int) = downAp7(i, j, k)
  private[graft] def testDownAp7r(i: Int, j: Int, k: Int) = downAp7r(i, j, k)
  private[graft] def testUpAp7(i: Int, j: Int, k: Int) = upAp7(i, j, k)
  private[graft] def testUpAp7r(i: Int, j: Int, k: Int) = upAp7r(i, j, k)
  private[graft] def testNormalize(i: Int, j: Int, k: Int) = ijkNormalize(i, j, k)

  // ---- UTF8String entry points for codegen -----------------------------

  def cellToken(lng: Double, lat: Double, res: Int): UTF8String =
    UTF8String.fromString(token(encode(lng, lat, res)))

  def centerPoint(t: UTF8String): GenericArrayData = {
    val (lng, lat) =
      try centerLngLat(fromToken(t.toString))
      catch { case _: Exception => (Double.NaN, Double.NaN) }
    new GenericArrayData(Array[Any](lng, lat))
  }

  def neighborTokens(t: UTF8String): GenericArrayData =
    try new GenericArrayData(neighbors(fromToken(t.toString))
      .map(n => UTF8String.fromString(token(n))).toArray[Any])
    catch { case _: Exception => null }

  /** geo_h3cell_to_polygon: the hexagon boundary as the geo family's bare
    * vertex ring. Computed as the VORONOI DUAL of the cell lattice — each
    * boundary vertex is the spherical circumcenter-approximation (normalized
    * chord midpoint) of the cell's center with two azimuth-consecutive
    * neighbor centers; this is exact for the ideal hex lattice the aperture-7
    * framework defines and needs no per-vertex table (deviation from libh3's
    * tabulated boundaries — documented at the object header alongside the
    * base-cell note). 5 or 6 vertices (pentagon-like seam cells have 5
    * neighbors). Sorted CCW by azimuth from the center. Bad tokens → null.
    * Additional deviation: where a neighbor lies across an icosahedron FACE
    * SEAM the dual vertices distort (the gnomonic frames differ), so the
    * ring can over/under-cover near face boundaries — interior cells are
    * exact (property-tested: center containment everywhere, neighbor-center
    * exclusion for same-face neighbors). */
  def cellPolygon(t: UTF8String): GenericArrayData = {
    try {
      val v = fromToken(t.toString)
      val (clng, clat) = centerLngLat(v)
      def toXyz(lng: Double, lat: Double): (Double, Double, Double) = {
        val phi = math.toRadians(lat); val th = math.toRadians(lng)
        (math.cos(phi) * math.cos(th), math.cos(phi) * math.sin(th), math.sin(phi))
      }
      val c = toXyz(clng, clat)
      val nbs = neighbors(v).map { n =>
        val (lng, lat) = centerLngLat(n); (lng, lat)
      }
      require(nbs.size >= 3, s"cell has ${nbs.size} neighbors, need >= 3")
      // order neighbors CCW by local azimuth around the center; the
      // longitude delta is wrap-normalized to (−180, 180] so cells beside
      // the antimeridian sort in true cyclic order
      val cosc = math.cos(math.toRadians(clat))
      val ordered = nbs.sortBy { case (lng, lat) =>
        val dl = ((lng - clng + 540.0) % 360.0) - 180.0
        math.atan2(lat - clat, dl * cosc)
      }
      val verts = ordered.indices.map { i =>
        val a = toXyz(ordered(i)._1, ordered(i)._2)
        val b = toXyz(ordered((i + 1) % ordered.size)._1, ordered((i + 1) % ordered.size)._2)
        val sx = c._1 + a._1 + b._1; val sy = c._2 + a._2 + b._2
        val sz = c._3 + a._3 + b._3
        val norm = math.sqrt(sx * sx + sy * sy + sz * sz)
        new GenericArrayData(Array[Any](
          math.toDegrees(math.atan2(sy / norm, sx / norm)),
          math.toDegrees(math.asin(sz / norm))))
      }
      new GenericArrayData(verts.toArray[Any])
    } catch { case _: Exception => null }
  }
}

/** geo_point_to_h3cell(lng, lat, res) → 15-hex-digit token. */
case class H3CellExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expected (double, double, int)")
  override def dataType: DataType = StringType
  override protected def nullSafeEval(lng: Any, lat: Any, r: Any): Any =
    H3Expressions.cellToken(lng.asInstanceOf[Double], lat.asInstanceOf[Double],
      r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.plans.H3Expressions.cellToken($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = "graft_h3_cell"
}

/** geo_h3cell_to_central_point(token) → [lng, lat]. */
case class H3CenterExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    H3Expressions.centerPoint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H3Expressions.centerPoint($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_h3_center_point"
}

/** geo_h3cell_parent(token, res) → ancestor token (digit-path prefix). */
case class H3ParentExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expected (string, int)")
  override def dataType: DataType = StringType
  override protected def nullSafeEval(t: Any, r: Any): Any =
    H3Expressions.parentToken(t.asInstanceOf[UTF8String], r.asInstanceOf[Int])
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r) => s"""
      ${ev.value} = graft.plans.H3Expressions.parentToken($t, $r);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_h3_parent"
}

/** geo_h3cell_children(token) → the 7 digit-path extensions. */
case class H3ChildrenExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    H3Expressions.childrenTokens(input.asInstanceOf[UTF8String])
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.H3Expressions.childrenTokens($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_h3_children"
}

/** geo_h3cell_rings(token, n) → array of distance rings (array of arrays). */
case class H3RingsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expected (string, int)")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false),
    containsNull = false)
  override protected def nullSafeEval(t: Any, n: Any): Any =
    H3Expressions.ringsTokens(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => s"""
      ${ev.value} = graft.plans.H3Expressions.ringsTokens($t, $n);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_h3_rings"
}

/** geo_h3cell_to_polygon(token) → hexagon boundary vertex ring. */
case class H3CellPolygonExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
    containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    H3Expressions.cellPolygon(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.H3Expressions.cellPolygon($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_h3_cell_polygon"
}

/** geo_h3cell_neighbors(token) → array of adjacent-cell tokens. */
case class H3NeighborsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    H3Expressions.neighborTokens(input.asInstanceOf[UTF8String])
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.H3Expressions.neighborTokens($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_h3_neighbors"
}
