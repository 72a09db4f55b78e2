package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** S2 cell scalars (`geo_point_to_s2cell` / `geo_s2cell_to_central_point`;
  * reference KQL surface `/root/reference/README.md:33-34`) implemented from
  * the PUBLIC S2 geometry spec: cube-face projection (quadratic ST), Hilbert
  * curve cell ids (lookup-table traversal, 4 bits per step), and the
  * canonical hex token form (trailing zeros stripped, "X" for id 0).
  *
  * Like geohash, S2 tokens are hierarchical: a level-k cell's id is a prefix
  * of its descendants' ids, so equality joins on `geo_point_to_s2cell(lng,
  * lat, k)` give distributed spatial bucketing — the scale path for
  * proximity joins (bucket equi-join on an ≤16-char key; no pairwise
  * distance pass, no broadcast requirement). The Hilbert ordering keeps
  * spatially adjacent cells numerically adjacent, so sorted/ranged storage
  * on the token clusters nearby points into the same row groups.
  *
  * Determinism: integer bit arithmetic throughout; the only doubles are the
  * trig projections (fixed IEEE chains). All math is from the published
  * algorithm — no library dependency.
  */
object S2Expressions {

  val names: Map[String, String] = Map(
    "s2_cell" -> "graft_s2_cell",
    "s2_center_lng" -> "graft_s2_center_lng",
    "s2_center_lat" -> "graft_s2_center_lat")

  private final val MaxLevel = 30
  private final val PosBits = 2 * MaxLevel + 1 // 61
  private final val SwapMask = 1
  private final val InvertMask = 2

  // Hilbert sub-cell orders (public S2 constants)
  private[graft] val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private[graft] val PosToOrientation: Array[Int] =
    Array(SwapMask, 0, 0, InvertMask | SwapMask)

  // 4-bit lookup tables: (ij << 2 | orientation) → (pos << 2 | orientation)
  private val LookupPos = new Array[Int](1 << 10)
  private val LookupIj = new Array[Int](1 << 10)
  private def initLookup(level: Int, i: Int, j: Int, origOrientation: Int,
      pos: Int, orientation: Int): Unit = {
    if (level == 4) {
      val ij = (i << 4) + j
      LookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
      LookupIj((pos << 2) + origOrientation) = (ij << 2) + orientation
    } else {
      val r = PosToIJ(orientation)
      var idx = 0
      while (idx < 4) {
        initLookup(level + 1, (i << 1) + (r(idx) >> 1), (j << 1) + (r(idx) & 1),
          origOrientation, (pos << 2) + idx, orientation ^ PosToOrientation(idx))
        idx += 1
      }
    }
  }
  locally {
    var o = 0
    while (o < 4) { initLookup(0, 0, 0, o, 0, o); o += 1 }
  }

  // ---- face projection -------------------------------------------------

  /** (face, u, v) of a unit-sphere direction. */
  private def xyzToFaceUV(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    var face = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val major = face match { case 0 => x; case 1 => y; case _ => z }
    if (major < 0) face += 3
    val (u, v) = face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }
    (face, u, v)
  }

  private def faceUVtoXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  /** Quadratic UV↔ST projection (the S2 default). */
  private def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u) else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)
  private def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  private def stToIJ(s: Double): Int =
    math.max(0, math.min((1 << MaxLevel) - 1, math.floor(s * (1 << MaxLevel)).toInt))

  // ---- cell ids --------------------------------------------------------

  /** Leaf (level 30) cell id from face + leaf-grid (i, j) — the table-driven
    * Hilbert traversal, 4 bits per step. */
  private[graft] def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var n = face.toLong << (PosBits - 1)
    var bits = face & SwapMask
    var k = 7
    while (k >= 0) {
      bits += ((i >> (k * 4)) & 15) << 6
      bits += ((j >> (k * 4)) & 15) << 2
      bits = LookupPos(bits)
      n |= (bits >> 2).toLong << (k * 8)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1
  }

  private def toFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> PosBits).toInt
    var bits = face & SwapMask
    var i = 0; var j = 0
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MaxLevel - 7 * 4 else 4
      bits += ((id >>> (k * 8 + 1)) & ((1 << (2 * nbits)) - 1)).toInt << 2
      bits = LookupIj(bits)
      i += (bits >> 6) << (k * 4)
      j += ((bits >> 2) & 15) << (k * 4)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    (face, i, j)
  }

  private def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))

  private[graft] def parentAtLevel(id: Long, level: Int): Long = {
    val nl = lsbForLevel(level)
    (id & -nl) | nl
  }

  /** Canonical token: 16-digit hex with trailing zeros stripped; "X" for 0. */
  private[graft] def token(id: Long): String = {
    if (id == 0) return "X"
    val h = f"$id%016x"
    var end = h.length
    while (end > 1 && h.charAt(end - 1) == '0') end -= 1
    h.substring(0, end)
  }

  private[graft] def idFromToken(t: String): Long = {
    require(t.nonEmpty && t.length <= 16, "bad s2 token")
    if (t == "X" || t == "x") return 0L
    java.lang.Long.parseUnsignedLong(t + "0" * (16 - t.length), 16)
  }

  // ---- neighbors (published AppendAllNeighbors + FromFaceIJWrap) -------

  private def levelOf(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  /** FromFaceIJ tolerating out-of-range ij: wraps across the cube edge via
    * the LINEAR uv mapping (the published FromFaceIJWrap — linear is exact
    * here because the wrap only ever moves one step past an edge). */
  private def fromFaceIJWrap(face: Int, i: Int, j: Int): Long = {
    val max = 1 << MaxLevel
    val ic = math.max(-1, math.min(max, i))
    val jc = math.max(-1, math.min(max, j))
    val scale = 1.0 / max
    val limit = 1.0 + 2.2204460492503131e-16
    val u = math.max(-limit, math.min(limit, scale * (2.0 * (ic - max / 2) + 1.0)))
    val v = math.max(-limit, math.min(limit, scale * (2.0 * (jc - max / 2) + 1.0)))
    val (x, y, z) = faceUVtoXYZ(face, u, v)
    val (f2, u2, v2) = xyzToFaceUV(x, y, z)
    fromFaceIJ(f2, stToIJ(0.5 * (u2 + 1)), stToIJ(0.5 * (v2 + 1)))
  }

  private def fromFaceIJSame(face: Int, i: Int, j: Int, same: Boolean): Long =
    if (same) fromFaceIJ(face, i, j) else fromFaceIJWrap(face, i, j)

  /** All neighbors of the cell at its own level (8 in the interior, fewer
    * only at cube corners after dedup), in the published append order,
    * deduped preserving first appearance. */
  private[graft] def allNeighbors(id: Long): Seq[Long] = {
    val level = levelOf(id)
    val size = 1 << (MaxLevel - level)
    val max = 1 << MaxLevel
    val (face, i0, j0) = toFaceIJ(id)
    val i = i0 & -size
    val j = j0 & -size
    val out = Vector.newBuilder[Long]
    var k = -size
    var done = false
    while (!done) {
      val sameFace =
        if (k < 0) j + k >= 0
        else if (k >= size) j + k < max
        else {
          out += parentAtLevel(
            fromFaceIJSame(face, i + k, j - size, j - size >= 0), level)
          out += parentAtLevel(
            fromFaceIJSame(face, i + k, j + size, j + size < max), level)
          true
        }
      out += parentAtLevel(
        fromFaceIJSame(face, i - size, j + k, sameFace && i - size >= 0), level)
      out += parentAtLevel(
        fromFaceIJSame(face, i + size, j + k, sameFace && i + size < max), level)
      if (k >= size) done = true else k += size
    }
    out.result().distinct.filterNot(_ == id)
  }

  def neighborTokens(t: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val id = idFromToken(t.toString)
    require(id != 0, "zero id has no neighbors")
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      allNeighbors(id).map(n => UTF8String.fromString(token(n))).toArray[Any])
  }

  // ---- polygon covering (geo_polygon_to_s2cells) -----------------------

  /** Conservative lng/lat box of a cell: 4 corners + 4 edge midpoints
    * through the exact ST→UV→sphere chain, padded 25% per side (the
    * projected cell edge can bulge past the 8-point hull; padding only ADDS
    * covering cells, never loses one — the exact point-in-polygon residual
    * prunes the extras). Antimeridian-spanning boxes widen to the full lng
    * range (conservative). */
  private def cellLngLatBoxes(id: Long): Seq[(Double, Double, Double, Double)] = {
    val level = levelOf(id)
    val size = 1 << (MaxLevel - level)
    val (face, i, j) = toFaceIJ(id)
    val i0 = (i & -size).toDouble; val j0 = (j & -size).toDouble
    val max = (1L << MaxLevel).toDouble
    val offs = Array((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0),
      (0.5, 0.0), (0.5, 1.0), (0.0, 0.5), (1.0, 0.5))
    val lngs = new Array[Double](offs.length)
    var y0 = Double.MaxValue; var y1 = -Double.MaxValue
    var k = 0
    offs.foreach { case (di, dj) =>
      val u = stToUV((i0 + di * size) / max)
      val v = stToUV((j0 + dj * size) / max)
      val (x, y, z) = faceUVtoXYZ(face, u, v)
      lngs(k) = math.toDegrees(math.atan2(y, x)); k += 1
      val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
      y0 = math.min(y0, lat); y1 = math.max(y1, lat)
    }
    val py = 0.25 * (y1 - y0) + 1e-9
    val by0 = y0 - py; val by1 = y1 + py
    def padded(x0: Double, x1: Double): (Double, Double) = {
      val px = 0.25 * (x1 - x0) + 1e-9
      (x0 - px, x1 + px)
    }
    if (lngs.max - lngs.min <= 180.0) {
      val (x0, x1) = padded(lngs.min, lngs.max)
      Seq((x0, by0, x1, by1))
    } else {
      // antimeridian-crossing cell: re-anchor lngs to [0,360) and split the
      // compact interval back into at most two [-180,180] boxes
      val sh = lngs.map(l => if (l < 0) l + 360.0 else l)
      if (sh.max - sh.min > 180.0) // pole cell — genuinely all longitudes
        Seq((-180.0, by0, 180.0, by1))
      else {
        val (x0, x1) = padded(sh.min, sh.max)
        if (x1 <= 180.0) Seq((x0, by0, x1, by1))
        else if (x0 >= 180.0) Seq((x0 - 360.0, by0, x1 - 360.0, by1))
        else Seq((x0, by0, 180.0, by1), (-180.0, by0, x1 - 360.0, by1))
      }
    }
  }

  /** Ray cast — the same fixed-order IEEE chain as the SQL-side
    * geo_point_in_polygon, so covering and residual agree on boundaries. */
  private def rayCast(x: Double, y: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    var c = false; var i = 0; val n = xs.length
    while (i < n) {
      val j2 = if (i + 1 == n) 0 else i + 1
      val yi = ys(i); val yj = ys(j2)
      if ((yi > y) != (yj > y) &&
          x < (xs(j2) - xs(i)) * (y - yi) / (yj - yi) + xs(i)) c = !c
      i += 1
    }
    c
  }

  /** Segment intersection with ≤0 orientation products — touching counts
    * as crossing (over-inclusive is safe for a covering). */
  private def segsCross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def o(px: Double, py: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Double =
      math.signum((qx - px) * (ry - py) - (qy - py) * (rx - px))
    val o1 = o(ax, ay, bx, by, cx, cy); val o2 = o(ax, ay, bx, by, dx, dy)
    val o3 = o(cx, cy, dx, dy, ax, ay); val o4 = o(cx, cy, dx, dy, bx, by)
    o1 * o2 <= 0 && o3 * o4 <= 0 &&
      math.max(math.min(ax, bx), math.min(cx, dx)) <=
        math.min(math.max(ax, bx), math.max(cx, dx)) + 1e-12 &&
      math.max(math.min(ay, by), math.min(cy, dy)) <=
        math.min(math.max(ay, by), math.max(cy, dy)) + 1e-12
  }

  /** COMPLETE covering of a [[lng,lat],…] ring at `level`: region-grow from
    * the vertex cells over same-level neighbors, keeping every cell whose
    * padded lng/lat box intersects the polygon (vertex-in-box ∨
    * box-corner-in-polygon ∨ edge crossing). Completeness: the padded box
    * CONTAINS the cell, so a cell truly meeting the polygon always tests
    * true, and intersecting cells of a connected polygon are connected
    * under 8-neighbor adjacency — BFS from the boundary reaches them all.
    * Capped at 8192 cells (use a coarser level past that; Kusto's coverer
    * has the same kind of budget). */
  private[graft] def coverRing(xs: Array[Double], ys: Array[Double], level: Int): Seq[Long] = {
    require(level >= 0 && level <= MaxLevel, s"bad s2 level $level")
    require(xs.length >= 3, "polygon needs >= 3 vertices")
    val minX = xs.min; val maxX = xs.max; val minY = ys.min; val maxY = ys.max
    def boxIntersects(bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean = {
      if (bx1 < minX || bx0 > maxX || by1 < minY || by0 > maxY) return false
      var i = 0
      while (i < xs.length) {
        if (xs(i) >= bx0 && xs(i) <= bx1 && ys(i) >= by0 && ys(i) <= by1) return true
        i += 1
      }
      val corners = Array((bx0, by0), (bx1, by0), (bx1, by1), (bx0, by1))
      if (corners.exists { case (cx, cy) => rayCast(cx, cy, xs, ys) }) return true
      val boxEdges = Array((bx0, by0, bx1, by0), (bx1, by0, bx1, by1),
        (bx1, by1, bx0, by1), (bx0, by1, bx0, by0))
      i = 0
      while (i < xs.length) {
        val j2 = if (i + 1 == xs.length) 0 else i + 1
        if (boxEdges.exists { case (ax, ay, bx, by) =>
          segsCross(xs(i), ys(i), xs(j2), ys(j2), ax, ay, bx, by) }) return true
        i += 1
      }
      false
    }
    // A ring in the ANCHORED [0,360) frame (an antimeridian-crossing ring
    // whose negative lngs were shifted +360 by the caller) has maxX > 180;
    // cell boxes stay in [-180,180], so also test each box's +360 image.
    // Over-inclusion is safe for a covering (the residual is exact).
    val wrap = maxX > 180.0
    def cellIntersects(id: Long): Boolean =
      cellLngLatBoxes(id).exists { case (bx0, by0, bx1, by1) =>
        boxIntersects(bx0, by0, bx1, by1) ||
          (wrap && boxIntersects(bx0 + 360.0, by0, bx1 + 360.0, by1)) }
    val seeds = xs.indices
      .map(i => parentAtLevel(leafFromLngLat(xs(i), ys(i)), level)).distinct
    val visited = scala.collection.mutable.HashSet[Long](seeds: _*)
    val queue = scala.collection.mutable.Queue[Long](seeds: _*)
    val out = Vector.newBuilder[Long]
    var count = 0
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      if (cellIntersects(c)) {
        out += c; count += 1
        require(count <= 8192,
          s"geo_polygon_to_s2cells: covering exceeds 8192 cells at level $level")
        allNeighbors(c).foreach(nb => if (visited.add(nb)) queue.enqueue(nb))
      }
    }
    out.result().sorted
  }

  /** Null (Kusto's invalid-input posture) when the covering exceeds the
    * 8192-cell budget for the level, or the ring spans >180° of longitude
    * (antimeridian-crossing rings are not supported — documented; split the
    * polygon at ±180 first). Malformed rings still throw. */
  def coverTokens(ring: org.apache.spark.sql.catalyst.util.ArrayData,
      level: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nAll = ring.numElements()
    // ignore an explicit closing vertex — the ray cast / edge walk wrap
    val n = if (nAll > 1 && {
      val a = ring.getArray(0); val b = ring.getArray(nAll - 1)
      a.getDouble(0) == b.getDouble(0) && a.getDouble(1) == b.getDouble(1)
    }) nAll - 1 else nAll
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = ring.getArray(i)
      xs(i) = p.getDouble(0); ys(i) = p.getDouble(1)
      i += 1
    }
    if (xs.length >= 3 && xs.max - xs.min > 180.0) return null
    try new org.apache.spark.sql.catalyst.util.GenericArrayData(
      coverRing(xs, ys, level).map(c => UTF8String.fromString(token(c))).toArray[Any])
    catch {
      case e: IllegalArgumentException if e.getMessage.contains("8192") => null
    }
  }

  // ---- public scalar entry points --------------------------------------

  private[graft] def leafFromLngLat(lngDeg: Double, latDeg: Double): Long = {
    val phi = math.toRadians(latDeg); val theta = math.toRadians(lngDeg)
    val cosphi = math.cos(phi)
    val (face, u, v) =
      xyzToFaceUV(cosphi * math.cos(theta), cosphi * math.sin(theta), math.sin(phi))
    fromFaceIJ(face, stToIJ(uvToST(u)), stToIJ(uvToST(v)))
  }

  def cellToken(lng: Double, lat: Double, level: Int): UTF8String =
    UTF8String.fromString(token(parentAtLevel(leafFromLngLat(lng, lat), level)))

  /** Cell center in (lng, lat) degrees — the exact si/ti midpoint readout
    * from the published GetCenterSiTi rule. Malformed tokens → NaN. */
  private[graft] def centerLngLat(t: String): (Double, Double) = try {
    val id = idFromToken(t)
    require(id != 0, "zero id has no center")
    val (face, i, j) = toFaceIJ(id)
    val delta =
      if ((id & 1) != 0) 1L
      else if (((i.toLong ^ (id >>> 2)) & 1L) != 0) 2L else 0L
    val si = 2L * i + delta
    val ti = 2L * j + delta
    val scale = 1.0 / (1L << (MaxLevel + 1)).toDouble
    val u = stToUV(si * scale); val v = stToUV(ti * scale)
    val (x, y, z) = faceUVtoXYZ(face, u, v)
    (math.toDegrees(math.atan2(y, x)),
      math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))
  } catch { case _: Exception => (Double.NaN, Double.NaN) }

  def centerLng(t: UTF8String): Double = centerLngLat(t.toString)._1
  def centerLat(t: UTF8String): Double = centerLngLat(t.toString)._2

  /** Both coordinates in ONE decode (the geo_s2cell_to_central_point path —
    * per-coordinate expressions would run the token parse + Hilbert decode +
    * trig chain twice per row). */
  def centerPoint(t: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val (lng, lat) = centerLngLat(t.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](lng, lat))
  }

  /** COMPLETE covering of a [[lng,lat],…] polyline at `level` — the line
    * analogue of coverRing, the bucket-key producer for route×points joins
    * (geo_line_to_s2cells / geo_line_lookup). Region-grow from the vertex
    * cells keeping every cell whose padded box meets any SEGMENT (vertex in
    * box ∨ segment×box-edge crossing — a segment wholly inside the box has
    * its vertices inside; one passing through must cross an edge). Same
    * completeness argument as coverRing: the padded box CONTAINS the cell,
    * and cells meeting a connected polyline are 8-neighbor connected.
    * Same 8192-cell budget. */
  private[graft] def coverPolyline(xs: Array[Double], ys: Array[Double],
      level: Int): Seq[Long] = {
    require(level >= 0 && level <= MaxLevel, s"bad s2 level $level")
    require(xs.length >= 2, "line needs >= 2 vertices")
    val minX = xs.min; val maxX = xs.max; val minY = ys.min; val maxY = ys.max
    def boxMeetsLine(bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean = {
      if (bx1 < minX || bx0 > maxX || by1 < minY || by0 > maxY) return false
      var i = 0
      while (i < xs.length) {
        if (xs(i) >= bx0 && xs(i) <= bx1 && ys(i) >= by0 && ys(i) <= by1) return true
        i += 1
      }
      val boxEdges = Array((bx0, by0, bx1, by0), (bx1, by0, bx1, by1),
        (bx1, by1, bx0, by1), (bx0, by1, bx0, by0))
      i = 0
      while (i < xs.length - 1) {
        if (boxEdges.exists { case (ax, ay, bx, by) =>
          segsCross(xs(i), ys(i), xs(i + 1), ys(i + 1), ax, ay, bx, by) }) return true
        i += 1
      }
      false
    }
    // anchored-frame polylines (see coverRing): test each box's +360 image
    val wrap = maxX > 180.0
    def cellMeets(id: Long): Boolean =
      cellLngLatBoxes(id).exists { case (bx0, by0, bx1, by1) =>
        boxMeetsLine(bx0, by0, bx1, by1) ||
          (wrap && boxMeetsLine(bx0 + 360.0, by0, bx1 + 360.0, by1)) }
    val seeds = xs.indices
      .map(i => parentAtLevel(leafFromLngLat(xs(i), ys(i)), level)).distinct
    val visited = scala.collection.mutable.HashSet[Long](seeds: _*)
    val queue = scala.collection.mutable.Queue[Long](seeds: _*)
    val out = Vector.newBuilder[Long]
    var count = 0
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      if (cellMeets(c)) {
        out += c; count += 1
        require(count <= 8192,
          s"geo_line_to_s2cells: covering exceeds 8192 cells at level $level")
        allNeighbors(c).foreach(nb => if (visited.add(nb)) queue.enqueue(nb))
      }
    }
    out.result().sorted
  }

  /** Null posture mirrors coverTokens: budget blow-out, a >180° longitude
    * span (antimeridian lines unsupported — documented), or a degenerate
    * <2-vertex line → null. */
  def coverLineTokens(line: org.apache.spark.sql.catalyst.util.ArrayData,
      level: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = line.numElements()
    if (n < 2) return null
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = line.getArray(i)
      xs(i) = p.getDouble(0); ys(i) = p.getDouble(1)
      i += 1
    }
    if (xs.length >= 2 && xs.max - xs.min > 180.0) return null
    try new org.apache.spark.sql.catalyst.util.GenericArrayData(
      coverPolyline(xs, ys, level).map(c => UTF8String.fromString(token(c))).toArray[Any])
    catch {
      case e: IllegalArgumentException if e.getMessage.contains("8192") => null
    }
  }

  /** Cell boundary as the geo family's bare vertex ring (deviation from
    * Kusto's GeoJSON dynamic — documented, same convention as the rest of
    * the repo): the 4 (u,v)-rectangle corners mapped to [lng, lat], in
    * cyclic (ST-space CCW) order. Malformed tokens → null. */
  def cellPolygon(t: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    try {
      val id = idFromToken(t.toString)
      require(id != 0, "zero id has no boundary")
      val level = levelOf(id)
      val size = 1 << (MaxLevel - level)
      val (face, i, j) = toFaceIJ(id)
      val i0 = (i & -size).toLong; val j0 = (j & -size).toLong
      val max = (1L << MaxLevel).toDouble
      val corners = Array((i0, j0), (i0 + size, j0),
        (i0 + size, j0 + size), (i0, j0 + size))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(corners.map {
        case (ci, cj) =>
          val u = stToUV(ci / max); val v = stToUV(cj / max)
          val (x, y, z) = faceUVtoXYZ(face, u, v)
          new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
            math.toDegrees(math.atan2(y, x)),
            math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))))
      }.toArray[Any])
    } catch { case _: Exception => null }
  }
}

/** geo_point_to_s2cell(lng, lat, level-literal) → token. */
case class S2CellExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expected (double, double, int)")
  override def dataType: DataType = StringType
  override protected def nullSafeEval(lng: Any, lat: Any, lvl: Any): Any =
    S2Expressions.cellToken(lng.asInstanceOf[Double], lat.asInstanceOf[Double],
      lvl.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.plans.S2Expressions.cellToken($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = "graft_s2_cell"
}

/** geo_s2cell_to_central_point(token) → [lng, lat], one decode per row. */
case class S2CenterPointExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    S2Expressions.centerPoint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.S2Expressions.centerPoint($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_s2_center_point"
}

/** geo_s2cell_neighbors(token) → array of same-level neighbor tokens. */
case class S2NeighborsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    S2Expressions.neighborTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.S2Expressions.neighborTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_s2_neighbors"
}

/** geo_polygon_to_s2cells(ring, level) → sorted array of covering tokens. */
case class S2CoverExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ArrayType(DoubleType, _), _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected (array<array<double>>, int), got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null on budget/antimeridian rings
  override protected def nullSafeEval(ring: Any, lvl: Any): Any =
    S2Expressions.coverTokens(
      ring.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lvl.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, l) => s"""
      ${ev.value} = graft.plans.S2Expressions.coverTokens($r, $l);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_s2_cover"
}

/** geo_line_to_s2cells(line, level) → complete covering tokens (null on
  * budget blow-out / antimeridian lines, the coverTokens posture). */
case class S2LineCoverExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ArrayType(DoubleType, _), _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected (array<array<double>>, int), got $other")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(line: Any, lvl: Any): Any =
    S2Expressions.coverLineTokens(
      line.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      lvl.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, l) => s"""
      ${ev.value} = graft.plans.S2Expressions.coverLineTokens($r, $l);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_s2_cover_line"
}

/** geo_s2cell_to_polygon(token) → the cell's 4-corner vertex ring. */
case class S2CellPolygonExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
    containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    S2Expressions.cellPolygon(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.S2Expressions.cellPolygon($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_s2_cell_polygon"
}

/** geo_s2cell_to_central_point coordinate readout (lng or lat). */
case class S2CenterExpr(child: Expression, coord: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    if (coord == "lng") S2Expressions.centerLng(t) else S2Expressions.centerLat(t)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.S2Expressions.center${if (coord == "lng") "Lng" else "Lat"}($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = s"graft_s2_center_$coord"
}
