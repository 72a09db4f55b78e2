package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Polygon boolean ops and polyline simplification
  * (`geo_intersection_2polygons` / `geo_union_2polygons` /
  * `geo_line_simplify`; reference KQL surface README.md:33-34), from the
  * published algorithms: Greiner–Hormann clipping (the linked-vertex
  * variant of Weiler–Atherton) and Ramer–Douglas–Peucker simplification.
  *
  * Deviations (documented): rings in/out are the bare [[lng,lat],…] vertex
  * form used across the geo family (not GeoJSON bags); clipping is planar
  * in lng/lat space (the geo_point_in_polygon / centroid convention —
  * exact IEEE arithmetic, sub-degree extents); when a boolean result is
  * disconnected or has holes, the largest-|area| ring is returned (Kusto
  * emits a MultiPolygon); inputs are assumed simple polygons in general
  * position (shared-vertex degeneracies follow the tie behavior of the
  * segment-intersection test). The result ring is canonicalized: oriented
  * counter-clockwise and rotated to start at the lexicographically
  * smallest vertex, so results are replayable constants for the oracle. */
object PolygonClip {

  private final class Vtx(val x: Double, val y: Double) {
    var next: Vtx = _
    var prev: Vtx = _
    var intersect = false
    var entry = false
    var neighbor: Vtx = _
    var processed = false
  }

  private def readRing(a: ArrayData): Array[(Double, Double)] = {
    val nAll = a.numElements()
    require(nAll >= 3, "polygon needs >= 3 vertices")
    val n = {
      val p0 = a.getArray(0); val pl = a.getArray(nAll - 1)
      if (nAll > 1 && p0.getDouble(0) == pl.getDouble(0) &&
        p0.getDouble(1) == pl.getDouble(1)) nAll - 1 else nAll
    }
    Array.tabulate(n) { i =>
      val p = a.getArray(i); (p.getDouble(0), p.getDouble(1))
    }
  }

  private def rayCast(x: Double, y: Double, ring: Array[(Double, Double)]): Boolean = {
    var c = false; var i = 0; val n = ring.length
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi) c = !c
      i += 1
    }
    c
  }

  /** Circular list with intersection vertices of the other ring spliced in
    * (sorted by the parameter along each original edge). Returns the list
    * head and the count of intersections found. */
  private def buildLists(s: Array[(Double, Double)], c: Array[(Double, Double)])
      : (Vtx, Vtx, Int) = {
    // per original edge, the (alpha, vertex) intersections to splice
    val sIns = Array.fill(s.length)(List.empty[(Double, Vtx)])
    val cIns = Array.fill(c.length)(List.empty[(Double, Vtx)])
    var count = 0
    var i = 0
    while (i < s.length) {
      val (x1, y1) = s(i); val (x2, y2) = s((i + 1) % s.length)
      var j = 0
      while (j < c.length) {
        val (x3, y3) = c(j); val (x4, y4) = c((j + 1) % c.length)
        val den = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        if (den != 0.0) {
          val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / den
          val u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / den
          if (t > 0 && t < 1 && u > 0 && u < 1) {
            val ix = x1 + t * (x2 - x1); val iy = y1 + t * (y2 - y1)
            val vs = new Vtx(ix, iy); val vc = new Vtx(ix, iy)
            vs.intersect = true; vc.intersect = true
            vs.neighbor = vc; vc.neighbor = vs
            sIns(i) = (t, vs) :: sIns(i)
            cIns(j) = (u, vc) :: cIns(j)
            count += 1
          }
        }
        j += 1
      }
      i += 1
    }
    def link(ring: Array[(Double, Double)], ins: Array[List[(Double, Vtx)]]): Vtx = {
      val all = ring.indices.flatMap { i =>
        new Vtx(ring(i)._1, ring(i)._2) +: ins(i).sortBy(_._1).map(_._2)
      }
      all.indices.foreach { i =>
        all(i).next = all((i + 1) % all.length)
        all(i).prev = all((i - 1 + all.length) % all.length)
      }
      all.head
    }
    (link(s, sIns), link(c, cIns), count)
  }

  /** Alternate entry/exit flags along a list; `firstInside` is whether the
    * list's first vertex lies inside the OTHER polygon. */
  private def markEntries(head: Vtx, firstInside: Boolean): Unit = {
    var entry = !firstInside // next intersection enters iff we start outside
    var v = head
    do {
      if (v.intersect) { v.entry = entry; entry = !entry }
      v = v.next
    } while (v ne head)
  }

  private def shoelace(ring: Seq[(Double, Double)]): Double = {
    var a = 0.0; var i = 0; val n = ring.length
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      a += ring(i)._1 * ring(j)._2 - ring(j)._1 * ring(i)._2
      i += 1
    }
    a / 2.0
  }

  /** Canonical form: CCW orientation, rotated to start at the smallest
    * (x, y) vertex, duplicate-free. */
  private def canonical(ring: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val dedup = ring.zipWithIndex.filter { case (p, i) =>
      p != ring((i + 1) % ring.length) }.map(_._1)
    if (dedup.length < 3) return Nil
    val ccw = if (shoelace(dedup) < 0) dedup.reverse else dedup
    val start = ccw.indices.minBy(i => ccw(i))
    ccw.drop(start) ++ ccw.take(start)
  }

  /** Greiner–Hormann traversal. `union = false` → intersection. */
  private def clip(sArr: ArrayData, cArr: ArrayData, union: Boolean): Seq[Seq[(Double, Double)]] = {
    val s = readRing(sArr); val c = readRing(cArr)
    val (sHead, cHead, n) = buildLists(s, c)
    if (n == 0) {
      // containment / disjoint cases
      val sInC = rayCast(s(0)._1, s(0)._2, c)
      val cInS = rayCast(c(0)._1, c(0)._2, s)
      return (union, sInC, cInS) match {
        case (false, true, _) => Seq(s.toSeq) // S ⊂ C → S
        case (false, _, true) => Seq(c.toSeq) // C ⊂ S → C
        case (false, _, _)    => Nil          // disjoint
        case (true, true, _)  => Seq(c.toSeq) // S ⊂ C → C
        case (true, _, true)  => Seq(s.toSeq)
        case (true, _, _)     => Nil          // disconnected union (documented)
      }
    }
    markEntries(sHead, firstInside = rayCast(s(0)._1, s(0)._2, c) != union)
    markEntries(cHead, firstInside = rayCast(c(0)._1, c(0)._2, s) != union)
    val polys = Seq.newBuilder[Seq[(Double, Double)]]
    var guard = 0
    def nextUnprocessed(): Vtx = {
      var v = sHead
      do { if (v.intersect && !v.processed) return v; v = v.next } while (v ne sHead)
      null
    }
    var start = nextUnprocessed()
    while (start != null && guard < 10000) {
      val poly = Seq.newBuilder[(Double, Double)]
      var cur = start
      do {
        cur.processed = true; cur.neighbor.processed = true
        if (cur.entry) {
          do { cur = cur.next; poly += ((cur.x, cur.y)); guard += 1 }
          while (!cur.intersect && guard < 10000)
        } else {
          do { cur = cur.prev; poly += ((cur.x, cur.y)); guard += 1 }
          while (!cur.intersect && guard < 10000)
        }
        cur = cur.neighbor
      } while ((cur ne start) && !cur.processed && guard < 10000)
      polys += poly.result()
      start = nextUnprocessed()
    }
    // a blown budget must FAIL, not emit a silently truncated ring
    require(guard < 10000,
      "polygon clip: traversal budget exceeded (simplify the inputs — e.g. geo_line_simplify — before boolean ops)")
    polys.result()
  }

  private def toArrayData(ring: Seq[(Double, Double)]): GenericArrayData =
    new GenericArrayData(ring.map { case (x, y) =>
      new GenericArrayData(Array[Any](x, y)) }.toArray[Any])

  /** Entry point: largest-|area| canonical ring, or null when empty. */
  def boolOp(s: ArrayData, c: ArrayData, union: Boolean): GenericArrayData = {
    val rings = clip(s, c, union).map(canonical).filter(_.nonEmpty)
    if (rings.isEmpty) null
    else toArrayData(rings.maxBy(r => math.abs(shoelace(r))))
  }

  /** geo_union_polygons_array: left fold of the pairwise union; null as
    * soon as a step disconnects (the boolOp contract). A single ring
    * passes through canonicalized. */
  def unionRings(polysArr: ArrayData): GenericArrayData = {
    val n = polysArr.numElements()
    require(n >= 1, "geo_union_polygons_array: empty array")
    if (n == 1)
      return toArrayData(canonical(readRing(polysArr.getArray(0)).toSeq))
    var acc: ArrayData = polysArr.getArray(0)
    var i = 1
    while (i < n && acc != null) {
      acc = boolOp(acc, polysArr.getArray(i), union = true)
      i += 1
    }
    acc match {
      case null => null
      case g: GenericArrayData => g
      case other => toArrayData(readRing(other).toSeq) // defensive copy path
    }
  }

  /** geo_intersection_line_with_polygon: the parts of the polyline inside
    * the ring, as a MULTILINE (array of [lng,lat] lines — the bare-ring
    * deviation of Kusto's MultiLineString). Per segment: split at every
    * ring-edge crossing parameter, keep the pieces whose midpoint ray-casts
    * inside; contiguous pieces merge. Null when nothing is inside. */
  /** geo_line_buffer / geo_polygon_buffer: the radius-`r` neighborhood of a
    * polyline (or of a polygon = interior ∪ boundary neighborhood) as ONE
    * boundary ring — built constructively as the Greiner–Hormann union fold
    * of per-segment oriented rectangles and per-vertex 16-gons (radius
    * padded 0.05% so circle/rect meetings are transversal, never tangent),
    * interleaved v₀, r₀, v₁, r₁, … so every fold step overlaps the
    * accumulator (the union never disconnects). Geometry is planar in a
    * local frame anchored at the centroid latitude (lng scaled by cos φ),
    * like the rest of the clipping family; deviations (vs Kusto's WGS84
    * geodesic buffers): spherical-planar approximation, 16-gon round joins,
    * largest-ring MultiPolygon result. Degenerate/self-overlapping unions
    * → null (the boolOp posture). */
  def bufferLine(lineArr: ArrayData, radiusMeters: Double,
      close: Boolean): GenericArrayData = {
    // family posture: degenerate input (incl. a non-positive radius, which
    // may arrive per-row from a column) degrades to null, never a failed job
    if (!(radiusMeters > 0)) return null
    // read vertices directly (readRing requires ≥3 — a LINE needs only 2)
    val raw = Array.tabulate(lineArr.numElements()) { i =>
      val p = lineArr.getArray(i); (p.getDouble(0), p.getDouble(1))
    }
    // drop an explicit closing vertex; readRing keeps input order
    val pts = if (raw.length > 1 && raw.head == raw.last) raw.dropRight(1) else raw
    if (pts.length < (if (close) 3 else 2)) return null
    val latC = pts.map(_._2).sum / pts.length
    val cosl = math.cos(math.toRadians(latC))
    val rDeg = radiusMeters / 6371000.0 * (180.0 / math.Pi)
    val sp = pts.map { case (x, y) => (x * cosl, y) }
    def vtx16(p: (Double, Double)): Seq[(Double, Double)] = {
      val rv = rDeg * 1.0005
      (0 until 16).map { k =>
        val th = 2 * math.Pi * k / 16
        (p._1 + rv * math.cos(th), p._2 + rv * math.sin(th))
      }
    }
    def rect(i: Int): Option[Seq[(Double, Double)]] = {
      val (x1, y1) = sp(i); val (x2, y2) = sp((i + 1) % sp.length)
      val dx = x2 - x1; val dy = y2 - y1
      val len = math.hypot(dx, dy)
      if (len < 1e-12) None
      else {
        val nx = -dy / len * rDeg; val ny = dx / len * rDeg
        Some(Seq((x1 + nx, y1 + ny), (x2 + nx, y2 + ny),
          (x2 - nx, y2 - ny), (x1 - nx, y1 - ny)))
      }
    }
    val shapes = Seq.newBuilder[Seq[(Double, Double)]]
    if (close) shapes += sp.toSeq // the polygon interior itself
    shapes += vtx16(sp(0))
    val edges = if (close) sp.indices else sp.indices.dropRight(1)
    edges.foreach { i =>
      rect(i).foreach(shapes += _)
      val nextV = (i + 1) % sp.length
      if (close || nextV != 0) shapes += vtx16(sp(nextV))
    }
    val all = shapes.result()
    var acc: ArrayData = toArrayData(all.head)
    var i = 1
    while (i < all.size && acc != null) {
      acc = boolOp(acc, toArrayData(all(i)), union = true)
      i += 1
    }
    if (acc == null) return null
    val out = readRing(acc).map { case (x, y) => (x / cosl, y) }
    toArrayData(canonical(out.toSeq))
  }

  /** geo_line_centroid: length-weighted centroid of the segment midpoints,
    * planar in the per-segment equirectangular frame (lng step scaled by
    * cos of the segment's mean latitude) — the line analogue of
    * geo_polygon_centroid's planar posture (deviation from Kusto's WGS84
    * form, documented). Degenerate (<2 vertices or zero total length) →
    * null. */
  def lineCentroid(lineArr: ArrayData): GenericArrayData = {
    val n = lineArr.numElements()
    if (n < 2) return null
    var sx = 0.0; var sy = 0.0; var sl = 0.0
    var i = 0
    while (i < n - 1) {
      val a = lineArr.getArray(i); val b = lineArr.getArray(i + 1)
      val x1 = a.getDouble(0); val y1 = a.getDouble(1)
      val x2 = b.getDouble(0); val y2 = b.getDouble(1)
      val coslm = math.cos(math.toRadians((y1 + y2) / 2))
      val len = math.hypot((x2 - x1) * coslm, y2 - y1)
      sx += (x1 + x2) / 2 * len
      sy += (y1 + y2) / 2 * len
      sl += len
      i += 1
    }
    if (sl == 0.0) null
    else new GenericArrayData(Array[Any](sx / sl, sy / sl))
  }

  /** Segment-pair orientation test incl. touching and collinear overlap —
    * the coverRing/segsCross convention (over-inclusive is the geo
    * `intersects` contract). */
  private def segsTouch(ax: Double, ay: Double, bx: Double, by: Double,
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

  /** geo_intersects_2lines: any segment pair of the two polylines meets
    * (touching and collinear overlap count). */
  def linesIntersect(aArr: ArrayData, bArr: ArrayData): Boolean = {
    val na = aArr.numElements(); val nb = bArr.numElements()
    var i = 0
    while (i < na - 1) {
      val a1 = aArr.getArray(i); val a2 = aArr.getArray(i + 1)
      var j = 0
      while (j < nb - 1) {
        val b1 = bArr.getArray(j); val b2 = bArr.getArray(j + 1)
        if (segsTouch(a1.getDouble(0), a1.getDouble(1), a2.getDouble(0), a2.getDouble(1),
          b1.getDouble(0), b1.getDouble(1), b2.getDouble(0), b2.getDouble(1)))
          return true
        j += 1
      }
      i += 1
    }
    false
  }

  /** geo_intersection_2lines: the proper (non-parallel) crossing points of
    * the two polylines, in (a-segment, b-segment) scan order with exact
    * duplicates removed — a bare point array (deviation from Kusto's
    * GeoJSON MultiPoint, documented; collinear-overlap stretches yield no
    * point, like the clipper's degenerate posture). Empty → null. */
  def linesIntersection(aArr: ArrayData, bArr: ArrayData): GenericArrayData = {
    val out = Seq.newBuilder[(Double, Double)]
    val na = aArr.numElements(); val nb = bArr.numElements()
    var i = 0
    while (i < na - 1) {
      val a1 = aArr.getArray(i); val a2 = aArr.getArray(i + 1)
      val ax = a1.getDouble(0); val ay = a1.getDouble(1)
      val bx = a2.getDouble(0); val by = a2.getDouble(1)
      var j = 0
      while (j < nb - 1) {
        val b1 = bArr.getArray(j); val b2 = bArr.getArray(j + 1)
        val cx = b1.getDouble(0); val cy = b1.getDouble(1)
        val dx = b2.getDouble(0); val dy = b2.getDouble(1)
        val den = (bx - ax) * (dy - cy) - (by - ay) * (dx - cx)
        if (den != 0.0) {
          val t = ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx)) / den
          val u = ((cx - ax) * (by - ay) - (cy - ay) * (bx - ax)) / den
          if (t >= 0 && t <= 1 && u >= 0 && u <= 1)
            out += ((ax + t * (bx - ax), ay + t * (by - ay)))
        }
        j += 1
      }
      i += 1
    }
    val pts = out.result().distinct
    if (pts.isEmpty) null
    else new GenericArrayData(pts.map { case (x, y) =>
      new GenericArrayData(Array[Any](x, y)) }.toArray[Any])
  }

  def clipLine(lineArr: ArrayData, ringArr: ArrayData): GenericArrayData = {
    val ring = readRing(ringArr)
    val n = lineArr.numElements()
    val lines = Seq.newBuilder[Seq[(Double, Double)]]
    var cur = List.empty[(Double, Double)] // reversed accumulation
    def flush(): Unit = {
      if (cur.length >= 2) lines += cur.reverse
      cur = Nil
    }
    var i = 0
    while (i < n - 1) {
      val a = lineArr.getArray(i); val b = lineArr.getArray(i + 1)
      val x1 = a.getDouble(0); val y1 = a.getDouble(1)
      val x2 = b.getDouble(0); val y2 = b.getDouble(1)
      val ts = Seq.newBuilder[Double]
      ts += 0.0; ts += 1.0
      var j = 0
      while (j < ring.length) {
        val (x3, y3) = ring(j); val (x4, y4) = ring((j + 1) % ring.length)
        val den = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        if (den != 0.0) {
          val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / den
          val u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / den
          if (t > 0 && t < 1 && u >= 0 && u <= 1) ts += t
        }
        j += 1
      }
      val sorted = ts.result().distinct.sorted
      var k = 0
      while (k < sorted.length - 1) {
        val t0 = sorted(k); val t1 = sorted(k + 1)
        val tm = (t0 + t1) / 2
        val inside = rayCast(x1 + tm * (x2 - x1), y1 + tm * (y2 - y1), ring)
        val p0 = (x1 + t0 * (x2 - x1), y1 + t0 * (y2 - y1))
        val p1 = (x1 + t1 * (x2 - x1), y1 + t1 * (y2 - y1))
        if (inside) {
          if (cur.isEmpty || cur.head != p0) { flush(); cur = List(p0) }
          cur = p1 :: cur
        } else flush()
        k += 1
      }
      i += 1
    }
    flush()
    val out = lines.result()
    if (out.isEmpty) null
    else new GenericArrayData(out.map(toArrayData).toArray[Any])
  }

  /** geo_intersects_line_with_polygon: any vertex inside, or any segment
    * crossing any polygon edge (planar, general position). */
  def lineIntersectsPolygon(lineArr: ArrayData, ringArr: ArrayData): Boolean = {
    val ring = readRing(ringArr)
    val n = lineArr.numElements()
    var i = 0
    while (i < n) {
      val p = lineArr.getArray(i)
      if (rayCast(p.getDouble(0), p.getDouble(1), ring)) return true
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val a = lineArr.getArray(i); val b = lineArr.getArray(i + 1)
      var j = 0
      while (j < ring.length) {
        val (x3, y3) = ring(j); val (x4, y4) = ring((j + 1) % ring.length)
        val x1 = a.getDouble(0); val y1 = a.getDouble(1)
        val x2 = b.getDouble(0); val y2 = b.getDouble(1)
        val den = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        if (den != 0.0) {
          val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / den
          val u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / den
          if (t >= 0 && t <= 1 && u >= 0 && u <= 1) return true
        }
        j += 1
      }
      i += 1
    }
    false
  }

  /** geo_line_densify / geo_polygon_densify: linear interpolation in lng/lat
    * (planar, documented) so consecutive vertices are ≤ tolerance apart.
    * `close = true` also densifies the wrap edge of a ring. */
  def densify(lineArr: ArrayData, tolMeters: Double, close: Boolean): GenericArrayData = {
    require(tolMeters > 0, "densify tolerance must be positive")
    val n = lineArr.numElements()
    val out = Seq.newBuilder[(Double, Double)]
    val edges = if (close) n else n - 1
    var i = 0
    while (i < edges) {
      val a = lineArr.getArray(i); val b = lineArr.getArray((i + 1) % n)
      val x1 = a.getDouble(0); val y1 = a.getDouble(1)
      val x2 = b.getDouble(0); val y2 = b.getDouble(1)
      out += ((x1, y1))
      val cosl = math.cos(math.toRadians(y1))
      val meters = math.hypot((x2 - x1) * cosl, y2 - y1) * 111320.0
      val steps = math.ceil(meters / tolMeters).toInt
      var k = 1
      while (k < steps) {
        val f = k.toDouble / steps
        out += ((x1 + f * (x2 - x1), y1 + f * (y2 - y1)))
        k += 1
      }
      i += 1
    }
    if (!close && n > 0) {
      val last = lineArr.getArray(n - 1)
      out += ((last.getDouble(0), last.getDouble(1)))
    }
    toArrayData(out.result())
  }

  /** geo_simplify_polygons_array: RDP each ring, anchored at vertex 0 and
    * the vertex farthest from it (the standard closed-ring split). */
  def simplifyRings(polysArr: ArrayData, tolMeters: Double): GenericArrayData = {
    val out = (0 until polysArr.numElements()).map { p =>
      val ringArr = polysArr.getArray(p)
      val ring = readRing(ringArr)
      if (ring.length <= 4) toArrayData(ring.toSeq)
      else {
        val (x0, y0) = ring(0)
        val far = ring.indices.maxBy { i =>
          val (x, y) = ring(i); (x - x0) * (x - x0) + (y - y0) * (y - y0)
        }
        // two open chains: 0..far and far..n..0 (wrapped), each simplified
        val chain1 = ring.slice(0, far + 1)
        val chain2 = ring.drop(far) :+ ring(0)
        val s1 = simplifyChain(chain1, tolMeters)
        val s2 = simplifyChain(chain2, tolMeters)
        toArrayData(s1 ++ s2.drop(1).dropRight(1))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def simplifyChain(pts: Array[(Double, Double)], tolMeters: Double): Seq[(Double, Double)] = {
    val arr = new GenericArrayData(pts.map { case (x, y) =>
      new GenericArrayData(Array[Any](x, y)) }.toArray[Any])
    val s = simplify(arr, tolMeters)
    (0 until s.numElements()).map { i =>
      val p = s.getArray(i); (p.getDouble(0), p.getDouble(1))
    }
  }

  /** Ramer–Douglas–Peucker with a meters tolerance (equirectangular local
    * projection anchored at each segment's start — the geoPointToLine
    * convention). Endpoints always kept. */
  def simplify(lineArr: ArrayData, tolMeters: Double): GenericArrayData = {
    val n = lineArr.numElements()
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = lineArr.getArray(i); xs(i) = p.getDouble(0); ys(i) = p.getDouble(1)
      i += 1
    }
    if (n < 3) return toArrayData(xs.indices.map(i => (xs(i), ys(i))))
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val tolDeg = tolMeters / 111320.0
    def rdp(a: Int, b: Int): Unit = {
      if (b <= a + 1) return
      val cosl = math.cos(math.toRadians(ys(a)))
      val ax = 0.0; val ay = 0.0
      val bx = (xs(b) - xs(a)) * cosl; val by = ys(b) - ys(a)
      val len = math.hypot(bx - ax, by - ay)
      var worst = -1.0; var wi = -1
      var i = a + 1
      while (i < b) {
        val px = (xs(i) - xs(a)) * cosl; val py = ys(i) - ys(a)
        val d =
          if (len == 0.0) math.hypot(px, py)
          else math.abs((bx - ax) * (ay - py) - (ax - px) * (by - ay)) / len
        if (d > worst) { worst = d; wi = i }
        i += 1
      }
      if (worst > tolDeg) { keep(wi) = true; rdp(a, wi); rdp(wi, b) }
    }
    rdp(0, n - 1)
    toArrayData(xs.indices.filter(keep).map(i => (xs(i), ys(i))))
  }
}

/** geo_intersection_2polygons / geo_union_2polygons (ring, ring) → ring. */
case class PolygonBoolExpr(left: Expression, right: Expression, union: Boolean)
    extends BinaryExpression {
  private def ringType(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ringType(left.dataType) && ringType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expected two array<array<double>> rings")
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PolygonClip.boolOp(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], union)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.plans.PolygonClip.boolOp($a, $b, $union);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String =
    if (union) "graft_polygon_union" else "graft_polygon_intersection"
}

/** Two-arg geo helpers dispatched by method name:
  * line_in_poly(line, ring) → bool; densify_line/densify_ring(line, tol) →
  * line; simplify_rings(rings, tol) → rings. */
case class GeoPolyFnExpr(left: Expression, right: Expression, fn: String)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(_, _) => true
      case _ => false
    }
    // right operand per fn: tolerance double for the densify/simplify
    // forms, a vertex ring for the line×polygon forms (unused for
    // union_rings) — check here so a direct SQL misuse fails analysis,
    // not execution
    val rightOk = fn match {
      case "densify_line" | "densify_ring" | "simplify_rings" |
           "buffer_line" | "buffer_ring" =>
        right.dataType == DoubleType
      case "line_in_poly" | "clip_line" | "lines_intersect" |
           "lines_intersection" => right.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      }
      case _ => true
    }
    if (leftOk && rightOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_geo_$fn: expected (array, ${
        if (fn == "line_in_poly" || fn == "clip_line") "array<array<double>>"
        else "double"}), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = fn match {
    case "line_in_poly" | "lines_intersect" => org.apache.spark.sql.types.BooleanType
    case "line_centroid" => ArrayType(DoubleType, containsNull = false)
    case "simplify_rings" | "clip_line" => ArrayType(
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false),
      containsNull = false)
    case _ => ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = fn match {
    case "line_in_poly" =>
      PolygonClip.lineIntersectsPolygon(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "densify_line" =>
      PolygonClip.densify(a.asInstanceOf[ArrayData], b.asInstanceOf[Double], close = false)
    case "densify_ring" =>
      PolygonClip.densify(a.asInstanceOf[ArrayData], b.asInstanceOf[Double], close = true)
    case "simplify_rings" =>
      PolygonClip.simplifyRings(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])
    case "union_rings" =>
      PolygonClip.unionRings(a.asInstanceOf[ArrayData]) // right arg unused
    case "clip_line" =>
      PolygonClip.clipLine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "buffer_line" =>
      PolygonClip.bufferLine(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
        close = false)
    case "buffer_ring" =>
      PolygonClip.bufferLine(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
        close = true)
    case "line_centroid" =>
      PolygonClip.lineCentroid(a.asInstanceOf[ArrayData]) // right arg unused
    case "lines_intersect" =>
      PolygonClip.linesIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "lines_intersection" =>
      PolygonClip.linesIntersection(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def call(a: String, b: String): String = fn match {
      case "line_in_poly" => s"graft.plans.PolygonClip.lineIntersectsPolygon($a, $b)"
      case "densify_line" => s"graft.plans.PolygonClip.densify($a, $b, false)"
      case "densify_ring" => s"graft.plans.PolygonClip.densify($a, $b, true)"
      case "simplify_rings" => s"graft.plans.PolygonClip.simplifyRings($a, $b)"
      case "union_rings" => s"graft.plans.PolygonClip.unionRings($a)"
      case "clip_line" => s"graft.plans.PolygonClip.clipLine($a, $b)"
      case "buffer_line" => s"graft.plans.PolygonClip.bufferLine($a, $b, false)"
      case "buffer_ring" => s"graft.plans.PolygonClip.bufferLine($a, $b, true)"
      case "line_centroid" => s"graft.plans.PolygonClip.lineCentroid($a)"
      case "lines_intersect" => s"graft.plans.PolygonClip.linesIntersect($a, $b)"
      case "lines_intersection" => s"graft.plans.PolygonClip.linesIntersection($a, $b)"
    }
    fn match {
      // boolean result — never a Java null
      case "line_in_poly" | "lines_intersect" => defineCodeGen(ctx, ev, call)
      // array results may be Java null (disjoint unions, degenerate
      // geometry): generated code must set isNull, not propagate the null
      // object into the row writer (the S2CoverExpr posture)
      case _ => nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = ${call(a, b)};
        ${ev.isNull} = ${ev.value} == null;""")
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = s"graft_geo_$fn"
}

/** geo_line_simplify(line, tolerance_meters) → line. */
case class LineSimplifyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected (array<array<double>>, double), got $other")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override protected def nullSafeEval(a: Any, t: Any): Any =
    PolygonClip.simplify(a.asInstanceOf[ArrayData], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, t) => s"graft.plans.PolygonClip.simplify($a, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_line_simplify"
}
