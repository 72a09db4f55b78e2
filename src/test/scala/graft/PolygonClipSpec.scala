package graft

import org.apache.spark.sql.DataFrame
import graft.kql.KqlParser

/** Polygon boolean ops + line simplify: closed-form fixtures with
  * hand-computable results (rect∩rect, rect∪rect octagon, triangle∩rect,
  * containment, disjoint), plus RDP keep/drop behavior. */
class PolygonClipSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t: DataFrame = Seq(1).toDF("one")
  private def run(kql: String): DataFrame = KqlParser.parse(kql, _ => t)

  private def ringOf(pts: (Double, Double)*): String =
    "pack_array(" + pts.map { case (x, y) => s"pack_array($x, $y)" }.mkString(", ") + ")"

  private val r1 = ringOf((0, 0), (4, 0), (4, 3), (0, 3))
  private val r2 = ringOf((2, 1), (6, 1), (6, 5), (2, 5))
  private val tri = ringOf((0, 0), (4, 0), (0, 4))
  private val rIn = ringOf((1, 1), (2, 1), (2, 2), (1, 2))
  private val rFar = ringOf((10, 10), (11, 10), (11, 11), (10, 11))

  private def ringSeq(kql: String): Seq[(Double, Double)] = {
    val r = run(s"t | project r = $kql").collect().head
    if (r.isNullAt(0)) Nil
    else r.getSeq[scala.collection.Seq[Double]](0).map(p => (p(0), p(1))).toSeq
  }

  test("degenerate geo inputs degrade to null, never a failed job") {
    val r = run(
      """t | project
        |  b1 = geo_line_buffer(pack_array(pack_array(1.0, 2.0)), 100.0),
        |  b2 = geo_line_buffer(pack_array(pack_array(1.0, 2.0), pack_array(3.0, 4.0)), 0.0),
        |  c1 = geo_line_to_s2cells(pack_array(pack_array(1.0, 2.0)), 8),
        |  cp = geo_closest_point_on_line(0.0, 0.0, pack_array(pack_array(1.0, 2.0))),
        |  cp2 = geo_closest_point_on_line(0.0, 0.0, parse_json('[null, null]')),
        |  dl = geo_distance_point_to_line(0.0, 0.0, pack_array(pack_array(1.0, 2.0))),
        |  ip = geo_point_in_polygon(0.0, 0.0, pack_array())""".stripMargin)
      .collect().head
    // cp2: 2 elements but zero non-null vertex pairs — no segment examined,
    // so the result must be null, never the echoed query point
    (0 until 7).foreach(i => assert(r.isNullAt(i), s"col $i not null"))
  }

  test("geo_angle: 6-arg chain form equals the 8-arg form with p3 = p2") {
    val r = run(
      """t | project
        |  a6 = geo_angle(-73.4, 40.3, -73.0, 40.6, -72.6, 40.5),
        |  a8 = geo_angle(-73.4, 40.3, -73.0, 40.6, -73.0, 40.6, -72.6, 40.5),
        |  straight = geo_angle(0.0, 0.0, 1.0, 0.0, 2.0, 0.0)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == r.getDouble(1),
      s"6-arg and 8-arg conventions diverge: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    // collinear eastward chain: no turn — the angle is ~0 (mod 2π), not ~π
    val s = r.getDouble(2)
    assert(s < 1e-6 || s > 2 * math.Pi - 1e-6, s"collinear turn angle was $s")
  }

  test("geo_line_buffer / geo_polygon_buffer: distance-margin containment") {
    def rayCast(x: Double, y: Double, ring: Seq[(Double, Double)]): Boolean = {
      var c = false; var i = 0; val n = ring.size
      while (i < n) {
        val (xi, yi) = ring(i); val (xj, yj) = ring((i + 1) % n)
        if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi) c = !c
        i += 1
      }
      c
    }
    // 2-segment line near lat 40; buffer radius 20 km
    val lineKql = "pack_array(pack_array(-73.4, 40.3), pack_array(-73.0, 40.6), pack_array(-72.6, 40.5))"
    val lb = ringSeq(s"geo_line_buffer($lineKql, 20000.0)")
    assert(lb.size >= 8, s"line buffer too coarse: ${lb.size}")
    val line = Seq((-73.4, 40.3), (-73.0, 40.6), (-72.6, 40.5))
    def distM(px: Double, py: Double): Double = {
      val cosl = math.cos(math.toRadians(py))
      line.sliding(2).map { s =>
        val (ax, ay) = s(0); val (bx, by) = s(1)
        val x1 = (ax - px) * cosl; val y1 = ay - py
        val x2 = (bx - px) * cosl; val y2 = by - py
        val dx = x2 - x1; val dy = y2 - y1
        val l2 = dx * dx + dy * dy
        val t0 = if (l2 > 0) math.max(0.0, math.min(1.0, -(x1 * dx + y1 * dy) / l2)) else 0.0
        val cx = x1 + t0 * dx; val cy = y1 + t0 * dy
        math.sqrt(cx * cx + cy * cy)
      }.min * (math.Pi / 180 * 6371000.0)
    }
    // margin probe grid: inside at d < 0.8r, outside at d > 1.3r
    var checked = 0
    for (i <- 0 until 40; j <- 0 until 24) {
      val px = -73.6 + i * 0.03; val py = 40.0 + j * 0.035
      val d = distM(px, py)
      if (d < 16000.0) { assert(rayCast(px, py, lb), s"missing inside ($px,$py) d=$d"); checked += 1 }
      else if (d > 26000.0) { assert(!rayCast(px, py, lb), s"false inside ($px,$py) d=$d"); checked += 1 }
    }
    assert(checked > 500, s"probe grid degenerate: $checked")
    // polygon buffer: contains every original vertex and the interior
    val pb = ringSeq(s"geo_polygon_buffer(${ringOf((-73.3, 40.2), (-72.8, 40.2), (-73.05, 40.9))}, 15000.0)")
    assert(pb.nonEmpty)
    Seq((-73.3, 40.2), (-72.8, 40.2), (-73.05, 40.9), (-73.05, 40.4))
      .foreach { case (x, y) => assert(rayCast(x, y, pb), s"vertex/interior ($x,$y) not in polygon buffer") }
    // a point 50 km away stays outside
    assert(!rayCast(-72.0, 41.5, pb))
  }

  test("rect ∩ rect is the overlap rectangle, canonical CCW from min vertex") {
    assert(ringSeq(s"geo_intersection_2polygons($r1, $r2)") ==
      Seq((2.0, 1.0), (4.0, 1.0), (4.0, 3.0), (2.0, 3.0)))
  }

  test("rect ∪ rect is the 8-vertex rectilinear union boundary") {
    val u = ringSeq(s"geo_union_2polygons($r1, $r2)")
    assert(u.toSet == Set((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (6.0, 1.0),
      (6.0, 5.0), (2.0, 5.0), (2.0, 3.0), (0.0, 3.0)), s"got $u")
    assert(u.head == ((0.0, 0.0)), "canonical start")
    // shoelace area of the union = 12 + 16 − 4 = 24
    val area = u.indices.map { i =>
      val j = (i + 1) % u.length
      u(i)._1 * u(j)._2 - u(j)._1 * u(i)._2
    }.sum / 2.0
    assert(math.abs(area - 24.0) < 1e-12)
  }

  test("triangle ∩ rect clips the hypotenuse exactly") {
    // {x+y ≤ 4} ∩ [1,5]² = triangle (1,1) (3,1) (1,3)
    val r = ringSeq(s"geo_intersection_2polygons($tri, ${ringOf((1, 1), (5, 1), (5, 5), (1, 5))})")
    assert(r == Seq((1.0, 1.0), (3.0, 1.0), (1.0, 3.0)), s"got $r")
  }

  test("containment and disjoint cases") {
    assert(ringSeq(s"geo_intersection_2polygons($rIn, $r1)") ==
      Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)), "inner ∩ outer = inner")
    assert(ringSeq(s"geo_union_2polygons($rIn, $r1)") ==
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)), "inner ∪ outer = outer")
    assert(ringSeq(s"geo_intersection_2polygons($r1, $rFar)").isEmpty, "disjoint ∩ = null")
    assert(ringSeq(s"geo_union_2polygons($r1, $rFar)").isEmpty,
      "disconnected ∪ = null (documented deviation)")
  }

  test("intersection is symmetric on the fixtures") {
    assert(ringSeq(s"geo_intersection_2polygons($r1, $r2)") ==
      ringSeq(s"geo_intersection_2polygons($r2, $r1)"))
    assert(ringSeq(s"geo_union_2polygons($r1, $r2)") ==
      ringSeq(s"geo_union_2polygons($r2, $r1)"))
  }

  test("geo_union_polygons_array folds unions; area of 3-rect chain is exact") {
    val r3 = ringOf((5, 4), (8, 4), (8, 6), (5, 6))
    val u = ringSeq(s"geo_union_polygons_array(pack_array($r1, $r2, $r3))")
    assert(u.nonEmpty && u.head == ((0.0, 0.0)))
    val area = u.indices.map { i =>
      val j = (i + 1) % u.length
      u(i)._1 * u(j)._2 - u(j)._1 * u(i)._2
    }.sum / 2.0
    assert(math.abs(area - 29.0) < 1e-12, s"area $area, ring $u") // 12+16-4+6-1
    assert(u.length == 12, s"got ${u.length}: $u")
    // disconnected chain → null
    assert(ringSeq(s"geo_union_polygons_array(pack_array($r1, $rFar))").isEmpty)
    // single ring passes through canonical
    assert(ringSeq(s"geo_union_polygons_array(pack_array($r1))") ==
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)))
  }

  test("geo_intersection_line_with_polygon clips to the inside multiline") {
    def multi(kql: String): Seq[Seq[(Double, Double)]] = {
      val r = run(s"t | project r = $kql").collect().head
      if (r.isNullAt(0)) Nil
      else r.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](0)
        .map(_.map(p => (p(0), p(1))).toSeq).toSeq
    }
    val ln = "pack_array(pack_array(-1.0, 1.0), pack_array(5.0, 1.0))"
    assert(multi(s"geo_intersection_line_with_polygon($ln, $r1)") ==
      Seq(Seq((0.0, 1.0), (4.0, 1.0))))
    val lout = "pack_array(pack_array(-1.0, 5.0), pack_array(5.0, 5.0))"
    assert(multi(s"geo_intersection_line_with_polygon($lout, $r1)").isEmpty)
    // in-out-in across the triangle: two pieces
    val zig = "pack_array(pack_array(0.5, 0.5), pack_array(4.5, 0.5))"
    val tri2 = multi(s"geo_intersection_line_with_polygon($zig, $tri)")
    assert(tri2.size == 1 && tri2.head.head == ((0.5, 0.5)), s"got $tri2")
  }

  test("geo_line_simplify: drops sub-tolerance wiggle, keeps real corners, keeps endpoints") {
    val wiggly = ringOf((0, 0), (1, 0.0001), (2, 0), (2.5, -0.0001), (4, 0))
    assert(ringSeq(s"geo_line_simplify($wiggly, 100.0)") == Seq((0.0, 0.0), (4.0, 0.0)))
    // 1 m tolerance keeps every vertex (deviations ≈ 11 m)
    assert(ringSeq(s"geo_line_simplify($wiggly, 1.0)").length == 5)
    val corner = ringOf((0, 0), (2, 0), (2, 2))
    assert(ringSeq(s"geo_line_simplify($corner, 100.0)") ==
      Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0)), "real corner survives")
  }
}
