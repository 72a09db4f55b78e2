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
