package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kql.KqlParser
import graft.plans.S2Expressions

/** S2 cell correctness: the fast lookup-table Hilbert traversal is checked
  * against an INDEPENDENT slow recursive traversal built directly from the
  * published sub-cell order constants; face/level-0 and level-1 tokens are
  * checked against hand-derived spec values; center readout must re-encode
  * to the same cell. */
class S2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val t: DataFrame = Seq(1).toDF("one")
  private def run(kql: String): DataFrame = KqlParser.parse(kql, _ => t)

  // duplicated on purpose: the test must not share the impl's lookup tables
  private val posToIJ = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val posToOrient = Array(1, 0, 0, 3)
  private def slowId(face: Int, i: Int, j: Int): Long = {
    var orientation = face & 1
    var pos = 0L
    var level = 29
    while (level >= 0) {
      val ij = (((i >> level) & 1) << 1) | ((j >> level) & 1)
      val index = posToIJ(orientation).indexOf(ij)
      pos = (pos << 2) | index
      orientation ^= posToOrient(index)
      level -= 1
    }
    (((face.toLong << 60) | pos) << 1) | 1L
  }

  test("fromFaceIJ matches an independent recursive Hilbert traversal") {
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val f = rnd.nextInt(6)
      val i = rnd.nextInt(1 << 30); val j = rnd.nextInt(1 << 30)
      assert(S2Expressions.fromFaceIJ(f, i, j) == slowId(f, i, j), s"($f,$i,$j)")
    }
  }

  test("face-center points land on the six level-0 cells") {
    val cases = Seq((0.0, 0.0, "1"), (90.0, 0.0, "3"), (0.0, 90.0, "5"),
      (180.0, 0.0, "7"), (-90.0, 0.0, "9"), (0.0, -90.0, "b"))
    cases.foreach { case (lng, lat, tok) =>
      val id = S2Expressions.parentAtLevel(S2Expressions.leafFromLngLat(lng, lat), 0)
      assert(S2Expressions.token(id) == tok, s"($lng,$lat)")
    }
  }

  test("level-1 tokens match hand-derived values; KQL dispatch works") {
    // derived by hand from the spec (face<<61 | pos<<59 | 1<<58):
    // (0,0) s=t=0.5 → child (1,1), face-0 order (0,1,3,2) → pos 2 → "14"
    val r = run(
      """t | project a = geo_point_to_s2cell(0.0, 0.0, 1),
        |  b = geo_point_to_s2cell(10.0, 10.0, 1),
        |  c = geo_point_to_s2cell(-10.0, 5.0, 1),
        |  d = geo_point_to_s2cell(-10.0, -5.0, 1),
        |  e = geo_point_to_s2cell(10.0, -5.0, 1),
        |  f = geo_point_to_s2cell(95.0, 0.0, 1)""".stripMargin)
      .collect().head
    assert((0 to 5).map(r.getString) == Seq("14", "14", "0c", "04", "1c", "34"))
  }

  test("cell center re-encodes to the same cell at every level") {
    val pts = for (lng <- -170 to 170 by 37; lat <- -80 to 80 by 23)
      yield (lng.toDouble + 0.37, lat.toDouble - 0.21)
    for ((lng, lat) <- pts; level <- Seq(2, 5, 11, 20, 30)) {
      val id = S2Expressions.parentAtLevel(
        S2Expressions.leafFromLngLat(lng, lat), level)
      val tok = S2Expressions.token(id)
      val (clng, clat) = S2Expressions.centerLngLat(tok)
      val rid = S2Expressions.parentAtLevel(
        S2Expressions.leafFromLngLat(clng, clat), level)
      assert(rid == id, s"center drifted out of cell: ($lng,$lat) level $level")
      if (level == 30) {
        assert(math.abs(clng - lng) < 1e-3 && math.abs(clat - lat) < 1e-3,
          s"leaf center too far: ($lng,$lat) vs ($clng,$clat)")
      }
    }
  }

  test("s2 neighbors: face adjacency, symmetry, center containment") {
    // level 0: a face's neighbors are the four non-opposite faces
    val faceTok = Map(0 -> "1", 1 -> "3", 2 -> "5", 3 -> "7", 4 -> "9", 5 -> "b")
    (0 until 6).foreach { f =>
      val nb = run(s"t | take 1 | project n = geo_s2cell_neighbors('${faceTok(f)}')")
        .collect().head.getSeq[String](0).toSet
      val expect = (0 until 6).filterNot(g => g == f || g == (f + 3) % 6)
        .map(faceTok).toSet
      assert(nb == expect, s"face $f")
    }
    // interior + cross-face cells: 8 neighbors; symmetry a∈N(b) ⟺ b∈N(a);
    // each neighbor's center re-encodes to that neighbor
    for ((lng, lat, lvl) <- Seq((12.3, 45.6, 11), (44.9, 0.1, 5), (0.0, 89.0, 7))) {
      val id = S2Expressions.parentAtLevel(S2Expressions.leafFromLngLat(lng, lat), lvl)
      val nbrs = S2Expressions.allNeighbors(id)
      assert(nbrs.size == 8, s"($lng,$lat,$lvl): ${nbrs.size}")
      nbrs.foreach { n =>
        assert(S2Expressions.allNeighbors(n).contains(id), "asymmetric neighbors")
        val (clng, clat) = S2Expressions.centerLngLat(S2Expressions.token(n))
        val re = S2Expressions.parentAtLevel(
          S2Expressions.leafFromLngLat(clng, clat), lvl)
        assert(re == n, "neighbor center re-encodes elsewhere")
      }
    }
  }

  test("polygon covering: face-level hand-derived cells; completeness probe") {
    def cover(pts: Seq[(Double, Double)], lvl: Int): Seq[String] = {
      val xs = pts.map(_._1).toArray; val ys = pts.map(_._2).toArray
      S2Expressions.coverRing(xs, ys, lvl).map(S2Expressions.token)
    }
    // tiny triangle near the face-0 center → exactly the face-0 cell "1"
    assert(cover(Seq((9.0, 9.0), (11.0, 9.0), (10.0, 11.0)), 0) == Seq("1"))
    // straddling the face-0/face-1 boundary (lng 45) → faces 0 and 1
    assert(cover(Seq((43.0, -1.0), (47.0, -1.0), (45.0, 2.0)), 0) == Seq("1", "3"))
    // COMPLETENESS: every deterministic sample point inside the polygon
    // keys to a cell present in the covering (the property the bucketed
    // points×polygons join rests on)
    val poly = Seq((-73.4, 40.2), (-72.7, 40.35), (-72.9, 41.1), (-73.3, 40.9))
    for (lvl <- Seq(8, 10, 12)) {
      val cov = cover(poly, lvl).toSet
      assert(cov.nonEmpty)
      val xs = poly.map(_._1).toArray; val ys = poly.map(_._2).toArray
      var inside = 0
      for (gx <- 0 until 60; gy <- 0 until 60) {
        val x = -73.5 + gx * 0.015; val y = 40.1 + gy * 0.02
        // the private rayCast mirrors geo_point_in_polygon; re-derive here
        var c = false; var i = 0
        while (i < xs.length) {
          val j2 = (i + 1) % xs.length
          if ((ys(i) > y) != (ys(j2) > y) &&
              x < (xs(j2) - xs(i)) * (y - ys(i)) / (ys(j2) - ys(i)) + xs(i)) c = !c
          i += 1
        }
        if (c) {
          inside += 1
          val tok = S2Expressions.token(S2Expressions.parentAtLevel(
            S2Expressions.leafFromLngLat(x, y), lvl))
          assert(cov.contains(tok), s"lvl $lvl misses cell $tok of ($x,$y)")
        }
      }
      assert(inside > 500, s"probe grid degenerate: $inside inside")
    }
    // KQL dispatch + closed-ring tolerance
    val k = run(
      """t | project c = strcat_array(geo_polygon_to_s2cells(pack_array(
        |  pack_array(9.0, 9.0), pack_array(11.0, 9.0), pack_array(10.0, 11.0),
        |  pack_array(9.0, 9.0)), 0), ';')""".stripMargin).collect().head
    assert(k.getString(0) == "1")
  }

  test("anchored-frame covering is complete across the antimeridian") {
    // an antimeridian-crossing triangle RE-ANCHORED to [0,360) (the geo
    // lookup plugins' build-side frame): raw [179.4, -179.6, -179.9] →
    // [179.4, 180.4, 180.1]. Every inside sample — keyed from its RAW
    // lng via the periodic leaf mapping — must hit a covered cell.
    val xs = Array(179.4, -179.6 + 360.0, -179.9 + 360.0)
    val ys = Array(40.2, 40.2, 40.9)
    for (lvl <- Seq(8, 10)) {
      val cov = S2Expressions.coverRing(xs, ys, lvl)
        .map(S2Expressions.token).toSet
      assert(cov.nonEmpty, s"empty covering at level $lvl")
      var inside = 0
      for (gx <- 0 until 60; gy <- 0 until 60) {
        val x = 179.3 + gx * 0.02; val y = 40.1 + gy * 0.015 // anchored frame
        var c = false; var i = 0
        while (i < xs.length) {
          val j2 = (i + 1) % xs.length
          if ((ys(i) > y) != (ys(j2) > y) &&
              x < (xs(j2) - xs(i)) * (y - ys(i)) / (ys(j2) - ys(i)) + xs(i)) c = !c
          i += 1
        }
        if (c) {
          inside += 1
          val rawLng = if (x > 180.0) x - 360.0 else x // what a fact row holds
          val tok = S2Expressions.token(S2Expressions.parentAtLevel(
            S2Expressions.leafFromLngLat(rawLng, y), lvl))
          assert(cov.contains(tok), s"lvl $lvl misses cell $tok of ($x,$y)")
        }
      }
      assert(inside > 300, s"probe grid degenerate: $inside inside")
    }
  }

  test("line covering is complete: every on-line sample's cell is covered") {
    // a wiggly 3-segment polyline; completeness probe at two levels
    val xs = Array(10.0, 10.4, 10.1, 10.8)
    val ys = Array(45.0, 45.2, 45.5, 45.6)
    Seq(8, 10).foreach { lvl =>
      val cov = S2Expressions.coverPolyline(xs, ys, lvl)
        .map(S2Expressions.token).toSet
      (0 until 3).foreach { s =>
        (0 to 400).foreach { k =>
          val tt = k / 400.0
          val x = xs(s) + tt * (xs(s + 1) - xs(s))
          val y = ys(s) + tt * (ys(s + 1) - ys(s))
          val tok = S2Expressions.token(S2Expressions.parentAtLevel(
            S2Expressions.leafFromLngLat(x, y), lvl))
          assert(cov.contains(tok), s"lvl $lvl misses cell $tok of ($x,$y)")
        }
      }
    }
    // KQL dispatch
    val k = run(
      """t | project n = array_length(geo_line_to_s2cells(pack_array(
        |  pack_array(10.0, 45.0), pack_array(10.4, 45.2)), 8))""".stripMargin)
      .collect().head
    assert(k.getLong(0) >= 1)
  }

  test("cell polygon: 4 corners bound the center; KQL ray-cast containment") {
    val r = run(
      """t | extend c = geo_point_to_s2cell(12.3, 45.6, 9)
        || extend ring = geo_s2cell_to_polygon(c),
        |    ctr = geo_s2cell_to_central_point(c)
        || project n = array_length(ring),
        |    inside = geo_point_in_polygon(todouble(ctr[0]), todouble(ctr[1]), ring),
        |    bad = geo_s2cell_to_polygon("zz@") """.stripMargin).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getBoolean(1))
    assert(r.isNullAt(2))
  }

  test("token encode/decode round-trips; malformed center is NaN") {
    val id = S2Expressions.parentAtLevel(S2Expressions.leafFromLngLat(12.3, 45.6), 11)
    assert(S2Expressions.idFromToken(S2Expressions.token(id)) == id)
    assert(S2Expressions.token(0L) == "X")
    assert(S2Expressions.centerLngLat("zzz")._1.isNaN)
    val c = run("t | project p = geo_s2cell_to_central_point(geo_point_to_s2cell(12.3, 45.6, 11))")
      .collect().head.getSeq[Double](0)
    assert(math.abs(c.head - 12.3) < 0.1 && math.abs(c(1) - 45.6) < 0.1)
  }
}
