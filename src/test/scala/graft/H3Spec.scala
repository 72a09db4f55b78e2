package graft

import org.apache.spark.sql.DataFrame
import graft.kql.KqlParser
import graft.plans.H3Expressions

/** H3-style hex cell correctness: the exact golden-ratio icosahedron, the
  * published aperture-7 IJK transforms (proven against their defining
  * property), center-re-encode identity, hand-derived index vectors, and
  * the 6-neighbor ring with symmetric interior adjacency. */
class H3Spec extends SparkSpec {
  import spark.implicits._

  private lazy val t: DataFrame = Seq(1).toDF("one")
  private def run(kql: String): DataFrame = KqlParser.parse(kql, _ => t)

  test("hand-derived res-0 index vectors: face cell, no digits, all-7 padding") {
    // the res-0 cell of any interior face point is the face itself: by the
    // published bit layout the index is mode-1 | res 0 | base f | fifteen
    // 7-digits — i.e. 0x8000000000000 | f<<45 | 0x1FFFFFFFFFFF, derived by
    // hand from the layout, not replayed from the implementation
    val handDerived = (f: Int) =>
      f"${(1L << 59) | (f.toLong << 45) | 0x1FFFFFFFFFFFL}%015x"
    (0 until 20).foreach { f =>
      // probe at each face's center (read back through the implementation's
      // OWN center decode — but the expected token is the formula above)
      val res0 = (1L << 59) | (f.toLong << 45) | 0x1FFFFFFFFFFFL
      val (lng, lat) = H3Expressions.centerLngLat(res0)
      assert(H3Expressions.token(H3Expressions.encode(lng, lat, 0)) == handDerived(f))
    }
    // a res-1 center digit path is all-CENTER: encoding a face center at
    // res 1 yields digit 0 → hand-derived ...digit1=0, digits2-15=7
    val r1 = (1L << 59) | (1L << 52) | (3L << 45) | 0x03FFFFFFFFFFL
    val (lng3, lat3) = H3Expressions.centerLngLat((1L << 59) | (3L << 45) | 0x1FFFFFFFFFFFL)
    assert(H3Expressions.token(H3Expressions.encode(lng3, lat3, 1)) == f"$r1%015x")
  }

  test("published aperture-7 property: up is the exact inverse of down+digit") {
    // the defining identity of the published transforms: every child
    // (= down(parent) + unit vector) up-rounds back to its parent
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val p = (rnd.nextInt(41) - 20, rnd.nextInt(41) - 20, 0)
      (0 to 6).foreach { d =>
        val u = H3Expressions.UnitVecs(d)
        // Class II
        val cII = H3Expressions.testDownAp7(p._1, p._2, p._3)
        val chII = H3Expressions.testNormalize(cII._1 + u._1, cII._2 + u._2, cII._3 + u._3)
        assert(H3Expressions.testUpAp7(chII._1, chII._2, chII._3) ==
          H3Expressions.testNormalize(p._1, p._2, p._3), s"ap7 $p digit $d")
        // Class III
        val cIII = H3Expressions.testDownAp7r(p._1, p._2, p._3)
        val chIII = H3Expressions.testNormalize(cIII._1 + u._1, cIII._2 + u._2, cIII._3 + u._3)
        assert(H3Expressions.testUpAp7r(chIII._1, chIII._2, chIII._3) ==
          H3Expressions.testNormalize(p._1, p._2, p._3), s"ap7r $p digit $d")
      }
    }
  }

  test("center re-encodes to the same cell at every resolution") {
    val pts = Seq((12.3, 45.6), (-73.1, 40.7), (139.7, 35.7), (-0.1, 51.5),
      (151.2, -33.9), (-43.2, -22.9), (44.9, 0.05), (0.0, 89.5), (-179.9, -0.3))
    for ((lng, lat) <- pts; res <- Seq(0, 1, 2, 5, 8, 11)) {
      val id = H3Expressions.encode(lng, lat, res)
      val (clng, clat) = H3Expressions.centerLngLat(id)
      assert(H3Expressions.encode(clng, clat, res) == id,
        s"($lng,$lat,$res): center re-encoded elsewhere")
    }
  }

  test("neighbors: 6-ring, interior symmetry, centers at the lattice pitch") {
    for ((lng, lat, res) <- Seq((12.3, 45.6, 7), (-73.1, 40.7, 9), (151.2, -33.9, 5))) {
      val id = H3Expressions.encode(lng, lat, res)
      val nbrs = H3Expressions.neighbors(id)
      assert(nbrs.size == 6, s"($lng,$lat,$res): ${nbrs.size} neighbors")
      nbrs.foreach { n =>
        assert(H3Expressions.neighbors(n).contains(id),
          s"asymmetric adjacency at ($lng,$lat,$res)")
        // centers one lattice pitch apart (hex grid): all six equidistant
        // to within gnomonic distortion
        val (alng, alat) = H3Expressions.centerLngLat(id)
        val (blng, blat) = H3Expressions.centerLngLat(n)
        val d = math.hypot((blng - alng) * math.cos(math.toRadians(alat)), blat - alat)
        assert(d > 0, "zero-distance neighbor")
      }
      // the six pitches agree to within 25% (hexagonal uniformity — the
      // property that distinguishes hex cells from geohash rectangles)
      val (alng, alat) = H3Expressions.centerLngLat(id)
      val ds = nbrs.map { n =>
        val (blng, blat) = H3Expressions.centerLngLat(n)
        math.hypot((blng - alng) * math.cos(math.toRadians(alat)), blat - alat)
      }
      assert(ds.max / ds.min < 1.25, s"non-uniform ring: $ds")
    }
  }

  test("bucket-key property: nearby points share a cell or adjacent cells") {
    // the spatial-join contract: two points closer than half the hex
    // inradius are in the same cell or in each other's neighbor ring
    val rnd = new scala.util.Random(23)
    var checked = 0
    (0 until 300).foreach { _ =>
      val lng = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 140 - 70
      val res = 6
      val id = H3Expressions.encode(lng, lat, res)
      // hex edge at res 6 ≈ res0-hex/√7^6; probe at ~2% of a cell away
      val eps = 0.004
      val id2 = H3Expressions.encode(lng + eps, lat + eps, res)
      if (id2 != id) {
        val ring = H3Expressions.neighbors(id)
        if (ring.contains(id2)) checked += 1
        else {
          // seam-adjacent faces may clip cells (documented); tolerate only
          // across a face change
          val baseA = (id >>> 45) & 0x7F; val baseB = (id2 >>> 45) & 0x7F
          assert(baseA != baseB, s"in-face near point escaped the ring at ($lng,$lat)")
        }
      } else checked += 1
    }
    assert(checked > 250, s"probe degenerate: only $checked conclusive")
  }

  test("hierarchy: children are digit-path extensions, parent inverts, rings are 1/6/12") {
    val id = H3Expressions.encode(12.3, 45.6, 7)
    val kids = H3Expressions.children(id)
    assert(kids.size == 7 && kids.distinct.size == 7)
    kids.foreach { k =>
      assert(H3Expressions.parent(k, 7) == id, "parent must invert children")
      assert(H3Expressions.level(k) == 8)
    }
    // a parent cell is itself canonical: its center re-encodes to it
    val p5 = H3Expressions.parent(id, 5)
    val (plng, plat) = H3Expressions.centerLngLat(p5)
    assert(H3Expressions.encode(plng, plat, 5) == p5)
    // interior k-rings: 1, 6, 12 cells (6k per ring), disjoint
    val rs = H3Expressions.rings(id, 2)
    assert(rs.map(_.size) == Seq(1, 6, 12), s"ring sizes ${rs.map(_.size)}")
    assert(rs.flatten.distinct.size == 19)
  }

  test("KQL dispatch: cell, central point, neighbors") {
    val r = run(
      """t | project c = geo_point_to_h3cell(12.3, 45.6, 7)
        || extend p = geo_h3cell_to_central_point(c),
        |    n = array_length(geo_h3cell_neighbors(c))
        || project c, lng = todouble(p[0]), lat = todouble(p[1]), n""".stripMargin)
      .collect().head
    assert(r.getString(0).length == 15)
    assert(math.abs(r.getDouble(1) - 12.3) < 0.5 && math.abs(r.getDouble(2) - 45.6) < 0.5)
    assert(r.getLong(3) == 6L)
  }

  test("cell polygon: hexagon ring contains the center, excludes neighbors' centers") {
    val id = H3Expressions.encode(12.3, 45.6, 7)
    val tok = org.apache.spark.unsafe.types.UTF8String
      .fromString(H3Expressions.token(id))
    val ring = H3Expressions.cellPolygon(tok)
    assert(ring.numElements() == 6, s"expected hexagon, got ${ring.numElements()}")
    val xs = (0 until 6).map(i => ring.getArray(i).getDouble(0)).toArray
    val ys = (0 until 6).map(i => ring.getArray(i).getDouble(1)).toArray
    def inside(x: Double, y: Double): Boolean = {
      var c = false; var i = 0
      while (i < 6) {
        val j2 = (i + 1) % 6
        if ((ys(i) > y) != (ys(j2) > y) &&
            x < (xs(j2) - xs(i)) * (y - ys(i)) / (ys(j2) - ys(i)) + xs(i)) c = !c
        i += 1
      }
      c
    }
    val (clng, clat) = H3Expressions.centerLngLat(id)
    assert(inside(clng, clat), "center must lie inside its own boundary ring")
    H3Expressions.neighbors(id).foreach { n =>
      val (nl, na) = H3Expressions.centerLngLat(n)
      assert(!inside(nl, na), "a neighbor's center must lie outside the ring")
    }
    // invalid-token posture: null, not a failed query
    assert(H3Expressions.cellPolygon(
      org.apache.spark.unsafe.types.UTF8String.fromString("nonsense")) == null)
    assert(H3Expressions.parentToken(
      org.apache.spark.unsafe.types.UTF8String.fromString("nonsense"), 3) == null)
  }

  test("cell polygon is simple (non-self-intersecting) beside the antimeridian") {
    // regression: unwrapped longitude deltas mis-sorted neighbors whose
    // centers sit across ±180, producing a bowtie ring
    Seq((179.97, 10.0), (-179.96, -15.0), (179.99, 45.0)).foreach { case (lng, lat) =>
      val id = H3Expressions.encode(lng, lat, 5)
      val tok = org.apache.spark.unsafe.types.UTF8String
        .fromString(H3Expressions.token(id))
      val ring = H3Expressions.cellPolygon(tok)
      assert(ring != null && ring.numElements() >= 5)
      val (clng, clat) = H3Expressions.centerLngLat(id)
      // vertices in a wrap-normalized local frame centered on the cell
      val local = (0 until ring.numElements()).map { i =>
        val p = ring.getArray(i)
        ((((p.getDouble(0) - clng + 540.0) % 360.0) - 180.0), p.getDouble(1) - clat)
      }
      def cross(a: (Double, Double), b: (Double, Double),
          c: (Double, Double), d: (Double, Double)): Boolean = {
        def o(p: (Double, Double), q: (Double, Double), r: (Double, Double)) =
          math.signum((q._1 - p._1) * (r._2 - p._2) - (q._2 - p._2) * (r._1 - p._1))
        o(a, b, c) * o(a, b, d) < 0 && o(c, d, a) * o(c, d, b) < 0
      }
      val n = local.size
      for (i <- 0 until n; j <- i + 2 until n
           if !(i == 0 && j == n - 1)) // skip adjacent (incl. wrap) pairs
        assert(!cross(local(i), local((i + 1) % n), local(j), local((j + 1) % n)),
          s"($lng,$lat): edges $i and $j cross — self-intersecting ring")
    }
  }
}
