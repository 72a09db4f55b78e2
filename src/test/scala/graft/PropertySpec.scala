package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Dedup, TextAnalysis}
import graft.kql.Kql._
import graft.sources.Tables

/** Property-based laws — the Spark analogue of the reference's randomized roundtrip
  * tests (`bitmap_rnd_test`, `io_roundtrip`; SURVEY.md §5): schema-widening algebra,
  * normalization invariances of the dedup digest, and bin() idempotence, each over
  * generated inputs (plain ScalaCheck; fixed seeds via default RNG, small bounded
  * sample counts for the Spark-driving laws). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val scalarTypes: Gen[DataType] = Gen.oneOf(
    IntegerType, LongType, DoubleType, FloatType, StringType,
    TimestampType, DateType, BooleanType, DecimalType(20, 4))

  test("widen is commutative, idempotent, and total over scalar types") {
    check(Prop.forAll(scalarTypes, scalarTypes) { (a, b) =>
      Tables.widen(a, a) == a &&
        Tables.widen(a, b) == Tables.widen(b, a) &&
        Tables.widen(a, b) != null
    })
  }

  test("widen chaining never reintroduces a narrower type past string") {
    check(Prop.forAll(scalarTypes, scalarTypes, scalarTypes) { (a, b, c) =>
      val chained = Tables.widen(Tables.widen(a, b), c)
      chained != StringType || Tables.widen(chained, a) == StringType
    })
  }

  test("contentHash is invariant under case and whitespace noise") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val texts = Gen.listOfN(25, Gen.nonEmptyListOf(word).map(_.mkString(" ")))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val noisy = df.select(col("id"),
      concat(lit("  "), upper(col("text")), lit("   ")).as("text"))
    val clean = df.select(col("id"), Dedup.contentHash(col("text")).as("h"))
    val dirty = noisy.select(col("id"), Dedup.contentHash(col("text")).as("h"))
    assert(clean.join(dirty, Seq("id", "h")).count() == texts.length)
  }

  test("contentHash separates distinct normalized texts") {
    val df = (0 until 200).map(i => (i.toLong, s"doc number $i unique")).toDF("id", "text")
    assert(df.select(Dedup.contentHash(col("text"))).distinct().count() == 200)
  }

  test("Bin.ts is idempotent and aligns to the step") {
    val epochs = Gen.listOfN(60, Gen.choose(0L, 4102444800L)) // 1970..2100
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
    for (step <- Seq(60L, 3600L, 21600L, 86400L)) {
      val df = epochs.toDF("e").select(timestamp_seconds(col("e")).as("ts"))
      val rows = df.select(Bin.ts(col("ts"), step).as("b"))
        .select(col("b"), Bin.ts(col("b"), step).as("bb"),
          (unix_timestamp(col("b")) % step).as("m"))
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      assert(rows.forall { case (b, bb, m) => b == bb && m == 0 }, s"step=$step")
    }
  }

  test("fingerprint is whitespace-trim invariant but order sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "  alpha beta gamma  "),
      (3L, "gamma beta alpha")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("serializedRowFns equals the global window on random keyed data") {
    // randomized law for the distributed serialize machinery: duplicate-heavy
    // keys (tie runs for the ranks), null values (prev/cumsum null handling),
    // and a random partition count — always equal to the naive global window
    import org.apache.spark.sql.expressions.Window
    val rows = Gen.listOfN(120, for {
      k <- Gen.choose(0, 6)       // heavy duplicates → rank tie runs
      v <- Gen.option(Gen.choose(-50L, 50L))
      id <- Gen.choose(0L, 100000L)
    } yield (k, v, id))
    check(Prop.forAll(rows, Gen.choose(1, 9)) { (data, parts) =>
      val df = data.toDF("k", "v", "id").dropDuplicates("k", "id")
      val order = Seq(col("k").asc, col("id").asc)
      val w = Window.orderBy(order: _*)
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = df
        .withColumn("rn", row_number().over(w))
        .withColumn("p2", lag(col("v"), 2, 999L).over(w))
        .withColumn("cs", sum(col("v")).over(wc))
        .withColumn("rk", dense_rank().over(Window.orderBy(col("k"))).cast("long"))
        .withColumn("rkm", rank().over(Window.orderBy(col("k"))).cast("long"))
        .orderBy(order: _*).collect().toSeq
      val got = serializedRowFns(df.repartition(parts), order, Seq[RowFn](
          RowNumber("rn"), PrevOf("p2", col("v"), 2, Some(lit(999L))),
          CumSumOf("cs", col("v")), RankDense("rk", col("k")),
          RankMin("rkm", col("k"))))
        .select(col("k"), col("v"), col("id"), col("rn"), col("p2"), col("cs"),
          col("rk"), col("rkm"))
        .orderBy(order: _*).collect().toSeq
      got == expected
    }, n = 12)
  }

  test("estJaccard stays within [0,1] and is 1 for identical docs") {
    val docs = (0 until 30).map(i => (i.toLong, s"common prefix words here item $i"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "text", "doc_id", numHashes = 32)
    val pairs = sigs.select(col("id").as("id_a")).crossJoin(sigs.select(col("id").as("id_b")))
      .filter(col("id_a") <= col("id_b"))
    val est = Dedup.estJaccard(pairs, sigs, 32)
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    assert(est.forall { case (_, _, j) => j >= 0.0 && j <= 1.0 })
    assert(est.filter { case (a, b, _) => a == b }.forall(_._3 == 1.0))
  }

  test("fast FFT matches a direct O(n²) DFT on random complex inputs") {
    import graft.plans.FftExpressions
    val rnd = new scala.util.Random(13)
    for (n <- Seq(4, 8, 16, 64); _ <- 0 until 5) {
      val re = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val im = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val fr = re.clone(); val fi = im.clone()
      FftExpressions.transform(fr, fi, inverse = false)
      // independent direct DFT: X_m = Σ_k x_k e^{-2πi km/n}
      (0 until n).foreach { m =>
        var sr = 0.0; var si = 0.0
        (0 until n).foreach { k =>
          val a = -2.0 * math.Pi * k * m / n
          sr += re(k) * math.cos(a) - im(k) * math.sin(a)
          si += re(k) * math.sin(a) + im(k) * math.cos(a)
        }
        assert(math.abs(fr(m) - sr) < 1e-8 * (1 + math.abs(sr)) + 1e-8,
          s"re mismatch n=$n m=$m: ${fr(m)} vs $sr")
        assert(math.abs(fi(m) - si) < 1e-8 * (1 + math.abs(si)) + 1e-8,
          s"im mismatch n=$n m=$m: ${fi(m)} vs $si")
      }
      // inverse round-trip
      FftExpressions.transform(fr, fi, inverse = true)
      (0 until n).foreach { k =>
        assert(math.abs(fr(k) - re(k)) < 1e-9 && math.abs(fi(k) - im(k)) < 1e-9)
      }
    }
  }

  test("S2 parent levels are consistent along the hierarchy") {
    import graft.plans.S2Expressions
    val rnd = new scala.util.Random(29)
    (0 until 100).foreach { _ =>
      val lng = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      val leaf = S2Expressions.leafFromLngLat(lng, lat)
      val l1 = rnd.nextInt(29); val l2 = l1 + 1 + rnd.nextInt(30 - l1 - 1)
      // coarse parent of a finer parent == coarse parent of the leaf
      assert(S2Expressions.parentAtLevel(
        S2Expressions.parentAtLevel(leaf, l2), l1) ==
        S2Expressions.parentAtLevel(leaf, l1), s"($lng,$lat) $l1/$l2")
    }
  }

  test("ipv4 pack kernel: value/prefix algebra holds on random addresses") {
    import graft.plans.ParseIpv4K
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(31)
    (0 until 300).foreach { _ =>
      val o = Array.fill(4)(rnd.nextInt(256))
      val v = o.foldLeft(0L)((a, x) => a * 256 + x)
      val bare = ParseIpv4K.eval(UTF8String.fromString(o.mkString(".")))
      assert(bare == ((v << 6) | 32), s"bare ${o.mkString(".")}")
      val p = rnd.nextInt(33)
      val masked = v - v % (1L << (32 - p))
      val packed = ParseIpv4K.eval(UTF8String.fromString(o.mkString(".") + "/" + p))
      assert(packed == ((masked << 6) | p), s"${o.mkString(".")}/$p")
      // malformed forms are null (-1), never a wrong value
      assert(ParseIpv4K.eval(UTF8String.fromString(
        s"${o(0)}.${o(1)}.${o(2)}.${256 + rnd.nextInt(700)}")) == -1L)
      assert(ParseIpv4K.eval(UTF8String.fromString(
        o.mkString(".") + "/" + (33 + rnd.nextInt(90)))) == -1L)
    }
  }

  test("geohash center kernel: center lies inside its own cell box, randomly") {
    import graft.plans.GeoHashExpressions
    import org.apache.spark.unsafe.types.UTF8String
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    val rnd = new scala.util.Random(37)
    (0 until 200).foreach { _ =>
      val p = 1 + rnd.nextInt(10)
      val tok = (0 until p).map(_ => alpha(rnd.nextInt(32))).mkString
      val c = GeoHashExpressions.centralPoint(UTF8String.fromString(tok))
      val box = GeoHashExpressions.cellPolygon(UTF8String.fromString(tok))
      assert(c != null && box != null, tok)
      val lng = c.getDouble(0); val lat = c.getDouble(1)
      val x0 = box.getArray(0).getDouble(0); val y0 = box.getArray(0).getDouble(1)
      val x1 = box.getArray(2).getDouble(0); val y1 = box.getArray(2).getDouble(1)
      assert(lng > x0 && lng < x1 && lat > y0 && lat < y1, s"$tok ($lng,$lat)")
    }
  }

  test("H3 boundary rings contain their center and exclude neighbors, randomly") {
    import graft.plans.H3Expressions
    val rnd = new scala.util.Random(47)
    var checked = 0
    (0 until 60).foreach { _ =>
      val lng = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 150 - 75 // az-sort degenerates at the poles
      val res = 3 + rnd.nextInt(6)
      val id = H3Expressions.encode(lng, lat, res)
      val ring0 = H3Expressions.cellPolygon(
        org.apache.spark.unsafe.types.UTF8String.fromString(H3Expressions.token(id)))
      if (ring0 != null) {
        val (clng, clat) = H3Expressions.centerLngLat(id)
        // wrap-local frame so antimeridian cells test correctly
        val ring = (0 until ring0.numElements()).map { i =>
          val p = ring0.getArray(i)
          ((((p.getDouble(0) - clng + 540.0) % 360.0) - 180.0), p.getDouble(1) - clat)
        }
        def inside(x: Double, y: Double): Boolean = {
          var c = false; var i = 0; val n = ring.size
          while (i < n) {
            val (xi, yi) = ring(i); val (xj, yj) = ring((i + 1) % n)
            if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
              c = !c
            i += 1
          }
          c
        }
        assert(inside(0.0, 0.0), s"($lng,$lat,$res): center outside its ring")
        // neighbor exclusion holds on the ideal lattice; across an
        // icosahedron FACE SEAM the dual ring distorts (the documented
        // cellPolygon deviation) — assert only for same-face neighbors
        def faceOf(v: Long): Long = (v >>> 45) & 0x7FL
        H3Expressions.neighbors(id).filter(faceOf(_) == faceOf(id)).foreach { nb =>
          val (nl, na) = H3Expressions.centerLngLat(nb)
          val lx = (((nl - clng + 540.0) % 360.0) - 180.0)
          assert(!inside(lx, na - clat),
            s"($lng,$lat,$res): same-face neighbor center inside the ring")
        }
        checked += 1
      }
    }
    assert(checked >= 55, s"too many degenerate rings: $checked/60")
  }

  test("line covering is complete for random polylines (bucket-join soundness)") {
    import graft.plans.S2Expressions
    val rnd = new scala.util.Random(41)
    (0 until 30).foreach { trial =>
      // random 2–5-vertex polyline in a ~1° window at a random location
      val cx = rnd.nextDouble() * 300 - 150
      val cy = rnd.nextDouble() * 140 - 70
      val nv = 2 + rnd.nextInt(4)
      val xs = Array.fill(nv)(cx + rnd.nextDouble())
      val ys = Array.fill(nv)(cy + rnd.nextDouble())
      val lvl = 7 + rnd.nextInt(4)
      val cov = S2Expressions.coverPolyline(xs, ys, lvl).toSet
      // every sample point along every segment must land in a covered cell
      (0 until nv - 1).foreach { s =>
        (0 to 200).foreach { k =>
          val t = k / 200.0
          val x = xs(s) + t * (xs(s + 1) - xs(s))
          val y = ys(s) + t * (ys(s + 1) - ys(s))
          val cell = S2Expressions.parentAtLevel(
            S2Expressions.leafFromLngLat(x, y), lvl)
          assert(cov.contains(cell),
            s"trial $trial lvl $lvl: uncovered on-line point ($x,$y)")
        }
      }
    }
  }

  test("line buffer honors the distance contract on random polylines") {
    import graft.plans.PolygonClip
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(43)
    def ad(pts: Seq[(Double, Double)]): GenericArrayData =
      new GenericArrayData(pts.map { case (x, y) =>
        new GenericArrayData(Array[Any](x, y)) }.toArray[Any])
    (0 until 20).foreach { trial =>
      val cx = rnd.nextDouble() * 200 - 100
      val cy = rnd.nextDouble() * 100 - 50
      val nv = 2 + rnd.nextInt(3)
      val pts = Seq.fill(nv)((cx + rnd.nextDouble() * 0.8, cy + rnd.nextDouble() * 0.8))
      val r = 15000.0
      val buf = PolygonClip.bufferLine(ad(pts), r, close = false)
      if (buf != null) { // degenerate unions may null out — contract is only for produced rings
        val ring = (0 until buf.numElements()).map { i =>
          val p = buf.getArray(i); (p.getDouble(0), p.getDouble(1))
        }
        def rayCast(x: Double, y: Double): Boolean = {
          var c = false; var i = 0; val n = ring.size
          while (i < n) {
            val (xi, yi) = ring(i); val (xj, yj) = ring((i + 1) % n)
            if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
              c = !c
            i += 1
          }
          c
        }
        def distM(px: Double, py: Double): Double = {
          val cosl = math.cos(math.toRadians(py))
          pts.sliding(2).map { s =>
            val (ax, ay) = s(0); val (bx, by) = s(1)
            val x1 = (ax - px) * cosl; val y1 = ay - py
            val x2 = (bx - px) * cosl; val y2 = by - py
            val dx = x2 - x1; val dy = y2 - y1
            val l2 = dx * dx + dy * dy
            val t = if (l2 > 0) math.max(0.0, math.min(1.0, -(x1 * dx + y1 * dy) / l2)) else 0.0
            val hx = x1 + t * dx; val hy = y1 + t * dy
            math.sqrt(hx * hx + hy * hy)
          }.min * (math.Pi / 180 * 6371000.0)
        }
        // margin probes around the polyline bbox (wide margins absorb the
        // centroid-frame vs per-point-frame difference at high |lat|)
        (0 until 150).foreach { _ =>
          val px = cx - 0.4 + rnd.nextDouble() * 1.6
          val py = cy - 0.4 + rnd.nextDouble() * 1.6
          val d = distM(px, py)
          if (d < 0.7 * r) assert(rayCast(px, py),
            s"trial $trial: point at d=$d missing from buffer")
          else if (d > 1.5 * r) assert(!rayCast(px, py),
            s"trial $trial: point at d=$d wrongly inside buffer")
        }
      }
    }
  }

  test("budgetWaterfill invariants: never oversubscribes, never exceeds caps") {
    import graft.functions.Sampling
    val domGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 1000L), Gen.choose(1L, 100L))).map(_.take(6))
    check(Prop.forAll(domGen, Gen.choose(0, 3000), Gen.choose(0L, 50000L)) {
      (doms, capMilli, budget) =>
        val df = doms.zipWithIndex
          .map { case ((n, w), i) => (s"d$i", n, w) }.toDF("d", "n", "w")
        val out = Sampling.budgetWaterfill(df, col("d"), col("n"), col("w"),
            capMilli, budget)
          .select("dom", "n_tok", "alloc").collect()
        val total = out.map(_.getLong(2)).sum
        val withinCaps = out.forall(r =>
          r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1) * capMilli / 1000)
        total <= budget && withinCaps
    }, n = 12)
  }

  test("diverseSelect coverage: the first min(k, #clusters) picks hit distinct clusters") {
    import graft.functions.Sampling
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 50L)))
      .map(_.take(30).distinctBy(_._2))
    check(Prop.forAll(rows, Gen.choose(1, 8)) { (data, k) =>
      val df = data.map { case (c, id) => (s"c$c", id, id % 7) }
        .toDF("cl", "id", "score")
      val picked = Sampling.diverseSelect(df, col("cl"), col("score"),
          col("id"), k)
        .orderBy("pick").select("cl").collect().map(_.getString(0))
      val clusters = data.map(_._1).distinct.size
      val head = picked.take(math.min(k, clusters))
      head.distinct.length == head.length
    }, n = 12)
  }

  test("KQL parser: arbitrary garbage fails fast (no hangs, no silent plans)") {
    import graft.kql.KqlParser
    val t = spark.range(3).toDF("id")
    val tokenGen = Gen.oneOf(
      Gen.oneOf("t", "where", "project", "summarize", "by", "|", "(", ")",
        "[", "]", ",", "==", "and", "or", "count()", "id", "\"s\"", "1.5",
        "datatable", "let", "=", ";", "macro-expand", "entity_group", "as"),
      Gen.alphaNumStr.map(_.take(8)),
      Gen.listOfN(3, Gen.oneOf("!@#$%^&*~`?<>", "\\u0000\\u001f", "\u00e9\u4e2d"))
        .map(_.mkString))
    val progGen = Gen.listOf(tokenGen).map(_.take(25).mkString(" "))
    check(Prop.forAll(progGen) { prog =>
      // contract: parse() either returns a DataFrame or throws promptly --
      // never hangs, never loops, never returns null
      try { KqlParser.parse(prog, _ => t) != null }
      catch { case _: Exception => true case _: StackOverflowError => false }
    }, n = 200)
  }
}
