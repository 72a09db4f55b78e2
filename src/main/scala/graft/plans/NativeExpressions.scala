package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity/dedup hot loops.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * CodegenFallback — every element step is an interpreted lambda with boxing. These
  * expressions generate (and interpret, for the fallback path) tight primitive
  * loops instead, and participate in WholeStageCodegen. They are injected through
  * the public `SparkSessionExtensions` API (`spark.sql.extensions=
  * graft.plans.GraftExtensions`); callers fall back to the HOF formulations when
  * the extension is not installed, so results are identical either way (asserted
  * in NativeExprSpec).
  */
object NativeExpressions {
  val dotName = "graft_dot_f32"
  val simhashName = "graft_simhash64"
  val hyperplanesName = "graft_hyperplanes"

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d) in
    * [-1,1]: 64-bit avalanche hash of (seed, p, d). Must stay in lockstep with
    * Similarity.planeComponent (the HOF fallback uses that copy). */
  def planeComponent(p: Int, d: Int, seed: Long): Double = {
    var x = seed ^ (p.toLong << 32) ^ d.toLong
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x.toDouble / Long.MaxValue.toDouble
  }
}

/** Dot product of two float-array columns accumulated in double, fixed
  * left-to-right order (deterministic; same order as the HOF fold it replaces).
  * Null array elements are treated as 0 (fixture embeddings contain none). */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"${NativeExpressions.dotName} expects two array<float> args, got $l / $r")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh local names: several DotF32 instances can land in ONE codegen
      // stage (cosine = three dots) and fixed names would collide, failing
      // janino compilation and silently dropping the stage to interpretation
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = NativeExpressions.dotName
}

/** 64-bit SimHash from a per-token hash array (majority vote per bit; ties → 0,
  * matching Dedup.simHashFromHashes). One primitive pass with a 64-int counter
  * array per ROW (not per token — the HOF version's allocation trap). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${NativeExpressions.simhashName} expects array<bigint>, got $other")
  }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    var m = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        m += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > m) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      // fresh locals — see DotF32.doGenCode (fixed names collide when multiple
      // instances share a codegen stage)
      val n = ctx.freshName("shN"); val counts = ctx.freshName("shCounts")
      val m = ctx.freshName("shM"); val i = ctx.freshName("shI")
      val h = ctx.freshName("shH"); val b = ctx.freshName("shB")
      val sig = ctx.freshName("shSig")
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[64];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $h = $hs.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) { $counts[$b] += (int) (($h >>> $b) & 1L); }
         |    $m++;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] * 2 > $m) $sig |= (1L << $b); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = NativeExpressions.simhashName
}

/** All `nProj` hyperplane projections of a float vector in one generated loop.
  * The weight matrix is derived from (dim, nProj, seed) on the driver and shipped
  * to generated code as a reference object (one flat double[]) — no literal trees,
  * no per-row matrix construction, no interpreted lambdas. Accumulation order is
  * d-major, identical to the HOF zip/fold fallback in Similarity.lshProjections. */
case class HyperplaneProjections(child: Expression, dim: Int, nProj: Int, seed: Long)
  extends UnaryExpression {

  // flat [d * nProj + p] layout; derived, not a constructor arg (case equality stays
  // on (child, dim, nProj, seed))
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](dim * nProj)
    var d = 0
    while (d < dim) {
      var p = 0
      while (p < nProj) {
        w(d * nProj + p) = NativeExpressions.planeComponent(p, d, seed)
        p += 1
      }
      d += 1
    }
    w
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${NativeExpressions.hyperplanesName} expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Double](nProj)
    var d = 0
    while (d < n) {
      if (!v.isNullAt(d)) {
        val x = v.getFloat(d).toDouble
        val base = d * nProj
        var p = 0
        while (p < nProj) { out(p) += x * weights(base + p); p += 1 }
      }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    // fresh locals — see DotF32.doGenCode
    val n = ctx.freshName("hpN"); val out = ctx.freshName("hpOut")
    val d = ctx.freshName("hpD"); val x = ctx.freshName("hpX")
    val base = ctx.freshName("hpBase"); val p = ctx.freshName("hpP")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $out = new double[$nProj];
         |for (int $d = 0; $d < $n; $d++) {
         |  if (!$v.isNullAt($d)) {
         |    double $x = (double) $v.getFloat($d);
         |    int $base = $d * $nProj;
         |    for (int $p = 0; $p < $nProj; $p++) { $out[$p] += $x * $w[$base + $p]; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = NativeExpressions.hyperplanesName
}

/** Session-extension installer: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(NativeExpressions.dotName),
      new ExpressionInfo(classOf[DotF32].getName, NativeExpressions.dotName),
      (children: Seq[Expression]) => DotF32(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(NativeExpressions.simhashName),
      new ExpressionInfo(classOf[SimHash64].getName, NativeExpressions.simhashName),
      (children: Seq[Expression]) => SimHash64(children.head)))
    e.injectFunction((
      FunctionIdentifier(NativeExpressions.hyperplanesName),
      new ExpressionInfo(classOf[HyperplaneProjections].getName,
        NativeExpressions.hyperplanesName),
      (children: Seq[Expression]) => {
        def litLong(i: Int): Long = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
            v.longValue()
          case other => throw new IllegalArgumentException(
            s"${NativeExpressions.hyperplanesName} arg $i must be a literal, got $other")
        }
        HyperplaneProjections(children.head, litLong(1).toInt, litLong(2).toInt, litLong(3))
      }))
    // zlib/gzip base64 codec scalars (CodecExpressions.scala)
    CodecExpressions.names.foreach { case (kql, regName) =>
      val method = kql match {
        case "zlib_compress_to_base64_string" => "zlibCompress"
        case "zlib_decompress_from_base64_string" => "zlibDecompress"
        case "gzip_compress_to_base64_string" => "gzipCompress"
        case "gzip_decompress_from_base64_string" => "gzipDecompress"
        case "punycode_from_string" => "punyEncode"
        case "punycode_to_string" => "punyDecode"
        case "parse_xml" => "xmlToJson"
        case "text_normalize_nfc" => "nfcNormalize"
        case "text_normalize_nfkc" => "nfkcNormalize"
        case "punycode_domain_from_string" => "punyDomainEncode"
        case "punycode_domain_to_string" => "punyDomainDecode"
      }
      e.injectFunction((
        FunctionIdentifier(regName),
        new ExpressionInfo(classOf[CodecExpr].getName, regName),
        (children: Seq[Expression]) => CodecExpr(children.head, method)))
    }
    // geo_geohash_neighbors (GeoHashExpressions.scala)
    e.injectFunction((
      FunctionIdentifier("graft_geohash_neighbors"),
      new ExpressionInfo(classOf[GeohashNeighborsExpr].getName,
        "graft_geohash_neighbors"),
      (children: Seq[Expression]) => GeohashNeighborsExpr(children.head)))
    // series_fft / series_ifft (FftExpressions.scala)
    Seq(("graft_series_fft", false), ("graft_series_ifft", true)).foreach {
      case (name, inv) =>
        e.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[FftExpr].getName, name),
          (children: Seq[Expression]) => FftExpr(children(0), children(1), inv)))
    }
    // S2 cell scalars (S2Expressions.scala)
    e.injectFunction((
      FunctionIdentifier("graft_s2_cell"),
      new ExpressionInfo(classOf[S2CellExpr].getName, "graft_s2_cell"),
      (children: Seq[Expression]) => S2CellExpr(children(0), children(1), children(2))))
    Seq("lng", "lat").foreach { coord =>
      e.injectFunction((
        FunctionIdentifier(s"graft_s2_center_$coord"),
        new ExpressionInfo(classOf[S2CenterExpr].getName, s"graft_s2_center_$coord"),
        (children: Seq[Expression]) => S2CenterExpr(children.head, coord)))
    }
    e.injectFunction((
      FunctionIdentifier("graft_s2_center_point"),
      new ExpressionInfo(classOf[S2CenterPointExpr].getName, "graft_s2_center_point"),
      (children: Seq[Expression]) => S2CenterPointExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_s2_neighbors"),
      new ExpressionInfo(classOf[S2NeighborsExpr].getName, "graft_s2_neighbors"),
      (children: Seq[Expression]) => S2NeighborsExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_s2_cover"),
      new ExpressionInfo(classOf[S2CoverExpr].getName, "graft_s2_cover"),
      (children: Seq[Expression]) => S2CoverExpr(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_s2_cover_line"),
      new ExpressionInfo(classOf[S2LineCoverExpr].getName, "graft_s2_cover_line"),
      (children: Seq[Expression]) => S2LineCoverExpr(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_s2_cell_polygon"),
      new ExpressionInfo(classOf[S2CellPolygonExpr].getName, "graft_s2_cell_polygon"),
      (children: Seq[Expression]) => S2CellPolygonExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_geohash_polygon"),
      new ExpressionInfo(classOf[GeohashPolygonExpr].getName, "graft_geohash_polygon"),
      (children: Seq[Expression]) => GeohashPolygonExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_geohash_center"),
      new ExpressionInfo(classOf[GeohashCenterExpr].getName, "graft_geohash_center"),
      (children: Seq[Expression]) => GeohashCenterExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_h3_cell_polygon"),
      new ExpressionInfo(classOf[H3CellPolygonExpr].getName, "graft_h3_cell_polygon"),
      (children: Seq[Expression]) => H3CellPolygonExpr(children.head)))
    // geo residual kernels (GeoKernelExpressions.scala)
    e.injectFunction((
      FunctionIdentifier(GeoKernelExpressions.pipName),
      new ExpressionInfo(classOf[PointInPolygonExpr].getName, GeoKernelExpressions.pipName),
      (children: Seq[Expression]) =>
        PointInPolygonExpr(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier(GeoKernelExpressions.plineName),
      new ExpressionInfo(classOf[PointToLineMetersExpr].getName, GeoKernelExpressions.plineName),
      (children: Seq[Expression]) =>
        PointToLineMetersExpr(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier(GeoKernelExpressions.closestName),
      new ExpressionInfo(classOf[ClosestPointOnLineExpr].getName, GeoKernelExpressions.closestName),
      (children: Seq[Expression]) =>
        ClosestPointOnLineExpr(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_stats"),
      new ExpressionInfo(classOf[ShingleStatsExpr].getName, "graft_shingle_stats"),
      (children: Seq[Expression]) =>
        ShingleStatsExpr(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "graft_repetition_stats"),
      (children: Seq[Expression]) => RepetitionStatsExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_span_hashes"),
      new ExpressionInfo(classOf[SpanHashesExpr].getName, "graft_span_hashes"),
      (children: Seq[Expression]) => SpanHashesExpr(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_span_dup_stats"),
      new ExpressionInfo(classOf[SpanDupStatsExpr].getName, "graft_span_dup_stats"),
      (children: Seq[Expression]) =>
        SpanDupStatsExpr(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("graft_parse_ipv6"),
      new ExpressionInfo(classOf[ParseIpv6Expr].getName, "graft_parse_ipv6"),
      (children: Seq[Expression]) => ParseIpv6Expr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_ipv4_pack"),
      new ExpressionInfo(classOf[ParseIpv4Expr].getName, "graft_ipv4_pack"),
      (children: Seq[Expression]) => ParseIpv4Expr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_make_string"),
      new ExpressionInfo(classOf[MakeStringExpr].getName, "graft_make_string"),
      (children: Seq[Expression]) => MakeStringExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_to_utf8"),
      new ExpressionInfo(classOf[ToUtf8Expr].getName, "graft_to_utf8"),
      (children: Seq[Expression]) => ToUtf8Expr(children.head)))
    // H3-style hex cells (H3Expressions.scala)
    e.injectFunction((
      FunctionIdentifier("graft_h3_cell"),
      new ExpressionInfo(classOf[H3CellExpr].getName, "graft_h3_cell"),
      (children: Seq[Expression]) => H3CellExpr(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier("graft_h3_center_point"),
      new ExpressionInfo(classOf[H3CenterExpr].getName, "graft_h3_center_point"),
      (children: Seq[Expression]) => H3CenterExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_h3_neighbors"),
      new ExpressionInfo(classOf[H3NeighborsExpr].getName, "graft_h3_neighbors"),
      (children: Seq[Expression]) => H3NeighborsExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_h3_parent"),
      new ExpressionInfo(classOf[H3ParentExpr].getName, "graft_h3_parent"),
      (children: Seq[Expression]) => H3ParentExpr(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_h3_children"),
      new ExpressionInfo(classOf[H3ChildrenExpr].getName, "graft_h3_children"),
      (children: Seq[Expression]) => H3ChildrenExpr(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_h3_rings"),
      new ExpressionInfo(classOf[H3RingsExpr].getName, "graft_h3_rings"),
      (children: Seq[Expression]) => H3RingsExpr(children(0), children(1))))
    // polygon boolean ops + polyline simplify (PolygonClipExpressions.scala)
    e.injectFunction((
      FunctionIdentifier("graft_polygon_intersection"),
      new ExpressionInfo(classOf[PolygonBoolExpr].getName, "graft_polygon_intersection"),
      (children: Seq[Expression]) => PolygonBoolExpr(children(0), children(1), union = false)))
    e.injectFunction((
      FunctionIdentifier("graft_polygon_union"),
      new ExpressionInfo(classOf[PolygonBoolExpr].getName, "graft_polygon_union"),
      (children: Seq[Expression]) => PolygonBoolExpr(children(0), children(1), union = true)))
    e.injectFunction((
      FunctionIdentifier("graft_line_simplify"),
      new ExpressionInfo(classOf[LineSimplifyExpr].getName, "graft_line_simplify"),
      (children: Seq[Expression]) => LineSimplifyExpr(children(0), children(1))))
    Seq("line_in_poly", "densify_line", "densify_ring", "simplify_rings",
        "union_rings", "clip_line", "buffer_line", "buffer_ring",
        "line_centroid", "lines_intersect", "lines_intersection").foreach { fn =>
      e.injectFunction((
        FunctionIdentifier(s"graft_geo_$fn"),
        new ExpressionInfo(classOf[GeoPolyFnExpr].getName, s"graft_geo_$fn"),
        (children: Seq[Expression]) => GeoPolyFnExpr(children(0), children(1), fn)))
    }
    e.injectFunction((
      FunctionIdentifier("graft_ivf_probes"),
      new ExpressionInfo(classOf[IvfProbesExpr].getName, "graft_ivf_probes"),
      (children: Seq[Expression]) =>
        IvfProbesExpr(children(0), children(1), children(2))))
    // statistical special functions (StatExpressions.scala)
    StatExpressions.names.foreach { case (kql, regName) =>
      e.injectFunction((
        FunctionIdentifier(regName),
        new ExpressionInfo(classOf[StatExpr3].getName, regName),
        (children: Seq[Expression]) => kql match {
          case "erf" => StatExpr1(children.head, "erf")
          case "erfc" => StatExpr1(children.head, "erfc")
          case "beta_cdf" => StatExpr3(children(0), children(1), children(2), "betaCdf")
          case "beta_pdf" => StatExpr3(children(0), children(1), children(2), "betaPdf")
          case "beta_inv" => StatExpr3(children(0), children(1), children(2), "betaInv")
          case "t_cdf" => StatExpr3(children(0), children(1), children(1), "tCdf2")
        }))
    }
  }
}

/** Nearest-centroid probes with the centroid MATRIX as one literal array —
  * the large-k scale path for IVF assignment (Similarity.ivfProbes's
  * literal-expression form embeds k separate dot subtrees in the plan; a
  * few thousand centroids make the PLAN the bottleneck, while this is one
  * fused loop over a single literal and is k-independent in plan size).
  * Scores replicate the fallback's chain exactly: dot accumulated in
  * double left-to-right over min(len) skipping null vector elements (the
  * DotF32 contract), bias = Σx²/2 summed left-to-right, ties broken toward
  * the lower centroid id (the (score desc, −cid desc) struct order). */
object IvfProbes {
  /** Per-centroid biases (Σx²/2, left-to-right — the fallback's chain).
    * A null centroid row biases to NaN so it can never win a probe slot
    * against any real centroid under the Double.compare order below. */
  def biasesOf(cents: org.apache.spark.sql.catalyst.util.ArrayData): Array[Double] = {
    val k = cents.numElements()
    val biases = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      if (cents.isNullAt(ci)) biases(ci) = Double.NaN
      else {
        val c = cents.getArray(ci)
        val m = c.numElements()
        var b = 0.0
        var j = 0
        while (j < m) { val x = c.getFloat(j).toDouble; b += x * x; j += 1 }
        biases(ci) = b / 2.0
      }
      ci += 1
    }
    biases
  }
  def eval(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      cents: org.apache.spark.sql.catalyst.util.ArrayData,
      nProbe: Int,
      biases: Array[Double]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = cents.numElements()
    val bs0 = if (biases != null) biases else biasesOf(cents)
    val scores = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      if (cents.isNullAt(ci) || java.lang.Double.isNaN(bs0(ci))) {
        // a null centroid row can never win a slot (NaN sorts LAST here —
        // note the deliberate divergence from Spark's NaN-largest sort: a
        // missing centroid must not hijack every assignment)
        scores(ci) = Double.NegativeInfinity
      } else {
        val c = cents.getArray(ci)
        val n = math.min(vec.numElements(), c.numElements())
        var s = 0.0
        var j = 0
        while (j < n) {
          if (!vec.isNullAt(j))
            s += vec.getFloat(j).toDouble * c.getFloat(j).toDouble
          j += 1
        }
        scores(ci) = s - bs0(ci)
      }
      ci += 1
    }
    val nOut = math.min(math.max(nProbe, 0), k)
    val out = new Array[Any](nOut)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < nOut) {
      var best = -1
      var bs = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        // Double.compare: NaN scores (a NaN vector element) order LARGEST,
        // matching the fallback's sort_array; strict > keeps the earliest
        // (lowest) id on exact ties
        if (!taken(i) &&
            (best < 0 || java.lang.Double.compare(scores(i), bs) > 0)) {
          best = i; bs = scores(i)
        }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** graft_ivf_probes(vec, centroids, n) → the n nearest centroid ids. The
  * per-centroid biases are constants of the (foldable) centroid literal, so
  * they are computed ONCE at plan build and shipped into generated code as
  * a reference object — the hot per-row loop pays only the k×dim dot. */
case class IvfProbesExpr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _),
          IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_ivf_probes expects (array<float>, array<array<float>>, int), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val biases: Array[Double] =
    if (second.foldable) {
      val c = second.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      if (c == null) null else IvfProbes.biasesOf(c.asInstanceOf[ArrayData])
    } else null // non-literal matrix: eval derives biases per call
  override protected def nullSafeEval(v: Any, c: Any, n: Any): Any =
    IvfProbes.eval(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], biases)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("ivfBiases", biases, "double[]")
    defineCodeGen(ctx, ev, (v, c, n) =>
      s"graft.plans.IvfProbes.eval($v, $c, $n, $b)")
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = "graft_ivf_probes"
}

/** Driver-built pruning model for [[IvfProbesPrunedExpr]]: the full centroid
  * matrix plus its √k super-group geometry (Similarity.superGroups) with
  * per-group Cauchy–Schwarz bounds. All fields are primitive arrays, so the
  * model ships ONCE per stage inside the task binary as compact blocks —
  * never the boxed per-task literal graph that made the literal kernel
  * unshippable at large k. Contract (enforced by the builder): every
  * centroid row non-null, all rows the same length. */
case class IvfPrunedModel(cents: Array[Array[Float]], biases: Array[Double],
    supers: Array[Array[Float]], radii: Array[Double],
    minb: Array[Double], maxb: Array[Double], members: Array[Array[Int]],
    sbiases: Array[Double]) {
  // the expression's treeString embeds its args: print geometry, not arrays
  override def toString: String =
    s"IvfPrunedModel(k=${cents.length}, " +
      s"dim=${if (cents.isEmpty) 0 else cents(0).length}, groups=${supers.length})"
}

/** Exact bound-pruned flat probe assignment — the large-k kernel behind
  * Similarity.assignProbes. Scores replicate IvfProbes' chain exactly (dot
  * accumulated in double left-to-right over min(len) skipping null vector
  * elements; bias Σx²/2 left-to-right; ties to the lower centroid id), and
  * the result is SET-EXACT vs the flat scan: per group g with super s_g,
  * radius r_g = max|c−s_g| and bias range [minb_g, maxb_g], every member
  * score lies in [v·s_g − |v|r_g − maxb_g, v·s_g + |v|r_g − minb_g]
  * (Cauchy–Schwarz). With t = the nProbe-th largest group LOWER bound, at
  * least nProbe centroids score ≥ t (each group is non-empty), so a group
  * whose UPPER bound is < t cannot hold a top-nProbe centroid and its
  * members are skipped without scoring. Per-row cost falls from k dots to
  * √k super dots + the surviving groups' members. A small slack keeps the
  * cut conservative under floating-point rounding (extra survivors are
  * merely scored exactly; droppees are proven strictly beaten). Non-finite
  * vectors (NaN/Inf elements) disable pruning for that row and take the
  * full exact scan, preserving IvfProbes' NaN-largest comparator order. */
object IvfPruned {
  def build(cents: Array[Array[Float]], supers: Array[Array[Float]],
      gid: Array[Int]): IvfPrunedModel = {
    val k = cents.length
    require(k > 0 && cents.forall(c => c != null && c.length == cents(0).length),
      "IvfPruned: centroid rows must be non-null and uniform-length")
    val g = supers.length
    val biases = new Array[Double](k)
    var i = 0
    while (i < k) { // the exact bias chain of IvfProbes.biasesOf
      val c = cents(i); var b = 0.0; var j = 0
      while (j < c.length) { val x = c(j).toDouble; b += x * x; j += 1 }
      biases(i) = b / 2.0
      i += 1
    }
    val rad2 = new Array[Double](g)
    val minb = Array.fill(g)(Double.PositiveInfinity)
    val maxb = Array.fill(g)(Double.NegativeInfinity)
    val counts = new Array[Int](g)
    i = 0; while (i < k) { counts(gid(i)) += 1; i += 1 }
    val members = Array.tabulate(g)(x => new Array[Int](counts(x)))
    val fill = new Array[Int](g)
    i = 0
    while (i < k) {
      val gi = gid(i)
      members(gi)(fill(gi)) = i; fill(gi) += 1
      val s = supers(gi); val c = cents(i)
      var d2 = 0.0; var j = 0
      val n = math.min(s.length, c.length)
      while (j < n) { val dd = c(j).toDouble - s(j).toDouble; d2 += dd * dd; j += 1 }
      if (d2 > rad2(gi)) rad2(gi) = d2
      if (biases(i) < minb(gi)) minb(gi) = biases(i)
      if (biases(i) > maxb(gi)) maxb(gi) = biases(i)
      i += 1
    }
    val sbiases = new Array[Double](g)
    i = 0
    while (i < g) { // supers get the same bias chain (the hier ladder scores
      val s = supers(i); var b = 0.0; var j = 0 // groups with ivfProbes)
      while (j < s.length) { val x = s(j).toDouble; b += x * x; j += 1 }
      sbiases(i) = b / 2.0
      i += 1
    }
    IvfPrunedModel(cents, biases, supers, rad2.map(math.sqrt), minb, maxb,
      members, sbiases)
  }

  /** Fused two-level (hierarchical) probe assignment — the kernel form of
    * Similarity.assignProbesHier's ladder (explode top-groupProbe supers →
    * broadcast member join → per-row top-nProbe): the CANDIDATE SET, score
    * chain, and both tie-breaks replicate the ladder exactly (supers scored
    * v·s − |s|²/2 with ties to the lower group id — the ivfProbes
    * comparator; members scored v·c − |c|²/2 with ties to the lower cid),
    * so the output is row-identical; only the explode + join + typed
    * aggregate machinery is gone. Like the ladder, the result is
    * recall-approximate vs flat (groupProbe = #groups degenerates to exact
    * flat, asserted in SimilaritySpec). Emits min(nProbe, candidates)
    * probes — the ladder's TopKAgg posture when a probed frontier holds
    * fewer than nProbe centroids. */
  def evalHier(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      m: IvfPrunedModel, nProbe: Int, groupProbe: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nv = vec.numElements()
    def dotTo(c: Array[Float]): Double = {
      val n = math.min(nv, c.length)
      var s = 0.0; var p = 0
      while (p < n) {
        if (!vec.isNullAt(p)) s += vec.getFloat(p).toDouble * c(p).toDouble
        p += 1
      }
      s
    }
    val g = m.supers.length
    val ng = math.min(math.max(groupProbe, 0), g)
    val sScores = new Array[Double](g)
    var gi = 0
    while (gi < g) { sScores(gi) = dotTo(m.supers(gi)) - m.sbiases(gi); gi += 1 }
    // top-ng groups: IvfProbes' selection (Double.compare, strict >,
    // ascending scan → ties to the lower gid)
    val gTaken = new Array[Boolean](g)
    val gSel = new Array[Int](ng)
    var r = 0
    var nc = 0
    while (r < ng) {
      var best = -1
      var bs = Double.NegativeInfinity
      var i2 = 0
      while (i2 < g) {
        if (!gTaken(i2) &&
            (best < 0 || java.lang.Double.compare(sScores(i2), bs) > 0)) {
          best = i2; bs = sScores(i2)
        }
        i2 += 1
      }
      gTaken(best) = true
      gSel(r) = best
      nc += m.members(best).length
      r += 1
    }
    val candIds = new Array[Int](nc)
    val scores = new Array[Double](nc)
    var w = 0
    r = 0
    while (r < ng) {
      val mem = m.members(gSel(r)); var q = 0
      while (q < mem.length) {
        val ci = mem(q)
        candIds(w) = ci
        scores(w) = dotTo(m.cents(ci)) - m.biases(ci)
        w += 1; q += 1
      }
      r += 1
    }
    val nOut = math.min(math.max(nProbe, 0), nc)
    val out = new Array[Any](nOut)
    val taken = new Array[Boolean](nc)
    r = 0
    while (r < nOut) {
      var bi = -1
      var bs = Double.NegativeInfinity
      var bcid = Int.MaxValue
      var i2 = 0
      while (i2 < nc) {
        if (!taken(i2)) {
          val cmp = java.lang.Double.compare(scores(i2), bs)
          if (bi < 0 || cmp > 0 || (cmp == 0 && candIds(i2) < bcid)) {
            bi = i2; bs = scores(i2); bcid = candIds(i2)
          }
        }
        i2 += 1
      }
      taken(bi) = true
      out(r) = candIds(bi)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def eval(vec: org.apache.spark.sql.catalyst.util.ArrayData,
      m: IvfPrunedModel, nProbe: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = m.cents.length
    val nv = vec.numElements()
    // |v| over non-null elements: valid for the bound even when a centroid
    // is shorter (the dot truncates to the common prefix, whose norm is ≤
    // the full vector norm)
    var vn2 = 0.0
    var j = 0
    while (j < nv) {
      if (!vec.isNullAt(j)) { val x = vec.getFloat(j).toDouble; vn2 += x * x }
      j += 1
    }
    val vnorm = math.sqrt(vn2)
    def dotTo(c: Array[Float]): Double = {
      val n = math.min(nv, c.length)
      var s = 0.0; var p = 0
      while (p < n) {
        if (!vec.isNullAt(p)) s += vec.getFloat(p).toDouble * c(p).toDouble
        p += 1
      }
      s
    }
    val g = m.supers.length
    var candIds: Array[Int] = null
    if (java.lang.Double.isFinite(vnorm) && g >= 1 && nProbe >= 1 &&
        nProbe < k) {
      val lbs = new Array[Double](g)
      val ubs = new Array[Double](g)
      var ok = true
      var gi = 0
      while (gi < g && ok) {
        val vs = dotTo(m.supers(gi))
        if (java.lang.Double.isNaN(vs)) ok = false
        else {
          val rad = vnorm * m.radii(gi)
          ubs(gi) = vs + rad - m.minb(gi)
          lbs(gi) = vs - rad - m.maxb(gi)
        }
        gi += 1
      }
      if (ok) {
        var t = Double.NegativeInfinity
        if (g >= nProbe) {
          val sorted = lbs.clone()
          java.util.Arrays.sort(sorted)
          t = sorted(g - nProbe)
        }
        // conservative under FP rounding: a borderline group survives and is
        // scored exactly; only groups proven strictly beaten are dropped
        val thr = t - 1e-6 * (1.0 + math.abs(t))
        var nc = 0
        gi = 0
        while (gi < g) {
          if (ubs(gi) >= thr) nc += m.members(gi).length
          gi += 1
        }
        candIds = new Array[Int](nc)
        var w = 0
        gi = 0
        while (gi < g) {
          if (ubs(gi) >= thr) {
            val mem = m.members(gi); var q = 0
            while (q < mem.length) { candIds(w) = mem(q); w += 1; q += 1 }
          }
          gi += 1
        }
      }
    }
    if (candIds == null) candIds = Array.range(0, k) // exact full scan
    val nc = candIds.length
    val scores = new Array[Double](nc)
    var q = 0
    while (q < nc) {
      val ci = candIds(q)
      scores(q) = dotTo(m.cents(ci)) - m.biases(ci)
      q += 1
    }
    // selection identical to IvfProbes.eval: Double.compare (NaN largest),
    // ties to the LOWER centroid id — made explicit here because candidates
    // are grouped, not in ascending-cid order
    val nOut = math.min(math.max(nProbe, 0), k)
    val out = new Array[Any](nOut)
    val taken = new Array[Boolean](nc)
    var r = 0
    while (r < nOut) {
      var bi = -1
      var bs = Double.NegativeInfinity
      var bcid = Int.MaxValue
      var i2 = 0
      while (i2 < nc) {
        if (!taken(i2)) {
          val cmp = java.lang.Double.compare(scores(i2), bs)
          if (bi < 0 || cmp > 0 || (cmp == 0 && candIds(i2) < bcid)) {
            bi = i2; bs = scores(i2); bcid = candIds(i2)
          }
        }
        i2 += 1
      }
      taken(bi) = true
      out(r) = candIds(bi)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** graft-internal (constructed programmatically by Similarity.assignProbes,
  * never via the function registry — the model rides the expression as a
  * reference object): exact bound-pruned probe assignment. Same output,
  * null posture, and tie semantics as graft_ivf_probes over the same
  * matrix (set-parity asserted in SimilaritySpec); only per-row WORK and
  * per-task shipping change. */
case class IvfProbesPrunedExpr(child: Expression, model: IvfPrunedModel,
    nProbe: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_probes_pruned expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    IvfPruned.eval(v.asInstanceOf[ArrayData], model, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfPrunedModel", model,
      "graft.plans.IvfPrunedModel")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.IvfPruned.eval($v, $m, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_ivf_probes_pruned"
}

/** graft-internal (constructed programmatically by
  * Similarity.assignProbesHier): the fused two-level ladder —
  * [[IvfPruned.evalHier]]. */
case class IvfProbesHierExpr(child: Expression, model: IvfPrunedModel,
    nProbe: Int, groupProbe: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_probes_hier expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    IvfPruned.evalHier(v.asInstanceOf[ArrayData], model, nProbe, groupProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfPrunedModel", model,
      "graft.plans.IvfPrunedModel")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.IvfPruned.evalHier($v, $m, $nProbe, $groupProbe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_ivf_probes_hier"
}
