package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd kernels for the geo residual tests (point-in-polygon ray
  * cast, point-to-polyline distance, closest point on line).
  *
  * Why native: the HOF (`aggregate`) formulations rebind every shared
  * sub-expression at each use site, so the per-segment projection chain
  * (x1/y1/x2/y2 → t → cx/cy) explodes combinatorially in TREE SIZE —
  * measured on q_kql_line_lookup the join-residual expression inflated past
  * the whole-stage-codegen budget into interpreted evaluation (2.9 s steady
  * for a 2-line × 26 k-point fixture). These expressions run the identical
  * IEEE chain (operation-for-operation the one the DuckDB oracles replay —
  * see the ops marked in the kernels) as a tight primitive loop inside
  * WholeStageCodegen.
  *
  * The HOF formulations remain the fallback when the session lacks
  * GraftExtensions (KqlFunctions checks registration, the Similarity.dot
  * pattern) — results are bit-identical either way, asserted in
  * NativeExprSpec.
  */
object GeoKernelExpressions {
  val pipName = "graft_point_in_polygon"
  val plineName = "graft_point_to_line_m"
  val closestName = "graft_closest_point_on_line"

  /** Even-odd ray cast; comparison order FIXED (== the SQL-side HOF and the
    * DuckDB oracle replays): ((yi > y) != (yj > y)) && x < (xj-xi)*(y-yi)/
    * (yj-yi) + xi, edges i → (i+1) mod n. */
  def pointInPolygon(x: Double, y: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val a = ring.getArray(i)
      val b = ring.getArray(if (i + 1 == n) 0 else i + 1)
      val xi = a.getDouble(0); val yi = a.getDouble(1)
      val xj = b.getDouble(0); val yj = b.getDouble(1)
      if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) c += 1
      i += 1
    }
    c % 2 == 1
  }

  /** Min point-to-segment distance in the local equirectangular projection,
    * meters on the mean-radius sphere. Chain per segment (== the HOF /
    * oracle): x1=(ax-px)*cosl, y1=ay-py, dx=x2-x1, dy=y2-y1, len2=dx²+dy²,
    * t = len2>0 ? clamp01(-(x1·dx+y1·dy)/len2) : 0, d=√(cx²+cy²);
    * result = min(d)·(π/180·6371000). */
  def pointToLineMeters(px: Double, py: Double, line: ArrayData): Double = {
    val cosl = math.cos(math.toRadians(py))
    val n = line.numElements()
    var acc = Double.PositiveInfinity
    var i = 0
    while (i < n - 1) {
      val a = line.getArray(i); val b = line.getArray(i + 1)
      val x1 = (a.getDouble(0) - px) * cosl
      val y1 = a.getDouble(1) - py
      val x2 = (b.getDouble(0) - px) * cosl
      val y2 = b.getDouble(1) - py
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      val t = if (len2 > 0) math.max(0.0, math.min(1.0, -(x1 * dx + y1 * dy) / len2))
        else 0.0
      val cx = x1 + t * dx; val cy = y1 + t * dy
      acc = math.min(acc, math.sqrt(cx * cx + cy * cy))
      i += 1
    }
    acc * (math.Pi / 180 * 6371000.0)
  }

  /** Argmin of the same per-segment chain — strict < keeps the EARLIEST
    * segment on ties (== the struct-accumulator HOF fold and the oracle's
    * ROW_NUMBER over (dist, segment)). Output [lng, lat]. */
  def closestPointOnLine(px: Double, py: Double, line: ArrayData): GenericArrayData = {
    val cosl = math.cos(math.toRadians(py))
    val n = line.numElements()
    var bestD = Double.PositiveInfinity
    var bx = 0.0; var by = 0.0
    var i = 0
    while (i < n - 1) {
      val a = line.getArray(i); val b = line.getArray(i + 1)
      val x1 = (a.getDouble(0) - px) * cosl
      val y1 = a.getDouble(1) - py
      val x2 = (b.getDouble(0) - px) * cosl
      val y2 = b.getDouble(1) - py
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      val t = if (len2 > 0) math.max(0.0, math.min(1.0, -(x1 * dx + y1 * dy) / len2))
        else 0.0
      val cx = x1 + t * dx; val cy = y1 + t * dy
      val d = math.sqrt(cx * cx + cy * cy)
      if (d < bestD) { bestD = d; bx = cx; by = cy }
      i += 1
    }
    new GenericArrayData(Array[Any](px + bx / cosl, py + by))
  }
}

private[plans] trait GeoKernel3 extends TernaryExpression {
  def first: Expression; def second: Expression; def third: Expression
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, double, array<array<double>>), got $other")
    }
}

/** graft_point_in_polygon(lng, lat, ring) → boolean. */
case class PointInPolygonExpr(first: Expression, second: Expression,
    third: Expression) extends GeoKernel3 {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(x: Any, y: Any, ring: Any): Any =
    GeoKernelExpressions.pointInPolygon(x.asInstanceOf[Double],
      y.asInstanceOf[Double], ring.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, r) =>
      s"graft.plans.GeoKernelExpressions.pointInPolygon($x, $y, $r)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = GeoKernelExpressions.pipName
}

/** graft_point_to_line_m(lng, lat, line) → meters. */
case class PointToLineMetersExpr(first: Expression, second: Expression,
    third: Expression) extends GeoKernel3 {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(x: Any, y: Any, line: Any): Any =
    GeoKernelExpressions.pointToLineMeters(x.asInstanceOf[Double],
      y.asInstanceOf[Double], line.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, l) =>
      s"graft.plans.GeoKernelExpressions.pointToLineMeters($x, $y, $l)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = GeoKernelExpressions.plineName
}

/** graft_closest_point_on_line(lng, lat, line) → [lng, lat]. */
case class ClosestPointOnLineExpr(first: Expression, second: Expression,
    third: Expression) extends GeoKernel3 {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(x: Any, y: Any, line: Any): Any =
    GeoKernelExpressions.closestPointOnLine(x.asInstanceOf[Double],
      y.asInstanceOf[Double], line.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, l) =>
      s"graft.plans.GeoKernelExpressions.closestPointOnLine($x, $y, $l)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = GeoKernelExpressions.closestName
}
