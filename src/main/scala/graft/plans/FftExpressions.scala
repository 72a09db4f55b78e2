package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `series_fft` / `series_ifft` (reference KQL surface `README.md:33-34`):
  * iterative radix-2 Cooley–Tukey from the published algorithm. Inputs
  * shorter than a power of two are zero-padded up (documented deviation:
  * Kusto requires/pads similarly; padding is the standard practice).
  *
  * Per-row array-bound numeric work with no Column-combinator formulation —
  * an Expression (CodegenFallback: the loop is array-dominated, codegen
  * would only inline the dispatch) in the CodecExpressions mold. Output is
  * struct(re, im); the KQL surface binds it via tuple extend
  * `extend (fr, fi) = series_fft(x)`.
  */
object FftExpressions {

  def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** In-place transform; `inverse` applies the conjugate kernel and 1/n. */
  def transform(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft length must be a power of two")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + half); val vi0 = im(base + k + half)
          val vr = vr0 * cwr - vi0 * cwi
          val vi = vr0 * cwi + vi0 * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val ncwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = ncwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }
}

/** series_fft / series_ifft over array<double> [re, im] → struct(re, im). */
case class FftExpr(left: Expression, right: Expression, inverse: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("re", ArrayType(DoubleType)),
    StructField("im", ArrayType(DoubleType))))

  override protected def nullSafeEval(reA: Any, imA: Any): Any = {
    val reIn = reA.asInstanceOf[ArrayData]
    val imIn = imA.asInstanceOf[ArrayData]
    val n0 = math.max(reIn.numElements(), math.max(imIn.numElements(), 1))
    val n = FftExpressions.nextPow2(n0)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < reIn.numElements()) {
      if (!reIn.isNullAt(i)) re(i) = reIn.getDouble(i); i += 1
    }
    i = 0
    while (i < imIn.numElements()) {
      if (!imIn.isNullAt(i)) im(i) = imIn.getDouble(i); i += 1
    }
    FftExpressions.transform(re, im, inverse)
    InternalRow(new GenericArrayData(re), new GenericArrayData(im))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)

  override def prettyName: String =
    if (inverse) "graft_series_ifft" else "graft_series_fft"
}
