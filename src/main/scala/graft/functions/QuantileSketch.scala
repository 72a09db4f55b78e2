package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches — the KQL `tdigest` / `tdigest_merge` /
  * `percentile_tdigest` surface (reference KQL surface: README.md:33-34).
  *
  * Deliberate deviation (documented): Kusto's t-digest keeps adaptive
  * centroids; this engine uses a DETERMINISTIC equi-width histogram sketch —
  * struct(lo, hi, counts) over an explicit [lo, hi) range. Rationale:
  *   - merge is an exact element-wise add (associative, commutative — safe in
  *     any partial-aggregation order, unlike float centroid merging);
  *   - every estimate is replayable bit-for-bit by an independent engine, so
  *     the sketch can sit in a stored table and be re-audited later;
  *   - at 100 TB the sketch column is a few hundred bytes per group and the
  *     build is a single partial+final hash aggregate (B conditional sums
  *     combine map-side; no collect, no second pass over the data).
  *
  * Error model: estimates snap to bucket lower bounds — max error (hi-lo)/B,
  * zero when the data is integral and the buckets are unit-width.
  */
object QuantileSketch {

  /** Aggregate: histogram sketch of `x` — struct(lo, hi, counts: array<long>
    * of `b` buckets over [lo, hi)), out-of-range values clamped into the end
    * buckets. The bucket index `floor((x-lo)*b/(hi-lo))` is exact for
    * integral inputs: the numerator is an exact integral double, IEEE
    * division is correctly rounded, so an integral true quotient floors
    * identically in any engine. */
  def tdigest(x: Column, lo: Long, hi: Long, b: Int): Column = {
    require(b > 0 && hi > lo, "tdigest: need hi > lo and b > 0")
    val bkt = greatest(lit(0), least(lit(b - 1),
      floor((x.cast("double") - lo) * b / (hi - lo)).cast("int")))
    struct(
      first(lit(lo)).as("lo"), first(lit(hi)).as("hi"),
      array((0 until b).map(i =>
        sum(when(x.isNotNull && (bkt === i), 1L).otherwise(0L))): _*).as("c"))
  }

  /** Aggregate: merge sketches (element-wise count add; binning carried from
    * the first sketch — merging differently-binned sketches is undefined,
    * like Kusto). The collect is bounded by the number of input GROUPS, not
    * rows — sketches arrive pre-reduced. */
  def tdigestMerge(td: Column): Column = {
    val cl = collect_list(td)
    val h = element_at(cl, 1)
    struct(
      h.getField("lo").as("lo"), h.getField("hi").as("hi"),
      aggregate(slice(cl, lit(2), greatest(size(cl) - 1, lit(0))),
        h.getField("c"),
        (acc, s) => zip_with(acc, s.getField("c"), _ + _)).as("c"))
  }

  /** Scalar: percentile estimate from a sketch — the lower bound of the
    * first bucket whose cumulative count reaches ceil(p% of the total).
    * All-integer target arithmetic ((n*p + 99) div 100), so the chosen
    * bucket is exact; only the final lo + idx*(hi-lo)/b maps to double. */
  def percentileTdigest(td: Column, p: Long): Column = {
    require(p >= 0 && p <= 100, "percentile_tdigest: p in [0,100]")
    val c = td.getField("c")
    val total = aggregate(c, lit(0L), _ + _)
    val target = (total * p + 99L) / 100L
    // bind the target as a lambda variable — expressions referenced inside a
    // HOF lambda re-evaluate per element (the SeriesFunctions.bound lesson)
    element_at(transform(array(target), t =>
      aggregate(c,
        struct(lit(0L).as("cum"), lit(null).cast("int").as("idx"), lit(0).as("i")),
        (st, cnt) => struct(
          (st.getField("cum") + cnt).as("cum"),
          when(st.getField("idx").isNotNull, st.getField("idx"))
            .otherwise(when(st.getField("cum") + cnt >= t, st.getField("i")))
            .as("idx"),
          (st.getField("i") + 1).as("i")),
        st => td.getField("lo") +
          coalesce(st.getField("idx"), size(c) - 1).cast("double") *
            (td.getField("hi") - td.getField("lo")) / size(c))), 1)
  }

  /** Scalar: rank of `v` in the sketch as a percentage [0,100] — the share of
    * values in buckets at or below v's bucket. Exact (not approximate) when
    * the data is integral and the buckets unit-width, so the oracle can
    * restate it as `100.0 * count(x <= v) / count(*)`. */
  def rankTdigest(td: Column, v: Column): Column = cumPct(td, v, inclusive = true)

  /** Scalar: percentage of values strictly below v's bucket (the Kusto
    * percentrank_tdigest counterpart; same exactness contract as rank). */
  def percentrankTdigest(td: Column, v: Column): Column = cumPct(td, v, inclusive = false)

  private def cumPct(td: Column, v: Column, inclusive: Boolean): Column = {
    val c = td.getField("c")
    val lo = td.getField("lo"); val hi = td.getField("hi")
    val b = size(c)
    val bkt = greatest(lit(0), least(b - 1,
      floor((v.cast("double") - lo) * b / (hi - lo)).cast("int")))
    val total = aggregate(c, lit(0L), _ + _)
    // bind the bucket index as a lambda variable (the HOF re-evaluation rule)
    element_at(transform(array(bkt), k =>
      aggregate(c, struct(lit(0L).as("cum"), lit(0).as("i")),
        (st, cnt) => struct(
          (st.getField("cum") +
            when(if (inclusive) st.getField("i") <= k else st.getField("i") < k, cnt)
              .otherwise(lit(0L))).as("cum"),
          (st.getField("i") + 1).as("i")),
        // 100.0 * long is an exact integral double; one correctly-rounded
        // division — replayable bit-for-bit by the oracle
        st => (lit(100.0) * st.getField("cum")) / total)), 1)
  }

  /** Typed partial state for the exact weighted percentile: the group's
    * (x, w) pairs in growable PRIMITIVE arrays, concatenated on merge. Same
    * O(1)-plan-size posture as the sketch aggregates; unlike them this one
    * is exact and therefore holds the whole group — the documented
    * collect-per-group bound of the weighted-percentile surface (for
    * billion-row groups pre-aggregate per distinct x first). */
  final case class WpPairs(var xs: Array[Double], var ws: Array[Long], var n: Int)

  /** Exact weighted percentiles, ALL requested ps from ONE buffer: smallest
    * x whose cumulative weight, in x-ascending order, reaches p·Σw — the
    * same inverse-CDF definition and the same IEEE arithmetic
    * (cum.toDouble >= Σw.toDouble · p) as the previous HOF formulation, so
    * results are bit-identical. Replaces per-percentile
    * collect_list + sort_array + interpreted per-element fold (measured
    * ~0.6 s of one-core Catalyst eval on a 100k-row fixture) with one
    * primitive-array buffer, one JVM sort and one cumulative pass. Rows
    * with null x or null w are skipped (Kusto: nulls are ignored and
    * weights are positive integers). */
  final class WeightedPercentilesAgg(ps: Array[Double])
      extends Aggregator[(java.lang.Double, java.lang.Long), WpPairs, Seq[Option[Double]]] {
    def zero: WpPairs = WpPairs(new Array[Double](8), new Array[Long](8), 0)
    def reduce(b: WpPairs, in: (java.lang.Double, java.lang.Long)): WpPairs = {
      if (in != null && in._1 != null && in._2 != null) {
        if (b.n == b.xs.length) {
          b.xs = java.util.Arrays.copyOf(b.xs, b.n * 2)
          b.ws = java.util.Arrays.copyOf(b.ws, b.n * 2)
        }
        b.xs(b.n) = in._1; b.ws(b.n) = in._2; b.n += 1
      }
      b
    }
    def merge(a: WpPairs, b: WpPairs): WpPairs = {
      val xs = new Array[Double](a.n + b.n); val ws = new Array[Long](a.n + b.n)
      System.arraycopy(a.xs, 0, xs, 0, a.n); System.arraycopy(b.xs, 0, xs, a.n, b.n)
      System.arraycopy(a.ws, 0, ws, 0, a.n); System.arraycopy(b.ws, 0, ws, a.n, b.n)
      WpPairs(xs, ws, a.n + b.n)
    }
    def finish(b: WpPairs): Seq[Option[Double]] = {
      if (b.n == 0) return ps.map(_ => Option.empty[Double]).toIndexedSeq
      val idx = Array.range(0, b.n).map(Integer.valueOf)
      java.util.Arrays.sort(idx, (i: Integer, j: Integer) =>
        java.lang.Double.compare(b.xs(i), b.xs(j)))
      var total = 0L
      var i = 0; while (i < b.n) { total += b.ws(i); i += 1 }
      ps.toIndexedSeq.map { p =>
        val target = total.toDouble * p
        var cum = 0L; var k = 0; var res = Option.empty[Double]
        while (k < b.n && res.isEmpty) {
          cum += b.ws(idx(k))
          if (cum.toDouble >= target) res = Some(b.xs(idx(k)))
          k += 1
        }
        res
      }
    }
    def bufferEncoder: Encoder[WpPairs] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Option[Double]]] = ExpressionEncoder()
  }

  /** Aggregate: exact weighted percentiles of `x` with integral weights
    * `w`, returned as array<double> aligned with `ps` (fractions in [0,1]).
    * Callers wanting several percentiles of one (x, w) MUST make one call —
    * the group's pairs are then buffered and sorted once. */
  def weightedPercentiles(x: Column, w: Column, ps: Seq[Double]): Column = {
    require(ps.nonEmpty, "weightedPercentiles: need at least one percentile")
    udaf(new WeightedPercentilesAgg(ps.toArray),
      ExpressionEncoder[(java.lang.Double, java.lang.Long)]())
      .apply(x.cast("double"), w.cast("long"))
  }
}
