package graft.functions

import org.apache.spark.sql.Column
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
}
