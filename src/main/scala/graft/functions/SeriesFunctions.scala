package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KQL series_* function family over packed series arrays (the dynamic-array
  * representation KQL's make-series emits; our row-oriented makeSeries output
  * packs into one with sort_array(collect_list(...))).
  *
  * All of these are Catalyst higher-order functions evaluated inside codegen —
  * one pass over the array per element for the O(n) ones, O(n·w) for the FIR
  * convolution with a w-tap filter. They are scalar per-row functions: a table
  * of a billion series applies them with zero shuffles.
  *
  * Determinism: accumulating sums left-to-right in doubles is exact while the
  * inputs are integral (counts) and totals stay below 2^53; variance uses the
  * textbook (Σx² − (Σx)²/n)/(n−1) with the exact same expression shape as the
  * DuckDB oracles so both engines execute identical IEEE op sequences.
  */
object SeriesFunctions {

  private def dsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (a, x) => a + x.cast("double"))

  /** Let-binding for Catalyst expressions: evaluate `v` ONCE and reference it
    * many times via a lambda variable (single-element transform). Catalyst has
    * no common-subexpression elimination across HOF lambda bodies — an
    * expression referenced inside a per-element lambda is RE-EVALUATED PER
    * ELEMENT, so composing series functions without binding turns O(n·p)
    * pipelines into O(n²·p²) ones (measured: 56s → sub-second on the
    * decompose-anomalies driver query). */
  private def bound(v: Column)(f: Column => Column): Column =
    element_at(transform(array(v), f), 1)

  /** KQL `series_sum`: Σ arrᵢ as a double (left-to-right fold — exact while
    * the elements are integral and the total stays below 2^53). */
  def seriesSum(arr: Column): Column = dsum(arr)

  /** KQL `series_product`: Π arrᵢ as a double. */
  def seriesProduct(arr: Column): Column =
    aggregate(arr, lit(1.0), (a, x) => a * x.cast("double"))

  /** KQL `series_dot_product`: Σ aᵢ·bᵢ — one zip_with + fold, zero-shuffle. */
  def seriesDotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** KQL `series_magnitude`: √Σ aᵢ². */
  def seriesMagnitude(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** KQL `series_cosine_similarity`: dot/(‖a‖·‖b‖) — the exact expression
    * shape `Σab / (√Σa² · √Σb²)` so the oracle replays the same IEEE ops. */
  def seriesCosine(a: Column, b: Column): Column =
    seriesDotProduct(a, b) / (seriesMagnitude(a) * seriesMagnitude(b))

  /** KQL `series_iir(arr, b, a)`: recursive (infinite-impulse-response)
    * filter — y[i] = (Σⱼ b[j]·x[i−j] − Σₖ₌₁ a[k]·y[i−k]) / a[0], out-of-range
    * terms dropped. One sequential fold per row (state = the y prefix);
    * O(n·taps) work, zero shuffles. With dyadic-rational taps (0.5, 0.25…)
    * over integral series every output is an exact double, so the oracle's
    * recursive CTE reproduces it bit-for-bit regardless of op order. */
  def seriesIir(arr: Column, b: Seq[Double], a: Seq[Double]): Column = {
    require(a.nonEmpty && a.head != 0.0, "series_iir: a[0] must be non-zero")
    bound(arr) { x =>
      aggregate(x, array().cast("array<double>"), (ys, _) => {
        val i = size(ys) // 0-based index of the output being produced
        val acc = b.zipWithIndex.foldLeft(lit(0.0)) { case (s, (bj, j)) =>
          s + when(i >= j, element_at(x, i - j + 1).cast("double") * bj)
            .otherwise(lit(0.0))
        }
        val sub = a.zipWithIndex.drop(1).foldLeft(lit(0.0)) { case (s, (ak, k)) =>
          s + when(i >= k, element_at(ys, i - k + 1) * ak).otherwise(lit(0.0))
        }
        concat(ys, array((acc - sub) / a.head))
      })
    }
  }

  /** KQL `series_stats_dynamic`: struct(min, min_idx, max, max_idx, avg,
    * variance, stdev); idx fields are the 0-based FIRST position (KQL
    * semantics). Null-free input expected (make-series fills first). */
  def seriesStats(arr: Column): Column = {
    val n = size(arr).cast("double")
    val sum = dsum(arr)
    val sumsq = aggregate(arr, lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double"))
    val variance = (sumsq - sum * sum / n) / (n - lit(1.0))
    val stats = struct(
      array_min(arr).as("min"),
      (array_position(arr, array_min(arr)) - 1).as("min_idx"),
      array_max(arr).as("max"),
      (array_position(arr, array_max(arr)) - 1).as("max_idx"),
      (sum / n).as("avg"),
      variance.as("variance"),
      sqrt(variance).as("stdev"))
    // empty/null input → null struct (ANSI: array_position(arr, null) throws)
    when(coalesce(size(arr), lit(0)) > 0, stats)
  }

  /** Trailing moving sum with partial head windows: out[i] = Σ arr[i-w+1..i]. */
  def seriesMovingSum(arr: Column, w: Int): Column =
    transform(arr, (_, i) =>
      aggregate(slice(arr, greatest(i - w + 2, lit(1)), least(i + 1, lit(w))),
        lit(0.0), (a, x) => a + x.cast("double")))

  /** Trailing moving average; partial head windows divide by their true size. */
  def seriesMovingAvg(arr: Column, w: Int): Column = seriesMovingAvg(arr, lit(w))

  /** Column-window form (same arithmetic: exact sum, one IEEE division) so the
    * window can come from per-row period detection (`series_decompose(x, -1)`). */
  def seriesMovingAvg(arr: Column, w: Column): Column =
    transform(arr, (_, i) =>
      aggregate(slice(arr, greatest(i - w + 2, lit(1)), least(i + 1, w)),
        lit(0.0), (a, x) => a + x.cast("double")) / least(i + 1, w))

  /** KQL `series_fir` (trailing form): y[i] = Σ_j coef[j]·x[i−j], with partial
    * head windows (terms before the series start are dropped). `normalize`
    * divides the coefficients by their sum (Kusto's default for all-positive
    * filters, turning a ones-filter into a moving average). */
  def seriesFir(arr: Column, coefs: Seq[Double], normalize: Boolean = false): Column = {
    val s = coefs.sum
    val cs = if (normalize) coefs.map(_ / s) else coefs
    val coefArr = array(cs.map(lit): _*)
    transform(arr, (_, i) =>
      aggregate(sequence(lit(0), least(lit(cs.size - 1), i)), lit(0.0),
        (a, j) => a + element_at(coefArr, j + 1) *
          element_at(arr, i - j + 1).cast("double")))
  }

  /** KQL `series_decompose(series, period)` → struct of four same-length
    * arrays (baseline, seasonal, trend, residual). Deterministic contract
    * (documented deviations from Kusto's least-squares/auto-period variant —
    * the decomposition SHAPE matches, the smoother is simpler and exactly
    * oracle-replayable):
    *   - `period = -1` auto-detects via [[seriesAutoPeriod]] (top ACF lag,
    *     Kusto's 0.7 seasonality cutoff, fallback period 1);
    *   - trend    = trailing moving average over `period` taps (partial head
    *                windows divide by their true size) — integral inputs sum
    *                exactly in doubles, then one IEEE division;
    *   - seasonal = per-phase LOWER MEDIAN of the detrended series
    *                (sorted[ceil(n/2)], 1-based — the same index-based
    *                quantile contract as seriesOutliers);
    *   - baseline = trend + seasonal; residual = x − baseline (exact same
    *                association replayed by the SQL oracle).
    * All four components are Catalyst HOFs — zero shuffles, O(n·p) per row.
    * A phase with no occupants (series shorter than the period) yields null
    * seasonal/baseline/residual entries rather than erroring. */
  def seriesDecompose(arr: Column, period: Int): Column = {
    require(period == -1 || period > 0,
      s"series_decompose period must be positive or -1 (auto), got $period")
    if (period == -1) seriesDecomposeAuto(arr) else seriesDecompose(arr, lit(period))
  }

  /** Column-period form of [[seriesDecompose]] — identical arithmetic with the
    * period supplied per row (used by the `-1` auto-period path). */
  def seriesDecompose(arr: Column, periodCol: Column): Column = {
    // every intermediate is bound exactly once (see `bound`) — the chain is
    // O(n·p) end to end instead of re-deriving the whole prefix per element
    bound(arr) { x =>
    bound(periodCol.cast("int")) { p =>
    bound(seriesMovingAvg(x, p)) { t =>
    bound(zip_with(x, t, (a, b) => a.cast("double") - b)) { d =>
    // p-entry lookup table: phase → lower median of detrended[i] with i≡phase
    bound(transform(sequence(lit(0), p - 1), q => {
      val ph = array_sort(filter(d, (_, i) => pmod(i, p) === q))
      try_element_at(ph, greatest(ceil(size(ph) * 0.5), lit(1)).cast("int"))
    })) { pm =>
    bound(transform(x, (_, i) => element_at(pm, pmod(i, p) + 1))) { se =>
    bound(zip_with(t, se, (a, b) => a + b)) { b =>
      struct(b.as("baseline"), se.as("seasonal"), t.as("trend"),
        zip_with(x, b, (xx, bb) => xx.cast("double") - bb).as("residual"))
    }}}}}}}
  }

  /** Auto-period detection for the KQL `-1` period argument: the lag in
    * [2, min(⌊n/2⌋, 365)] with the highest lag-L Pearson autocorrelation (the
    * exact scoring chain of [[seriesPeriodsDetect]]; ties → smaller lag). A
    * top score below `threshold` (Kusto's documented 0.7 seasonality cutoff)
    * means "no seasonality detected" and falls back to period 1, which
    * degenerates the decomposition to baseline = x (trend window 1, zero
    * seasonal medians, zero residual) — deterministic and oracle-replayable.
    * Integral inputs keep every ACF sum exact, so the score ranking is
    * bit-identical across engines. O(n·⌊n/2⌋) HOFs per row, zero shuffles. */
  def seriesAutoPeriod(arr: Column, threshold: Double = 0.7): Column =
    bound(arr) { a =>
      val n = size(a)
      bound(transform(sequence(lit(2), greatest(lit(2),
          least(floor(n / 2).cast("int"), lit(365)))), l => {
        val m = greatest(n - l, lit(0))
        val x = slice(a, lit(1), m)
        val y = slice(a, l + 1, m)
        val md = m.cast("double")
        val sa = dsum(x)
        val sb = dsum(y)
        val sab = aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
        val saa = aggregate(x, lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))
        val sbb = aggregate(y, lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))
        val den = sqrt(md * saa - sa * sa) * sqrt(md * sbb - sb * sb)
        val score = when(m < 2 || den === 0, lit(0.0))
          .otherwise((md * sab - sa * sb) / den)
        struct(l.as("period"), score.as("score"))
      })) { cands =>
        bound(element_at(array_sort(cands, (p, q) =>
          when(p.getField("score") > q.getField("score"), -1)
            .when(p.getField("score") < q.getField("score"), 1)
            .otherwise(p.getField("period") - q.getField("period"))), 1)) { top =>
          when(top.isNotNull && top.getField("score") >= threshold,
            top.getField("period").cast("int")).otherwise(lit(1))
        }
      }
    }

  /** KQL `series_decompose(x, -1)` / `series_decompose(x)`: decomposition with
    * the period auto-detected per row by [[seriesAutoPeriod]]. */
  def seriesDecomposeAuto(arr: Column): Column =
    bound(arr) { x => seriesDecompose(x, seriesAutoPeriod(x)) }

  /** KQL `series_decompose_forecast(series, points)` → baseline array of
    * length n+points: a linear trend (the seriesFitLine closed form — exact
    * integer sums, single IEEE divisions) extrapolated past the series end,
    * plus the per-phase LOWER-MEDIAN seasonal of the linearly-detrended
    * series repeated cyclically into the forecast horizon. Deviation
    * (documented): Kusto's forecast reuses its STL-style decomposition; this
    * engine uses the deterministic linear-trend + phase-median contract
    * shared with seriesDecompose/seriesFitLine, so every element is a
    * fixed-order IEEE chain over exact integer inputs that a SQL oracle
    * replays bit-for-bit. Zero shuffles, O(n·p) per row inside codegen. */
  def seriesDecomposeForecast(arr: Column, points: Int, period: Int): Column = {
    require(period == -1 || period > 0,
      s"series_decompose_forecast period must be positive or -1 (auto), got $period")
    require(points >= 0, s"series_decompose_forecast points must be >= 0, got $points")
    if (period == -1)
      bound(arr) { x => seriesDecomposeForecast(x, points, seriesAutoPeriod(x)) }
    else seriesDecomposeForecast(arr, points, lit(period))
  }

  /** Column-period form of [[seriesDecomposeForecast]] (auto-period path). */
  def seriesDecomposeForecast(arr: Column, points: Int, periodCol: Column): Column = {
    bound(arr) { x =>
    bound(periodCol.cast("int")) { p =>
    bound(seriesFitLine(x)) { fit =>
    bound(struct(fit.getField("slope").as("m"), fit.getField("intercept").as("b"))) { mb =>
    val slope = mb.getField("m")
    val intercept = mb.getField("b")
    // linear detrend with the exact association the oracle replays:
    // d[i] = x[i] − (slope·i + intercept)
    bound(transform(x, (v, i) =>
      v.cast("double") - (slope * i.cast("double") + intercept))) { d =>
    // p-entry phase table: lower median of detrended values at i ≡ phase
    bound(transform(sequence(lit(0), p - 1), q => {
      val ph = array_sort(filter(d, (_, i) => pmod(i, p) === q))
      try_element_at(ph, greatest(ceil(size(ph) * 0.5), lit(1)).cast("int"))
    })) { pm =>
      transform(sequence(lit(0), size(x) + lit(points) - 1),
        i => (slope * i.cast("double") + intercept) + element_at(pm, pmod(i, p) + 1))
    }}}}}}
  }

  /** KQL `series_fit_line(series)` → struct(slope, intercept, rsquare,
    * variance, line_fit): closed-form least squares against x = 0..n−1.
    * Σx and Σx² use the exact closed forms n(n−1)/2 and n(n−1)(2n−1)/6; Σy
    * and Σxy accumulate left-to-right (exact for integral series below
    * 2^53), then slope/intercept are single IEEE divisions — the oracle
    * replays the identical operand order. rsquare/variance fold residual
    * squares in series order (deterministic; matched by a list-ordered
    * oracle fold where used). */
  def seriesFitLine(arr: Column): Column =
    bound(arr) { a =>
      val n = size(a).cast("double")
      val sx = n * (n - 1) / 2
      val sxx = n * (n - 1) * (n * 2 - 1) / 6
      val sy = dsum(a)
      val sxy = aggregate(transform(a, (x, i) => i.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      bound(struct(
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).as("slope"))) { s0 =>
        val slope = s0.getField("slope")
        bound(struct(((sy - slope * sx) / n).as("intercept"))) { s1 =>
          val intercept = s1.getField("intercept")
          val mean = sy / n
          val ssTot = aggregate(a, lit(0.0),
            (acc, y) => acc + (y.cast("double") - mean) * (y.cast("double") - mean))
          val ssRes = aggregate(
            transform(a, (y, i) =>
              y.cast("double") - (slope * i.cast("double") + intercept)),
            lit(0.0), (acc, r) => acc + r * r)
          struct(slope.as("slope"), intercept.as("intercept"),
            when(ssTot === 0, lit(1.0)).otherwise(lit(1.0) - ssRes / ssTot).as("rsquare"),
            (ssRes / n).as("variance"),
            transform(a, (_, i) => slope * i.cast("double") + intercept).as("line_fit"))
        }
      }
    }

  /** KQL `series_fit_poly(series[, degree])`, degree 1 or 2, x = 0..n−1 →
    * coefficient array HIGHEST degree first ([a2, a1, a0] / [a1, a0]).
    * Least squares solved in closed form: Cramer's rule over the 3×3 normal
    * matrix of power sums S₀..S₄ (closed-form polynomials in n, all exactly
    * divisible before their single division) and moments T₀..T₂ (one fold).
    * With integral-valued inputs every determinant term is an exact integral
    * double, so the three final divisions are the ONLY rounding steps — the
    * SQL oracle replays the same formulas and hash-matches. Deviation
    * (documented): Kusto supports arbitrary degree and custom x; this engine
    * bounds degree at 2 (the common trend shapes) and fixes the unit grid. */
  def seriesFitPoly(arr: Column, degree: Int = 1): Column = {
    require(degree == 1 || degree == 2,
      s"series_fit_poly: degree must be 1 or 2, got $degree")
    if (degree == 1) bound(seriesFitLine(arr)) { f =>
      array(f.getField("slope"), f.getField("intercept"))
    } else bound(arr) { x =>
      val n = size(x).cast("double")
      val s1 = n * (n - 1) / 2
      val s2 = n * (n - 1) * (n * 2 - 1) / 6
      val s3 = s1 * s1
      val s4 = n * (n - 1) * (n * 2 - 1) * (n * n * 3 - n * 3 - 1) / 30
      bound(aggregate(x,
        struct(lit(0.0).as("t0"), lit(0.0).as("t1"),
          lit(0.0).as("t2"), lit(0.0).as("i")),
        (st, v) => struct(
          (st.getField("t0") + v.cast("double")).as("t0"),
          (st.getField("t1") + st.getField("i") * v.cast("double")).as("t1"),
          (st.getField("t2") + st.getField("i") * st.getField("i") * v.cast("double")).as("t2"),
          (st.getField("i") + 1).as("i")))) { m =>
        val t0 = m.getField("t0"); val t1 = m.getField("t1"); val t2 = m.getField("t2")
        val det = n * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2) +
          s2 * (s1 * s3 - s2 * s2)
        val det0 = t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - s3 * t2) +
          s2 * (t1 * s3 - s2 * t2)
        val det1 = n * (t1 * s4 - s3 * t2) - t0 * (s1 * s4 - s3 * s2) +
          s2 * (s1 * t2 - t1 * s2)
        val det2 = n * (s2 * t2 - t1 * s3) - s1 * (s1 * t2 - t1 * s2) +
          t0 * (s1 * s3 - s2 * s2)
        array(det2 / det, det1 / det, det0 / det)
      }
    }
  }

  /** KQL `series_fit_2lines(series)`: the single split k (1 ≤ k < n) that
    * minimizes the summed residual sum-of-squares of independent least-squares
    * lines over [0,k) and [k,n) → struct(split_idx, rsquare, variance,
    * rvariance, left/right slope+intercept). O(n²) HOF arithmetic per series —
    * n is the series grid length (a query constant set by time-range/step),
    * so cost is independent of corpus size and the whole thing runs inside
    * codegen with zero shuffles. Segment fits use LOCAL x = 0..m−1 (RSS is
    * translation-invariant; right-segment intercept is relative to the split
    * — documented deviation from Kusto's packed line_fit output). Σy, Σxy,
    * Σy² are exact for integral series; every downstream op is a fixed-order
    * IEEE chain the oracle replays verbatim, so even rsquare/rvariance
    * driver-compare exactly. Ties in rss pick the smallest k on both sides. */
  def seriesFit2Lines(arr: Column): Column = bound(arr) { a =>
    // per-segment least-squares stats on local x; m≤1 → degenerate fit
    def fit(seg: Column): Column = bound(seg) { s =>
      val m = size(s).cast("double")
      val sy = dsum(s)
      val sxy = aggregate(transform(s, (v, i) => i.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val syy = aggregate(s, lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double"))
      val sx = m * (m - 1) / 2
      val sxx = m * (m - 1) * (m * 2 - 1) / 6
      // ANSI: the m==1 denominator is 0 — keep the division in the untaken
      // CaseWhen branch (the m<=1 outputs below never read this slope)
      val denom = m * sxx - sx * sx
      bound(struct(when(denom === 0, lit(0.0))
            .otherwise((m * sxy - sx * sy) / denom).as("slope"),
          sy.as("sy"), sxy.as("sxy"), syy.as("syy"), m.as("m"), sx.as("sx"))) { b0 =>
        val slope = b0.getField("slope")
        bound(struct(((b0.getField("sy") - slope * b0.getField("sx")) /
            b0.getField("m")).as("intercept"))) { b1 =>
          val intercept = b1.getField("intercept")
          val m_ = b0.getField("m")
          struct(
            when(m_ <= 1, lit(0.0)).otherwise(slope).as("slope"),
            when(m_ <= 1, b0.getField("sy")).otherwise(intercept).as("intercept"),
            when(m_ <= 1, lit(0.0))
              .otherwise((b0.getField("syy") - intercept * b0.getField("sy")) -
                slope * b0.getField("sxy")).as("rss"))
        }
      }
    }
    val n = size(a)
    val cands = transform(sequence(lit(1), n - 1), k =>
      bound(struct(fit(slice(a, lit(1), k)).getField("rss").as("rl"),
          fit(slice(a, k + 1, n - k)).getField("rss").as("rr"))) { lr =>
        struct(k.as("k"), (lr.getField("rl") + lr.getField("rr")).as("rss"))
      })
    val best = aggregate(slice(cands, lit(2), greatest(n - 2, lit(0))),
      element_at(cands, 1),
      (acc, c) => when(c.getField("rss") < acc.getField("rss"), c).otherwise(acc))
    val out = bound(best) { b =>
      val k = b.getField("k")
      bound(struct(fit(slice(a, lit(1), k)).as("l"),
          fit(slice(a, k + 1, n - k)).as("r"))) { lr =>
        val nD = n.cast("double")
        val sy = dsum(a)
        val syy = aggregate(a, lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))
        bound(struct((syy - (sy * sy) / nD).as("sstot"))) { t =>
          val ssTot = t.getField("sstot")
          val rss = b.getField("rss")
          struct(
            k.cast("long").as("split_idx"),
            when(ssTot === 0, lit(1.0)).otherwise(lit(1.0) - rss / ssTot).as("rsquare"),
            (ssTot / nD).as("variance"),
            (rss / nD).as("rvariance"),
            lr.getField("l").getField("slope").as("left_slope"),
            lr.getField("l").getField("intercept").as("left_intercept"),
            lr.getField("r").getField("slope").as("right_slope"),
            lr.getField("r").getField("intercept").as("right_intercept"))
        }
      }
    }
    when(coalesce(size(arr), lit(0)) >= 2, out)
  }

  /** KQL `series_seasonal(series, period)`: per-phase mean repeated across
    * the series — seasonal[i] = mean{ series[j] : j ≡ i (mod period) }.
    * O(n·p) HOF arithmetic, zero shuffles; sums fold left-to-right (exact
    * for integral inputs). Deviation (documented): Kusto's period=-1
    * auto-detection is served by series_periods_detect — here the period is
    * explicit. */
  def seriesSeasonal(arr: Column, period: Int): Column = bound(arr) { a =>
    bound(transform(sequence(lit(0), lit(period - 1)), ph => {
      val s = aggregate(transform(a, (v, i) =>
        when(i % period === ph, v.cast("double")).otherwise(lit(0.0))),
        lit(0.0), (acc, v) => acc + v)
      val c = aggregate(transform(a, (_, i) =>
        when(i % period === ph, lit(1.0)).otherwise(lit(0.0))),
        lit(0.0), (acc, v) => acc + v)
      when(c === 0, lit(0.0)).otherwise(s / c)
    })) { phases =>
      transform(a, (_, i) => element_at(phases, (i % period) + 1))
    }
  }

  /** KQL `series_fill_const(series, value)`: nulls → the constant. */
  def seriesFillConst(arr: Column, value: Column): Column =
    transform(arr, x => coalesce(x, value))

  /** KQL `series_fill_forward`: each null takes the nearest preceding
    * non-null value (leading nulls stay null). O(n) fold building the
    * output array left-to-right with O(1) carried state. */
  def seriesFillForward(arr: Column): Column =
    bound(arr) { a =>
      aggregate(a,
        struct(array().cast("array<double>").as("out"),
          lit(null).cast("double").as("carry")),
        (acc, x) => {
          val v = coalesce(x.cast("double"), acc.getField("carry"))
          struct(concat(acc.getField("out"), array(v)).as("out"), v.as("carry"))
        },
        acc => acc.getField("out"))
    }

  /** KQL `series_fill_backward`: nearest FOLLOWING non-null (trailing nulls
    * stay null) — the forward fill over the reversed series, reversed back. */
  def seriesFillBackward(arr: Column): Column =
    reverse(seriesFillForward(reverse(arr)))

  /** Forward fill carrying (value, index) pairs — the anchor array for
    * linear interpolation. O(n) fold, O(1) carried state. */
  private def fillAnchors(x: Column): Column =
    aggregate(
      zip_with(x, sequence(lit(0), size(x) - 1), (v, i) =>
        when(v.isNotNull, struct(v.cast("double").as("v"), i.as("i")))),
      struct(array().cast("array<struct<v:double,i:int>>").as("out"),
        lit(null).cast("struct<v:double,i:int>").as("carry")),
      (acc, p) => {
        val cur = coalesce(p, acc.getField("carry"))
        struct(concat(acc.getField("out"), array(cur)).as("out"), cur.as("carry"))
      },
      acc => acc.getField("out"))

  /** KQL `series_fill_linear`: null runs interpolate linearly between the
    * nearest non-null neighbors over the INDEX axis (the Kusto contract);
    * leading/trailing runs take the nearest non-null (constant edges, the
    * Kusto default). Two O(n) anchor folds + one O(n) transform. */
  def seriesFillLinear(arr: Column): Column = bound(arr) { a =>
    val n = size(a)
    val fwd = fillAnchors(a)
    val bwd = reverse(fillAnchors(reverse(a)))
    zip_with(zip_with(a, fwd, (x, p) => struct(x.cast("double").as("x"), p.as("p"))),
      zip_with(bwd, sequence(lit(0), n - 1), (q, i) => struct(q.as("q"), i.as("i"))),
      (l, r) => {
        val x = l.getField("x"); val p = l.getField("p")
        val q = r.getField("q"); val i = r.getField("i").cast("double")
        val pv = p.getField("v"); val pi = p.getField("i").cast("double")
        val qv = q.getField("v")
        // the reversed-frame anchor index maps back to n-1-i
        val qi = (n - 1).cast("double") - q.getField("i").cast("double")
        when(x.isNotNull, x)
          .when(p.isNull, qv)  // leading run → next value
          .when(q.isNull, pv)  // trailing run → previous value
          .otherwise(pv + (qv - pv) * (i - pi) / (qi - pi))
      })
  }

  /** KQL `series_pearson_correlation(a, b)`: exact closed-form Pearson r.
    * All five sums accumulate left-to-right (exact for integral-valued
    * series below 2^53); the final expression is a fixed operand-order
    * IEEE chain the SQL oracle replays verbatim. */
  def seriesPearson(aIn: Column, bIn: Column): Column =
    bound(aIn) { a =>
      bound(bIn) { b =>
        val n = size(a).cast("double")
        val sa = dsum(a)
        val sb = dsum(b)
        val sab = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
        val saa = aggregate(a, lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
        val sbb = aggregate(b, lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
        (n * sab - sa * sb) /
          (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))
      }
    }

  /** The lag-L ACF score shared by series_periods_detect/validate:
    * struct(period, score) where score = Pearson r(x[0..n−L), x[L..n)),
    * degenerate lags (overlap < 2 or zero variance) → 0. */
  private def acfScore(a: Column, n: Column, l: Column): Column = {
    val m = greatest(n - l, lit(0))
    val x = slice(a, lit(1), m)
    val y = slice(a, l + 1, m)
    val md = m.cast("double")
    val sa = dsum(x)
    val sb = dsum(y)
    val sab = aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val saa = aggregate(x, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double"))
    val sbb = aggregate(y, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double"))
    val den = sqrt(md * saa - sa * sa) * sqrt(md * sbb - sb * sb)
    val score = when(m < 2 || den === 0, lit(0.0))
      .otherwise((md * sab - sa * sb) / den)
    struct(l.as("period"), score.as("score"))
  }

  /** KQL `series_periods_detect(series, min_period, max_period, num_periods)`
    * → struct(periods, scores): the `num_periods` candidate lags with the
    * highest lag-L Pearson autocorrelation r(x[0..n−L), x[L..n)), ties broken
    * by the smaller period. Deterministic contract (documented deviation:
    * Kusto scores via periodogram energy; this scores via the ACF — the same
    * "which periods repeat" answer with an exactly oracle-replayable
    * arithmetic chain): integral series sum exactly in doubles, the Pearson
    * chain is a fixed operand-order IEEE sequence, and degenerate lags
    * (overlap < 2 points or zero variance on either side) score 0 rather
    * than NaN. O(n · (max−min)) Catalyst HOFs per row — zero shuffles. */
  def seriesPeriodsDetect(arr: Column, minPeriod: Int, maxPeriod: Int,
      numPeriods: Int): Column = {
    require(0 < minPeriod && minPeriod <= maxPeriod,
      s"series_periods_detect needs 0 < min <= max, got $minPeriod..$maxPeriod")
    bound(arr) { a =>
      val n = size(a)
      bound(transform(sequence(lit(minPeriod), lit(maxPeriod)),
        l => acfScore(a, n, l))) { cands =>
        bound(slice(array_sort(cands, (p, q) =>
          when(p.getField("score") > q.getField("score"), -1)
            .when(p.getField("score") < q.getField("score"), 1)
            .otherwise(p.getField("period") - q.getField("period"))),
          1, numPeriods)) { top =>
          struct(transform(top, _.getField("period")).as("periods"),
            transform(top, _.getField("score")).as("scores"))
        }
      }
    }
  }

  /** KQL `series_periods_validate(series, p1, p2, ...)` → struct(periods,
    * scores): the SAME lag-L ACF score as series_periods_detect, but for the
    * caller's candidate periods IN THE GIVEN ORDER (Kusto's contract —
    * validate scores what you ask, detect searches). Same deterministic
    * arithmetic chain, so the oracle replays it term-for-term. */
  def seriesPeriodsValidate(arr: Column, periods: Seq[Int]): Column = {
    require(periods.nonEmpty && periods.forall(_ > 0),
      "series_periods_validate needs at least one positive period")
    bound(arr) { a =>
      val n = size(a)
      bound(transform(array(periods.map(lit): _*),
        l => acfScore(a, n, l))) { scored =>
        struct(transform(scored, _.getField("period").cast("long")).as("periods"),
          transform(scored, _.getField("score")).as("scores"))
      }
    }
  }

  /** KQL `series_decompose_anomalies(series, period)`: Tukey-fence flags over
    * the decomposition residual — +1 high outlier, −1 low, 0 normal (the same
    * graded-score→sign contract as seriesOutliers). */
  def seriesDecomposeAnomalies(arr: Column, period: Int): Column =
    bound(seriesDecompose(arr, period).getField("residual"))(seriesOutliers)

  /** `series_decompose_anomalies(x, -1)` auto-period form. */
  def seriesDecomposeAnomalies(arr: Column, periodCol: Column): Column =
    bound(seriesDecompose(arr, periodCol).getField("residual"))(seriesOutliers)

  /** Tukey-fence outlier flags: +1 above q3+1.5·iqr, −1 below q1−1.5·iqr, else
    * 0 (KQL series_outliers returns graded scores; this emits the sign — the
    * deterministic contract both engines reproduce exactly). Quartiles are
    * index-based on the sorted series: q(p) = sorted[ceil(p·n)] (1-based). */
  def seriesOutliers(arr: Column): Column =
    bound(arr) { a =>
      bound(array_sort(a)) { sorted =>
        // try_element_at: an empty series must yield an empty flag array, not
        // an ANSI out-of-bounds error from the quartile probe
        def q(p: Double): Column =
          try_element_at(sorted,
            greatest(ceil(lit(p) * size(a)), lit(1)).cast("int")).cast("double")
        val q1 = q(0.25)
        val q3 = q(0.75)
        val iqr = q3 - q1
        // the fences are bound too: referenced per element by the flag lambda
        bound(struct((q3 + lit(1.5) * iqr).as("hi"),
                     (q1 - lit(1.5) * iqr).as("lo"))) { f =>
          transform(a, x =>
            when(x.cast("double") > f.getField("hi"), 1)
              .when(x.cast("double") < f.getField("lo"), -1).otherwise(0))
        }
      }
    }
}
