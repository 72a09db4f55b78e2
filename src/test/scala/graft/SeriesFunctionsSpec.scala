package graft

import org.apache.spark.sql.functions._
import graft.functions.SeriesFunctions._
import graft.kql.KqlParser

class SeriesFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(Tuple1(Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0)))
    .toDF("s")

  test("series_stats: extremes, first-index, avg, variance") {
    val r = df.select(seriesStats($"s").as("st")).select("st.*")
      .as[(Double, Long, Double, Long, Double, Double, Double)].head()
    assert(r._1 == 1.0 && r._2 == 1L) // min 1 first at idx 1 (0-based)
    assert(r._3 == 9.0 && r._4 == 5L)
    assert(r._5 == 23.0 / 6)
    // var = (sumsq - sum^2/n)/(n-1); sum=23 sumsq=133
    assert(math.abs(r._6 - (133.0 - 23.0 * 23.0 / 6) / 5) < 1e-12)
    assert(math.abs(r._7 - math.sqrt(r._6)) < 1e-12)
  }

  test("moving sum/avg: trailing windows with partial heads") {
    val (ms, ma) = df.select(
        seriesMovingSum($"s", 3).as("ms"), seriesMovingAvg($"s", 3).as("ma"))
      .as[(Seq[Double], Seq[Double])].head() match { case (a, b) => (a, b) }
    assert(ms == Seq(3.0, 4.0, 8.0, 6.0, 10.0, 15.0))
    assert(ma == Seq(3.0, 2.0, 8.0 / 3, 2.0, 10.0 / 3, 5.0))
  }

  test("series_fir: convolution with literal taps; normalize = moving average") {
    val got = df.select(seriesFir($"s", Seq(1.0, 1.0, 1.0), normalize = true).as("f"))
      .as[Seq[Double]].head()
    // normalized ones-filter ≈ moving SUM / 3 (head windows also divide by 3:
    // dropped taps contribute zero, unlike seriesMovingAvg's true-size divisor;
    // tolerance: Σ x·(1/3) accumulates differently than (Σ x)/3)
    val want = Seq(1.0, 4.0 / 3, 8.0 / 3, 2.0, 10.0 / 3, 5.0)
    assert(got.size == want.size && got.zip(want).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    val weighted = df.select(seriesFir($"s", Seq(2.0, 0.0)).as("f"))
      .as[Seq[Double]].head()
    assert(weighted == Seq(6.0, 2.0, 8.0, 2.0, 10.0, 18.0))
  }

  test("series_outliers: tukey fence signs") {
    val flags = Seq(Tuple1(Seq(1.0, 2.0, 2.0, 3.0, 2.0, 2.0, 3.0, 100.0, -50.0)))
      .toDF("s").select(seriesOutliers($"s").as("o")).as[Seq[Int]].head()
    assert(flags == Seq(0, 0, 0, 0, 0, 0, 0, 1, -1))
  }

  test("empty series: stats null, outliers/moving/fir empty — never ANSI errors") {
    val e = Seq(Tuple1(Seq.empty[Double])).toDF("s")
    val r = e.select(
      seriesStats($"s").as("st"),
      seriesOutliers($"s").as("o"),
      seriesMovingSum($"s", 3).as("ms"),
      seriesFir($"s", Seq(1.0, 1.0)).as("f")).collect().head
    assert(r.isNullAt(0))
    assert(r.getSeq[Int](1).isEmpty && r.getSeq[Double](2).isEmpty &&
      r.getSeq[Double](3).isEmpty)
  }

  test("series_decompose: components reconstruct, seasonality captured, flags fire") {
    // two exact periods of a pure seasonal pattern riding a flat level
    val s = Seq(Tuple1(Seq(10.0, 20.0, 30.0, 10.0, 20.0, 30.0)))
      .toDF("s").select(seriesDecompose($"s", 3).as("d")).collect().head
      .getStruct(0)
    val Seq(baseline, seasonal, trend, residual) =
      (0 to 3).map(s.getSeq[Double](_))
    // identity: x == baseline + residual and baseline == trend + seasonal
    val x = Seq(10.0, 20.0, 30.0, 10.0, 20.0, 30.0)
    x.indices.foreach { i =>
      assert(math.abs(baseline(i) + residual(i) - x(i)) < 1e-12)
      assert(math.abs(trend(i) + seasonal(i) - baseline(i)) < 1e-12)
    }
    // phases repeat with period 3
    assert(seasonal(0) == seasonal(3) && seasonal(1) == seasonal(4) &&
      seasonal(2) == seasonal(5))
    // anomalies: a huge spike on an otherwise repeating pattern flags +1
    val flags = Seq(Tuple1(Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 10.0, 20.0,
        10.0, 500.0, 10.0, 20.0)))
      .toDF("s").select(seriesDecomposeAnomalies($"s", 2).as("f"))
      .as[Seq[Int]].head()
    assert(flags(9) == 1)
    assert(flags.count(_ != 0) <= 3, s"spike should dominate: $flags")
    // degenerate: series shorter than the period yields nulls, not errors
    val short = Seq(Tuple1(Seq(1.0, 2.0)))
      .toDF("s").select(seriesDecompose($"s", 5).as("d")).collect().head
    assert(short.getStruct(0).getSeq[Any](1).size == 2)
  }

  test("series_decompose auto-period (-1): detects the lag, falls back below cutoff") {
    // strong period-3 signal over 5 cycles → detector must return 3
    val periodic = Seq.fill(5)(Seq(10.0, 200.0, 30.0)).flatten
    val p = Seq(Tuple1(periodic)).toDF("s")
      .select(seriesAutoPeriod($"s").as("p")).as[Int].head()
    assert(p == 3, s"expected detected period 3, got $p")
    // -1 routes decompose through the detector: phases repeat with period 3
    val d = Seq(Tuple1(periodic)).toDF("s")
      .select(seriesDecompose($"s", -1).as("d")).collect().head.getStruct(0)
    val seasonal = d.getSeq[Double](1)
    assert(seasonal(0) == seasonal(3) && seasonal(1) == seasonal(4))
    // aperiodic ramp: every ACF lag < 0.7 is impossible (a ramp autocorrelates),
    // so use a short alternating+noise-free fallback case instead: constant
    // series has zero variance at every lag → score 0 → fallback period 1,
    // which degenerates to baseline = x, residual = 0
    val const = Seq(Tuple1(Seq(5.0, 5.0, 5.0, 5.0, 5.0, 5.0)))
      .toDF("s").select(seriesDecompose($"s", -1).as("d")).collect().head.getStruct(0)
    assert(const.getSeq[Double](3).forall(_ == 0.0)) // residual
    assert(const.getSeq[Double](0) == Seq.fill(6)(5.0)) // baseline = x
    // empty input survives (period 1 fallback, empty components)
    val empty = Seq(Tuple1(Seq.empty[Double])).toDF("s")
      .select(seriesDecompose($"s", -1).as("d")).collect().head.getStruct(0)
    assert(empty.getSeq[Any](0).isEmpty)
  }

  test("series_fit_line: exact fit, noisy fit, degenerate cases") {
    // perfectly linear series: slope/intercept exact, rsquare 1, variance 0
    val exact = Seq(Tuple1(Seq(3.0, 5.0, 7.0, 9.0, 11.0)))
      .toDF("s").select(seriesFitLine($"s").as("f")).collect().head.getStruct(0)
    assert(exact.getDouble(0) == 2.0 && exact.getDouble(1) == 3.0)
    assert(exact.getDouble(2) == 1.0 && exact.getDouble(3) == 0.0)
    assert(exact.getSeq[Double](4) == Seq(3.0, 5.0, 7.0, 9.0, 11.0))
    // noisy upward trend: positive slope, 0 < rsquare < 1
    val noisy = Seq(Tuple1(Seq(1.0, 3.0, 2.0, 5.0, 4.0, 7.0)))
      .toDF("s").select(seriesFitLine($"s").as("f")).collect().head.getStruct(0)
    assert(noisy.getDouble(0) > 0.5)
    assert(noisy.getDouble(2) > 0.5 && noisy.getDouble(2) < 1.0)
    // constant series: slope 0 and rsquare 1 by the ssTot==0 convention
    val const = Seq(Tuple1(Seq(4.0, 4.0, 4.0)))
      .toDF("s").select(seriesFitLine($"s").as("f")).collect().head.getStruct(0)
    assert(const.getDouble(0) == 0.0 && const.getDouble(1) == 4.0 &&
      const.getDouble(2) == 1.0)
    // parser wiring
    val viaKql = KqlParser.parse(
      "t | extend f = series_fit_line(pack_array(3.0, 5.0, 7.0)) | project sl = f.slope",
      _ => Seq(Tuple1(1)).toDF("id")).as[Double].collect().head
    assert(viaKql == 2.0)
  }

  test("series_pearson_correlation: self=1, negated=-1, independent≈0") {
    val df = Seq(Tuple1(Seq(1.0, 3.0, 2.0, 5.0, 4.0))).toDF("a")
    val self = df.select(seriesPearson($"a", $"a")).as[Double].collect().head
    assert(math.abs(self - 1.0) < 1e-12)
    val neg = df.select(seriesPearson($"a",
      transform($"a", x => -x))).as[Double].collect().head
    assert(math.abs(neg + 1.0) < 1e-12)
    // parser wiring
    val viaKql = KqlParser.parse(
      """t | extend r = series_pearson_correlation(
        |  pack_array(1.0, 2.0, 3.0), pack_array(2.0, 4.0, 6.0)) | project r""".stripMargin,
      _ => Seq(Tuple1(1)).toDF("id")).as[Double].collect().head
    assert(math.abs(viaKql - 1.0) < 1e-12)
  }

  test("series fill family: const, forward, backward") {
    val df = Seq(Tuple1(Seq[java.lang.Double](null, 1.0, null, null, 4.0, null)))
      .toDF("s")
    val const = df.select(seriesFillConst($"s", lit(0.0))).as[Seq[Double]].collect().head
    assert(const == Seq(0.0, 1.0, 0.0, 0.0, 4.0, 0.0))
    val fwd = df.select(seriesFillForward($"s")).collect().head.getSeq[Any](0)
    assert(fwd == Seq(null, 1.0, 1.0, 1.0, 4.0, 4.0))
    val bwd = df.select(seriesFillBackward($"s")).collect().head.getSeq[Any](0)
    assert(bwd == Seq(1.0, 1.0, 4.0, 4.0, 4.0, null))
    // empty input stays empty
    assert(Seq(Tuple1(Seq.empty[Double])).toDF("s")
      .select(seriesFillForward($"s")).as[Seq[Double]].collect().head.isEmpty)
  }

  test("series_periods_detect finds the planted period") {
    // period-4 signal with a small linear trend so lag 4 strictly beats lag 8
    val sig = (0 until 24).map(i => Seq(1.0, 9.0, 3.0, 5.0)(i % 4) + i * 0.01)
    val df = Seq(Tuple1(sig)).toDF("s")
    val row = df.select(seriesPeriodsDetect($"s", 2, 10, 3).as("pd"))
      .select($"pd.periods", $"pd.scores").collect().head
    val periods = row.getSeq[Int](0)
    val scores = row.getSeq[Double](1)
    assert(periods.head == 4, s"expected 4 first, got $periods")
    assert(periods.take(2).toSet == Set(4, 8))
    assert(scores.head > 0.999)
    // degenerate inputs: constant series scores 0 everywhere, never NaN
    val const = Seq(Tuple1(Seq.fill(12)(5.0))).toDF("s")
      .select(seriesPeriodsDetect($"s", 2, 4, 2).as("pd"))
      .select($"pd.scores").as[Seq[Double]].collect().head
    assert(const == Seq(0.0, 0.0))
    // series shorter than min lag: all lags degenerate, still no error
    val short = Seq(Tuple1(Seq(1.0, 2.0))).toDF("s")
      .select(seriesPeriodsDetect($"s", 5, 6, 1).as("pd"))
      .select($"pd.scores").as[Seq[Double]].collect().head
    assert(short == Seq(0.0))
  }

  test("parser surface: dynamic literal, pack_array, series fns, set ops") {
    val t = Seq((1, 7.0), (2, 1.0)).toDF("id", "v")
    val got = KqlParser.parse(
      """t
        || extend s = pack_array(v, 2.0, 3.0)
        || extend ms = series_moving_sum(s, 2),
        |    st = series_stats_dynamic(s),
        |    fir = series_fir(s, dynamic([1, 1]), false),
        |    u = set_union(pack_array(1, 2), dynamic([2, 3]))
        || project id, ms, avg_ = st.avg, fir, u
        || sort by id asc""".stripMargin, _ => t)
      .as[(Int, Seq[Double], Double, Seq[Double], Seq[Long])].collect().toSeq
    assert(got == Seq(
      (1, Seq(7.0, 9.0, 5.0), 4.0, Seq(7.0, 9.0, 5.0), Seq(1L, 2L, 3L)),
      (2, Seq(1.0, 3.0, 5.0), 2.0, Seq(1.0, 3.0, 5.0), Seq(1L, 2L, 3L))))
  }

  test("series_fit_poly: exact quadratic recovered; degree 1 matches fit_line") {
    import graft.functions.SeriesFunctions
    // y = 2x² + 3x + 1 on x = 0..5
    val ys = (0 to 5).map(x => 2.0 * x * x + 3 * x + 1)
    val df = Seq(Tuple1(ys)).toDF("sr")
      .select(SeriesFunctions.seriesFitPoly(col("sr"), 2).as("co"),
        SeriesFunctions.seriesFitPoly(col("sr"), 1).as("lin"),
        SeriesFunctions.seriesFitLine(col("sr")).as("fl"))
    val r = df.collect().head
    val co = r.getSeq[Double](0)
    assert(math.abs(co(0) - 2.0) < 1e-9 && math.abs(co(1) - 3.0) < 1e-9 &&
      math.abs(co(2) - 1.0) < 1e-9)
    val lin = r.getSeq[Double](1)
    val fl = r.getStruct(2)
    assert(lin(0) == fl.getDouble(fl.fieldIndex("slope")) &&
      lin(1) == fl.getDouble(fl.fieldIndex("intercept")))
  }
}
