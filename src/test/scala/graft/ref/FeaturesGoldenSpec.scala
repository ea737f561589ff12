package graft.ref

import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden values ported from the reference crate's `feature_test!`
 * literals (file:line cited per case; see FIXTURES.md §2).
 */
class FeaturesGoldenSpec extends AnyFunSuite {
  private val Tol = 1e-6

  private def lcU(t: Array[Double], m: Array[Double]) = LightCurve.unweighted(t, m)
  private def close(a: Double, b: Double, tol: Double = Tol): Unit =
    assert(math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b))),
      s"$a != $b (tol $tol)")

  test("amplitude — amplitude.rs:81") {
    val lc = lcU(Array(0.0, 1.0), Array(0.0, 2.0))
    close(Features.Amplitude.evalNoCheck(lc)(0), 1.0)
  }

  test("mean — mean.rs:72-77") {
    val m = Array(1.0, 1, 1, 1, 5, 6, 6, 6, 99)
    val lc = lcU(m.indices.map(_.toDouble).toArray, m)
    close(Features.Mean.evalNoCheck(lc)(0), 14.0)
  }

  test("mean_variance — mean_variance.rs:71-76") {
    val m = Array(1.0, 1, 1, 1, 5, 6, 6, 6, 99)
    val lc = lcU(m.indices.map(_.toDouble).toArray, m)
    close(Features.MeanVariance.evalNoCheck(lc)(0), 2.2832017440606585)
  }

  test("weighted mean + reduced chi2 — time_series.rs:236-266") {
    val t = Array(0.0, 1, 2, 3, 4)
    val m = Array(12.77883145, 18.89988406, 17.55633632, 18.36073996, 11.83854198)
    val w = Array(0.1282489, 0.10576467, 0.32102692, 0.12962352, 0.10746144)
    val lc = LightCurve(t, m, w)
    // reference asserts these NumPy-derived literals at epsilon 1e-6
    close(lc.mWeightedMean, 16.31817047752941)
    close(lc.mReducedChi2, 1.3752251301435465)
    close(Features.WeightedMean.evalNoCheck(lc)(0), 16.31817047752941)
    close(Features.ReducedChi2.evalNoCheck(lc)(0), 1.3752251301435465)
  }

  test("DataSample stats — data_sample.rs:271-313") {
    val m = Array(3.92948846, 3.28436964, 6.73375373, -7.79420906, -7.23407407)
    val lc = lcU(m.indices.map(_.toDouble).toArray, m)
    close(lc.mMin, -7.79420906, 1e-12)
    close(lc.mMax, 6.73375373, 1e-12)
    close(lc.mMean, -0.21613426, 1e-6)
    close(lc.mMedian, 3.28436964, 1e-12)
    close(lc.mStd, 6.7900544035968435, 1e-12)
  }

  test("median even n — data_sample.rs:299-306") {
    val m = Array(9.47981408, 3.86815751, 9.90299294, -2.986894, 7.44343197, 1.52751816)
    val lc = lcU(m.indices.map(_.toDouble).toArray, m)
    close(lc.mMedian, 5.655794743124782)
  }

  test("R-5 ppf deciles — sorted_array.rs:182-190") {
    val sorted = Array.tabulate(11)(i => i / 10.0)
    val expected = Array(0.0, 0.06, 0.17, 0.28, 0.39, 0.5, 0.61, 0.72, 0.83, 0.94, 1.0)
    for (i <- 0 to 10)
      close(LightCurve.ppf(sorted, i / 10.0), expected(i), 1e-7)
  }

  test("ppf(0.5) == median, ppf(0)=min, ppf(1)=max") {
    val rng = new scala.util.Random(7)
    for (n <- Seq(1, 2, 3, 10, 101)) {
      val a = Array.fill(n)(rng.nextDouble()); java.util.Arrays.sort(a)
      assert(LightCurve.ppf(a, 0.5) == LightCurve.medianOfSorted(a))
      assert(LightCurve.ppf(a, 0.0) == a(0))
      assert(LightCurve.ppf(a, 1.0) == a(n - 1))
    }
  }

  test("bins rollup — bins.rs:374-392") {
    val t = Array(0.0, 1, 1.1, 1.2, 2, 2.1, 2.2, 2.3, 2.4, 2.5, 5)
    val m = Array(0.0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val w = Array(10.0, 5, 10, 5, 10, 5, 10, 5, 10, 5, 10)
    val b = Bins(LightCurve(t, m, w), window = 1.0, offset = 0.0)
    assert(b.t.toSeq == Seq(0.5, 1.5, 2.5, 5.5))
    close(b.m(0), 0.0, 1e-12); close(b.m(1), 2.0, 1e-12)
    close(b.m(2), 6.333333333333333, 1e-12); close(b.m(3), 10.0, 1e-12)
    close(b.w(0), 10.0, 1e-12); close(b.w(1), 6.666666666666667, 1e-12)
    close(b.w(2), 7.5, 1e-12); close(b.w(3), 10.0, 1e-12)
  }

  test("bins bucket counts — bins.rs:394-415") {
    val t = Array(0.0, 1, 1.1, 1.2, 2, 2.1, 2.2, 2.3, 2.4, 2.5, 5)
    val lc = LightCurve(t, t.map(_ => 1.0), t.map(_ => 1.0))
    def count(window: Double, offset: Double) = Bins(lc, window, offset).t.length
    assert(count(2, 0) == 3); assert(count(3, 0) == 2); assert(count(10, 0) == 1)
    assert(count(1, 0.1) == 5); assert(count(1, 0.5) == 5); assert(count(2, 1) == 3)
  }

  test("otsu_split — otsu_split.rs:193-224") {
    val main = lcU(Array(0.0, 1, 2, 3, 4, 5), Array(0.51, 0.52, 0.53, 0.54, 1.2, 1.3))
    val o = Features.OtsuSplit.evalNoCheck(main)
    close(o(0), 0.725); close(o(1), 0.012909944487358068)
    close(o(2), 0.07071067811865482); close(o(3), 0.6666666666666666)

    val lower = Features.OtsuSplit.evalNoCheck(lcU(Array(0.0, 1, 2, 3), Array(0.5, 1.5, 1.5, 1.5)))
    assert(lower.toSeq == Seq(1.0, 0.0, 0.0, 0.25))
    val upper = Features.OtsuSplit.evalNoCheck(lcU(Array(0.0, 1, 2, 3), Array(0.5, 0.5, 0.5, 1.5)))
    assert(upper.toSeq == Seq(1.0, 0.0, 0.0, 0.75))
    val minObs = Features.OtsuSplit.evalNoCheck(lcU(Array(0.0, 1), Array(0.51, 0.52)))
    close(minObs(0), 0.01); assert(minObs(1) == 0.0 && minObs(2) == 0.0 && minObs(3) == 0.5)
  }

  test("linear fit unweighted — straight_line_fit.rs:90-102") {
    val t = Array(0.5, 1.5, 2.5, 5.0, 7.0, 16.0)
    val m = Array(-1.0, 3, 2, 6, 10, 25)
    val r = StraightLineFit.fit(LightCurve.unweighted(t, m), knownErrors = false)
    close(r.slope, 1.63021767, 1e-7)
    close(r.slopeSigma2, 0.0078127, 1e-5)
    close(r.reducedChi2, 1.271190781049937, 1e-9)
  }

  test("linear fit weighted — straight_line_fit.rs:104-118") {
    val t = Array(0.5, 1.5, 2.5, 5.0, 7.0, 16.0)
    val m = Array(-1.0, 3, 2, 6, 10, 25)
    val w = Array(2.0, 1, 3, 10, 1, 0.4)
    val r = StraightLineFit.fit(LightCurve(t, m, w), knownErrors = true)
    close(r.slope, 1.6023644, 1e-6)
    close(r.slopeSigma2, 0.00882845, 1e-5)
    close(r.reducedChi2, 1.7927152569891913, 1e-9)
  }

  test("extractor semantics — extractor.rs:228-373") {
    val lc = lcU(Array(0.0, 1, 2, 3, 4), Array(1.0, 2, 3, 4, 5))
    close(Features.Amplitude.evalNoCheck(lc)(0), 2.0)
    close(Features.Mean.evalNoCheck(lc)(0), 3.0)
    // short series -> ShortTimeSeries error
    val short = lcU(Array(0.0, 1), Array(1.0, 2))
    Features.LinearTrend.eval(short) match {
      case Left(EvalError.ShortTimeSeries(2, 3)) => ()
      case other => fail(s"expected ShortTimeSeries(2,3), got $other")
    }
    // fill semantics
    val filled = Features.LinearTrend.evalOrFill(short, -9.0)
    assert(filled.toSeq == Seq(-9.0, -9.0, -9.0))
    // plateau -> variability_required features fail, others pass
    val flat = lcU(Array(0.0, 1, 2, 3, 4), Array(2.0, 2, 2, 2, 2))
    assert(Features.Cusum.eval(flat).isLeft)
    assert(Features.Mean.eval(flat).map(_.toSeq) == Right(Seq(2.0)))
  }

  test("ln_erfc matches erfc in all branches") {
    import org.apache.commons.math3.special.Erf
    for (x <- Seq(-9.0, -8.0001, -3.0, -0.02, -1e-4, 0.0, 1e-4, 0.02, 3.0, 7.9, 8.0))
      close(LnErfc(x), math.log(Erf.erfc(x)), 1e-12)
    // x > 8: erfc underflows in precision; check against asymptotic identity
    val x = 9.0
    val expected = math.log(Erf.erfc(x))
    close(LnErfc(x), expected, 1e-10)
  }

  test("chi2_pvar — regularized gamma Q") {
    // chi2 distribution: Q(dof/2, chi2/2); for dof=2, Q = exp(-chi2/2)
    val t = Array(0.0, 1, 2)
    val m = Array(1.0, 2.0, 3.0)
    val lc = LightCurve(t, m, Array(1.0, 1.0, 1.0))
    val expected = math.exp(-lc.mChi2 / 2.0) // dof = 2
    close(Features.Chi2Pvar.evalNoCheck(lc)(0), expected, 1e-12)
  }

  test("eta on evenly spaced monotone series") {
    // m = [1,2,3,4,5]: sum of squared diffs = 4, std2 = 2.5, n-1 = 4
    val lc = lcU(Array(0.0, 1, 2, 3, 4), Array(1.0, 2, 3, 4, 5))
    close(Features.Eta.evalNoCheck(lc)(0), 4.0 / (4.0 * 2.5), 1e-12)
  }

  test("duration / time intervals / maximum slope") {
    val lc = lcU(Array(0.0, 1, 3, 7), Array(0.0, 2, 2, 10))
    close(Features.Duration.evalNoCheck(lc)(0), 7.0)
    close(Features.MaximumTimeInterval.evalNoCheck(lc)(0), 4.0)
    close(Features.MinimumTimeInterval.evalNoCheck(lc)(0), 1.0)
    close(Features.MaximumSlope.evalNoCheck(lc)(0), 2.0)
  }

  test("all features finite on a generic random series") {
    val rng = new scala.util.Random(42)
    val n = 64
    val t = Array.iterate(0.0, n)(x => x).zipWithIndex.map { case (_, i) => i + rng.nextDouble() * 0.5 }
    java.util.Arrays.sort(t)
    val m = Array.fill(n)(rng.nextGaussian() * 3 + 17)
    val w = Array.fill(n)(0.5 + rng.nextDouble())
    val lc = LightCurve(t, m, w)
    for (f <- Features.all) {
      val out = f.eval(lc)
      assert(out.isRight, s"${f.name} failed: $out")
      val arr = out.toOption.get
      assert(arr.length == f.size, s"${f.name} arity ${arr.length} != ${f.size}")
      assert(arr.forall(v => java.lang.Double.isFinite(v)), s"${f.name} non-finite: ${arr.toSeq}")
    }
  }
}
