package graft.ref

import org.scalatest.funsuite.AnyFunSuite

/** Tolerance tests for the nonlinear fits (parameter recovery on
  * synthetic curves with known ground truth, like the reference's
  * scipy-golden approach, bazin_fit.rs:430-490 — tolerance-tested, not
  * bit-matched: the reference's MCMC stream is emcee-PRNG-specific). */
class FitSpec extends AnyFunSuite {

  private def mkCurve(model: NonlinearFit.FitModel, truth: Array[Double],
      sigma: Double, n: Int = 150, tLo: Double = -50, tHi: Double = 100)
      : (Array[Double], Array[Double], Array[Double]) = {
    val rng = new java.util.Random(99)
    val t = Array.tabulate(n)(i => tLo + (tHi - tLo) * i / (n - 1.0))
    val m = t.map(x => model.model(x, truth) + sigma * rng.nextGaussian())
    val w = Array.fill(n)(1.0 / (sigma * sigma))
    (t, m, w)
  }

  test("bazin fit recovers known parameters") {
    val truth = Array(100.0, 10.0, 20.0, 5.0, 30.0) // A, B, t0, rise, fall
    val (t, m, w) = mkCurve(NonlinearFit.BazinModel, truth, sigma = 0.5)
    val out = CurveFitFeature(NonlinearFit.BazinModel)
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(out.length == 6)
    assert(math.abs(out(0) - truth(0)) / truth(0) < 0.1, s"amplitude ${out(0)}")
    assert(math.abs(out(1) - truth(1)) < 2.0, s"baseline ${out(1)}")
    assert(math.abs(out(2) - truth(2)) < 3.0, s"t0 ${out(2)}")
    assert(math.abs(out(3) - truth(3)) / truth(3) < 0.5, s"rise ${out(3)}")
    assert(math.abs(out(4) - truth(4)) / truth(4) < 0.3, s"fall ${out(4)}")
    assert(out(5) > 0.3 && out(5) < 3.0, s"reduced chi2 ${out(5)}")
  }

  test("linexp fit recovers known parameters") {
    val truth = Array(80.0, 0.0, 25.0, 5.0) // A, t0, tau, B
    val (t, m, w) = mkCurve(NonlinearFit.LinexpModel, truth, sigma = 0.4,
      tLo = -10, tHi = 200)
    val out = CurveFitFeature(NonlinearFit.LinexpModel)
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(out.length == 5)
    assert(math.abs(out(0) - truth(0)) / truth(0) < 0.15, s"amplitude ${out(0)}")
    assert(math.abs(out(1) - truth(1)) < 5.0, s"t0 ${out(1)}")
    assert(math.abs(out(2) - truth(2)) / truth(2) < 0.25, s"tau ${out(2)}")
    assert(out(4) > 0.3 && out(4) < 3.0, s"reduced chi2 ${out(4)}")
  }

  test("villar fit converges to a good model (reduced chi2 near 1)") {
    val truth = Array(50.0, 5.0, 0.0, 4.0, 40.0, 0.3, 30.0)
    val (t, m, w) = mkCurve(NonlinearFit.VillarModel, truth, sigma = 0.4,
      tLo = -30, tHi = 250, n = 200)
    val out = CurveFitFeature(NonlinearFit.VillarModel)
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(out.length == 8)
    assert(out(7) > 0.3 && out(7) < 4.0, s"reduced chi2 ${out(7)}")
    assert(out(0) > 0.0)
  }

  test("fits are deterministic (fixed seed)") {
    val truth = Array(100.0, 10.0, 20.0, 5.0, 30.0)
    val (t, m, w) = mkCurve(NonlinearFit.BazinModel, truth, sigma = 1.0)
    val f = CurveFitFeature(NonlinearFit.BazinModel)
    val a = f.evalOrFill(LightCurve(t, m, w), Double.NaN)
    val b = f.evalOrFill(LightCurve(t.clone(), m.clone(), w.clone()), Double.NaN)
    assert(a.toSeq == b.toSeq)
  }

  test("short or flat series fill per the evaluator contract") {
    val f = CurveFitFeature(NonlinearFit.BazinModel)
    val short = LightCurve.unweighted(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0))
    assert(f.evalOrFill(short, -9.0).forall(_ == -9.0))
    val flat = LightCurve.unweighted(
      Array.tabulate(20)(_.toDouble), Array.fill(20)(5.0))
    assert(f.evalOrFill(flat, -9.0).forall(_ == -9.0))
  }

  test("ln-priors steer the sampler (uniform prior restricts amplitude)") {
    val truth = Array(100.0, 10.0, 20.0, 5.0, 30.0)
    val (t, m, w) = mkCurve(NonlinearFit.BazinModel, truth, sigma = 0.5)
    // normalize the same way CurveFitFeature does, then fit raw
    val lc = LightCurve(t, m, w)
    val tn = t.map(x => (x - lc.tMean) / lc.tStd)
    val mn = m.map(x => (x - lc.mMean) / lc.mStd)
    val ie = w.map(x => math.sqrt(x) * lc.mStd)
    var tPeak = tn(0); var mMax = mn(0); var mMin = mn(0)
    for (i <- 1 until mn.length) {
      if (mn(i) >= mMax) { mMax = mn(i); tPeak = tn(i) }
      if (mn(i) < mMin) mMin = mn(i)
    }
    val ib = NonlinearFit.BazinModel.initsBounds(tn(0), tn.last, tPeak, mMin, mMax)
    val free = NonlinearFit.mcmcFit(NonlinearFit.BazinModel, tn, mn, ie, ib)
    // clamp amplitude to under half its unconstrained optimum
    val cap = free(0) * 0.5
    val priors = LnPrior.independent(Seq(
      LnPrior.uniform(0.0, cap), LnPrior.none, LnPrior.none, LnPrior.none, LnPrior.none))
    val constrained = NonlinearFit.mcmcFit(NonlinearFit.BazinModel, tn, mn, ie, ib,
      lnPrior = priors)
    assert(constrained(0) <= cap + 1e-12, s"prior violated: ${constrained(0)} > $cap")

    // prior math sanity
    assert(LnPrior.normal(0.0, 1.0)(0.0) == -0.5 * math.log(2.0 * math.Pi))
    assert(LnPrior.uniform(0.0, 2.0)(1.0) == -math.log(2.0))
    assert(LnPrior.uniform(0.0, 2.0)(3.0).isNegInfinity)
    assert(LnPrior.logUniform(1.0, math.E)(1.0) == -0.0 - math.log(math.log(math.E)))
    val mixed = LnPrior.mix(Seq((1.0, LnPrior.uniform(0.0, 1.0)), (1.0, LnPrior.uniform(1.0, 2.0))))
    assert(math.abs(mixed(0.5) - math.log(0.5)) < 1e-12)
  }

  test("fit-output transformers: golden reshape values and names") {
    // zp is the widened f32 literal (bazin_fit.rs:41-43)
    val zp = FitTransformer.DefaultMagZp
    assert(zp == 8.899999618530273)

    // Bazin 6 -> 5 (bazin_fit.rs:106-136): A=2, B=0.5, t0=100 (dropped),
    // rise=3, fall=7, chi2=1.5
    val bz = FitTransformer.BazinFitTransformer()
    val b = bz(Array(2.0, 0.5, 100.0, 3.0, 7.0, 1.5))
    assert(b.toSeq == Seq(zp - 2.5 * math.log10(4.0), 0.25, 3.0, 7.0, math.log1p(1.5)))
    assert(bz.names == Seq("bazin_fit_mag_full_amplitude",
      "bazin_fit_baseline_amplitude_ratio", "bazin_fit_rise_time",
      "bazin_fit_fall_time", "ln1p_bazin_fit_reduced_chi2"))

    // Villar 8 -> 7 (villar_fit.rs:106-136): nu and gamma pass through
    val vl = FitTransformer.VillarFitTransformer()
    val v = vl(Array(4.0, -1.0, 50.0, 2.0, 9.0, 0.3, 11.0, 0.25))
    assert(v.toSeq == Seq(zp - 2.5 * math.log10(8.0), -0.25, 2.0, 9.0, 0.3, 11.0,
      math.log1p(0.25)))
    assert(vl.names.head == "villar_fit_mag_full_amplitude" && vl.names.size == 7)

    // Linexp 5 -> 4 (linexp_fit.rs:97-121): [A, t0, fall, B, chi2] ->
    // [mag_amp, fall, B/A, ln1p(chi2)] under the historic names
    val lx = FitTransformer.LinexpFitTransformer()
    val l = lx(Array(8.0, 10.0, 6.0, -2.0, 3.0))
    assert(l.toSeq == Seq(zp - 2.5 * math.log10(16.0), 6.0, -0.25, math.log1p(3.0)))
    assert(lx.names == Seq("linexp_fit_amplitude", "linexp_fit_fall_time",
      "linexp_fit_baseline", "ln1p_linexp_fit_reduced_chi2"))

    // arity is enforced
    intercept[IllegalArgumentException](bz(Array(1.0)))

    // TransformedFit wraps a feature: names/arity swap to the reshape
    val tf = TransformedFit(CurveFitFeature(NonlinearFit.BazinModel),
      FitTransformer.BazinFitTransformer())
    assert(tf.names == bz.names && tf.minTsLength ==
      CurveFitFeature(NonlinearFit.BazinModel).minTsLength)
  }

  test("analytic jacobians match central finite differences on every model") {
    val cases = Seq(
      NonlinearFit.BazinModel -> Array(1.2, 0.3, 0.1, 0.4, 0.9),
      NonlinearFit.LinexpModel -> Array(2.0, -0.2, 0.7, 0.1),
      NonlinearFit.VillarModel -> Array(1.5, 0.2, -0.1, 0.3, 0.8, 0.4, 0.6))
    for ((model, p) <- cases; t <- Seq(-1.5, -0.3, 0.05, 0.4, 1.1, 2.7)) {
      val g = model.jacobian(t, p)
      for (j <- p.indices) {
        val h = 1e-6 * math.max(1.0, math.abs(p(j)))
        val pp = p.clone(); pp(j) += h
        val pm = p.clone(); pm(j) -= h
        val fd = (model.model(t, pp) - model.model(t, pm)) / (2 * h)
        assert(math.abs(g(j) - fd) <= 1e-5 * math.max(1.0, math.abs(fd)),
          s"${model.name} d/dp$j at t=$t: analytic ${g(j)} vs fd $fd")
      }
    }
  }

  test("LM fit (lmsder analogue) recovers parameters from the data-driven init") {
    val truth = Array(100.0, 10.0, 20.0, 5.0, 30.0)
    val (t, m, w) = mkCurve(NonlinearFit.BazinModel, truth, sigma = 0.5)
    val out = CurveFitFeature(NonlinearFit.BazinModel,
      algorithm = FitAlgorithm.Lmsder)
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(math.abs(out(0) - truth(0)) / truth(0) < 0.1, s"amplitude ${out(0)}")
    assert(math.abs(out(2) - truth(2)) < 3.0, s"t0 ${out(2)}")
    assert(out(5) > 0.3 && out(5) < 3.0, s"reduced chi2 ${out(5)}")
    // mcmc + LM fine-tune must not be worse than mcmc + nelder-mead
    val nm = CurveFitFeature(NonlinearFit.BazinModel)
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    val lm = CurveFitFeature(NonlinearFit.BazinModel,
      algorithm = FitAlgorithm.McmcLmsder)
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(lm(5) <= nm(5) * 1.05,
      s"LM polish degraded chi2: ${lm(5)} vs ${nm(5)}")
  }

  test("NUTS fit recovers parameters and LM fine-tuning sharpens the draw") {
    val truth = Array(100.0, 10.0, 20.0, 5.0, 30.0)
    val (t, m, w) = mkCurve(NonlinearFit.BazinModel, truth, sigma = 0.5)
    val nuts = CurveFitFeature(NonlinearFit.BazinModel,
      algorithm = FitAlgorithm.Nuts())
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(math.abs(nuts(0) - truth(0)) / truth(0) < 0.15, s"amplitude ${nuts(0)}")
    assert(math.abs(nuts(2) - truth(2)) < 5.0, s"t0 ${nuts(2)}")
    assert(nuts(5) > 0.2 && nuts(5) < 5.0, s"reduced chi2 ${nuts(5)}")
    val tuned = CurveFitFeature(NonlinearFit.BazinModel,
      algorithm = FitAlgorithm.Nuts(Some(FitAlgorithm.Lmsder)))
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(tuned(5) <= nuts(5) + 1e-9,
      s"LM fine-tune must not worsen chi2: ${tuned(5)} vs ${nuts(5)}")
    assert(tuned(5) > 0.3 && tuned(5) < 3.0, s"tuned reduced chi2 ${tuned(5)}")
    // determinism under a fixed seed
    val again = CurveFitFeature(NonlinearFit.BazinModel,
      algorithm = FitAlgorithm.Nuts())
      .evalOrFill(LightCurve(t, m, w), Double.NaN)
    assert(nuts.toSeq == again.toSeq)
  }

  test("nelder-mead minimizes a bounded quadratic") {
    val f = (p: Array[Double]) =>
      (p(0) - 3.0) * (p(0) - 3.0) + 2.0 * (p(1) + 1.0) * (p(1) + 1.0)
    val best = NonlinearFit.nelderMead(f, Array(0.0, 0.0),
      Array(-10.0, -10.0), Array(10.0, 10.0))
    assert(math.abs(best(0) - 3.0) < 1e-3 && math.abs(best(1) + 1.0) < 1e-3)
  }
}
