package graft.ref

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavioural-contract checker for every kernel, mirroring the
 * reference's eval_info_tests (/root/reference/src/tests.rs:56-306):
 * declared arity holds, truncation below min_ts_length fills the
 * whole output slice, plateau series fill when variability is
 * required, and evaluation is deterministic.
 */
class ContractSpec extends AnyFunSuite {

  private def allFeatures: Seq[Feature] =
    Features.all ++ Seq(
      PeriodogramFeature(),
      PeriodogramFeature(peaks = 3, useFft = true),
      Transformed(Features.Amplitude, Transformer.Ln1p),
      Transformed(Features.Mean, Transformer.Arcsinh),
      CurveFitFeature(NonlinearFit.BazinModel, nIterations = 16),
      CurveFitFeature(NonlinearFit.LinexpModel, nIterations = 16),
      BinsFeature(Seq(Features.Mean, Features.Amplitude), window = 5.0))

  /** Seeded random series, N = 128 (tests.rs:66 pattern). */
  private def randomLc(n: Int = 128): LightCurve = {
    val rng = new java.util.Random(0)
    var t = 0.0
    val ts = Array.fill(n) { t += 0.1 + rng.nextDouble(); t }
    val ms = Array.fill(n)(rng.nextGaussian() * 3.0 + 10.0)
    val ws = Array.fill(n)(0.5 + rng.nextDouble())
    new LightCurve(ts, ms, ws)
  }

  test("declared arity matches actual output length for every kernel") {
    val lc = randomLc()
    allFeatures.foreach { f =>
      val out = f.evalOrFill(lc, Double.NaN)
      assert(out.length == f.size, s"${f.name}: ${out.length} != ${f.size}")
      assert(f.names.length == f.size, s"${f.name} names arity")
    }
  }

  test("truncation below min_ts_length fills the whole output slice (tests.rs:126-148)") {
    val lc = randomLc()
    allFeatures.foreach { f =>
      if (f.minTsLength > 1) {
        val short = new LightCurve(
          lc.t.take(f.minTsLength - 1),
          lc.m.take(f.minTsLength - 1),
          lc.w.take(f.minTsLength - 1))
        val out = f.evalOrFill(short, -99.5)
        assert(out.forall(_ == -99.5), s"${f.name} did not fill on short input")
        assert(f.eval(short) == Left(EvalError.ShortTimeSeries(f.minTsLength - 1, f.minTsLength)),
          s"${f.name} error kind")
      }
    }
  }

  test("plateau series fill when variability is required (tests.rs:269-306)") {
    val n = 32
    val rng = new java.util.Random(1)
    var t = 0.0
    val ts = Array.fill(n) { t += 0.5 + rng.nextDouble(); t }
    val flat = new LightCurve(ts, Array.fill(n)(7.25), Array.fill(n)(1.0))
    allFeatures.foreach { f =>
      if (f.variabilityRequired) {
        val out = f.evalOrFill(flat, -42.0)
        assert(out.forall(_ == -42.0), s"${f.name} did not fill on plateau")
        assert(f.eval(flat) == Left(EvalError.FlatTimeSeries), s"${f.name} error kind")
      } else {
        // not required -> must evaluate (possibly to 0/NaN) without throwing
        f.evalOrFill(flat, Double.NaN)
      }
    }
  }

  test("evaluation is deterministic") {
    val a = randomLc()
    val b = randomLc()
    allFeatures.foreach { f =>
      val x = f.evalOrFill(a, Double.NaN)
      val y = f.evalOrFill(b, Double.NaN)
      assert(x.map(java.lang.Double.doubleToLongBits).toSeq ==
        y.map(java.lang.Double.doubleToLongBits).toSeq, s"${f.name} nondeterministic")
    }
  }

  test("input-requirement flags hold under perturbation (tests.rs:150-232)") {
    val lc = randomLc(96)
    val rng = new java.util.Random(5)
    // order-preserving t perturbation (cumulative positive jitter,
    // non-uniform so scale-invariant kernels still see a change)
    var acc = 0.0
    val tP = lc.t.map { x => acc += 0.01 + 0.2 * rng.nextDouble(); x + acc }
    val mP = lc.m.map(_ + rng.nextGaussian() * 2.0)
    val wP = lc.w.map(_ * (0.3 + rng.nextDouble()))
    def bits(a: Array[Double]) = a.map(java.lang.Double.doubleToLongBits).toSeq

    allFeatures.foreach { f =>
      val base = bits(f.evalOrFill(lc, Double.NaN))
      val onT = bits(f.evalOrFill(new LightCurve(tP, lc.m, lc.w), Double.NaN))
      val onM = bits(f.evalOrFill(new LightCurve(lc.t, mP, lc.w), Double.NaN))
      val onW = bits(f.evalOrFill(new LightCurve(lc.t, lc.m, wP), Double.NaN))
      // flag false -> output provably unchanged
      if (!f.tRequired) assert(onT == base, s"${f.name}: t not required but output changed")
      if (!f.mRequired) assert(onM == base, s"${f.name}: m not required but output changed")
      if (!f.wRequired) assert(onW == base, s"${f.name}: w not required but output changed")
      // flag true -> the perturbation must be visible
      if (f.tRequired) assert(onT != base, s"${f.name}: t required but output unchanged")
      if (f.mRequired) assert(onM != base, s"${f.name}: m required but output unchanged")
      if (f.wRequired) assert(onW != base, s"${f.name}: w required but output unchanged")
    }
  }

  test("extractor concatenation contract: multi-feature output is the concat of singles") {
    val lc = randomLc()
    val feats = Seq(Features.Amplitude, Features.Mean, Features.OtsuSplit,
      Features.LinearFit, PeriodogramFeature(peaks = 2))
    val whole = graft.operators.SeriesFeatures
      .evalSeries(feats, Double.NaN)(lc.t, lc.m, lc.w)
    val parts = feats.flatMap(_.evalOrFill(
      new LightCurve(lc.t, lc.m, lc.w), Double.NaN))
    assert(whole.toSeq == parts)
  }
}
