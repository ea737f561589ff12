package graft.ref

import org.scalatest.funsuite.AnyFunSuite

class MultiColorPeriodogramSpec extends AnyFunSuite {

  private val period = 0.17

  private def band(seed: Long, n: Int, offset: Double): LightCurve = {
    val rng = new java.util.Random(seed)
    val t = Array.fill(n)(rng.nextDouble()).sorted
    val m = t.map(x => 3.0 * math.sin(2.0 * math.Pi / period * x + 0.5) + offset)
    LightCurve.unweighted(t, m)
  }

  test("combined periodogram recovers the shared period across bands") {
    val bands = Seq("g" -> band(1L, 60, 10.0), "r" -> band(2L, 90, 20.0))
    val out = MultiColorPeriodogram.eval(bands)
    assert(math.abs(out(0) - period) < 5e-3, s"period ${out(0)}")
    assert(out(1) > 0.0)
  }

  test("combined power is the weight-normalized sum of per-band powers") {
    val bands = Seq("g" -> band(3L, 40, 0.0), "r" -> band(4L, 80, 5.0))
    val (grid, combined) = MultiColorPeriodogram.combinedPower(bands)
    // manual: same grid, count weights
    val n = bands.map(_._2.nf)
    val norm = n.sum
    val perBand = bands.map { case (_, lc) => Periodogram.directPower(lc.t, lc.m, grid) }
    for (i <- combined.indices) {
      val manual = perBand.zip(n).map { case (p, w) => w / norm * p(i) }.sum
      assert(math.abs(combined(i) - manual) < 1e-12 * math.max(1.0, math.abs(manual)))
    }
  }

  test("chi2 weighting differs from count weighting when variances differ") {
    // different SIGNALS (periodogram power is variance-normalized, so
    // scaling m alone changes nothing): periodic g vs noise-only r with
    // 3x the points but 10x the chi2 spread
    val g = band(5L, 50, 0.0)
    val rng = new java.util.Random(6)
    val rT = Array.fill(150)(rng.nextDouble()).sorted
    val r = LightCurve.unweighted(rT, rT.map(_ => rng.nextGaussian() * 10.0))
    val bands = Seq("g" -> g, "r" -> r)
    val (_, byCount) = MultiColorPeriodogram.combinedPower(bands,
      weighting = MultiColorPeriodogram.Count)
    val (_, byChi2) = MultiColorPeriodogram.combinedPower(bands,
      weighting = MultiColorPeriodogram.Chi2)
    assert(byCount.zip(byChi2).exists { case (a, b) => math.abs(a - b) > 1e-9 })
  }

  test("per-band phase features at the combined best period") {
    val bands = Seq("g" -> band(6L, 60, 10.0), "r" -> band(7L, 70, 20.0))
    val phase = Seq(Features.Mean, Features.Amplitude)
    val out = MultiColorPeriodogram.eval(bands, phaseFeatures = phase)
    val names = MultiColorPeriodogram.names(bands.map(_._1), 1, phase)
    assert(names == Seq("mc_period_0", "mc_periodogram_peak_snr_0",
      "period_folded_g_mean", "period_folded_g_amplitude",
      "period_folded_r_mean", "period_folded_r_amplitude"))
    assert(out.length == names.length)
    // folding preserves the m set per band
    assert(math.abs(out(2) - LightCurve.mean(bands(0)._2.m)) < 1e-12)
    assert(math.abs(out(4) - LightCurve.mean(bands(1)._2.m)) < 1e-12)
  }

  test("degenerate inputs fill") {
    val flat = LightCurve.unweighted(Array(1.0, 2.0, 3.0), Array(5.0, 5.0, 5.0))
    val out = MultiColorPeriodogram.eval(Seq("g" -> flat), fill = -1.0)
    // flat band: power all zero -> no peaks -> zero-padded (period 0) is
    // fine for the peaks block; phase path would fill
    assert(out.length == 2)
    val zeroDur = LightCurve.unweighted(Array(2.0, 2.0), Array(1.0, 2.0))
    assert(MultiColorPeriodogram.eval(Seq("g" -> zeroDur), fill = -1.0).forall(_ == -1.0))
  }
}
