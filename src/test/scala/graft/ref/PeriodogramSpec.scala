package graft.ref

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the Lomb-Scargle port, mirroring the reference's
  * own oracle tests (periodogram/mod.rs:162-218 scipy comparison;
  * features/periodogram.rs:806-851 peak recovery & plateau;
  * peak_indices.rs:50-74). */
class PeriodogramSpec extends AnyFunSuite {

  private def relEq(a: Double, b: Double, rel: Double, eps: Double = 2.3e-16): Unit =
    assert(math.abs(a - b) <= math.max(rel * math.max(math.abs(a), math.abs(b)), eps),
      s"$a != $b (rel $rel)")

  test("direct power matches scipy lombscargle (reference golden)") {
    val n = 100
    val t = Array.tabulate(n)(_.toDouble)
    val m = t.map(x => math.sin(0.07 * x))

    // single-frequency sanity: P(0.07) * 2/(N-1) ~ 1
    val g1 = Periodogram.ZeroBasedPow2Grid(0.07, 0)
    val p1 = Periodogram.directPower(t, m, g1)
    relEq(p1(1) * 2.0 / (n - 1.0), 1.0, 1.0 / n)

    // scipy.signal.lombscargle(t, standardized m, linspace(0, 0.04, 5))
    val g2 = Periodogram.ZeroBasedPow2Grid(0.01, 2)
    assert(g2.size == 5)
    val p2 = Periodogram.directPower(t, m, g2)
    val desired = Array(3.76158192e-33, 1.69901802e+01, 1.85772252e+01,
      2.19604974e+01, 2.81505681e+01)
    p2.zip(desired).foreach { case (a, d) => relEq(a, d, 1e-6) }
  }

  test("even-grid sinus: best period recovered within 5e-3") {
    val period = 0.17
    val rng = new java.util.Random(0)
    val t = Array.tabulate(101)(i => i / 100.0)
    val m = t.map(x =>
      3.0 * math.sin(2.0 * math.Pi / period * x + 0.5) + 4.0 + 0.01 * rng.nextDouble())
    val f = PeriodogramFeature()
    val out = f.evalOrFill(LightCurve.unweighted(t, m), Double.NaN)
    assert(math.abs(out(0) - period) < 5e-3, s"period ${out(0)}")
    assert(out(1) > 0.0) // snr of the top peak is positive
  }

  test("uneven-grid sinus: best period recovered within 5e-3") {
    val period = 0.17
    val rng = new java.util.Random(0)
    val t = Array.fill(100)(rng.nextDouble()).sorted
    val m = t.map(x => 3.0 * math.sin(2.0 * math.Pi / period * x + 0.5) + 4.0)
    val out = PeriodogramFeature().evalOrFill(LightCurve.unweighted(t, m), Double.NaN)
    assert(math.abs(out(0) - period) < 5e-3, s"period ${out(0)}")
  }

  test("plateau series yields [0, 0] (reference periodogram_plateau)") {
    val t = Array.tabulate(100)(i => i / 99.0)
    val m = Array.fill(100)(0.0)
    val out = PeriodogramFeature().evalOrFill(LightCurve.unweighted(t, m), Double.NaN)
    assert(out.toSeq == Seq(0.0, 0.0))
  }

  test("arbitrary grid: direct trig stream matches the linear recurrence on the same freqs") {
    val rng = new java.util.Random(5)
    val t = Array.fill(80)(rng.nextDouble() * 10.0).sorted
    val m = t.map(x => math.sin(1.3 * x) + 0.2 * rng.nextDouble())
    val lin = Periodogram.LinearGrid(0.5, 0.05, 64)
    val arb = Periodogram.ArbitraryGrid(Array.tabulate(64)(lin.get))
    val pLin = Periodogram.directPower(t, m, lin)
    val pArb = Periodogram.directPower(t, m, arb)
    // recurrence vs per-point trig drift stays far below the 1e-6 gate
    pLin.zip(pArb).foreach { case (a, b) => relEq(a, b, 1e-9) }
  }

  test("arbitrary grid: non-uniform freqs evaluate, get/size honor the array") {
    val freqs = Array(0.3, 0.7, 0.9, 2.0, 5.5)
    val g = Periodogram.ArbitraryGrid(freqs)
    assert(g.size == 5 && g.get(3) == 2.0)
    val t = Array.tabulate(50)(i => i / 5.0)
    val m = t.map(x => math.cos(0.9 * x))
    val p = Periodogram.directPower(t, m, g)
    // the planted frequency wins on this sparse grid
    assert(p.indexOf(p.max) == 2, s"power ${p.toSeq}")
    // strategy contract: unsorted grids are rejected, FFT needs pow2
    intercept[IllegalArgumentException] {
      Periodogram.ArbitraryGrid(Array(1.0, 0.5))
    }
    intercept[IllegalArgumentException] {
      PeriodogramFeature(useFft = true, fixedGrid = Some(g))
        .evalNoCheck(LightCurve.unweighted(t, m))
    }
  }

  test("fixed-grid strategy replaces the dynamic derivation") {
    val rng = new java.util.Random(11)
    val t = Array.fill(60)(rng.nextDouble() * 4.0).sorted
    val m = t.map(x => math.sin(2.0 * math.Pi / 0.9 * x))
    val freqs = Array.tabulate(128)(i => 1.0 + 0.1 * i)
    val fixed = PeriodogramFeature(peaks = 1,
      fixedGrid = Some(Periodogram.ArbitraryGrid(freqs)))
      .evalNoCheck(LightCurve.unweighted(t, m))
    // best period must come FROM the supplied grid
    val fromGrid = freqs.map(f => 2.0 * math.Pi / f)
    assert(fromGrid.exists(p => math.abs(p - fixed(0)) < 1e-12),
      s"period ${fixed(0)} not on the fixed grid")
    assert(math.abs(fixed(0) - 0.9) < 0.05)
  }

  test("peak indices semantics (reference peak_indices.rs goldens)") {
    import Periodogram.peakIndicesReverseSorted
    assert(peakIndicesReverseSorted(Array(0.0, 1.0, 0.0)).toSeq == Seq(1))
    assert(peakIndicesReverseSorted(Array(1.0, 1.0, 1.0)).toSeq == Seq.empty)
    assert(peakIndicesReverseSorted(Array(3.0, 2.0, 1.0)).toSeq == Seq.empty)
    assert(peakIndicesReverseSorted(Array(1.0, 2.0, 3.0)).toSeq == Seq.empty)
    // last element can't be a peak (no fall after it)
    assert(peakIndicesReverseSorted(Array(1.0, 0.0, 2.0, 0.0, 3.0)).toSeq == Seq(2))
  }

  test("peaks are sorted by power descending and zero-padded") {
    val power = Array(0.0, 5.0, 0.0, 9.0, 0.0, 2.0, 0.0)
    val idx = Periodogram.peakIndicesReverseSorted(power)
    assert(idx.toSeq == Seq(3, 1, 5))
  }

  test("dynamic linear grid derivation (freq.rs:313-331,410-418)") {
    val t = Array.tabulate(101)(i => i / 100.0) // duration 1, n 101
    val g = Periodogram.GridParams().linearFromT(t)
    val duration = 1.0
    val step = 2.0 * math.Pi * 100.0 / (101.0 * 10.0 * duration)
    relEq(g.start, 4.0 * math.Pi / duration, 1e-12)
    relEq(g.step, step, 1e-12)
    val maxFreq = math.Pi * 100.0 / duration
    assert(g.size == math.round((maxFreq - g.start) / step).toInt)
  }

  test("FFT is one-to-one with Direct at resolution 1 (periodogram/mod.rs:221-251)") {
    // resolution 1 on an integer grid puts the extirpolation time grid
    // exactly on the samples -> FFT equals Direct to 1e-8, last point
    // excluded, exactly the reference's own oracle
    val n = 64
    val t = Array.tabulate(n)(_.toDouble)
    val m = t.map(x => math.sin(0.472 * x))
    val grid = Periodogram.GridParams(resolution = 1.0).pow2FromT(t)
    val fft = Periodogram.fftPower(t, m, grid)
    val direct = Periodogram.directPower(t, m, grid)
    assert(fft.length == direct.length && fft.length == grid.size)
    for (i <- 0 until grid.size - 1)
      assert(math.abs(fft(i) - direct(i)) < 1e-8, s"bin $i: ${fft(i)} vs ${direct(i)}")
  }

  test("FFT and Direct agree on top-2 peaks (uniform res 4 + uneven fixed grid)") {
    import Periodogram.peakIndicesReverseSorted
    // uniform two-tone, resolution 4 (periodogram/mod.rs:254-295)
    val n = 100
    val t1 = Array.tabulate(n)(_.toDouble)
    val m1 = t1.map(x => math.sin(0.472 * x) + 2.0 * math.cos(1.222 * x))
    val g1 = Periodogram.GridParams(resolution = 4.0).pow2FromT(t1)
    val f1 = Periodogram.fftPower(t1, m1, g1)
    val d1 = Periodogram.directPower(t1, m1, g1)
    assert(peakIndicesReverseSorted(f1).take(2).toSeq ==
      peakIndicesReverseSorted(d1).take(2).toSeq)

    // uneven + noise, fixed pow2 grid 0.01 x 257 (mod.rs:297-345)
    val rng = new java.util.Random(0)
    val t2 = Array.fill(n)(rng.nextDouble() * (n - 1)).sorted
    val m2 = t2.map(x => math.sin(0.222 * x) + 2.0 * math.cos(1.222 * x) + rng.nextDouble())
    val g2 = Periodogram.ZeroBasedPow2Grid(0.01, 8) // 257 points
    assert(g2.size == 257)
    val f2 = Periodogram.fftPower(t2, m2, g2)
    val d2 = Periodogram.directPower(t2, m2, g2)
    assert(peakIndicesReverseSorted(f2).take(2).toSeq ==
      peakIndicesReverseSorted(d2).take(2).toSeq)
  }

  test("FFT path recovers the sinus period on an uneven grid") {
    val period = 0.17
    val rng = new java.util.Random(0)
    val t = Array.fill(256)(rng.nextDouble()).sorted
    val m = t.map(x => 3.0 * math.sin(2.0 * math.Pi / period * x + 0.5) + 4.0)
    val out = PeriodogramFeature(useFft = true)
      .evalOrFill(LightCurve.unweighted(t, m), Double.NaN)
    assert(math.abs(out(0) - period) < 5e-3, s"period ${out(0)}")
  }

  test("phase features evaluate on the folded series at the best period") {
    val period = 0.17
    val t = Array.tabulate(101)(i => i / 100.0)
    val m = t.map(x => 3.0 * math.sin(2.0 * math.Pi / period * x + 0.5) + 4.0)
    val f = PeriodogramFeature(
      phaseFeatures = Seq(Features.Amplitude, Features.Eta))
    assert(f.names == Seq("period_0", "periodogram_peak_snr_0",
      "phase_amplitude", "phase_eta"))
    val out = f.evalOrFill(LightCurve.unweighted(t, m), Double.NaN)
    assert(out.length == 4)
    assert(math.abs(out(0) - period) < 5e-3)
    // folding preserves the magnitude set -> amplitude unchanged
    assert(math.abs(out(2) - (m.max - m.min) / 2.0) < 1e-12)
    // phase-folded periodic signal is smooth -> eta (von Neumann) small
    val etaUnfolded = Features.Eta.evalOrFill(LightCurve.unweighted(t, m), Double.NaN)(0)
    assert(out(3) < 0.5 * etaUnfolded, s"folded eta ${out(3)} vs unfolded $etaUnfolded")
    // plateau input: zero best period -> whole output fills
    val flat = LightCurve.unweighted(t, Array.fill(t.length)(1.0))
    assert(f.evalOrFill(flat, -7.0).forall(_ == -7.0))
  }

  test("normalizations relate to psd exactly (power_trait.rs)") {
    val raw = Array(0.0, 10.0, 49.0)
    val n = 100
    val std = Periodogram.Standard(raw.clone(), n)
    std.zip(raw).foreach { case (s, r) => relEq(s, r * 2.0 / 99.0, 1e-15) }
    val model = Periodogram.Model(raw.clone(), n)
    model.zip(std).foreach { case (mo, s) => relEq(mo, s / (1.0 - s), 1e-12) }
    val log = Periodogram.LogNorm(raw.clone(), n)
    log.zip(std).foreach { case (lo, s) => relEq(lo, -math.log(1.0 - s), 1e-12) }
  }
}
