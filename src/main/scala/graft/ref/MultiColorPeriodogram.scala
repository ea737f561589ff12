package graft.ref

/**
 * Multi-passband periodogram (/root/reference/src/multicolor/features/
 * multi_color_periodogram.rs:22-62,508-562): per-band Lomb-Scargle
 * powers on a COMMON frequency grid derived from the union of all
 * observation times, weighted by per-band observation count or chi2
 * (normalized over all matched bands), summed; peaks extracted from
 * the combined spectrum; phase features evaluated per band at the
 * combined best period (names `period_folded_{band}_*`).
 */
object MultiColorPeriodogram {

  sealed trait Weighting extends Serializable
  /** Weight bands by observation count. */
  case object Count extends Weighting
  /** Weight bands by chi2 around the weighted mean. */
  case object Chi2 extends Weighting

  /** Combined power on the union-time grid. Bands shorter than 2
    * points are excluded from the power sum but still normalize the
    * weights (reference :545-557 filter order). */
  def combinedPower(bands: Seq[(String, LightCurve)],
      params: Periodogram.GridParams = Periodogram.GridParams(),
      weighting: Weighting = Count,
      useFft: Boolean = false): (Periodogram.FreqGrid, Array[Double]) = {
    require(bands.nonEmpty, "at least one band required")
    val unionT = bands.flatMap(_._2.t).toArray
    java.util.Arrays.sort(unionT)
    require(unionT.length >= 2 && unionT(unionT.length - 1) > unionT(0),
      "union time axis must span a positive duration")

    val weights = bands.map { case (_, lc) =>
      weighting match {
        case Count => lc.nf
        case Chi2 => lc.mChi2
      }
    }
    val norm = weights.sum
    require(norm > 0.0, "zero total band weight")

    val grid: Periodogram.FreqGrid =
      if (useFft) params.pow2FromT(unionT) else params.linearFromT(unionT)

    val combined = new Array[Double](grid.size)
    bands.zip(weights).foreach { case ((_, lc), w) =>
      if (lc.n >= 2) {
        val p = grid match {
          case g: Periodogram.ZeroBasedPow2Grid if useFft =>
            Periodogram.fftPower(lc.t, lc.m, g)
          case g => Periodogram.directPower(lc.t, lc.m, g)
        }
        var i = 0
        while (i < combined.length) { combined(i) += w / norm * p(i); i += 1 }
      }
    }
    (grid, combined)
  }

  /** Full evaluation: top `peaks` of the combined spectrum as
    * (period, snr) pairs, then per-band phase features at the best
    * period, bands in the given order. */
  def eval(bands: Seq[(String, LightCurve)],
      peaks: Int = 1,
      params: Periodogram.GridParams = Periodogram.GridParams(),
      weighting: Weighting = Count,
      useFft: Boolean = false,
      phaseFeatures: Seq[Feature] = Seq.empty,
      fill: Double = Double.NaN): Array[Double] = {
    val nPhase = bands.length * phaseFeatures.map(_.size).sum
    val size = 2 * peaks + nPhase
    val out = Array.fill(size)(fill)
    try {
      val (grid, power) = combinedPower(bands, params, weighting, useFft)
      val idx = Periodogram.peakIndicesReverseSorted(power)
      val pMean = LightCurve.mean(power)
      val pStd = if (power.length >= 2) math.sqrt(LightCurve.std2(power, pMean)) else 0.0
      java.util.Arrays.fill(out, 0, 2 * peaks, 0.0)
      var k = 0
      while (k < math.min(peaks, idx.length)) {
        out(2 * k) = 2.0 * math.Pi / grid.get(idx(k))
        out(2 * k + 1) = (power(idx(k)) - pMean) / pStd
        k += 1
      }
      if (phaseFeatures.nonEmpty) {
        val bestPeriod = out(0)
        if (!java.lang.Double.isFinite(bestPeriod) || bestPeriod <= 0.0) {
          java.util.Arrays.fill(out, fill)
          return out
        }
        val perBand = phaseFeatures.map(_.size).sum
        bands.zipWithIndex.foreach { case ((_, lc), bi) =>
          // reuse the monochrome fold via a peaks-free PeriodogramFeature
          val folded = foldAt(lc, bestPeriod)
          val vals = graft.operators.SeriesFeatures.evalSeries(
            phaseFeatures, fill)(folded.t, folded.m, folded.w)
          System.arraycopy(vals, 0, out, 2 * peaks + bi * perBand, vals.length)
        }
      }
      out
    } catch {
      case _: IllegalArgumentException => Array.fill(size)(fill)
      case FlatSeriesException => Array.fill(size)(fill)
      case ZeroDivisionException(_) => Array.fill(size)(fill)
    }
  }

  /** Phase folding identical to the monochrome path
    * (features/periodogram.rs:42-89). */
  private def foldAt(lc: LightCurve, period: Double): LightCurve = {
    val raw = lc.t.map { ti =>
      val p = (ti / period) % 1.0
      if (p < 0.0) p + 1.0 else p
    }
    var iMin = 0
    var i = 1
    while (i < lc.n) { if (lc.m(i) < lc.m(iMin)) iMin = i; i += 1 }
    val off = raw(iMin)
    val phases = raw.map(p => (p - off + 1.0) % 1.0)
    val order = phases.indices.sortBy(phases(_))
    val folded = new LightCurve(
      order.map(phases(_)).toArray,
      order.map(lc.m(_)).toArray,
      order.map(lc.w(_)).toArray)
    var minStep = Double.PositiveInfinity
    i = 1
    while (i < folded.n) {
      val d = folded.t(i) - folded.t(i - 1)
      if (d < minStep) minStep = d
      i += 1
    }
    if (minStep < 1e-6) Bins(folded, 1e-6, 0.0).toLightCurve else folded
  }

  /** Output names, mirroring the reference's `period_folded_{band}_`
    * prefix convention. */
  def names(bands: Seq[String], peaks: Int, phaseFeatures: Seq[Feature]): Seq[String] =
    (0 until peaks).flatMap(i => Seq(s"mc_period_$i", s"mc_periodogram_peak_snr_$i")) ++
      bands.flatMap(b => phaseFeatures.flatMap(_.names.map(n => s"period_folded_${b}_$n")))
}
