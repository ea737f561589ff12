package graft.ref

/**
 * Lomb-Scargle periodogram with the reference crate's exact semantics
 * (/root/reference/src/periodogram/): dynamic per-series frequency
 * grids derived from the time column, the Press §13.8 direct
 * algorithm with recurrent sin/cos (angle-addition, no trig call per
 * point — required for numeric parity, sin_cos_iterator.rs:73-106),
 * PSD-default normalization (power_trait.rs:24-109), and peak
 * extraction (peak_indices.rs:5-32, _periodogram_peaks.rs:121-132).
 */
object Periodogram {

  // ---------------- Nyquist frequency (freq.rs:36-130) ----------------

  sealed trait NyquistFreq extends Serializable {
    def apply(t: Array[Double]): Double
  }

  /** `pi (N-1) / duration` — mean-interval Nyquist (freq.rs:70-75). */
  case object AverageNyquist extends NyquistFreq {
    def apply(t: Array[Double]): Double =
      math.Pi * (t.length - 1) / (t(t.length - 1) - t(0))
  }

  /** `pi / median(dt)` (freq.rs:86-92). */
  case object MedianNyquist extends NyquistFreq {
    def apply(t: Array[Double]): Double = {
      val dt = diffSorted(t)
      math.Pi / LightCurve.medianOfSorted(dt)
    }
  }

  /** `pi / ppf(dt, q)` with the shared R-5 quantile (freq.rs:101-107). */
  final case class QuantileNyquist(quantile: Double) extends NyquistFreq {
    def apply(t: Array[Double]): Double =
      math.Pi / LightCurve.ppf(diffSorted(t), quantile)
  }

  /** User-fixed maximum frequency (freq.rs:126-130). */
  final case class FixedNyquist(freq: Double) extends NyquistFreq {
    def apply(t: Array[Double]): Double = freq
  }

  private def diffSorted(t: Array[Double]): Array[Double] = {
    val d = new Array[Double](t.length - 1)
    var i = 0
    while (i < d.length) { d(i) = t(i + 1) - t(i); i += 1 }
    java.util.Arrays.sort(d)
    d
  }

  // ---------------- frequency grids (freq.rs:146-354,400-460) ----------------

  sealed trait FreqGrid extends Serializable {
    def size: Int
    def get(i: Int): Double
    /** Stream of (sin, cos)(freq_k * time), k = 0..size-1 — the
      * reference's iter_sin_cos_mul (freq.rs:133-141): uniform grids
      * use the angle-addition recurrence, arbitrary grids direct trig
      * per point. */
    def sinCos(time: Double): SinCosStream
  }

  /** Uniform grids: recurrent stream from (first angle, angle step). */
  sealed trait UniformFreqGrid extends FreqGrid {
    /** (first angle, angle step) for sin/cos(freq_k * time). */
    def angles(time: Double): (Double, Double)
    final def sinCos(time: Double): SinCosStream = {
      val (first, step) = angles(time)
      new RecurrentSinCos(first, step)
    }
  }

  /** freq_k = step * k, size = 2^log2 + 1 (freq.rs:230-290). */
  final case class ZeroBasedPow2Grid(step: Double, log2SizeM1: Int) extends UniformFreqGrid {
    val size: Int = (1 << log2SizeM1) + 1
    def get(i: Int): Double = step * i
    def angles(time: Double): (Double, Double) = (0.0, step * time)
  }

  /** freq_k = start + step * k (freq.rs:293-354). */
  final case class LinearGrid(start: Double, step: Double, size: Int) extends UniformFreqGrid {
    def get(i: Int): Double = start + step * i
    def angles(time: Double): (Double, Double) = (start * time, step * time)
  }

  /** User-supplied sorted frequency grid (freq.rs:146-162,196-216:
    * FreqGrid::Arbitrary over a SortedArray): the fixed physical grid
    * a user evaluates across ALL series. No recurrence is possible —
    * the sin/cos stream computes trig per frequency, exactly like the
    * reference's from_angles iterator. */
  final case class ArbitraryGrid(freqs: Array[Double]) extends FreqGrid {
    require(freqs.nonEmpty, "arbitrary frequency grid must be non-empty")
    require(freqs.indices.tail.forall(i => freqs(i - 1) <= freqs(i)),
      "arbitrary frequency grid must be sorted ascending")
    def size: Int = freqs.length
    def get(i: Int): Double = freqs(i)
    def sinCos(time: Double): SinCosStream = new SinCosStream {
      private var i = -1
      def next(): Unit = i += 1
      def sin: Double = math.sin(freqs(i) * time)
      def cos: Double = math.cos(freqs(i) * time)
    }
    // Array fields break case-class equality (reference identity) —
    // compare by content so serde round-trips are value-equal
    override def equals(o: Any): Boolean = o match {
      case ArbitraryGrid(fs) => java.util.Arrays.equals(freqs, fs)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(freqs)
  }

  /** Dynamic grid parameters (freq.rs:400-418): grid step
    * `2 pi (N-1) / (N resolution duration)`, max freq from the Nyquist
    * strategy scaled by maxFreqFactor. */
  final case class GridParams(
      resolution: Double = 10.0,
      maxFreqFactor: Double = 1.0,
      nyquist: NyquistFreq = AverageNyquist) {

    def durationStepMaxFreq(t: Array[Double]): (Double, Double, Double) = {
      val n = t.length.toDouble
      val duration = t(t.length - 1) - t(0)
      val step = 2.0 * math.Pi * (n - 1.0) / (n * resolution * duration)
      val maxFreq = nyquist(t) * maxFreqFactor
      (duration, step, maxFreq)
    }

    /** Linear grid from t (freq.rs:313-331): starts at the
      * half-duration frequency `4 pi / duration`. */
    def linearFromT(t: Array[Double]): LinearGrid = {
      val (duration, step, maxFreq) = durationStepMaxFreq(t)
      val minFreq = 4.0 * math.Pi / duration
      val sizef = (maxFreq - minFreq) / step
      val size = if (sizef >= 1.0) math.round(sizef).toInt else 1
      LinearGrid(minFreq, step, size)
    }

    /** Pow2 grid from t (freq.rs:256-263): size from
      * `round(log2(maxFreq / step))`. */
    def pow2FromT(t: Array[Double]): ZeroBasedPow2Grid = {
      val (_, step, maxFreq) = durationStepMaxFreq(t)
      val log2Size = math.round(math.log(maxFreq / step) / math.log(2.0)).toInt
      ZeroBasedPow2Grid(step, log2Size)
    }
  }

  // ---------------- recurrent sin/cos (sin_cos_iterator.rs:73-106) ----------------

  /** Advance-then-read stream of (sin, cos) values per grid frequency. */
  sealed trait SinCosStream {
    def next(): Unit
    def sin: Double
    def cos: Double
  }

  /** In-place angle-addition recurrence: 2 mults + 2 adds per step
    * instead of trig calls. State arrays hold current (sin, cos) per
    * data point; `inc` holds (sin(step), cos(step)). */
  private final class RecurrentSinCos(first: Double, step: Double) extends SinCosStream {
    private var s = math.sin(first)
    private var c = math.cos(first)
    private val si = math.sin(step)
    private val ci = math.cos(step)
    private var curS = 0.0
    private var curC = 0.0
    /** Advance and expose the PREVIOUS value (iterator semantics). */
    def next(): Unit = {
      curS = s; curC = c
      val ns = si * c + ci * s
      val nc = ci * c - si * s
      s = ns; c = nc
    }
    def sin: Double = curS
    def cos: Double = curC
  }

  // ---------------- direct power (power_direct.rs:21-103) ----------------

  /** Exact O(N * Nfreq) Lomb-Scargle with tau phase correction. Raw
    * (PSD) normalization: divide-by-variance form of Press §13.8. */
  def directPower(t: Array[Double], m: Array[Double], grid: FreqGrid): Array[Double] = {
    val n = t.length
    val nf = n.toDouble
    val mMean = LightCurve.mean(m)
    val mStd2 = LightCurve.std2(m, mMean)

    val scOmegaX = new Array[SinCosStream](n)
    val scTwoOmegaX = new Array[SinCosStream](n)
    var i = 0
    while (i < n) {
      scOmegaX(i) = grid.sinCos(t(i))
      scTwoOmegaX(i) = grid.sinCos(2.0 * t(i))
      i += 1
    }

    val out = new Array[Double](grid.size)
    var k = 0
    while (k < grid.size) {
      // tau: atan2-free via sums of sin/cos(2 omega x) (power_direct.rs:73-103)
      var sumSin = 0.0
      var sumCos = 0.0
      i = 0
      while (i < n) {
        val sc = scTwoOmegaX(i)
        sc.next()
        sumSin += sc.sin
        sumCos += sc.cos
        i += 1
      }
      val cos2 = sumCos / math.hypot(sumSin, sumCos)
      val sinOmegaTau = math.signum(sumSin) * math.sqrt(0.5 * (1.0 - cos2))
      val cosOmegaTau = math.sqrt(0.5 * (1.0 + cos2))

      var sumMSin = 0.0
      var sumMCos = 0.0
      var sumSin2 = 0.0
      i = 0
      while (i < n) {
        val sc = scOmegaX(i)
        sc.next()
        val sin = sc.sin * cosOmegaTau - sc.cos * sinOmegaTau
        val cos = sc.cos * cosOmegaTau + sc.sin * sinOmegaTau
        val dy = m(i) - mMean
        sumMSin += dy * sin
        sumMCos += dy * cos
        sumSin2 += sin * sin
        i += 1
      }
      val sumCos2 = nf - sumSin2

      out(k) =
        if ((sumMSin == 0.0 && sumSin2 == 0.0) ||
          (sumMCos == 0.0 && sumCos2 == 0.0) || mStd2 == 0.0) 0.0
        else 0.5 * (sumMSin * sumMSin / sumSin2 + sumMCos * sumMCos / sumCos2) / mStd2
      k += 1
    }
    out
  }

  // ---------------- FFT power (power_fft.rs:85-275) ----------------

  /**
   * O(N log N) Lomb-Scargle via extirpolation: center m, linearly
   * "spread" each observation onto a uniform 2^(k+1)-point time grid
   * (dt = pi / maxFreq, wrap-around indexing), run two real FFTs
   * (values and counts-at-2x), and assemble the tau-corrected power
   * from the spectral sums. Requires a ZeroBasedPow2 grid; the last
   * grid point is approximate (the reference's own oracle test
   * excludes it, periodogram/mod.rs:249-251).
   *
   * Backend: Apache commons-math3 FastFourierTransformer (ships in
   * /opt/spark/jars), plan-free; the reference caches rustfft plans
   * per thread (fft_rustfft.rs:70-81) — JVM-side the transformer is
   * stateless and allocation-light.
   */
  def fftPower(t: Array[Double], m: Array[Double], grid: ZeroBasedPow2Grid): Array[Double] = {
    val n = t.length
    val nf = n.toDouble
    val mMean = LightCurve.mean(m)
    val mStd2 = LightCurve.std2(m, mMean)
    if (mStd2 == 0.0) return new Array[Double](grid.size)

    val maxFreq = grid.step * (grid.size - 1)
    val dt = math.Pi / maxFreq
    val len = (grid.size - 1) << 1

    val xSch = new Array[Double](len)
    val xSc2 = new Array[Double](len)
    val t0 = t(0)

    // linear extirpolation with wrap-around (power_fft.rs:235-252)
    def spread(v: Array[Double], x: Double, y: Double): Unit = {
      val xLo = math.floor(x)
      val xHi = math.ceil(x)
      val iLo = (math.round(xLo) % len).toInt
      val iHi = (math.round(xHi) % len).toInt
      if (iLo == iHi) v(iLo) += y
      else {
        v(iLo) += (xHi - x) * y
        v(iHi) += (x - xLo) * y
      }
    }
    var i = 0
    while (i < n) {
      val x = (t(i) - t0) / dt
      spread(xSch, x, m(i) - mMean)
      spread(xSc2, 2.0 * x, 1.0)
      i += 1
    }

    import org.apache.commons.math3.transform.{DftNormalization, FastFourierTransformer, TransformType}
    val fft = new FastFourierTransformer(DftNormalization.STANDARD)
    val sch = fft.transform(xSch, TransformType.FORWARD)
    val sc2 = fft.transform(xSc2, TransformType.FORWARD)

    val out = new Array[Double](grid.size)
    var k = 0
    while (k < grid.size) {
      val sumCosH = sch(k).getReal
      val sumSinH = -sch(k).getImaginary
      val sumCos2 = sc2(k).getReal
      val sumSin2 = -sc2(k).getImaginary

      val cos2wtau =
        if (sumCos2 == 0.0 && sumSin2 == 0.0) 1.0
        else sumCos2 / math.hypot(sumCos2, sumSin2)
      val cosWtau = math.sqrt(0.5 * (1.0 + cos2wtau))
      val sinWtau = math.signum(sumSin2) * math.sqrt(0.5 * (1.0 - cos2wtau))

      val sumHCos = sumCosH * cosWtau + sumSinH * sinWtau
      val sumHSin = sumSinH * cosWtau - sumCosH * sinWtau
      val sumCos2WtTau = 0.5 * (nf + sumCos2 * cosWtau + sumSin2 * sinWtau)
      val sumSin2WtTau = nf - sumCos2WtTau

      val fracCos = if (sumCos2WtTau == 0.0) 0.0 else sumHCos * sumHCos / sumCos2WtTau
      val fracSin = if (sumSin2WtTau == 0.0) 0.0 else sumHSin * sumHSin / sumSin2WtTau
      val sumFrac =
        if (fracCos == 0.0) 2.0 * fracSin
        else if (fracSin == 0.0) 2.0 * fracCos
        else fracSin + fracCos

      out(k) = 0.5 / mStd2 * sumFrac
      k += 1
    }
    out
  }

  // ---------------- normalization (power_trait.rs:24-109) ----------------

  sealed trait Normalization extends Serializable {
    def apply(power: Array[Double], n: Int): Array[Double]
  }
  /** Raw power (scipy lombscargle normalize=False over standardized m). */
  case object Psd extends Normalization {
    def apply(power: Array[Double], n: Int): Array[Double] = power
  }
  /** `P * 2 / (n-1)` — fraction of variance explained, in [0, 1]. */
  case object Standard extends Normalization {
    def apply(power: Array[Double], n: Int): Array[Double] =
      power.map(_ * 2.0 / (n - 1.0))
  }
  /** `P_std / (1 - P_std)`. */
  case object Model extends Normalization {
    def apply(power: Array[Double], n: Int): Array[Double] =
      power.map { p =>
        val ps = p * 2.0 / (n - 1.0)
        if (ps >= 1.0) Double.PositiveInfinity else ps / (1.0 - ps)
      }
  }
  /** `-ln(1 - P_std)`. */
  case object LogNorm extends Normalization {
    def apply(power: Array[Double], n: Int): Array[Double] =
      power.map { p =>
        val ps = p * 2.0 / (n - 1.0)
        if (ps >= 1.0) Double.PositiveInfinity else -math.log(1.0 - ps)
      }
  }

  // ---------------- peaks (peak_indices.rs:5-32) ----------------

  /** Indices of strict local maxima (rise then fall; first/last
    * element never qualifies), sorted by peak value descending. */
  def peakIndicesReverseSorted(a: Array[Double]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var prev = Double.PositiveInfinity
    var prevRising = false
    var i = 0
    while (i < a.length) {
      val rising = a(i) > prev
      if (prevRising && !rising) out += (i - 1)
      prev = a(i)
      prevRising = rising
      i += 1
    }
    out.result().sortBy(idx => -a(idx))
  }
}

/**
 * The Periodogram meta-feature (features/periodogram.rs:190-575):
 * derive the frequency grid from t, compute normalized power, then
 * emit the top `peaks` local maxima as (period = 2 pi / freq,
 * snr = (P - mean P) / std P) pairs, zero-padded to 2*peaks
 * (_periodogram_peaks.rs:121-132).
 */
final case class PeriodogramFeature(
    peaks: Int = 1,
    params: Periodogram.GridParams = Periodogram.GridParams(),
    normalization: Periodogram.Normalization = Periodogram.Psd,
    useFft: Boolean = false,
    phaseFeatures: Seq[Feature] = Seq.empty,
    /** Fixed-grid strategy (freq.rs FreqGridStrategy::Fixed): when set,
      * this grid — e.g. a user-supplied [[Periodogram.ArbitraryGrid]]
      * physical grid shared by ALL series — replaces the dynamic
      * per-series derivation from `params`. */
    fixedGrid: Option[Periodogram.FreqGrid] = None) extends Feature {

  val name = "periodogram"
  override val names: Seq[String] =
    (0 until peaks).flatMap(i => Seq(s"period_$i", s"periodogram_peak_snr_$i")) ++
      phaseFeatures.flatMap(_.names.map(n => s"phase_$n"))
  override val minTsLength =
    math.max(2, phaseFeatures.map(_.minTsLength).maxOption.getOrElse(1))
  override val variabilityRequired = phaseFeatures.exists(_.variabilityRequired)
  override val tRequired = true

  /** Phase folding (features/periodogram.rs:42-89): phase = (t/P) mod 1
    * shifted so the minimum-m observation is at phase 0, sorted by
    * phase; near-duplicate phases (< 1e-6 apart) merged via Bins
    * (:125-156). */
  private def phaseFold(lc: LightCurve, period: Double): LightCurve = {
    val n = lc.n
    val raw = lc.t.map { ti =>
      val p = (ti / period) % 1.0
      if (p < 0.0) p + 1.0 else p
    }
    var iMin = 0
    var i = 1
    while (i < n) { if (lc.m(i) < lc.m(iMin)) iMin = i; i += 1 }
    val off = raw(iMin)
    val phases = raw.map(p => (p - off + 1.0) % 1.0)
    val order = phases.indices.sortBy(phases(_))
    val folded = new LightCurve(
      order.map(phases(_)).toArray,
      order.map(lc.m(_)).toArray,
      order.map(lc.w(_)).toArray)
    // merge near-duplicate phases (PHASE_DEDUP_WINDOW = 1e-6)
    var minStep = Double.PositiveInfinity
    i = 1
    while (i < folded.n) {
      val d = folded.t(i) - folded.t(i - 1)
      if (d < minStep) minStep = d
      i += 1
    }
    if (minStep < 1e-6) Bins(folded, 1e-6, 0.0).toLightCurve else folded
  }

  def evalNoCheck(lc: LightCurve): Array[Double] = {
    if (lc.t(lc.n - 1) == lc.t(0))
      throw ZeroDivisionException("zero duration, no frequency grid")
    val (grid: Periodogram.FreqGrid, raw) = (fixedGrid, useFft) match {
      case (Some(g: Periodogram.ZeroBasedPow2Grid), true) =>
        (g, Periodogram.fftPower(lc.t, lc.m, g))
      case (Some(g), true) =>
        // the reference's to_zero_based_pow2 contract: FFT power only
        // evaluates on a zero-based pow2 grid (periodogram/mod.rs)
        throw new IllegalArgumentException(
          s"FFT power requires a zero-based pow2 grid, got ${g.getClass.getSimpleName}")
      case (Some(g), false) =>
        (g, Periodogram.directPower(lc.t, lc.m, g))
      case (None, true) =>
        val g = params.pow2FromT(lc.t)
        (g, Periodogram.fftPower(lc.t, lc.m, g))
      case (None, false) =>
        val g = params.linearFromT(lc.t)
        (g, Periodogram.directPower(lc.t, lc.m, g))
    }
    val power = normalization(raw, lc.n)

    val idx = Periodogram.peakIndicesReverseSorted(power)
    val pMean = LightCurve.mean(power)
    val pStd = if (power.length >= 2) math.sqrt(LightCurve.std2(power, pMean)) else 0.0

    val out = Array.fill(2 * peaks)(0.0)
    var k = 0
    while (k < math.min(peaks, idx.length)) {
      val i = idx(k)
      out(2 * k) = 2.0 * math.Pi / grid.get(i)
      out(2 * k + 1) = (power(i) - pMean) / pStd
      k += 1
    }
    if (phaseFeatures.isEmpty) out
    else {
      // phase features at the best period (periodogram.rs:553-575)
      val bestPeriod = out(0)
      if (!java.lang.Double.isFinite(bestPeriod) || bestPeriod <= 0.0)
        throw ZeroDivisionException("best period is not positive, cannot phase-fold")
      val folded = phaseFold(lc, bestPeriod)
      val phaseOut = graft.operators.SeriesFeatures.evalSeries(
        phaseFeatures, Double.NaN)(folded.t, folded.m, folded.w)
      out ++ phaseOut
    }
  }
}
