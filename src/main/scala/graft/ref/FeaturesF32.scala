package graft.ref

/**
 * Single-precision (f32) flavor of the simple statistical kernels.
 *
 * The reference is generic over a sealed float trait with exactly two
 * instantiations, f32 and f64 (/root/reference/src/float_trait.rs:30-120);
 * every kernel there runs its accumulations in the instantiated
 * precision. The engine's primary path is the f64 flavor
 * ([[Features]]); this object is the f32 surface for the kernels the
 * reference benchmarks as "simple features", with every accumulation,
 * comparison and division performed in `Float` so results carry f32
 * rounding exactly as the reference's f32 instantiation does.
 *
 * Conventions (stated because f32 transcendentals are not uniquely
 * defined across languages): `sqrt` is the correctly-rounded double
 * sqrt narrowed to f32 (equal to a correctly-rounded f32 sqrt except
 * on double-rounding boundary cases, and mirrored exactly by the
 * oracle), and the integer power in skew is iterated f32 multiplies.
 * The DuckDB oracle (EventQueries.sqlSimpleStatsF32) reproduces each
 * loop in the same order over `FLOAT`-typed lists, so both engines
 * agree bit-for-bit.
 *
 * Distributed evaluation casts the stored f64 columns to f32 at the
 * series boundary (one IEEE round-to-nearest narrowing per value —
 * `CAST(x AS FLOAT)` on both engines), then runs these kernels over
 * the per-series arrays in sorted `(t, idx)` order.
 */
object FeaturesF32 {

  /** In-order f32 sum, the reference's accumulation shape. */
  def sum(a: Array[Float]): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s
  }

  def mean(a: Array[Float]): Float = sum(a) / a.length

  /** Two-pass sample variance, ddof=1, f32 accumulation. */
  def std2(a: Array[Float], mu: Float): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { val d = a(i) - mu; s += d * d; i += 1 }
    s / (a.length - 1)
  }

  /** Correctly-rounded double sqrt narrowed to f32. */
  @inline def sqrtF(x: Float): Float = math.sqrt(x.toDouble).toFloat

  def amplitude(m: Array[Float]): Float = {
    var mn = m(0); var mx = m(0); var i = 1
    while (i < m.length) {
      val x = m(i)
      if (x > mx) mx = x else if (x < mn) mn = x
      i += 1
    }
    0.5f * (mx - mn)
  }

  def standardDeviation(m: Array[Float]): Float = sqrtF(std2(m, mean(m)))

  def meanVariance(m: Array[Float]): Float = standardDeviation(m) / mean(m)

  def beyondNStd(m: Array[Float], nstd: Float): Float = {
    val mu = mean(m)
    val thr = standardDeviation(m) * nstd
    var c = 0; var i = 0
    while (i < m.length) { if (math.abs(m(i) - mu) > thr) c += 1; i += 1 }
    c.toFloat / m.length
  }

  def cusum(m: Array[Float]): Float = {
    val mu = mean(m)
    var s = 0.0f
    var mn = Float.PositiveInfinity; var mx = Float.NegativeInfinity
    var i = 0
    while (i < m.length) {
      s += m(i) - mu
      if (s < mn) mn = s
      if (s > mx) mx = s
      i += 1
    }
    (mx - mn) / (standardDeviation(m) * m.length)
  }

  def eta(m: Array[Float]): Float = {
    var s = 0.0f; var i = 1
    while (i < m.length) { val d = m(i) - m(i - 1); s += d * d; i += 1 }
    s / (m.length - 1) / std2(m, mean(m))
  }

  /** max |dm/dt| over consecutive points, non-finite slopes dropped
    * (f32 time deltas can underflow to zero on dense cadences — the
    * same guard the f64 kernel carries). */
  def maximumSlope(t: Array[Float], m: Array[Float]): Float = {
    var best = Float.NegativeInfinity; var found = false; var i = 1
    while (i < m.length) {
      val v = math.abs((m(i) - m(i - 1)) / (t(i) - t(i - 1)))
      if (java.lang.Float.isFinite(v)) { found = true; if (v > best) best = v }
      i += 1
    }
    if (found) best else Float.NaN
  }

  def medianOfSorted(sorted: Array[Float]): Float = {
    val len = sorted.length
    val i = (len - 1) / 2
    if (len % 2 == 0) 0.5f * (sorted(i) + sorted(i + 1)) else sorted(i)
  }

  def median(m: Array[Float]): Float = {
    val s = m.clone(); java.util.Arrays.sort(s); medianOfSorted(s)
  }

  def skew(m: Array[Float]): Float = {
    val mu = mean(m)
    var m3 = 0.0f; var i = 0
    while (i < m.length) { val d = m(i) - mu; m3 += d * d * d; i += 1 }
    val n = m.length.toFloat
    val sd = standardDeviation(m)
    m3 / (sd * sd * sd) * n / ((n - 1.0f) * (n - 2.0f))
  }

  def kurtosis(m: Array[Float]): Float = {
    val mu = mean(m)
    var m4 = 0.0f; var i = 0
    while (i < m.length) { val d = m(i) - mu; m4 += d * d * d * d; i += 1 }
    val n = m.length.toFloat
    val s2 = std2(m, mu)
    m4 / (s2 * s2) * n * (n + 1.0f) / ((n - 1.0f) * (n - 2.0f) * (n - 3.0f)) -
      3.0f * (n - 1.0f) * (n - 1.0f) / ((n - 2.0f) * (n - 3.0f))
  }

  /** R-5 quantile over a sorted array, all arithmetic in f32 exactly
    * as the reference's f32 instantiation: `h = len·q − 0.5` is
    * computed in f32 (sorted_array.rs:50-70 takes `q: f32` and casts
    * `len as f32`), and the linear interpolation runs in the element
    * type. */
  def ppf(sorted: Array[Float], q: Float): Float = {
    val len = sorted.length
    require(len > 0, "ppf of empty array")
    val h = len * q - 0.5f
    val hFloor = math.floor(h).toFloat
    if (hFloor < 0.0f) sorted(0)
    else {
      val i = hFloor.toInt
      if (i >= len - 1) sorted(len - 1)
      else sorted(i) + (h - hFloor) * (sorted(i + 1) - sorted(i))
    }
  }

  /** The quantile-kernel battery (q_quantiles_f32), mirroring the f64
    * evaluators Median / InterPercentileRange(0.25) /
    * MedianAbsoluteDeviation / PercentAmplitude /
    * MedianBufferRangePercentage(0.1) /
    * PercentDifferenceMagnitudePercentile(0.05) /
    * MagnitudePercentageRatio(0.4, 0.05) with every accumulation in
    * f32. Quantile complements are computed as `1.0f - q` (not a
    * rounded decimal literal) so the oracle's FLOAT subtraction lands
    * on identical bits; the MBRP threshold follows the reference's
    * `q * (half * (max - min))` order
    * (median_buffer_range_percentage.rs:117-129). The two flat-series
    * ZeroDivision cases fill NaN (eval_or_fill convention). */
  def evalQuantiles(m: Array[Float]): Array[Float] = {
    val s = m.clone(); java.util.Arrays.sort(s)
    val n = s.length
    val med = medianOfSorted(s)
    val mn = s(0); val mx = s(n - 1)
    val dev = new Array[Float](n)
    var i = 0
    while (i < n) { dev(i) = math.abs(m(i) - med); i += 1 }
    java.util.Arrays.sort(dev)
    val mad = medianOfSorted(dev)
    val ipr = ppf(s, 1.0f - 0.25f) - ppf(s, 0.25f)
    val pa = math.max(mx - med, med - mn)
    val thr = 0.1f * (0.5f * (mx - mn))
    var c = 0
    i = 0
    while (i < n) { if (math.abs(m(i) - med) < thr) c += 1; i += 1 }
    val mbrp = c.toFloat / n
    val pd05 = ppf(s, 1.0f - 0.05f) - ppf(s, 0.05f)
    val pdmp = if (pd05 == 0.0f && med == 0.0f) Float.NaN else pd05 / med
    val mprNum = ppf(s, 1.0f - 0.4f) - ppf(s, 0.4f)
    val mpr = if (mprNum == 0.0f && pd05 == 0.0f) Float.NaN else mprNum / pd05
    Array(med, ipr, mad, pa, mbrp, pdmp, mpr)
  }

  /** The weighted-kernel battery (q_weighted_f32), mirroring the f64
    * evaluators WeightedMean / ReducedChi2 / ExcessVariance /
    * StetsonK / Roms with every accumulation in f32 (the reference's
    * f32 instantiation of weighted_mean.rs:58-60, excess_variance.rs:
    * 62-67, stetson_k.rs:64-71, roms.rs:61-73). `sqrt` follows the
    * engine-wide narrowed-double convention ([[sqrtF]]); series must
    * satisfy the n >= 2 + variability guard (enforced by the query). */
  def evalWeighted(m: Array[Float], w: Array[Float]): Array[Float] = {
    val n = m.length
    val nf = n.toFloat
    var sw = 0.0f; var swm = 0.0f
    var i = 0
    while (i < n) { sw += w(i); swm += w(i) * m(i); i += 1 }
    val wm = swm / sw
    var chi2 = 0.0f
    i = 0
    while (i < n) { val d = m(i) - wm; chi2 += d * d * w(i); i += 1 }
    var sInvW = 0.0f
    i = 0
    while (i < n) { sInvW += 1.0f / w(i); i += 1 }
    val mu = mean(m)
    val ev = (std2(m, mu) - sInvW / nf) / (mu * mu)
    var sK = 0.0f
    i = 0
    while (i < n) { sK += math.abs(m(i) - wm) * sqrtF(w(i)); i += 1 }
    val stetsonK = sK / sqrtF(nf * chi2)
    val med = median(m)
    var sR = 0.0f
    i = 0
    while (i < n) {
      val v = math.abs(m(i) - med) * sqrtF(w(i))
      if (java.lang.Float.isFinite(v)) sR += v
      i += 1
    }
    val roms = sR / (nf - 1.0f)
    Array(wm, chi2 / (nf - 1.0f), ev, stetsonK, roms)
  }

  /** The sequential/time-kernel battery (q_sequential_f32), mirroring
    * the f64 evaluators EtaE / LaflerKinmanStringLength / Duration /
    * TimeMean / TimeStandardDeviation / Maximum-/MinimumTimeInterval
    * with f32 accumulation (eta_e.rs:67-82,
    * lafler_kinman_string_length.rs:86-100, *_time_interval.rs:60-69).
    * The cube in EtaE's denominator is iterated f32 multiplies (the
    * engine's integer-power convention); non-finite squared slopes
    * drop exactly as in the f64 kernel. */
  def evalSequential(t: Array[Float], m: Array[Float]): Array[Float] = {
    val n = m.length
    val nf = n.toFloat
    val mu = mean(m)
    val s2 = std2(m, mu)
    // eta_e: finite squared slopes, in order
    var s = 0.0f
    var i = 1
    while (i < n) {
      val sl = (m(i) - m(i - 1)) / (t(i) - t(i - 1))
      val sq = sl * sl
      if (java.lang.Float.isFinite(sq)) s += sq
      i += 1
    }
    val dur = t(n - 1) - t(0)
    val nm1 = nf - 1.0f
    val etaE = dur * dur * s / s2 / (nm1 * nm1 * nm1)
    // lafler-kinman with cyclic wrap
    var lk = 0.0f
    i = 0
    while (i < n) {
      val next = if (i + 1 < n) i + 1 else 0
      val d = m(next) - m(i)
      lk += d * d
      i += 1
    }
    val lkv = lk / (2.0f * s2 * nm1)
    var mxDt = Float.NegativeInfinity
    var mnDt = Float.PositiveInfinity
    i = 1
    while (i < n) {
      val d = t(i) - t(i - 1)
      if (d > mxDt) mxDt = d
      if (d < mnDt) mnDt = d
      i += 1
    }
    val tMu = mean(t)
    val tStd = sqrtF(std2(t, tMu))
    Array(etaE, lkv, dur, tMu, tStd, mxDt, mnDt)
  }

  /** The f32 Bins meta-feature battery (q_bins_f32): downsample the
    * sorted series into `window`-second buckets with f32 accumulators
    * — the reference's `Bins<f32>` instantiation
    * (/root/reference/src/feature/bins.rs:171-201 under
    * float_trait.rs:30-120) — then the inner kernels over the binned
    * magnitudes: Mean, StandardDeviation, Amplitude and the
    * weighted-mean accumulation of [[evalWeighted]]. Bucket index is
    * `floor(t / window)` of the f32 quotient; per bucket the count /
    * Σ(m·w) / Σw accumulate in series order, `m* = Σmw/Σw`,
    * `w* = Σw/cnt`. Output: Array(nBins, binsMean, binsStd,
    * binsAmplitude, binsWeightedMean); binsStd is NaN below 2 bins
    * (callers filter). */
  def evalBins(t: Array[Float], m: Array[Float], w: Array[Float],
      window: Float): Array[Float] = {
    val n = t.length
    val bm = scala.collection.mutable.ArrayBuffer.empty[Float]
    val bw = scala.collection.mutable.ArrayBuffer.empty[Float]
    var i = 0
    while (i < n) {
      val j = math.floor((t(i) / window).toDouble)
      var cnt = 0.0f; var sMw = 0.0f; var sW = 0.0f
      while (i < n && math.floor((t(i) / window).toDouble) == j) {
        cnt += 1.0f
        sMw += m(i) * w(i)
        sW += w(i)
        i += 1
      }
      bm += sMw / sW
      bw += sW / cnt
    }
    val bmA = bm.toArray
    val bwA = bw.toArray
    val nb = bmA.length
    var sw = 0.0f; var swm = 0.0f
    var k = 0
    while (k < nb) { sw += bwA(k); swm += bwA(k) * bmA(k); k += 1 }
    Array(nb.toFloat,
      mean(bmA),
      if (nb >= 2) standardDeviation(bmA) else Float.NaN,
      amplitude(bmA),
      swm / sw)
  }

  /** The battery evaluated by q_simple_stats_f32, in output order. */
  def evalAll(t: Array[Float], m: Array[Float]): Array[Float] = {
    val n = m.length
    def guarded(min: Int, v: => Float): Float = if (n >= min) v else Float.NaN
    Array(
      amplitude(m),
      mean(m),
      median(m),
      guarded(2, standardDeviation(m)),
      guarded(2, meanVariance(m)),
      guarded(2, beyondNStd(m, 1.0f)),
      guarded(2, cusum(m)),
      guarded(2, eta(m)),
      guarded(2, maximumSlope(t, m)),
      guarded(3, skew(m)),
      guarded(4, kurtosis(m)))
  }
}
