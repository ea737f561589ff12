package graft.ref

/**
 * Single-node, single-series reference model: one irregularly sampled
 * time series `(t, m, w)` with lazily cached derived statistics.
 *
 * Semantics mirror the reference crate's `TimeSeries` / `DataSample` /
 * `SortedArray` (see /root/reference/src/data/time_series.rs:16-29,
 * data_sample.rs:10-22, sorted_array.rs:40-70) but the implementation is
 * original Scala. This class is the correctness oracle for every Spark
 * kernel in this engine: the distributed aggregators funnel each
 * `(series, bucket)` group through the same code at finish time, so
 * Spark results bit-match the single-node rollup by construction.
 *
 * Invariants:
 *  - `t` is monotonically non-decreasing (caller sorts by the stable
 *    order key before construction).
 *  - `w` are inverse squared errors (`w = 1/sigma^2`); unit weights for
 *    the unweighted path (reference `new_without_weight`,
 *    time_series.rs:110-136).
 *  - All math in Double (the reference's f64 flavor).
 */
final class LightCurve(val t: Array[Double], val m: Array[Double], val w: Array[Double]) {
  require(t.length == m.length && m.length == w.length, "t, m, w must have equal length")

  @inline def n: Int = t.length
  @inline def nf: Double = t.length.toDouble

  // --- m-column cached statistics (reference data_sample.rs getters) ---

  lazy val mSorted: Array[Double] = { val a = m.clone(); java.util.Arrays.sort(a); a }
  lazy val tSorted: Array[Double] = { val a = t.clone(); java.util.Arrays.sort(a); a }

  private lazy val mMinMax: (Double, Double) = LightCurve.minMax(m)
  def mMin: Double = mMinMax._1
  def mMax: Double = mMinMax._2

  lazy val mMean: Double = LightCurve.mean(m)
  lazy val tMean: Double = LightCurve.mean(t)

  /** Sample variance, two-pass: sum((x-mean)^2)/(n-1) — same summation
    * order as the reference (data_sample.rs:143-149), NOT Welford. */
  lazy val mStd2: Double = LightCurve.std2(m, mMean)
  lazy val mStd: Double = math.sqrt(mStd2)
  lazy val tStd2: Double = LightCurve.std2(t, tMean)
  lazy val tStd: Double = math.sqrt(tStd2)

  lazy val mMedian: Double = LightCurve.medianOfSorted(mSorted)

  /** R-5 quantile of the m column (sorted_array.rs:50-70). */
  def mPpf(q: Double): Double = LightCurve.ppf(mSorted, q)

  // --- weighted statistics (reference time_series.rs getters) ---

  lazy val mWeightedMean: Double = {
    var sw = 0.0; var swm = 0.0; var i = 0
    while (i < n) { sw += w(i); swm += w(i) * m(i); i += 1 }
    swm / sw
  }

  /** chi^2 around the weighted mean; zero marks a plateau. */
  lazy val mChi2: Double = {
    val wm = mWeightedMean
    var s = 0.0; var i = 0
    while (i < n) { val d = m(i) - wm; s += d * d * w(i); i += 1 }
    s
  }

  def mReducedChi2: Double = mChi2 / (nf - 1.0)

  /** All m equal (constant series) — `variability_required` guard. */
  lazy val isPlateau: Boolean = {
    if (n == 0) true
    else {
      var i = 1; var same = true
      while (same && i < n) { same = m(i) == m(0); i += 1 }
      same
    }
  }

  /** time of minimum / maximum m — first index wins for min, per
    * itertools position_minmax semantics (min: first, max: last). */
  lazy val tMinMaxM: (Double, Double) = {
    var iMin = 0; var iMax = 0; var i = 1
    while (i < n) {
      if (m(i) < m(iMin)) iMin = i
      if (m(i) >= m(iMax)) iMax = i
      i += 1
    }
    (t(iMin), t(iMax))
  }
}

object LightCurve {
  def apply(t: Array[Double], m: Array[Double], w: Array[Double]): LightCurve =
    new LightCurve(t, m, w)

  /** Unit-weight constructor (reference `new_without_weight`). */
  def unweighted(t: Array[Double], m: Array[Double]): LightCurve =
    new LightCurve(t, m, Array.fill(t.length)(1.0))

  private[ref] def minMax(a: Array[Double]): (Double, Double) = {
    var mn = a(0); var mx = a(0); var i = 1
    while (i < a.length) {
      val x = a(i)
      if (x > mx) mx = x else if (x < mn) mn = x
      i += 1
    }
    (mn, mx)
  }

  private[ref] def mean(a: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s / a.length
  }

  private[ref] def std2(a: Array[Double], mu: Double): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - mu; s += d * d; i += 1 }
    s / (a.length - 1)
  }

  /** Median of a pre-sorted array: midpoint of the two central elements
    * for even n (sorted_array.rs:40-48). */
  def medianOfSorted(sorted: Array[Double]): Double = {
    val len = sorted.length
    require(len > 0, "median of empty array")
    val i = (len - 1) / 2
    if (len % 2 == 0) 0.5 * (sorted(i) + sorted(i + 1)) else sorted(i)
  }

  /** R-5 quantile with linear interpolation, `h = n*q - 0.5`
    * (sorted_array.rs:50-70; scipy mquantiles alphap=betap=0.5). */
  def ppf(sorted: Array[Double], q: Double): Double = {
    val len = sorted.length
    require(len > 0, "ppf of empty array")
    require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0,1]")
    val h = len * q - 0.5
    val hFloor = math.floor(h)
    if (hFloor < 0.0) sorted(0)
    else {
      val i = hFloor.toInt
      if (i >= len - 1) sorted(len - 1)
      else sorted(i) + (h - hFloor) * (sorted(i + 1) - sorted(i))
    }
  }
}
