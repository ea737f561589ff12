package graft.ref

import org.apache.commons.math3.special.{Erf, Gamma}

/** Evaluation failure modes (reference src/error.rs:10-22). */
sealed trait EvalError
object EvalError {
  final case class ShortTimeSeries(actual: Int, minimum: Int) extends EvalError
  case object FlatTimeSeries extends EvalError
  final case class ZeroDivision(msg: String) extends EvalError
}

/**
 * One statistical kernel over a single series, with the reference's
 * evaluator contract (src/evaluator.rs:14-23,83-108,144-149):
 * declared output arity, minimum series length, variability guard,
 * `eval` returning an error for invalid input, and `evalOrFill`
 * replacing the whole output slice with a fill value on failure.
 */
trait Feature extends Serializable {
  def name: String

  /** Output column names; arity = names.length. */
  def names: Seq[String] = Seq(name)
  final def size: Int = names.length
  def minTsLength: Int = 1
  def variabilityRequired: Boolean = false

  /** Input-requirement flags (reference EvaluatorInfo,
    * src/evaluator.rs:14-23): which of t / m / w influence the
    * output. The engine uses them for column pruning decisions and
    * the contract suite probes them by perturbation
    * (tests.rs:150-232). `sorting_required` is not modelled — every
    * engine path feeds kernels pre-sorted by (t, turn_idx). */
  def tRequired: Boolean = false
  def mRequired: Boolean = true
  def wRequired: Boolean = false

  /** Kernel body; assumes checks already passed. */
  def evalNoCheck(lc: LightCurve): Array[Double]

  final def eval(lc: LightCurve): Either[EvalError, Array[Double]] = {
    if (lc.n < minTsLength) Left(EvalError.ShortTimeSeries(lc.n, minTsLength))
    else if (variabilityRequired && lc.isPlateau) Left(EvalError.FlatTimeSeries)
    else
      try Right(evalNoCheck(lc))
      catch {
        case FlatSeriesException => Left(EvalError.FlatTimeSeries)
        case ZeroDivisionException(msg) => Left(EvalError.ZeroDivision(msg))
      }
  }

  final def evalOrFill(lc: LightCurve, fill: Double): Array[Double] =
    eval(lc).getOrElse(Array.fill(size)(fill))
}

private[ref] case object FlatSeriesException extends RuntimeException
private[ref] final case class ZeroDivisionException(msg: String) extends RuntimeException

/**
 * The complete single-band kernel inventory of the reference crate
 * (SURVEY.md §2.1; enum src/feature.rs:25-67), re-expressed in Scala.
 * Each object cites its reference definition.
 */
object Features {

  /** `(max(m) - min(m)) / 2` — amplitude.rs:67-69. */
  case object Amplitude extends Feature {
    val name = "amplitude"
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(0.5 * (lc.mMax - lc.mMin))
  }

  /** Unbiased Anderson–Darling normality statistic over sorted m
    * (anderson_darling_normal.rs:66-88, lnerfc.rs). */
  case object AndersonDarlingNormal extends Feature {
    val name = "anderson_darling_normal"
    override val minTsLength = 4
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val n = lc.n
      val mu = lc.mMean
      val sd = lc.mStd
      val s = lc.mSorted
      val invSqrt2 = 1.0 / math.sqrt(2.0)
      var sum = 0.0
      var i = 0
      while (i < n) {
        val x = (s(i) - mu) / sd * invSqrt2
        sum += (2 * i + 1).toDouble * LnErfc(-x) + (2 * (n - i) - 1).toDouble * LnErfc(x)
        i += 1
      }
      val nf = lc.nf
      val coeff = 1.0 + 4.0 / nf - math.pow(5.0 / nf, 2)
      Array(coeff * (nf * (2.0 * math.log(2.0) - 1.0) - sum / nf))
    }
  }

  /** Fraction of observations with `|m - mean| > nstd * sigma`
    * (beyond_n_std.rs:137-147; default nstd = 1). */
  final case class BeyondNStd(nstd: Double = 1.0) extends Feature {
    val name = s"beyond_${fmtParam(nstd)}_std"
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val mu = lc.mMean
      val thr = lc.mStd * nstd
      var c = 0; var i = 0
      while (i < lc.n) { if (math.abs(lc.m(i) - mu) > thr) c += 1; i += 1 }
      Array(c / lc.nf)
    }
  }

  /** Tukey biweight midvariance scale, c=9, MAD-normalized; 0 when
    * MAD == 0 (biweight_scale.rs:134-180). */
  final case class BiweightScale(c: Double = 9.0) extends Feature {
    val name = "biweight_scale"
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val med = lc.mMedian
      val dev = lc.m.map(x => math.abs(x - med))
      java.util.Arrays.sort(dev)
      val mad = LightCurve.medianOfSorted(dev)
      if (mad <= 0.0) return Array(0.0)
      val denom = c * mad
      var num = 0.0; var den = 0.0; var i = 0
      while (i < lc.n) {
        val d = lc.m(i) - med
        val u2 = (d / denom) * (d / denom)
        if (u2 < 1.0) {
          val om = 1.0 - u2
          num += d * d * om * om * om * om
          den += om * (1.0 - 5.0 * u2)
        }
        i += 1
      }
      Array(math.sqrt(lc.nf * num / (den * den)))
    }
  }

  /** `p = Q((N-1)/2, chi2/2)` regularized upper incomplete gamma,
    * clamped to [0,1] (chi2_pvar.rs:70-76). */
  case object Chi2Pvar extends Feature {
    val name = "chi2_pvar"
    override val wRequired = true
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val dof = (lc.n - 1).toDouble
      val p = Gamma.regularizedGammaQ(dof / 2.0, lc.mChi2 / 2.0)
      Array(math.min(1.0, math.max(0.0, p)))
    }
  }

  /** Range of the normalized cumulative sum in time order
    * (cusum.rs:66-78). */
  case object Cusum extends Feature {
    val name = "cusum"
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val mu = lc.mMean
      var s = 0.0; var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
      var i = 0
      while (i < lc.n) {
        s += lc.m(i) - mu
        if (s < mn) mn = s
        if (s > mx) mx = s
        i += 1
      }
      Array((mx - mn) / (lc.mStd * lc.nf))
    }
  }

  /** `t[N-1] - t[0]` (duration.rs:59-61). */
  case object Duration extends Feature {
    val name = "duration"
    override val tRequired = true
    override val mRequired = false
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.t(lc.n - 1) - lc.t(0))
  }

  /** Von Neumann eta: `sum((m[i+1]-m[i])^2) / ((N-1) sigma^2)` in time
    * order (eta.rs:62-73). */
  case object Eta extends Feature {
    val name = "eta"
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      var s = 0.0; var i = 1
      while (i < lc.n) { val d = lc.m(i) - lc.m(i - 1); s += d * d; i += 1 }
      Array(s / (lc.nf - 1.0) / lc.mStd2)
    }
  }

  /** Eta for uneven cadence: `dur^2 * sum((dm/dt)^2) / (sigma^2 (N-1)^3)`,
    * non-finite slope terms dropped (eta_e.rs:67-82). */
  case object EtaE extends Feature {
    val name = "eta_e"
    override val tRequired = true
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      var s = 0.0; var i = 1
      while (i < lc.n) {
        val sl = (lc.m(i) - lc.m(i - 1)) / (lc.t(i) - lc.t(i - 1))
        val sq = sl * sl
        if (java.lang.Double.isFinite(sq)) s += sq
        i += 1
      }
      val dur = lc.t(lc.n - 1) - lc.t(0)
      Array(dur * dur * s / lc.mStd2 / math.pow(lc.nf - 1.0, 3))
    }
  }

  /** `(sigma^2 - mean(1/w)) / mean(m)^2` (excess_variance.rs:62-67). */
  case object ExcessVariance extends Feature {
    val name = "excess_variance"
    override val wRequired = true
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < lc.n) { s += 1.0 / lc.w(i); i += 1 }
      val meanErr2 = s / lc.nf
      Array((lc.mStd2 - meanErr2) / (lc.mMean * lc.mMean))
    }
  }

  /** `ppf(1-q) - ppf(q)` with R-5 quantiles
    * (inter_percentile_range.rs:100-106; default q = 0.25). */
  final case class InterPercentileRange(quantile: Double = 0.25) extends Feature {
    val name = s"inter_percentile_range_${fmtParam(quantile)}"
    def evalNoCheck(lc: LightCurve): Array[Double] =
      Array(lc.mPpf(1.0 - quantile) - lc.mPpf(quantile))
  }

  /** Unbiased excess kurtosis G2 with exact small-N corrections
    * (kurtosis.rs:63-78). */
  case object Kurtosis extends Feature {
    val name = "kurtosis"
    override val minTsLength = 4
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val mu = lc.mMean
      var m4 = 0.0; var i = 0
      while (i < lc.n) { val d = lc.m(i) - mu; m4 += d * d * d * d; i += 1 }
      val n = lc.nf
      val s2 = lc.mStd2
      Array(m4 / (s2 * s2) * n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0))
        - 3.0 * (n - 1.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0)))
    }
  }

  /** Lafler–Kinman string length with cyclic wrap
    * (lafler_kinman_string_length.rs:86-100). */
  case object LaflerKinmanStringLength extends Feature {
    val name = "lafler_kinman_string_length"
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val n = lc.n
      var s = 0.0; var i = 0
      while (i < n) {
        val next = if (i + 1 < n) i + 1 else 0
        val d = lc.m(next) - lc.m(i)
        s += d * d
        i += 1
      }
      Array(s / (2.0 * lc.mStd2 * (lc.nf - 1.0)))
    }
  }

  /** Weighted least-squares straight line, errors known; outputs
    * slope, sigma_slope, reduced chi2 (linear_fit.rs:73-80,
    * straight_line_fit.rs:12-74). */
  case object LinearFit extends Feature {
    val name = "linear_fit"
    override val tRequired = true
    override val wRequired = true
    override val names = Seq("linear_fit_slope", "linear_fit_slope_sigma", "linear_fit_reduced_chi2")
    override val minTsLength = 3
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val r = StraightLineFit.fit(lc, knownErrors = true)
      Array(r.slope, math.sqrt(r.slopeSigma2), r.reducedChi2)
    }
  }

  /** Unweighted straight line; outputs slope, sigma_slope, noise level
    * sqrt(reduced chi2) (linear_trend.rs:67-74). */
  case object LinearTrend extends Feature {
    val name = "linear_trend"
    override val tRequired = true
    override val names = Seq("linear_trend", "linear_trend_sigma", "linear_trend_noise")
    override val minTsLength = 3
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val r = StraightLineFit.fit(lc, knownErrors = false)
      Array(r.slope, math.sqrt(r.slopeSigma2), math.sqrt(r.reducedChi2))
    }
  }

  /** `(ppf(1-qn)-ppf(qn)) / (ppf(1-qd)-ppf(qd))`; FlatTimeSeries when
    * both are zero (magnitude_percentage_ratio.rs:121-134). */
  final case class MagnitudePercentageRatio(qn: Double = 0.4, qd: Double = 0.05) extends Feature {
    val name = s"magnitude_percentage_ratio_${fmtParam(qn)}_${fmtParam(qd)}"
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val num = lc.mPpf(1.0 - qn) - lc.mPpf(qn)
      val den = lc.mPpf(1.0 - qd) - lc.mPpf(qd)
      if (num == 0.0 && den == 0.0) throw FlatSeriesException
      Array(num / den)
    }
  }

  /** `max |dm/dt|`, non-finite dropped (maximum_slope.rs:61-77). */
  case object MaximumSlope extends Feature {
    val name = "maximum_slope"
    override val tRequired = true
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      var best = Double.NegativeInfinity; var found = false; var i = 1
      while (i < lc.n) {
        val v = math.abs((lc.m(i) - lc.m(i - 1)) / (lc.t(i) - lc.t(i - 1)))
        if (java.lang.Double.isFinite(v)) { found = true; if (v > best) best = v }
        i += 1
      }
      if (!found) throw ZeroDivisionException("all points share the same time")
      Array(best)
    }
  }

  /** `max(dt)` (maximum_time_interval.rs:60-69). */
  case object MaximumTimeInterval extends Feature {
    val name = "maximum_time_interval"
    override val tRequired = true
    override val mRequired = false
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      var best = Double.NegativeInfinity; var i = 1
      while (i < lc.n) { val d = lc.t(i) - lc.t(i - 1); if (d > best) best = d; i += 1 }
      Array(best)
    }
  }

  /** `min(dt)` (minimum_time_interval.rs:60-69). */
  case object MinimumTimeInterval extends Feature {
    val name = "minimum_time_interval"
    override val tRequired = true
    override val mRequired = false
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      var best = Double.PositiveInfinity; var i = 1
      while (i < lc.n) { val d = lc.t(i) - lc.t(i - 1); if (d < best) best = d; i += 1 }
      Array(best)
    }
  }

  /** Arithmetic mean of m (mean.rs:58-60). */
  case object Mean extends Feature {
    val name = "mean"
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.mMean)
  }

  /** `sigma / mean` (mean_variance.rs:57-59). */
  case object MeanVariance extends Feature {
    val name = "mean_variance"
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.mStd / lc.mMean)
  }

  /** Midpoint median (median.rs:57-59). */
  case object Median extends Feature {
    val name = "median"
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.mMedian)
  }

  /** `median(|m - median(m)|)` (median_absolute_deviation.rs:60-69). */
  case object MedianAbsoluteDeviation extends Feature {
    val name = "median_absolute_deviation"
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val med = lc.mMedian
      val dev = lc.m.map(x => math.abs(x - med))
      java.util.Arrays.sort(dev)
      Array(LightCurve.medianOfSorted(dev))
    }
  }

  /** Fraction with `|m - median| < q * amplitude`
    * (median_buffer_range_percentage.rs:117-129; default q = 0.1). */
  final case class MedianBufferRangePercentage(quantile: Double = 0.1) extends Feature {
    val name = s"median_buffer_range_percentage_${fmtParam(quantile)}"
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val med = lc.mMedian
      val thr = quantile * 0.5 * (lc.mMax - lc.mMin)
      var c = 0; var i = 0
      while (i < lc.n) { if (math.abs(lc.m(i) - med) < thr) c += 1; i += 1 }
      Array(c / lc.nf)
    }
  }

  /** N (observation_count.rs:59-61). */
  case object ObservationCount extends Feature {
    val name = "observation_count"
    override val mRequired = false
    override val minTsLength = 0
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.nf)
  }

  /** Otsu split of sorted m maximizing inter-class variance; outputs
    * mean_diff, std_lower, std_upper, lower_to_all_ratio
    * (otsu_split.rs:51-127,154-177). */
  case object OtsuSplit extends Feature {
    val name = "otsu_split"
    override val names = Seq(
      "otsu_mean_diff", "otsu_std_lower", "otsu_std_upper", "otsu_lower_to_all_ratio")
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val s = lc.mSorted
      val n = s.length
      if (s(0) == s(n - 1)) throw FlatSeriesException
      // prefix/suffix cumulative sums; split k puts k+1 points in the
      // lower class, n-1-k in the upper (k = 0..n-2)
      var bestK = 0; var bestVar = Double.NegativeInfinity
      var prefix = 0.0
      val total = { var tt = 0.0; var i = 0; while (i < n) { tt += s(i); i += 1 }; tt }
      // suffix sums must reproduce the reference's reversed-cumsum
      // rounding exactly, so accumulate from the right like it does
      val suffix = new Array[Double](n) // suffix(k) = sum of s(k..n-1)
      var acc = 0.0
      var j = n - 1
      while (j >= 0) { acc += s(j); suffix(j) = acc; j -= 1 }
      val _ = total
      var k = 0
      while (k < n - 1) {
        prefix += s(k)
        val a1 = (k + 1).toDouble
        val a2 = (n - 1 - k).toDouble
        val mean1 = prefix / a1
        val mean2 = suffix(k + 1) / a2
        val w1 = a1 / n
        val w2 = 1.0 - w1
        val icv = w1 * w2 * (mean1 - mean2) * (mean1 - mean2)
        if (icv > bestVar) { bestVar = icv; bestK = k }
        k += 1
      }
      val lowerLen = bestK + 1
      val upperLen = n - lowerLen
      val lower = java.util.Arrays.copyOfRange(s, 0, lowerLen)
      val upper = java.util.Arrays.copyOfRange(s, lowerLen, n)
      val meanLower = LightCurve.mean(lower)
      val meanUpper = LightCurve.mean(upper)
      val stdLower = if (lowerLen == 1) 0.0 else math.sqrt(LightCurve.std2(lower, meanLower))
      val stdUpper = if (upperLen == 1) 0.0 else math.sqrt(LightCurve.std2(upper, meanUpper))
      Array(meanUpper - meanLower, stdLower, stdUpper, lowerLen / lc.nf)
    }
  }

  /** `max(max - median, median - min)` (percent_amplitude.rs:60-65). */
  case object PercentAmplitude extends Feature {
    val name = "percent_amplitude"
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val med = lc.mMedian
      Array(math.max(lc.mMax - med, med - lc.mMin))
    }
  }

  /** `(ppf(1-q) - ppf(q)) / median`; ZeroDivision when both are zero
    * (percent_difference_magnitude_percentile.rs:100-109; q = 0.05). */
  final case class PercentDifferenceMagnitudePercentile(quantile: Double = 0.05) extends Feature {
    val name = s"percent_difference_magnitude_percentile_${fmtParam(quantile)}"
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val num = lc.mPpf(1.0 - quantile) - lc.mPpf(quantile)
      val den = lc.mMedian
      if (num == 0.0 && den == 0.0) throw ZeroDivisionException("median magnitude is zero")
      Array(num / den)
    }
  }

  /** `chi2 / (N-1)` around the weighted mean (reduced_chi2.rs:63-65). */
  case object ReducedChi2 extends Feature {
    val name = "reduced_chi2"
    override val wRequired = true
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.mReducedChi2)
  }

  /** Robust median statistic: `sum(|m-median| sqrt(w)) / (N-1)`,
    * non-finite dropped (roms.rs:61-73). */
  case object Roms extends Feature {
    val name = "roms"
    override val wRequired = true
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val med = lc.mMedian
      var s = 0.0; var i = 0
      while (i < lc.n) {
        val v = math.abs(lc.m(i) - med) * math.sqrt(lc.w(i))
        if (java.lang.Double.isFinite(v)) s += v
        i += 1
      }
      Array(s / (lc.nf - 1.0))
    }
  }

  /** Unbiased sample skewness G1 (skew.rs:62-73). */
  case object Skew extends Feature {
    val name = "skew"
    override val minTsLength = 3
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val mu = lc.mMean
      var m3 = 0.0; var i = 0
      while (i < lc.n) { val d = lc.m(i) - mu; m3 += d * d * d; i += 1 }
      val n = lc.nf
      Array(m3 / math.pow(lc.mStd, 3) * n / ((n - 1.0) * (n - 2.0)))
    }
  }

  /** Sample standard deviation, ddof=1 (standard_deviation.rs:62-64). */
  case object StandardDeviation extends Feature {
    val name = "standard_deviation"
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.mStd)
  }

  /** Stetson K: `sum(|m - wmean| sqrt(w)) / sqrt(N chi2)`
    * (stetson_k.rs:64-71). */
  case object StetsonK extends Feature {
    val name = "stetson_k"
    override val wRequired = true
    override val minTsLength = 2
    override val variabilityRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = {
      val wm = lc.mWeightedMean
      var s = 0.0; var i = 0
      while (i < lc.n) { s += math.abs(lc.m(i) - wm) * math.sqrt(lc.w(i)); i += 1 }
      Array(s / math.sqrt(lc.nf * lc.mChi2))
    }
  }

  /** Mean of t (time_mean.rs:57-59). */
  case object TimeMean extends Feature {
    val name = "time_mean"
    override val tRequired = true
    override val mRequired = false
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.tMean)
  }

  /** Sample sigma of t (time_standard_deviation.rs:59-61). */
  case object TimeStandardDeviation extends Feature {
    val name = "time_standard_deviation"
    override val tRequired = true
    override val mRequired = false
    override val minTsLength = 2
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.tStd)
  }

  /** `sum(m w) / sum(w)` (weighted_mean.rs:58-60). */
  case object WeightedMean extends Feature {
    val name = "weighted_mean"
    override val wRequired = true
    def evalNoCheck(lc: LightCurve): Array[Double] = Array(lc.mWeightedMean)
  }

  private def fmtParam(x: Double): String = {
    val s = BigDecimal(x).underlying.stripTrailingZeros.toPlainString
    s.replace("-", "m").replace(".", "_")
  }

  /** Default-parameter instances of every single-band kernel, in the
    * reference enum's order (src/feature.rs:25-67). */
  val all: Seq[Feature] = Seq(
    Amplitude, AndersonDarlingNormal, BeyondNStd(), BiweightScale(), Chi2Pvar,
    Cusum, Duration, Eta, EtaE, ExcessVariance, InterPercentileRange(),
    Kurtosis, LaflerKinmanStringLength, LinearFit, LinearTrend,
    MagnitudePercentageRatio(), MaximumSlope, MaximumTimeInterval,
    MinimumTimeInterval, Mean, MeanVariance, Median, MedianAbsoluteDeviation,
    MedianBufferRangePercentage(), ObservationCount, OtsuSplit,
    PercentAmplitude, PercentDifferenceMagnitudePercentile(), ReducedChi2,
    Roms, Skew, StandardDeviation, StetsonK, TimeMean, TimeStandardDeviation,
    WeightedMean)
}

/** Weighted/unweighted straight-line fit, Press et al. §15.2
  * (straight_line_fit.rs:12-74). */
object StraightLineFit {
  final case class Result(slope: Double, intercept: Double, slopeSigma2: Double, reducedChi2: Double)

  def fit(lc: LightCurve, knownErrors: Boolean): Result = {
    val n = lc.nf
    var s = 0.0; var sx = 0.0; var sy = 0.0
    var i = 0
    if (knownErrors) {
      while (i < lc.n) { s += lc.w(i); sx += lc.w(i) * lc.t(i); sy += lc.w(i) * lc.m(i); i += 1 }
    } else {
      s = n
      while (i < lc.n) { sx += lc.t(i); sy += lc.m(i); i += 1 }
    }
    var stt = 0.0; var sty = 0.0
    i = 0
    while (i < lc.n) {
      val tt = lc.t(i) - sx / s
      if (knownErrors) { stt += lc.w(i) * tt * tt; sty += lc.w(i) * tt * lc.m(i) }
      else { stt += tt * tt; sty += tt * lc.m(i) }
      i += 1
    }
    val slope = sty / stt
    val intercept = (sy - sx * slope) / s
    var slopeSigma2 = 1.0 / stt
    var chi2 = 0.0
    i = 0
    while (i < lc.n) {
      val r = lc.m(i) - intercept - slope * lc.t(i)
      chi2 += (if (knownErrors) r * r * lc.w(i) else r * r)
      i += 1
    }
    val reducedChi2 = chi2 / (n - 2.0)
    if (!knownErrors) slopeSigma2 *= reducedChi2
    Result(slope, intercept, slopeSigma2, reducedChi2)
  }
}

/** Natural log of the complementary error function; same branch
  * structure as the reference's GSL-derived `ln_erfc`
  * (lnerfc.rs:9-17): small-|x| Taylor-style series, large-x asymptotic
  * rational, direct `ln(erfc(x))` otherwise. */
object LnErfc {
  private val SmallCut = 2.4607833005759251e-02 // 10 * DBL_EPSILON^(1/6)
  private val SqrtPi = 1.77245385090551602729816748334

  def apply(x: Double): Double =
    if (x * x < SmallCut) smallAbs(x)
    else if (x > 8.0) large(x)
    else math.log(Erf.erfc(x))

  // series for -1/2 ln(erfc(sqrt(pi) y)), highest order first
  private val C: Array[Double] = Array(
    0.00048204, -0.00142906, 0.0013200243174, 0.0009461589032,
    -0.0045563339802, 0.00556964649138, 0.00125993961762116,
    -0.01621575378835404, 0.02629651521057465, -0.001829764677455021,
    2.0 * (1.0 - math.Pi / 3.0), (4.0 - math.Pi) / 3.0, 1.0, 1.0, 0.0)

  private val P: Array[Double] = Array(
    0.5641895835477550741253201704, 1.275366644729965952479585264,
    5.019049726784267463450058, 6.1602098531096305440906,
    7.409740605964741794425, 2.97886562639399288862)

  private val Q: Array[Double] = Array(
    1.0, 2.260528520767326969591866945, 9.396034016235054150430579648,
    12.0489519278551290360340491, 17.08144074746600431571095,
    9.608965327192787870698, 3.3690752069827527677)

  private def horner(a: Array[Double], x: Double): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc = acc * x + a(i); i += 1 }
    acc
  }

  private def smallAbs(x: Double): Double = -2.0 * horner(C, x / SqrtPi)

  private def large(x: Double): Double =
    math.log(horner(P, x) / horner(Q, x)) - x * x
}
