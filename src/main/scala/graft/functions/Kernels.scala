package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Catalyst-native (whole-stage-codegen'd) aggregate expressions for the
 * kernels Spark's built-ins can express exactly (SURVEY.md §2.1 "Spark
 * primitive" column). Each returns a Column to be used inside one
 * `groupBy(series, bucket).agg(...)` — Catalyst collapses the shared
 * sub-aggregates (sum(w), avg(m), ...) into a single physical aggregate,
 * mirroring the reference's memoized shared statistics
 * (/root/reference/src/data/data_sample.rs:33-65).
 *
 * Kernels that need the sorted array or a sequential scan live in
 * [[graft.operators.SeriesFeatures]] instead.
 */
object Kernels {

  /** `(max(m) - min(m)) / 2` — reference amplitude.rs:67-69. */
  def amplitude(m: Column): Column = (max(m) - min(m)) / 2.0

  /** Arithmetic mean — mean.rs:58-60. */
  def mean(m: Column): Column = avg(m)

  /** Sample sigma (ddof=1) — standard_deviation.rs:62-64. */
  def standardDeviation(m: Column): Column = stddev_samp(m)

  /** `sigma / mean` — mean_variance.rs:57-59. */
  def meanVariance(m: Column): Column = stddev_samp(m) / avg(m)

  /** `sum(m w) / sum(w)` — weighted_mean.rs:58-60. */
  def weightedMean(m: Column, w: Column): Column = sum(m * w) / sum(w)

  /** chi2 around the weighted mean via the exact algebraic expansion
    * `sum(w m^2) - (sum(w m))^2 / sum(w)` — one distributed pass; equals
    * the reference two-pass form (time_series.rs:155-166) to float
    * round-off. */
  def chi2(m: Column, w: Column): Column =
    sum(w * m * m) - sum(m * w) * sum(m * w) / sum(w)

  /** `chi2 / (N-1)` — reduced_chi2.rs:63-65. */
  def reducedChi2(m: Column, w: Column): Column =
    chi2(m, w) / (count(lit(1)) - 1.0)

  /** `(sigma^2 - mean(1/w)) / mean(m)^2` — excess_variance.rs:62-67. */
  def excessVariance(m: Column, w: Column): Column =
    (var_samp(m) - avg(lit(1.0) / w)) / (avg(m) * avg(m))

  /** `max(t) - min(t)`; equals `t[N-1] - t[0]` under sorted t —
    * duration.rs:59-61. */
  def duration(t: Column): Column = max(t) - min(t)

  /** Mean observation time — time_mean.rs:57-59. */
  def timeMean(t: Column): Column = avg(t)

  /** Sample sigma of t — time_standard_deviation.rs:59-61. */
  def timeStandardDeviation(t: Column): Column = stddev_samp(t)

  /** N — observation_count.rs:59-61. */
  def observationCount(): Column = count(lit(1))

  /** Unbiased excess kurtosis G2 from raw moments — kurtosis.rs:63-78.
    * `d4` must be `sum((m - mean)^4)` computed against the group mean
    * (use [[centralMoments]] via a window pre-pass, or the object-buffer
    * path). This variant takes pre-computed columns. */
  def kurtosisFromMoments(n: Column, s2: Column, m4: Column): Column =
    m4 / (s2 * s2) * n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0)) -
      lit(3.0) * (n - 1.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))

  /** Unbiased skewness G1 from raw moments — skew.rs:62-73. */
  def skewFromMoments(n: Column, sd: Column, m3: Column): Column =
    m3 / pow(sd, 3.0) * n / ((n - 1.0) * (n - 2.0))

  // --- Bins / tier rollup primitives (bins.rs:171-201) ---

  /** Bucket index `j = floor((t - offset) / window)`. */
  def binIndex(t: Column, window: Double, offset: Double = 0.0): Column =
    floor((t - offset) / window)

  /** Bucket center time `(j + 0.5) * window` (offset not re-added). */
  def binTime(j: Column, window: Double): Column = (j + 0.5) * window

  /** Binned magnitude `sum(m w) / sum(w)`. */
  def binM(m: Column, w: Column): Column = sum(m * w) / sum(w)

  /** Binned weight `sum(w) / count`. */
  def binW(w: Column): Column = sum(w) / count(lit(1))
}
