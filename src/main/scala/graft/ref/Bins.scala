package graft.ref

/**
 * Downsampling by time bucket — the rollup core. Groups observations by
 * `j = floor((t - offset) / window)`; per bucket emits
 * `t* = (j + 0.5) * window` (offset NOT re-added), weighted mean
 * `m* = sum(m w) / sum(w)` and `w* = sum(w) / count`
 * (reference bins.rs:10-33 doc, :171-201 bin_time_series).
 *
 * These per-bucket sums are associative, which is what makes the
 * 1m -> 1h -> 1d tier cascade in the Spark engine recompute coarser
 * tiers from finer ones exactly: carrying (sum_mw, sum_w, count)
 * composes; carrying only (m*, w*) does not.
 */
object Bins {
  final case class Binned(t: Array[Double], m: Array[Double], w: Array[Double]) {
    def toLightCurve: LightCurve = new LightCurve(t, m, w)
  }

  def apply(lc: LightCurve, window: Double, offset: Double): Binned = {
    require(window > 0.0, "window must be positive")
    val tb = Array.newBuilder[Double]
    val mb = Array.newBuilder[Double]
    val wb = Array.newBuilder[Double]
    var i = 0
    val n = lc.n
    while (i < n) {
      val j = math.floor((lc.t(i) - offset) / window)
      var cnt = 0.0; var sumMw = 0.0; var sumW = 0.0
      while (i < n && math.floor((lc.t(i) - offset) / window) == j) {
        cnt += 1.0
        sumMw += lc.m(i) * lc.w(i)
        sumW += lc.w(i)
        i += 1
      }
      tb += (j + 0.5) * window
      mb += sumMw / sumW
      wb += sumW / cnt
    }
    Binned(tb.result(), mb.result(), wb.result())
  }
}

/**
 * Element-wise post-transforms of feature outputs (reference
 * transformers/mod.rs:102-138, clipped_lg.rs:13-41).
 */
object Transformers {
  type Transformer = Double => Double

  val Identity: Transformer = x => x
  val Arcsinh: Transformer = x => math.log(x + math.sqrt(x * x + 1.0))
  val Ln1p: Transformer = x => math.log1p(x)
  val Lg: Transformer = x => math.log10(x)
  val Sqrt: Transformer = x => math.sqrt(x)
  def clippedLg(minValue: Double): Transformer =
    x => math.log10(math.max(x, minValue))
  def composed(outer: Transformer, inner: Transformer): Transformer =
    x => outer(inner(x))
}

/**
 * Bins as a meta-feature (reference bins.rs via transformer_eval!,
 * macros.rs:87-104): downsample the series into `window`-second
 * buckets, then evaluate the inner extractor over the binned series.
 * Output names are prefixed `bins_` (per-child fill on failure, the
 * extractor's eval_or_fill semantics).
 */
final case class BinsFeature(inner: Seq[Feature], window: Double = 1.0,
    offset: Double = 0.0) extends Feature {
  require(inner.nonEmpty, "BinsFeature needs at least one inner feature")
  val name = "bins"
  override val names: Seq[String] = inner.flatMap(_.names.map(n => s"bins_$n"))
  override val minTsLength: Int = inner.map(_.minTsLength).max
  override val variabilityRequired: Boolean = inner.exists(_.variabilityRequired)
  override val tRequired = true
  override val wRequired = true
  def evalNoCheck(lc: LightCurve): Array[Double] = {
    val binned = Bins(lc, window, offset).toLightCurve
    graft.operators.SeriesFeatures.evalSeries(inner, Double.NaN)(
      binned.t, binned.m, binned.w)
  }
}
