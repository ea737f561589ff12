package graft.engine

import graft.ref.Feature
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One rolled-up point of a retention tier. `n/sumW/sumMw` are the
  * associative carries that make the 1m -> 1h -> 1d cascade exact
  * (reference Bins semantics, /root/reference/src/features/bins.rs:
  * 171-201: m* = sum(m w)/sum(w), w* = sum(w)/count); `feats` is the
  * reference extractor's concatenated output vector over the bucket's
  * input points (extractor.rs:111-121), NaN-filled on failure
  * (eval_or_fill, evaluator.rs:144-149). */
final case class TierPoint(
    n: Long, sumW: Double, sumMw: Double,
    binM: Double, binW: Double, feats: Array[Double])

final case class TierSpec(name: String, window: Long)

/**
 * The retention-tier rollup engine (the north rule's core).
 *
 * Every tier is one `groupBy(conv_id, bucket)` hash aggregation — the
 * single shuffle — whose per-group state is the sorted collected input
 * points. All per-bucket math (carry sums AND feature kernels) runs in
 * ONE deterministic pass over that sorted array, by the same
 * single-node code as the reference port, so distributed results
 * bit-match the single-node rollup by construction regardless of
 * partitioning / merge order (SURVEY.md §7 "what's hard" #1).
 *
 * Scale design (10^12 turns):
 *  - the group key includes the time bucket, so a hot conversation's
 *    turns spread across buckets — per-group state is bounded by
 *    turns-per-minute at the finest tier, and by window ratio
 *    (60 / 24 rows) for cascaded tiers;
 *  - coarser tiers NEVER touch raw turns: they re-aggregate the finer
 *    tier's (exactly carried) bucket points, so the 1h/1d passes scan
 *    60x/1440x less data;
 *  - collect_list runs as ObjectHashAggregate with map-side partial
 *    lists and sort-based spill fallback — skewed groups degrade to
 *    disk, they don't OOM;
 *  - gap-fill is `sequence` + explode + LOCF window: pure Catalyst,
 *    no driver loops.
 */
object Rollup {

  val Tiers: Seq[TierSpec] =
    Seq(TierSpec("1m", 60L), TierSpec("1h", 3600L), TierSpec("1d", 86400L))

  /** Default per-bucket kernel battery: the moment/robust kernels the
    * north star calls out (amplitude, mean-variance, skew/kurtosis,
    * Stetson-K) plus the cheap always-useful ones. */
  def defaultFeatures: Seq[Feature] = {
    import graft.ref.Features._
    Seq(ObservationCount, Mean, Amplitude, StandardDeviation, MeanVariance,
      WeightedMean, ReducedChi2, Skew, Kurtosis, StetsonK, Median, Eta)
  }

  /** The one shared per-bucket computation: carries + features over
    * points pre-sorted by (t, idx). Raw turns enter with
    * n=1, sumW=w, sumMw=m*w; tier points enter with their carries. */
  def evalBucket(features: Seq[Feature])(
      t: Array[Double], m: Array[Double], w: Array[Double],
      ns: Array[Long], sws: Array[Double], smws: Array[Double]): TierPoint = {
    var n = 0L; var sw = 0.0; var smw = 0.0
    var i = 0
    val len = ns.length
    while (i < len) { n += ns(i); sw += sws(i); smw += smws(i); i += 1 }
    val feats = graft.operators.SeriesFeatures.evalSeries(features, Double.NaN)(t, m, w)
    TierPoint(n, sw, smw, smw / sw, sw / n, feats)
  }

  /** Raw-turn variant: carries derived in place (n=1, sw=w(i),
    * smw=m(i)*w(i)) in the same sorted order and with the same float
    * operations as [[evalBucket]] over [[RefRollup.fromTurns]] arrays —
    * bit-identical results, 3 fewer struct fields on the engine's
    * biggest shuffle (the raw-turn collect). */
  def evalBucketRaw(features: Seq[Feature])(
      t: Array[Double], m: Array[Double], w: Array[Double]): TierPoint = {
    var n = 0L; var sw = 0.0; var smw = 0.0
    var i = 0
    val len = w.length
    while (i < len) { n += 1L; sw += w(i); smw += m(i) * w(i); i += 1 }
    val feats = graft.operators.SeriesFeatures.evalSeries(features, Double.NaN)(t, m, w)
    TierPoint(n, sw, smw, smw / sw, sw / n, feats)
  }

  /** Finest tier straight from the turn series
    * (columns conv_id, turn_idx, t, m, w — see [[Transcripts.series]]).
    *
    * The per-bucket state is the native [[graft.plans.BucketAggExpr]]
    * typed aggregate (primitive-array buffers, kernels run in the
    * aggregate's finish): one ObjectHashAggregate shuffle, no
    * struct-array materialization and no UDF boundary on the engine's
    * dominant path. Bit-parity with the declarative collect_list/UDF
    * form (kept as a measurement baseline in [[RollupBaselines]]) is
    * asserted in RollupParitySpec. */
  def tierFromTurns(series: DataFrame, window: Long,
      features: Seq[Feature] = defaultFeatures): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val agg = graft.plans.BucketAggExpr(
      GraftSqlBridge.expressionOf(col("t").cast("double")),
      GraftSqlBridge.expressionOf(col("turn_idx").cast("long")),
      GraftSqlBridge.expressionOf(col("m").cast("double")),
      GraftSqlBridge.expressionOf(col("w").cast("double")),
      features)
    val names = graft.operators.SeriesFeatures.outputNames(features)
    series
      .groupBy(col("conv_id"), floor(col("t") / window.toDouble).cast("long").as("bucket"))
      .agg(GraftSqlBridge.aggColumn(agg).as("pt"))
      .select(
        (Seq(
          col("conv_id"), col("bucket"),
          ((col("bucket") + 0.5) * window.toDouble).as("bucket_t"),
          col("pt.n").as("n"), col("pt.sumW").as("sum_w"),
          col("pt.sumMw").as("sum_mw"), col("pt.binM").as("bin_m"),
          col("pt.binW").as("bin_w")) ++
          names.zipWithIndex.map { case (nm, i) => col("pt.feats").getItem(i).as(nm) }): _*)
  }

  /**
   * Salted raw-tier build for hot-key skew: a conversation bursting
   * thousands of turns inside ONE bucket still lands on a single task
   * in [[tierFromTurns]]. Here the collect runs in two phases —
   * partial collects on (conv_id, bucket, salt = turn_idx % k), then a
   * merge that flattens + re-sorts the partial arrays — so no single
   * task ever materializes a hot bucket's raw turns alone. The final
   * per-bucket pass sorts the merged points by (t, idx), the same
   * total order as the unsalted path: results are bit-identical
   * (asserted in RollupParitySpec).
   */
  def tierFromTurnsSalted(series: DataFrame, window: Long,
      features: Seq[Feature] = defaultFeatures, saltBuckets: Int = 8): DataFrame = {
    val eval = udf(evalBucketRaw(features) _)
    val names = graft.operators.SeriesFeatures.outputNames(features)
    val partial = series
      .groupBy(col("conv_id"),
        floor(col("t") / window.toDouble).cast("long").as("bucket"),
        pmod(col("turn_idx"), lit(saltBuckets)).as("salt"))
      .agg(collect_list(struct(
        col("t").cast("double").as("t"),
        col("turn_idx").cast("long").as("i"),
        col("m").cast("double").as("m"),
        col("w").cast("double").as("w"))).as("part"))
    val merged = partial
      .groupBy(col("conv_id"), col("bucket"))
      .agg(sort_array(flatten(collect_list(col("part")))).as("pts"))
    val p = col("pts")
    val withPoint = merged
      .withColumn("pt", eval(p.getField("t"), p.getField("m"), p.getField("w")))
      .drop("pts")
    withPoint.select(
      (Seq(
        col("conv_id"), col("bucket"),
        ((col("bucket") + 0.5) * window.toDouble).as("bucket_t"),
        col("pt.n").as("n"), col("pt.sumW").as("sum_w"),
        col("pt.sumMw").as("sum_mw"), col("pt.binM").as("bin_m"),
        col("pt.binW").as("bin_w")) ++
        names.zipWithIndex.map { case (nm, i) => col("pt.feats").getItem(i).as(nm) }): _*)
  }

  /** Cascade: coarser tier from a finer tier's points. The finer
    * bucket index is the stable order key; t of a tier point is its
    * bucket center, m its weighted mean, w its mean weight —
    * reference Bins-then-features semantics (bins.rs:10-33). Same
    * native typed-aggregate shape as [[tierFromTurns]], with the
    * carries riding the buffer. */
  def tierFromTier(finer: DataFrame, window: Long,
      features: Seq[Feature] = defaultFeatures): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val agg = graft.plans.CarryBucketAggExpr(
      GraftSqlBridge.expressionOf(col("bucket_t").cast("double")),
      GraftSqlBridge.expressionOf(col("bucket").cast("long")),
      GraftSqlBridge.expressionOf(col("bin_m").cast("double")),
      GraftSqlBridge.expressionOf(col("bin_w").cast("double")),
      GraftSqlBridge.expressionOf(col("n").cast("long")),
      GraftSqlBridge.expressionOf(col("sum_w").cast("double")),
      GraftSqlBridge.expressionOf(col("sum_mw").cast("double")),
      features)
    val names = graft.operators.SeriesFeatures.outputNames(features)
    finer
      .groupBy(col("conv_id"), floor(col("bucket_t") / window.toDouble).cast("long").as("bucket"))
      .agg(GraftSqlBridge.aggColumn(agg).as("pt"))
      .select(
        (Seq(
          col("conv_id"), col("bucket"),
          ((col("bucket") + 0.5) * window.toDouble).as("bucket_t"),
          col("pt.n").as("n"), col("pt.sumW").as("sum_w"),
          col("pt.sumMw").as("sum_mw"), col("pt.binM").as("bin_m"),
          col("pt.binW").as("bin_w")) ++
          names.zipWithIndex.map { case (nm, i) => col("pt.feats").getItem(i).as(nm) }): _*)
  }

  /** Build all three retention tiers from the turn series. */
  def buildAll(series: DataFrame, features: Seq[Feature] = defaultFeatures)
      : Map[String, DataFrame] = {
    val t1m = tierFromTurns(series, 60L, features)
    val t1h = tierFromTier(t1m, 3600L, features)
    val t1d = tierFromTier(t1h, 86400L, features)
    Map("1m" -> t1m, "1h" -> t1h, "1d" -> t1d)
  }

  /** Gap-fill a tier to dense buckets per conversation with LOCF on
    * the bucket value — `sequence` + explode + last(ignoreNulls)
    * window, pure Catalyst (SURVEY.md §7 step 5). */
  def gapFillLocf(tier: DataFrame, window: Long): DataFrame = {
    val spans = tier.groupBy(col("conv_id"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("conv_id"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans.join(tier.select(col("conv_id"), col("bucket"), col("bin_m"), col("bin_w"), col("n")),
        Seq("conv_id", "bucket"), "left")
      .select(
        col("conv_id"), col("bucket"),
        ((col("bucket") + 0.5) * window.toDouble).as("bucket_t"),
        when(col("n").isNull, lit(1)).otherwise(lit(0)).as("is_gap"),
        last(col("bin_m"), ignoreNulls = true).over(w).as("bin_m_locf"),
        last(col("bin_w"), ignoreNulls = true).over(w).as("bin_w_locf"))
  }
}
