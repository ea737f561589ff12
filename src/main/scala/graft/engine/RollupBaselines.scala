package graft.engine

import graft.ref.Feature
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * MEASUREMENT BASELINES — not part of the engine surface.
 *
 * The declarative `sort_array(collect_list(struct))` + UDF tier builds
 * that [[Rollup.tierFromTurns]] / [[Rollup.tierFromTier]] replaced with
 * native TypedImperativeAggregates ([[graft.plans.BucketAggExpr]],
 * measured 12-15% faster at every warm round — BASELINE.md round 2).
 * They are retained ONLY as (a) the bit-parity oracle for the native
 * aggregates (RollupParitySpec) and (b) the A/B arm of the
 * [[graft.RollupProbe]] bench harness. Production callers use
 * [[Rollup]], which exposes exactly one path per tier.
 */
object RollupBaselines {

  /** `sort_array(collect_list(struct(...)))` — the deterministic
    * per-bucket state. Lexicographic struct order = (t, idx) order
    * since t leads; idx breaks ties (stable `(conv_id, turn_idx)`
    * order per the correctness gate). */
  private def collectPoints(t: Column, idx: Column, m: Column, w: Column,
      n: Column, sw: Column, smw: Column): Column =
    sort_array(collect_list(struct(
      t.cast("double").as("t"), idx.cast("long").as("i"),
      m.cast("double").as("m"), w.cast("double").as("w"),
      n.cast("long").as("n"), sw.cast("double").as("sw"),
      smw.cast("double").as("smw"))))

  private def tierAgg(grouped: DataFrame, window: Long, features: Seq[Feature],
      raw: Boolean): DataFrame = {
    val names = graft.operators.SeriesFeatures.outputNames(features)
    val p = col("pts")
    val withPoint = (if (raw) {
      val eval = udf(Rollup.evalBucketRaw(features) _)
      grouped.withColumn("pt", eval(p.getField("t"), p.getField("m"), p.getField("w")))
    } else {
      val eval = udf(Rollup.evalBucket(features) _)
      grouped.withColumn("pt", eval(
        p.getField("t"), p.getField("m"), p.getField("w"),
        p.getField("n"), p.getField("sw"), p.getField("smw")))
    }).drop("pts")
    withPoint.select(
      (Seq(
        col("conv_id"), col("bucket"),
        ((col("bucket") + 0.5) * window.toDouble).as("bucket_t"),
        col("pt.n").as("n"), col("pt.sumW").as("sum_w"),
        col("pt.sumMw").as("sum_mw"), col("pt.binM").as("bin_m"),
        col("pt.binW").as("bin_w")) ++
        names.zipWithIndex.map { case (nm, i) => col("pt.feats").getItem(i).as(nm) }): _*)
  }

  /** The declarative collect_list/UDF form of [[Rollup.tierFromTurns]]
    * — retained as the parity oracle for the native aggregate. */
  def tierFromTurnsCollect(series: DataFrame, window: Long,
      features: Seq[Feature] = Rollup.defaultFeatures): DataFrame = {
    // 4-field struct only: the raw-turn collect is the engine's
    // dominant shuffle; carries are derived at finish (evalBucketRaw)
    val grouped = series
      .groupBy(col("conv_id"), floor(col("t") / window.toDouble).cast("long").as("bucket"))
      .agg(sort_array(collect_list(struct(
        col("t").cast("double").as("t"),
        col("turn_idx").cast("long").as("i"),
        col("m").cast("double").as("m"),
        col("w").cast("double").as("w")))).as("pts"))
    tierAgg(grouped, window, features, raw = true)
  }

  /** The declarative collect_list/UDF form of [[Rollup.tierFromTier]]
    * — retained as the parity oracle for the native carry aggregate. */
  def tierFromTierCollect(finer: DataFrame, window: Long,
      features: Seq[Feature] = Rollup.defaultFeatures): DataFrame = {
    val grouped = finer
      .groupBy(col("conv_id"), floor(col("bucket_t") / window.toDouble).cast("long").as("bucket"))
      .agg(collectPoints(col("bucket_t"), col("bucket"), col("bin_m"), col("bin_w"),
        col("n"), col("sum_w"), col("sum_mw")).as("pts"))
    tierAgg(grouped, window, features, raw = false)
  }
}
