package graft.operators

import graft.ref.{Feature, Features, LightCurve}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed evaluation of the composite kernels that need the whole
 * per-group series (sorted arrays, sequential scans, Otsu, quantiles...):
 * one `collect_list(struct(t, idx, m, w))` per `(series, bucket)` group,
 * deterministically ordered by `sort_array` (lexicographic on
 * `(t, idx, m, w)` — the stable `(conv_id, turn_idx)` order the
 * correctness gate requires), then every requested kernel evaluated in
 * one pass over the collected arrays by the SAME single-node code as the
 * reference port ([[graft.ref.Features]]) — so the distributed result
 * bit-matches the single-node rollup by construction, sidestepping
 * float-merge-order nondeterminism (SURVEY.md §7 "what's hard" #1).
 *
 * Output is one flat `array<double>` per group — the reference
 * extractor's concatenation contract (/root/reference/src/extractor.rs:
 * 111-121); failing kernels contribute `fill` per their whole output
 * slice (eval_or_fill, evaluator.rs:144-149).
 *
 * Scale notes (100 TB): the collect is a single shuffle on the group
 * key with map-side partial list building; per-group memory is bounded
 * because the engine only ever collects raw turns at the finest tier
 * (minute buckets) and computes coarser tiers over the finer tier's
 * binned points (<= 60 / <= 24 rows per group, see
 * [[graft.engine.Rollup]]). Spark falls back to sort-based aggregation
 * when ObjectHashAggregate spills, so skewed groups degrade, not OOM.
 */
object SeriesFeatures {

  /** Sorted per-group points: `sort_array(collect_list(struct(...)))`. */
  def collectSorted(t: Column, idx: Column, m: Column, w: Column): Column =
    sort_array(collect_list(struct(
      t.cast("double").as("t"),
      idx.cast("long").as("i"),
      m.cast("double").as("m"),
      w.cast("double").as("w"))))

  /** Evaluate `features` over one collected series; output is the
    * concatenation of each feature's output vector, `fill` on failure.
    * Primitive-array signature: Spark deserializes array<double> into
    * Array[Double] via ArrayData.toDoubleArray — no per-element boxing
    * (the boxed Seq path dominated GC at 32 threads). */
  def evalSeries(features: Seq[Feature], fill: Double)(
      t: Array[Double], m: Array[Double], w: Array[Double]): Array[Double] = {
    val lc = LightCurve(t, m, w)
    val out = new Array[Double](features.map(_.size).sum)
    var off = 0
    features.foreach { f =>
      val v = f.evalOrFill(lc, fill)
      System.arraycopy(v, 0, out, off, v.length)
      off += v.length
    }
    out
  }

  /** Flattened output names for a feature list (extractor contract). */
  def outputNames(features: Seq[Feature]): Seq[String] = features.flatMap(_.names)

  /**
   * Bounded-per-group collection for whole-series kernels (periodogram,
   * curve fits): a series with more than `maxN` observations is FIRST
   * downsampled by reference Bins semantics (bins.rs:10-33 — bucket
   * j = floor(t / window), t* = (j + 0.5) window, m* = Σmw/Σw,
   * w* = Σw/count) at window = duration/maxN, through a SCALAR-state
   * aggregation on (key, bucket) — so no task ever materializes more
   * than ~maxN points for one series, no matter how hot it is. Series
   * at or under maxN take the exact collect path bit-identically.
   *
   * Output: (key, n_obs = the ORIGINAL observation count for gating,
   * p = sorted points struct). One bounded shuffle on the group key
   * (the capacity-bounded stats+collect aggregate) covers every
   * under-cap series; only hot series pay the extra bin aggregation
   * pass — the cap is the price of a memory contract the plain
   * collect (spill-or-die) cannot give.
   *
   * Caveat: the binned route's per-bucket float sums merge in
   * partition order, so binned values match single-node [[graft.ref.Bins]]
   * to ~1e-15 relative, not bitwise — inherent to any distributed
   * downsample, and confined to the > maxN regime which is lossy by
   * design.
   */
  def boundedCollect(pts: DataFrame, key: String, maxN: Int): DataFrame =
    boundedCollect(pts, Seq(key), maxN)

  /** Composite-key variant (e.g. per (series, band)).
    *
    * ONE corpus pass (r06, guide §2.4): the round-5 shape scanned the
    * input three times (span-stats aggregate, small-branch collect,
    * large-branch bins) and paid a corpus-wide join against the span
    * table. The [[graft.plans.BoundedPointsAggExpr]] aggregate now
    * produces span stats AND the under-cap sorted point sets in one
    * partial-aggregated pass — per-group memory still bounded by
    * `maxN` points, and the emitted arrays bit-identical to
    * `sort_array(collect_list(struct))` (same lexicographic order;
    * asserted in BoundedCollectSpec). Only over-cap HOT series — rare
    * by this operator's contract — are re-scanned, through a join
    * against the tiny hot-key set, down the unchanged scalar-state
    * Bins path. */
  def boundedCollect(pts: DataFrame, keys: Seq[String], maxN: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val ks = keys.map(col)
    val agg = graft.plans.BoundedPointsAggExpr(
      GraftSqlBridge.expressionOf(col("t").cast("double")),
      GraftSqlBridge.expressionOf(col("idx").cast("long")),
      GraftSqlBridge.expressionOf(col("m").cast("double")),
      GraftSqlBridge.expressionOf(col("w").cast("double")),
      maxN)
    val stats = pts.groupBy(ks: _*).agg(GraftSqlBridge.aggColumn(agg).as("bp"))
    val small = stats.filter(col("bp.n_obs") <= maxN)
      .select(ks :+ col("bp.n_obs").as("n_obs") :+ col("bp.p").as("p"): _*)
    val hot = stats.filter(col("bp.n_obs") > maxN)
      .select(ks :+ col("bp.n_obs").as("n_obs")
        :+ col("bp.t0").as("_t0") :+ col("bp.t1").as("_t1"): _*)
    val joined = pts.join(hot, keys)
    val win = (col("_t1") - col("_t0")) / maxN.toDouble
    // zero-duration hot series degenerate to one bucket (the kernels
    // reject zero-duration series downstream anyway)
    val large = joined
      .withColumn("_j",
        when(col("_t1") > col("_t0"), floor(col("t") / win))
          .otherwise(lit(0.0)).cast("long"))
      .groupBy(ks ++ Seq(col("n_obs"), col("_t0"), col("_t1"), col("_j")): _*)
      .agg(count(lit(1)).as("_c"),
        sum(col("m") * col("w")).as("_smw"),
        sum(col("w")).as("_sw"))
      .select(ks ++ Seq(col("n_obs"),
        ((col("_j") + 0.5) * win).as("t"),
        col("_j").as("idx"),
        (col("_smw") / col("_sw")).as("m"),
        (col("_sw") / col("_c")).as("w")): _*)
      .groupBy(ks :+ col("n_obs"): _*)
      .agg(collectSorted(col("t"), col("idx"), col("m"), col("w")).as("p"))
      .select(ks :+ col("n_obs") :+ col("p"): _*)
    small.unionByName(large)
  }

  /**
   * Column computing `features` over a sorted collected-points column
   * (as produced by [[collectSorted]]): `extract(fs)($"pts")` yields
   * `array<double>` of arity `fs.map(_.size).sum`.
   */
  def extract(features: Seq[Feature], fill: Double = Double.NaN): Column => Column = {
    val f = udf(evalSeries(features, fill) _)
    pts => f(pts.getField("t"), pts.getField("m"), pts.getField("w"))
  }

  /**
   * Convenience: group `df` by `groupCols`, evaluate `features` over
   * `(t, idx, m, w)` and return one named double column per output.
   */
  def aggregate(
      df: DataFrame,
      groupCols: Seq[Column],
      t: Column, idx: Column, m: Column, w: Column,
      features: Seq[Feature],
      fill: Double = Double.NaN): DataFrame = {
    val grouped = df
      .groupBy(groupCols: _*)
      .agg(collectSorted(t, idx, m, w).as("pts"))
      .withColumn("feats", extract(features, fill)(col("pts")))
    val names = outputNames(features)
    names.zipWithIndex.foldLeft(grouped) { case (d, (n, i)) =>
      d.withColumn(n, col("feats").getItem(i))
    }.drop("pts", "feats")
  }

  /** Default full single-band kernel battery. */
  def allFeatures: Seq[Feature] = Features.all
}
