package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The multicolor layer (SURVEY.md §2.4): the reference's passband
 * dimension maps to a grouping column — here `event_type` over the
 * events table plays the band. PerBandFeature = groupBy(id, band);
 * ColorOf{Median,Maximum,Minimum} = pivoted per-band aggregate
 * difference (color_of_median.rs:14-17); ColorSpread = population
 * sigma of per-band weighted means (color_spread.rs:103-130);
 * MultiColorBins = per-band Bins then per-band features
 * (multicolor_bins.rs:20-47). Plus the Transformed wrappers
 * (transformers/mod.rs:102-138) applied as plain Catalyst columns.
 *
 * All queries are pure Catalyst (single shuffle per aggregation
 * level, codegen'd) with exact DuckDB oracles.
 */
object MultiColorQueries {

  private val R = 6
  private val JitterSql = "1.2345e-9"
  private def r(c: Column): Column = round(c + JitterSql.toDouble, R)
  private val TBase = 1704067200.0

  private def pts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet").select(
      col("user_id"),
      col("event_type").as("band"),
      (unix_micros(col("ts").cast("timestamp")) / 1000000.0 - TBase).as("t"),
      col("value").as("m"),
      (lit(1.0) / (lit(1.0) + col("event_id") % 7)).as("w"))

  private val PTS =
    s"SELECT user_id, event_type AS band, epoch(ts) - $TBase AS t, value AS m, " +
      "1.0/(1.0 + (event_id % 7)) AS w, event_id AS idx FROM events"

  // ---------------- PerBandFeature (per_band_feature.rs:15-26) ----------------

  private def qPerBand(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).groupBy(col("user_id"), col("band")).agg(
      count(lit(1)).as("n_obs"),
      r(avg(col("m"))).as("mean"),
      r(stddev_samp(col("m"))).as("standard_deviation"),
      r((max(col("m")) - min(col("m"))) / 2.0).as("amplitude"),
      r(sum(col("m") * col("w")) / sum(col("w"))).as("weighted_mean"))
      .filter(col("n_obs") >= 2)
      .orderBy(col("user_id"), col("band"))

  private val sqlPerBand =
    s"""WITH p AS ($PTS)
       |SELECT user_id, band, count(*) AS n_obs,
       | round(avg(m) + $JitterSql, $R) + 0 AS mean,
       | round(stddev_samp(m) + $JitterSql, $R) + 0 AS standard_deviation,
       | round((max(m) - min(m)) / 2 + $JitterSql, $R) + 0 AS amplitude,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS weighted_mean
       |FROM p GROUP BY user_id, band HAVING count(*) >= 2
       |ORDER BY user_id, band""".stripMargin

  // ------------- ColorOf{Median,Maximum,Minimum} (color_of_*.rs) -------------
  // between bands "click" and "view"; median at q=0.5 is the midpoint
  // median in every quantile convention, so percentile() is exact here

  private def qColors(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).filter(col("band").isin("click", "view"))
      .groupBy(col("user_id"))
      .pivot("band", Seq("click", "view"))
      .agg(
        percentile(col("m"), lit(0.5)).as("med"),
        max(col("m")).as("mx"),
        min(col("m")).as("mn"))
      .filter(col("click_med").isNotNull && col("view_med").isNotNull)
      .select(col("user_id"),
        r(col("click_med") - col("view_med")).as("color_median_click_view"),
        r(col("click_mx") - col("view_mx")).as("color_maximum_click_view"),
        r(col("click_mn") - col("view_mn")).as("color_minimum_click_view"))
      .orderBy(col("user_id"))

  private val sqlColors =
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id,
       |        quantile_cont(m, 0.5) FILTER (WHERE band = 'click') AS cm,
       |        quantile_cont(m, 0.5) FILTER (WHERE band = 'view') AS vm,
       |        max(m) FILTER (WHERE band = 'click') AS cmx,
       |        max(m) FILTER (WHERE band = 'view') AS vmx,
       |        min(m) FILTER (WHERE band = 'click') AS cmn,
       |        min(m) FILTER (WHERE band = 'view') AS vmn
       |       FROM p GROUP BY user_id)
       |SELECT user_id,
       | round(cm - vm + $JitterSql, $R) + 0 AS color_median_click_view,
       | round(cmx - vmx + $JitterSql, $R) + 0 AS color_maximum_click_view,
       | round(cmn - vmn + $JitterSql, $R) + 0 AS color_minimum_click_view
       |FROM g WHERE cm IS NOT NULL AND vm IS NOT NULL ORDER BY user_id""".stripMargin

  // ---------------- ColorSpread (color_spread.rs:103-130) ----------------

  private def qColorSpread(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .groupBy(col("user_id"), col("band"))
      .agg((sum(col("m") * col("w")) / sum(col("w"))).as("band_wmean"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_bands"),
        r(stddev_pop(col("band_wmean"))).as("color_spread"))
      .filter(col("n_bands") >= 2)
      .orderBy(col("user_id"))

  private val sqlColorSpread =
    s"""WITH p AS ($PTS),
       | b AS (SELECT user_id, band, sum(m*w)/sum(w) AS band_wmean
       |       FROM p GROUP BY user_id, band)
       |SELECT user_id, count(*) AS n_bands,
       | round(stddev_pop(band_wmean) + $JitterSql, $R) + 0 AS color_spread
       |FROM b GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin

  // ------------- MultiColorExtractor (multicolor_extractor.rs:14-105) -------------

  /** The dedicated extractor type evaluated distributed: colors +
    * spread + per-band monochrome features in ONE concatenated pass
    * through [[graft.operators.McSeriesFeatures]], with per-feature
    * fill on missing bands (eval_or_fill_multicolor). */
  private def qMcExtractor(s: SparkSession, dir: String): DataFrame = {
    import graft.ref.{Features, McExtractor, McFeature}
    import scala.collection.immutable.SortedSet
    val ex = McExtractor(Seq(
      McFeature.ColorOfMedian("click", "view"),
      McFeature.ColorOfMaximum("click", "view"),
      McFeature.ColorOfMinimum("click", "view"),
      McFeature.ColorSpread(SortedSet("click", "error", "purchase", "signup", "view")),
      McFeature.PerBand(Features.Median, "purchase"),
      McFeature.PerBand(Features.Amplitude, "signup")))
    val in = s.read.parquet(s"$dir/events.parquet").select(
      col("user_id"),
      col("event_type").as("band"),
      (unix_micros(col("ts").cast("timestamp")) / 1000000.0 - TBase).as("t"),
      col("value").as("m"),
      (lit(1.0) / (lit(1.0) + col("event_id") % 7)).as("w"),
      col("event_id").as("idx"))
    val base = graft.operators.McSeriesFeatures.extract(in, "user_id", "band", ex)
    ex.names.foldLeft(base) { (d, n) => d.withColumn(n, r(col(n))) }
      .orderBy(col("user_id"))
  }

  /** DuckDB mirror: midpoint medians, in-(t)-order weighted-mean folds
    * for the spread (the single-node extractor folds points in sorted
    * time order), NaN fills for missing bands. */
  private val sqlMcExtractor: String = {
    def medBand(b: String) =
      s"""(SELECT CASE WHEN count(*) = 0 THEN NULL
         |  WHEN count(*) % 2 = 0
         |  THEN 0.5 * (list_sort(list(m))[(count(*) - 1) // 2 + 1]
         |            + list_sort(list(m))[(count(*) - 1) // 2 + 2])
         |  ELSE list_sort(list(m))[(count(*) - 1) // 2 + 1] END
         | FROM p i WHERE i.user_id = u.user_id AND i.band = '$b')""".stripMargin
        .replaceAll("\\s+", " ")
    s"""WITH p AS ($PTS),
       | u AS (SELECT DISTINCT user_id FROM p),
       | bm AS (SELECT user_id, band,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w * m ORDER BY t, idx)),
       |           (a, x) -> a + x)
       |          / list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(w ORDER BY t, idx)),
       |           (a, x) -> a + x) AS wmean,
       |         max(m) AS mx, min(m) AS mn, count(*) AS n
       |        FROM p GROUP BY user_id, band),
       | sp AS (SELECT user_id, count(*) AS nb,
       |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list(wmean ORDER BY band)), (a, x) -> a + x) / count(*) AS mu,
       |         list(wmean ORDER BY band) AS wms
       |        FROM bm GROUP BY user_id),
       | sp2 AS (SELECT user_id, nb,
       |          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |            list_transform(wms, x -> (x - mu) * (x - mu))), (a, x) -> a + x) / nb)
       |           AS spread
       |         FROM sp),
       | piv AS (SELECT u.user_id,
       |          ${medBand("click")} AS med_c, ${medBand("view")} AS med_v,
       |          ${medBand("purchase")} AS med_p,
       |          (SELECT mx FROM bm WHERE bm.user_id = u.user_id AND band = 'click') AS mx_c,
       |          (SELECT mx FROM bm WHERE bm.user_id = u.user_id AND band = 'view') AS mx_v,
       |          (SELECT mn FROM bm WHERE bm.user_id = u.user_id AND band = 'click') AS mn_c,
       |          (SELECT mn FROM bm WHERE bm.user_id = u.user_id AND band = 'view') AS mn_v,
       |          (SELECT (mx - mn) / 2 FROM bm WHERE bm.user_id = u.user_id AND band = 'signup') AS amp_s
       |         FROM u),
       | o AS (SELECT p2.user_id,
       |        CASE WHEN med_c IS NULL OR med_v IS NULL THEN CAST('nan' AS DOUBLE)
       |         ELSE med_c - med_v END AS cmed,
       |        CASE WHEN mx_c IS NULL OR mx_v IS NULL THEN CAST('nan' AS DOUBLE)
       |         ELSE mx_c - mx_v END AS cmax,
       |        CASE WHEN mn_c IS NULL OR mn_v IS NULL THEN CAST('nan' AS DOUBLE)
       |         ELSE mn_c - mn_v END AS cmin,
       |        CASE WHEN s2.nb < 5 THEN CAST('nan' AS DOUBLE) ELSE s2.spread END AS spr,
       |        coalesce(med_p, CAST('nan' AS DOUBLE)) AS medp,
       |        coalesce(amp_s, CAST('nan' AS DOUBLE)) AS amps,
       |        s2.nb
       |       FROM piv p2 JOIN sp2 s2 ON p2.user_id = s2.user_id)
       |SELECT user_id, nb AS n_bands,
       | round(cmed + $JitterSql, $R) + 0 AS color_median_click_view,
       | round(cmax + $JitterSql, $R) + 0 AS color_maximum_click_view,
       | round(cmin + $JitterSql, $R) + 0 AS color_minimum_click_view,
       | round(spr + $JitterSql, $R) + 0 AS color_spread_click_error_purchase_signup_view,
       | round(medp + $JitterSql, $R) + 0 AS median_purchase,
       | round(amps + $JitterSql, $R) + 0 AS amplitude_signup
       |FROM o ORDER BY user_id""".stripMargin
  }

  // ---------------- MultiColorBins (multicolor_bins.rs:20-47) ----------------

  private def qMcBins(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .groupBy(col("user_id"), col("band"),
        floor(col("t") / 3600.0).cast("long").as("bucket"))
      .agg((sum(col("m") * col("w")) / sum(col("w"))).as("bm"))
      .groupBy(col("user_id"), col("band"))
      .agg(count(lit(1)).as("n_bins"),
        r(avg(col("bm"))).as("bins_mean"),
        r(stddev_samp(col("bm"))).as("bins_std"))
      .filter(col("n_bins") >= 2)
      .orderBy(col("user_id"), col("band"))

  private val sqlMcBins =
    s"""WITH p AS ($PTS),
       | b AS (SELECT user_id, band, floor(t / 3600) AS bucket, sum(m*w)/sum(w) AS bm
       |       FROM p GROUP BY 1, 2, 3)
       |SELECT user_id, band, count(*) AS n_bins,
       | round(avg(bm) + $JitterSql, $R) + 0 AS bins_mean,
       | round(stddev_samp(bm) + $JitterSql, $R) + 0 AS bins_std
       |FROM b GROUP BY user_id, band HAVING count(*) >= 2
       |ORDER BY user_id, band""".stripMargin

  // ---------------- Transformed (transformers/mod.rs) ----------------

  /** Catalyst column versions of the transformers. */
  private def clippedLg(c: Column): Column =
    when(c < java.lang.Double.MIN_NORMAL, lit(graft.ref.Transformer.ClippedLgZero))
      .otherwise(log10(c))

  private def qTransformed(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_obs"),
      avg(col("m")).as("mean0"),
      ((max(col("m")) - min(col("m"))) / 2.0).as("amp0"),
      stddev_samp(col("m")).as("std0"))
      .filter(col("n_obs") >= 2)
      .select(col("user_id"),
        r(asinh(col("mean0"))).as("arcsinh_mean"),
        r(log1p(col("amp0"))).as("ln1p_amplitude"),
        r(clippedLg(col("amp0"))).as("clipped_lg_amplitude"),
        r(sqrt(col("std0"))).as("sqrt_standard_deviation"))
      .orderBy(col("user_id"))

  private val sqlTransformed =
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n, avg(m) AS mean0,
       |        (max(m) - min(m))/2 AS amp0, stddev_samp(m) AS std0
       |       FROM p GROUP BY user_id HAVING count(*) >= 2)
       |SELECT user_id,
       | round(ln(mean0 + sqrt(mean0*mean0 + 1)) + $JitterSql, $R) + 0 AS arcsinh_mean,
       | round(ln(1 + amp0) + $JitterSql, $R) + 0 AS ln1p_amplitude,
       | round(CASE WHEN amp0 < 2.2250738585072014e-308
       |        THEN ${graft.ref.Transformer.ClippedLgZero}
       |        ELSE log10(amp0) END + $JitterSql, $R) + 0 AS clipped_lg_amplitude,
       | round(sqrt(std0) + $JitterSql, $R) + 0 AS sqrt_standard_deviation
       |FROM g ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mc_per_band" -> qPerBand _,
    "q_mc_extractor" -> qMcExtractor _,
    "q_mc_colors" -> qColors _,
    "q_mc_color_spread" -> qColorSpread _,
    "q_mc_bins" -> qMcBins _,
    "q_transformed" -> qTransformed _)

  val oracles: Map[String, String] = Map(
    "q_mc_per_band" -> sqlPerBand,
    "q_mc_extractor" -> sqlMcExtractor,
    "q_mc_colors" -> sqlColors,
    "q_mc_color_spread" -> sqlColorSpread,
    "q_mc_bins" -> sqlMcBins,
    "q_transformed" -> sqlTransformed)
}
