package graft.queries

import graft.functions.Kernels
import graft.operators.SeriesFeatures
import graft.ref.Features
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver-facing correctness queries: every implemented kernel expressed
 * over the `events` test table (`user_id` plays the series id, `value`
 * the magnitude, `epoch(ts)` the time axis, a deterministic synthetic
 * inverse-variance weight) with a DuckDB-SQL oracle for each
 * SQL-expressible kernel.
 *
 * Implementation split (the 100 TB design decision):
 *  - O(1)-state sequential kernels (eta, eta_e, cusum, slopes, string
 *    length) run as codegen'd window + hash aggregates — one shuffle,
 *    no per-group array materialization.
 *  - Whole-array kernels (R-5 quantiles, Otsu, Anderson-Darling,
 *    biweight, fits) go through [[SeriesFeatures]]' bounded collect.
 *  - Rollup/tier queries are pure Catalyst `groupBy(floor(t/window))`
 *    partial+final hash aggregation.
 *
 * All float outputs are rounded to 6 decimals on BOTH sides so the
 * driver's value-hash compare is insensitive to last-ulp differences
 * between Spark's and DuckDB's summation orders.
 */
object EventQueries {

  private val R = 6 // rounding decimals, both engines

  /** Fixed epoch base subtracted from t on BOTH sides: keeps t small
    * enough (O(1e6-1e7)) that float round-off in time aggregates stays
    * far below the 6-decimal rounding granularity of the value-hash
    * compare. Raw epoch seconds (~1.7e9) would leave only ~1e-7 abs
    * precision — the same order as the rounding boundary. */
  private val TBase = 1704067200.0 // 2024-01-01T00:00:00Z

  /** Shared series derivation; the DuckDB oracle mirrors it in `PTS`. */
  private def pts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet").select(
      col("user_id"),
      // parquet ts is TIMESTAMP_NTZ; interpret as UTC instant (session
      // tz is UTC) -> exact micros/1e6, matching DuckDB's epoch(ts)
      (unix_micros(col("ts").cast("timestamp")) / 1000000.0 - TBase).as("t"),
      col("value").as("m"),
      (lit(1.0) / (lit(1.0) + col("event_id") % 7)).as("w"),
      col("event_id").as("idx"))

  private val PTS =
    s"SELECT user_id, epoch(ts) - $TBase AS t, value AS m, " +
      "1.0/(1.0 + (event_id % 7)) AS w, event_id AS idx FROM events"

  /** Round for the value-hash compare, with a tiny deterministic jitter
    * (mirrored in every oracle) that shifts rounding boundaries off the
    * decimal lattice the data concentrates on — otherwise a last-ulp
    * difference between Spark's and DuckDB's summation orders flips the
    * 6th decimal on exact-halfway values. */
  private def r(c: Column): Column = round(c + JitterSql.toDouble, R)
  private val JitterSql = "1.2345e-9" 

  /** R-5 quantile over a DuckDB sorted list `arr` of length `n`. */
  private def r5Sql(arr: String, n: String, q: String): String = {
    val h = s"($n * $q - 0.5)"
    val i = s"CAST(floor($h) AS BIGINT)"
    s"""CASE WHEN $h < 0 THEN $arr[1]
       | WHEN $i >= $n - 1 THEN $arr[$n]
       | ELSE $arr[$i + 1] + ($h - floor($h)) * ($arr[$i + 2] - $arr[$i + 1])
       | END""".stripMargin.replaceAll("\\s+", " ")
  }

  // group-level plateau/length guards shared by both sides
  private val Guard2 = "count(*) >= 2 AND min(m) < max(m)"

  // ---------------------------------------------------------------
  // Catalyst-native simple aggregates
  // ---------------------------------------------------------------

  private def qSimpleStats(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_obs"),
      r(Kernels.mean(col("m"))).as("mean"),
      r(Kernels.amplitude(col("m"))).as("amplitude"),
      r(Kernels.standardDeviation(col("m"))).as("std"),
      r(Kernels.meanVariance(col("m"))).as("mean_variance"),
      r(Kernels.duration(col("t"))).as("duration"),
      r(Kernels.timeMean(col("t"))).as("time_mean"),
      r(Kernels.timeStandardDeviation(col("t"))).as("time_std"))
      .filter(col("n_obs") >= 2)
      .orderBy(col("user_id"))

  private val sqlSimpleStats =
    s"""WITH p AS ($PTS)
       |SELECT user_id, count(*) AS n_obs,
       | round(avg(m) + $JitterSql, $R) + 0 AS mean,
       | round((max(m) - min(m)) / 2 + $JitterSql, $R) + 0 AS amplitude,
       | round(stddev_samp(m) + $JitterSql, $R) + 0 AS std,
       | round(stddev_samp(m) / avg(m) + $JitterSql, $R) + 0 AS mean_variance,
       | round(max(t) - min(t) + $JitterSql, $R) + 0 AS duration,
       | round(avg(t) + $JitterSql, $R) + 0 AS time_mean,
       | round(stddev_samp(t) + $JitterSql, $R) + 0 AS time_std
       |FROM p GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin

  private def qWeighted(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_obs"),
      r(Kernels.weightedMean(col("m"), col("w"))).as("weighted_mean"),
      r(Kernels.reducedChi2(col("m"), col("w"))).as("reduced_chi2"),
      r(Kernels.excessVariance(col("m"), col("w"))).as("excess_variance"))
      .filter(col("n_obs") >= 2)
      .drop("n_obs")
      .orderBy(col("user_id"))

  private val sqlWeighted =
    s"""WITH p AS ($PTS)
       |SELECT user_id,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS weighted_mean,
       | round((sum(w*m*m) - sum(m*w)*sum(m*w)/sum(w)) / (count(*) - 1) + $JitterSql, $R) + 0 AS reduced_chi2,
       | round((var_samp(m) - avg(1.0/w)) / (avg(m)*avg(m)) + $JitterSql, $R) + 0 AS excess_variance
       |FROM p GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin

  /** Two-pass beyond-n-std: group mean/std via window, then count. */
  private def qBeyond1Std(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    pts(s, dir)
      .withColumn("mu", avg(col("m")).over(wAll))
      .withColumn("sd", stddev_samp(col("m")).over(wAll))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        r(sum(when(abs(col("m") - col("mu")) > col("sd"), 1.0).otherwise(0.0)) /
          count(lit(1))).as("beyond_1_std"))
      .filter(col("n_obs") >= 2)
      .drop("n_obs")
      .orderBy(col("user_id"))
  }

  private val sqlBeyond1Std =
    s"""WITH p AS ($PTS),
       | st AS (SELECT *, avg(m) OVER (PARTITION BY user_id) AS mu,
       |        stddev_samp(m) OVER (PARTITION BY user_id) AS sd FROM p)
       |SELECT user_id,
       | round(sum(CASE WHEN abs(m - mu) > sd THEN 1.0 ELSE 0.0 END) / count(*) + $JitterSql, $R) + 0 AS beyond_1_std
       |FROM st GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Sequential kernels as streaming window computations
  // ---------------------------------------------------------------

  private def withLags(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("idx"))
    df.withColumn("dm", col("m") - lag(col("m"), 1).over(w))
      .withColumn("dt", col("t") - lag(col("t"), 1).over(w))
  }

  private def qEta(s: SparkSession, dir: String): DataFrame =
    withLags(pts(s, dir)).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_obs"),
      min(col("m")).as("mn"), max(col("m")).as("mx"),
      r(sum(col("dm") * col("dm")) / ((count(lit(1)) - 1.0) * var_samp(col("m"))))
        .as("eta"))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .select(col("user_id"), col("eta"))
      .orderBy(col("user_id"))

  private val sqlEta =
    s"""WITH p AS ($PTS),
       | d AS (SELECT *, m - lag(m) OVER (PARTITION BY user_id ORDER BY t, idx) AS dm FROM p)
       |SELECT user_id,
       | round(sum(dm*dm) / ((count(*) - 1) * var_samp(m)) + $JitterSql, $R) + 0 AS eta
       |FROM d GROUP BY user_id HAVING $Guard2 ORDER BY user_id""".stripMargin

  private def qEtaE(s: SparkSession, dir: String): DataFrame =
    withLags(pts(s, dir)).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_obs"),
      min(col("m")).as("mn"), max(col("m")).as("mx"),
      r(pow(max(col("t")) - min(col("t")), 2.0) *
        sum(when(col("dt") =!= 0.0, pow(col("dm") / col("dt"), 2.0))) /
        var_samp(col("m")) / pow(count(lit(1)) - 1.0, 3.0)).as("eta_e"))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .select(col("user_id"), col("eta_e"))
      .orderBy(col("user_id"))

  private val sqlEtaE =
    s"""WITH p AS ($PTS),
       | d AS (SELECT *, m - lag(m) OVER (PARTITION BY user_id ORDER BY t, idx) AS dm,
       |        t - lag(t) OVER (PARTITION BY user_id ORDER BY t, idx) AS dt FROM p)
       |SELECT user_id,
       | round(pow(max(t) - min(t), 2) * sum(CASE WHEN dt <> 0 THEN pow(dm/dt, 2) END)
       |   / var_samp(m) / pow(count(*) - 1, 3) + $JitterSql, $R) + 0 AS eta_e
       |FROM d GROUP BY user_id HAVING $Guard2 ORDER BY user_id""".stripMargin

  private def qSlopesIntervals(s: SparkSession, dir: String): DataFrame =
    withLags(pts(s, dir)).groupBy(col("user_id")).agg(
      count(lit(1)).as("n_obs"),
      r(max(when(col("dt") =!= 0.0, abs(col("dm") / col("dt"))))).as("maximum_slope"),
      r(max(col("dt"))).as("maximum_time_interval"),
      r(min(col("dt"))).as("minimum_time_interval"))
      .filter(col("n_obs") >= 2)
      .drop("n_obs")
      .orderBy(col("user_id"))

  private val sqlSlopesIntervals =
    s"""WITH p AS ($PTS),
       | d AS (SELECT *, m - lag(m) OVER (PARTITION BY user_id ORDER BY t, idx) AS dm,
       |        t - lag(t) OVER (PARTITION BY user_id ORDER BY t, idx) AS dt FROM p)
       |SELECT user_id,
       | round(max(CASE WHEN dt <> 0 THEN abs(dm/dt) END) + $JitterSql, $R) + 0 AS maximum_slope,
       | round(max(dt) + $JitterSql, $R) + 0 AS maximum_time_interval,
       | round(min(dt) + $JitterSql, $R) + 0 AS minimum_time_interval
       |FROM d GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin

  private def qCusum(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    val wRun = wAll.orderBy(col("t"), col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts(s, dir)
      .withColumn("mu", avg(col("m")).over(wAll))
      .withColumn("cs", sum(col("m") - col("mu")).over(wRun))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        min(col("m")).as("mn"), max(col("m")).as("mx"),
        r((max(col("cs")) - min(col("cs"))) /
          (stddev_samp(col("m")) * count(lit(1)))).as("cusum"))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .select(col("user_id"), col("cusum"))
      .orderBy(col("user_id"))
  }

  private val sqlCusum =
    s"""WITH p AS ($PTS),
       | st AS (SELECT *, avg(m) OVER (PARTITION BY user_id) AS mu FROM p),
       | c AS (SELECT *, sum(m - mu) OVER (PARTITION BY user_id ORDER BY t, idx
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs FROM st)
       |SELECT user_id,
       | round((max(cs) - min(cs)) / (stddev_samp(m) * count(*)) + $JitterSql, $R) + 0 AS cusum
       |FROM c GROUP BY user_id HAVING $Guard2 ORDER BY user_id""".stripMargin

  private def qLaflerKinman(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("t"), col("idx"))
    val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pts(s, dir)
      .withColumn("dm", lead(col("m"), 1).over(wOrd) - col("m"))
      .withColumn("wrap", first(col("m")).over(wFull) - last(col("m")).over(wFull))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        min(col("m")).as("mn"), max(col("m")).as("mx"),
        r((sum(col("dm") * col("dm")) + any_value(col("wrap") * col("wrap"))) /
          (lit(2.0) * var_samp(col("m")) * (count(lit(1)) - 1.0)))
          .as("lafler_kinman_string_length"))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .select(col("user_id"), col("lafler_kinman_string_length"))
      .orderBy(col("user_id"))
  }

  private val sqlLaflerKinman =
    s"""WITH p AS ($PTS),
       | d AS (SELECT *, lead(m) OVER (PARTITION BY user_id ORDER BY t, idx) - m AS dm,
       |   first_value(m) OVER (PARTITION BY user_id ORDER BY t, idx
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) -
       |   last_value(m) OVER (PARTITION BY user_id ORDER BY t, idx
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS wrap
       |  FROM p)
       |SELECT user_id,
       | round((sum(dm*dm) + any_value(wrap*wrap)) / (2 * var_samp(m) * (count(*) - 1)) + $JitterSql, $R) + 0
       |   AS lafler_kinman_string_length
       |FROM d GROUP BY user_id HAVING $Guard2 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Whole-array kernels via the SeriesFeatures collect operator
  // ---------------------------------------------------------------

  private def extracted(s: SparkSession, dir: String, feats: Seq[graft.ref.Feature],
      outNames: Seq[String], minN: Int = 2): DataFrame = {
    val base = pts(s, dir)
      .groupBy(col("user_id"))
      .agg(
        SeriesFeatures.collectSorted(col("t"), col("idx"), col("m"), col("w")).as("p"),
        count(lit(1)).as("n_obs"),
        min(col("m")).as("mn"), max(col("m")).as("mx"))
      .filter(col("n_obs") >= minN && col("mn") < col("mx"))
      .withColumn("f", SeriesFeatures.extract(feats)(col("p")))
    outNames.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, r(col("f").getItem(i)))
    }.select((col("user_id") +: outNames.map(col)): _*).orderBy(col("user_id"))
  }

  private def qQuantiles(s: SparkSession, dir: String): DataFrame =
    extracted(s, dir,
      Seq(Features.Median, Features.InterPercentileRange(0.25),
        Features.MedianAbsoluteDeviation, Features.PercentAmplitude,
        Features.MedianBufferRangePercentage(0.1),
        Features.PercentDifferenceMagnitudePercentile(0.05),
        Features.MagnitudePercentageRatio(0.4, 0.05)),
      Seq("median", "inter_percentile_range", "median_absolute_deviation",
        "percent_amplitude", "median_buffer_range_percentage",
        "percent_difference_magnitude_percentile", "magnitude_percentage_ratio"))

  private val sqlQuantiles = {
    val med = r5Sql("arr", "n", "0.5")
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, list_sort(list(m)) AS arr, count(*) AS n,
       |        min(m) AS mn, max(m) AS mx
       |       FROM p GROUP BY user_id HAVING $Guard2),
       | q AS (SELECT user_id, arr, n, mn, mx, $med AS med,
       |        ${r5Sql("arr", "n", "0.25")} AS q25, ${r5Sql("arr", "n", "0.75")} AS q75,
       |        ${r5Sql("arr", "n", "0.05")} AS q05, ${r5Sql("arr", "n", "0.95")} AS q95,
       |        ${r5Sql("arr", "n", "0.4")} AS q40, ${r5Sql("arr", "n", "0.6")} AS q60
       |       FROM g),
       | q2 AS (SELECT *, list_sort(list_transform(arr, x -> abs(x - med))) AS dev,
       |         len(list_filter(arr, x -> abs(x - med) < 0.1 * (mx - mn) / 2)) AS n_under
       |        FROM q)
       |SELECT user_id,
       | round(med + $JitterSql, $R) + 0 AS median,
       | round(q75 - q25 + $JitterSql, $R) + 0 AS inter_percentile_range,
       | round(${r5Sql("dev", "n", "0.5")} + $JitterSql, $R) + 0 AS median_absolute_deviation,
       | round(CASE WHEN mx - med > med - mn THEN mx - med ELSE med - mn END + $JitterSql, $R) + 0 AS percent_amplitude,
       | round(CAST(n_under AS DOUBLE) / n + $JitterSql, $R) + 0 AS median_buffer_range_percentage,
       | round((q95 - q05) / med + $JitterSql, $R) + 0 AS percent_difference_magnitude_percentile,
       | round((q60 - q40) / (q95 - q05) + $JitterSql, $R) + 0 AS magnitude_percentage_ratio
       |FROM q2 ORDER BY user_id""".stripMargin
  }

  private def qMoments(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    pts(s, dir)
      .withColumn("mu", avg(col("m")).over(wAll))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        min(col("m")).as("mn"), max(col("m")).as("mx"),
        sum(pow(col("m") - col("mu"), 3.0)).as("m3"),
        sum(pow(col("m") - col("mu"), 4.0)).as("m4"),
        var_samp(col("m")).as("s2"),
        stddev_samp(col("m")).as("sd"))
      .filter(col("n_obs") >= 4 && col("mn") < col("mx"))
      .select(
        col("user_id"),
        r(Kernels.skewFromMoments(col("n_obs").cast("double"), col("sd"), col("m3"))).as("skew"),
        r(Kernels.kurtosisFromMoments(col("n_obs").cast("double"), col("s2"), col("m4"))).as("kurtosis"))
      .orderBy(col("user_id"))
  }

  private val sqlMoments =
    s"""WITH p AS ($PTS),
       | st AS (SELECT *, avg(m) OVER (PARTITION BY user_id) AS mu FROM p),
       | g AS (SELECT user_id, count(*) AS n, sum(pow(m - mu, 3)) AS m3,
       |        sum(pow(m - mu, 4)) AS m4, var_samp(m) AS s2, stddev_samp(m) AS sd
       |       FROM st GROUP BY user_id
       |       HAVING count(*) >= 4 AND min(m) < max(m))
       |SELECT user_id,
       | round(m3 / pow(sd, 3) * n / ((n - 1.0) * (n - 2.0)) + $JitterSql, $R) + 0 AS skew,
       | round(m4 / (s2*s2) * n * (n + 1.0) / ((n - 1.0) * (n - 2.0) * (n - 3.0))
       |   - 3.0 * (n - 1.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0)) + $JitterSql, $R) + 0 AS kurtosis
       |FROM g ORDER BY user_id""".stripMargin

  private def qLinearFits(s: SparkSession, dir: String): DataFrame =
    extracted(s, dir,
      Seq(Features.LinearTrend, Features.LinearFit),
      Seq("linear_trend", "linear_trend_sigma", "linear_trend_noise",
        "linear_fit_slope", "linear_fit_slope_sigma", "linear_fit_reduced_chi2"),
      minN = 3)

  private val sqlLinearFits =
    s"""WITH p AS ($PTS),
       | su AS (SELECT user_id, count(*) AS n,
       |         sum(t) AS sxu, sum(m) AS syu,
       |         sum(w) AS sw, sum(w*t) AS sxw, sum(w*m) AS syw,
       |         min(m) AS mn, max(m) AS mx
       |        FROM p GROUP BY user_id HAVING count(*) >= 3 AND min(m) < max(m)),
       | f AS (SELECT p.user_id,
       |        sum(pow(t - sxu/n, 2)) AS sttu, sum((t - sxu/n) * m) AS styu,
       |        sum(w * pow(t - sxw/sw, 2)) AS sttw, sum(w * (t - sxw/sw) * m) AS styw
       |       FROM p JOIN su ON p.user_id = su.user_id GROUP BY p.user_id),
       | s2 AS (SELECT su.user_id, n, mn, mx,
       |         styu/sttu AS slope_u, (syu - sxu*(styu/sttu))/n AS icept_u, sttu,
       |         styw/sttw AS slope_w, (syw - sxw*(styw/sttw))/sw AS icept_w, sttw
       |        FROM su JOIN f ON su.user_id = f.user_id),
       | c AS (SELECT p.user_id,
       |        sum(pow(m - icept_u - slope_u*t, 2)) / (any_value(n) - 2.0) AS rchi2_u,
       |        sum(w * pow(m - icept_w - slope_w*t, 2)) / (any_value(n) - 2.0) AS rchi2_w,
       |        any_value(slope_u) AS slope_u, any_value(sttu) AS sttu,
       |        any_value(slope_w) AS slope_w, any_value(sttw) AS sttw
       |       FROM p JOIN s2 ON p.user_id = s2.user_id GROUP BY p.user_id)
       |SELECT user_id,
       | round(slope_u + $JitterSql, $R) + 0 AS linear_trend,
       | round(sqrt(rchi2_u / sttu) + $JitterSql, $R) + 0 AS linear_trend_sigma,
       | round(sqrt(rchi2_u) + $JitterSql, $R) + 0 AS linear_trend_noise,
       | round(slope_w + $JitterSql, $R) + 0 AS linear_fit_slope,
       | round(sqrt(1.0 / sttw) + $JitterSql, $R) + 0 AS linear_fit_slope_sigma,
       | round(rchi2_w + $JitterSql, $R) + 0 AS linear_fit_reduced_chi2
       |FROM c ORDER BY user_id""".stripMargin

  private def qStetsonRoms(s: SparkSession, dir: String): DataFrame =
    extracted(s, dir,
      Seq(Features.StetsonK, Features.Roms),
      Seq("stetson_k", "roms"))

  private val sqlStetsonRoms = {
    val med = r5Sql("arr", "n", "0.5")
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n, sum(m*w)/sum(w) AS wm,
       |        list_sort(list(m)) AS arr
       |       FROM p GROUP BY user_id HAVING $Guard2),
       | g2 AS (SELECT user_id, n, wm, $med AS med FROM g),
       | f AS (SELECT p.user_id,
       |        sum(abs(m - wm) * sqrt(w)) / sqrt(any_value(n) * sum(w * pow(m - wm, 2))) AS stetson_k,
       |        sum(abs(m - med) * sqrt(w)) / (any_value(n) - 1.0) AS roms
       |       FROM p JOIN g2 ON p.user_id = g2.user_id GROUP BY p.user_id)
       |SELECT user_id, round(stetson_k + $JitterSql, $R) + 0 AS stetson_k, round(roms + $JitterSql, $R) + 0 AS roms
       |FROM f ORDER BY user_id""".stripMargin
  }

  /** Anderson-Darling normality + chi^2 p-value — the special-function
    * kernels (ln_erfc, regularized incomplete gamma). Full value
    * oracle: [[sqlSpecial]] replays the commons-math3 stack in DuckDB
    * recursive CTEs. */
  private def qSpecial(s: SparkSession, dir: String): DataFrame =
    extracted(s, dir,
      Seq(Features.AndersonDarlingNormal, Features.Chi2Pvar),
      Seq("anderson_darling_normal", "chi2_pvar"))

  /** Full value oracle for the special-function pair. DuckDB has no
    * erfc / incomplete gamma, so the commons-math3 3.6.1 stack behind
    * both kernels — `Erf.erfc(x) = regularizedGammaQ(0.5, x², 1e-15)`,
    * `Gamma.regularizedGammaP` lower series and the Lentz continued
    * fraction of `regularizedGammaQ` (small = 1e-50) — is replayed
    * iteration-for-iteration in recursive CTEs with the same epsilon
    * termination, giving ≤1-ulp agreement per call (series branch
    * verified bit-exact; DuckDB `lgamma` matches commons `logGamma`
    * to ≤1 ulp on the half-integers used here). `LnErfc`'s three
    * branches (reference lnerfc.rs:9-17) are mirrored with the same
    * polynomial literals: small-|x| Horner series, x>8 asymptotic
    * rational, ln(erfc) otherwise. All statistics folds (mean,
    * two-pass std, weighted mean, chi²) and the AD sum run in the
    * JVM's loop order via ordered-list pure folds. */
  private val sqlSpecial: String = {
    def fold(l: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $l), (a, x) -> a + x)"
    def horner(cs: Seq[String], x: String): String =
      cs.foldLeft("0.0")((acc, c) => s"($acc * $x + $c)")
    // LnErfc.C / P / Q literals, exactly as in graft.ref.LnErfc
    val cC = Seq(
      "0.00048204", "-0.00142906", "0.0013200243174", "0.0009461589032",
      "-0.0045563339802", "0.00556964649138", "0.00125993961762116",
      "-0.01621575378835404", "0.02629651521057465",
      "-0.001829764677455021", "(2.0 * (1.0 - pi() / 3.0))",
      "((4.0 - pi()) / 3.0)", "1.0", "1.0", "0.0")
    val cP = Seq(
      "0.5641895835477550741253201704", "1.275366644729965952479585264",
      "5.019049726784267463450058", "6.1602098531096305440906",
      "7.409740605964741794425", "2.97886562639399288862")
    val cQ = Seq(
      "1.0", "2.260528520767326969591866945",
      "9.396034016235054150430579648", "12.0489519278551290360340491",
      "17.08144074746600431571095", "9.608965327192787870698",
      "3.3690752069827527677")
    val smallCut = "2.4607833005759251e-02" // 10 * DBL_EPSILON^(1/6)
    val sqrtPi = "1.77245385090551602729816748334"
    // Erf.erfc(v) from the shared q = regularizedGammaQ(0.5, v*v)
    def erfcv(v: String, q: String) =
      s"(CASE WHEN $v < -40.0 THEN 2.0 WHEN $v > 40.0 THEN 0.0 " +
        s"WHEN $v < 0.0 THEN 2.0 - $q WHEN $v = 0.0 THEN 1.0 ELSE $q END)"
    def lnErfc(v: String, q: String) =
      s"(CASE WHEN $v * $v < $smallCut " +
        s"THEN -2.0 * ${horner(cC, s"($v / $sqrtPi)")} " +
        s"WHEN $v > 8.0 " +
        s"THEN ln(${horner(cP, v)} / ${horner(cQ, v)}) - $v * $v " +
        s"ELSE ln(${erfcv(v, q)}) END)"
    val wprod = "list_transform(range(1, CAST(n AS BIGINT) + 1), " +
      "k -> warr[k] * marr[k])"
    val chiTerms = "list_transform(range(1, CAST(n AS BIGINT) + 1), " +
      "k -> (marr[k] - wm) * (marr[k] - wm) * warr[k])"
    s"""WITH RECURSIVE p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n,
       |        list(m ORDER BY t, idx) AS marr,
       |        list(w ORDER BY t, idx) AS warr
       |       FROM p GROUP BY 1
       |       HAVING count(*) >= 2 AND min(m) < max(m)),
       | g1 AS (SELECT *, ${fold("marr")} / n AS mu FROM g),
       | g2 AS (SELECT *, list_sort(marr) AS sarr,
       |         sqrt(${fold("list_transform(marr, x -> (x - mu) * (x - mu))")}
       |              / (n - 1.0)) AS sd,
       |         ${fold("warr")} AS sw, ${fold(wprod)} AS swm
       |        FROM g1),
       | g3 AS (SELECT *, swm / sw AS wm FROM g2),
       | g4 AS (SELECT *, ${fold(chiTerms)} AS chi2 FROM g3),
       | el AS (SELECT user_id, n,
       |         (sarr[i + 1] - mu) / sd * (1.0 / sqrt(2.0)) AS x, i
       |        FROM (SELECT user_id, n, mu, sd, sarr,
       |               unnest(range(0, CAST(n AS BIGINT))) AS i FROM g4)),
       | -- rid must be a DETERMINISTIC function of the row identity:
       | -- an argless row_number() OVER () relies on DuckDB
       | -- materializing this multi-referenced CTE exactly once — if it
       | -- were inlined, each instantiation could enumerate rows in a
       | -- different parallel order and the five rid joins would mis-pair
       | qin AS (SELECT row_number() OVER (ORDER BY kind, user_id, i) AS rid, * FROM (
       |    SELECT 'el' AS kind, user_id, i, CAST(0.5 AS DOUBLE) AS a,
       |           x * x AS y
       |    FROM el WHERE x * x >= $smallCut AND abs(x) <= 40.0
       |    UNION ALL
       |    SELECT 'chi', user_id, CAST(-1 AS BIGINT),
       |           (n - 1) / 2.0, chi2 / 2.0
       |    FROM g4)),
       | ser AS (
       |  SELECT rid, a, y, CAST(0 AS DOUBLE) AS it,
       |         1.0 / a AS an, 1.0 / a AS s, FALSE AS done
       |  FROM qin WHERE y > 0 AND y < a + 1.0
       |  UNION ALL
       |  SELECT rid, a, y,
       |    CASE WHEN stop THEN it ELSE it + 1.0 END,
       |    CASE WHEN stop THEN an ELSE an * (y / (a + (it + 1.0))) END,
       |    CASE WHEN stop THEN s ELSE s + an * (y / (a + (it + 1.0))) END,
       |    stop
       |  FROM (SELECT *, (abs(an / s) <= 1e-15) AS stop FROM ser)
       |  WHERE NOT done AND it < 5000),
       | serq AS (
       |  SELECT rid, 1.0 - exp(-y + a * ln(y) - lgamma(a)) * s AS q
       |  FROM (SELECT *, row_number() OVER (PARTITION BY rid
       |                    ORDER BY it DESC) AS rk FROM ser)
       |  WHERE rk = 1),
       | cf AS (
       |  SELECT rid, a, y, CAST(1 AS DOUBLE) AS it, CAST(0 AS DOUBLE) AS dprev,
       |         h0 AS cprev, h0 AS h, FALSE AS done
       |  FROM (SELECT *, CASE WHEN abs(1.0 - a + y) <= 1e-50 THEN 1e-50
       |                  ELSE 1.0 - a + y END AS h0
       |        FROM qin WHERE y >= a + 1.0)
       |  UNION ALL
       |  SELECT rid, a, y,
       |    CASE WHEN stop THEN it ELSE it + 1.0 END,
       |    CASE WHEN stop THEN dprev ELSE dn END,
       |    CASE WHEN stop THEN cprev ELSE cn END,
       |    hn, stop
       |  FROM (
       |    SELECT *, h * (cn * dn) AS hn,
       |           (abs(cn * dn - 1.0) < 1e-15) AS stop
       |    FROM (
       |      SELECT *,
       |        1.0 / (CASE WHEN abs(aa + bb * dprev) <= 1e-50 THEN 1e-50
       |               ELSE aa + bb * dprev END) AS dn,
       |        CASE WHEN abs(aa + bb / cprev) <= 1e-50 THEN 1e-50
       |             ELSE aa + bb / cprev END AS cn
       |      FROM (SELECT *, ((2.0 * it) + 1.0) - a + y AS aa,
       |                   it * (a - it) AS bb FROM cf)))
       |  WHERE NOT done AND it < 5000),
       | cfq AS (
       |  SELECT rid, exp(-y + a * ln(y) - lgamma(a)) * (1.0 / h) AS q
       |  FROM (SELECT *, row_number() OVER (PARTITION BY rid
       |                    ORDER BY it DESC) AS rk FROM cf)
       |  WHERE rk = 1),
       | qout AS (SELECT rid,
       |           CASE WHEN qin.y = 0 THEN 1.0
       |                ELSE coalesce(s.q, c.q) END AS qv
       |          FROM qin LEFT JOIN serq s USING (rid)
       |                   LEFT JOIN cfq c USING (rid)),
       | elq AS (SELECT e.*, q2.qv
       |         FROM el e LEFT JOIN
       |           (SELECT qi.user_id, qi.i, qo.qv
       |            FROM qin qi JOIN qout qo USING (rid)
       |            WHERE qi.kind = 'el') q2
       |           ON q2.user_id = e.user_id AND q2.i = e.i),
       | terms AS (SELECT user_id, i, n,
       |            (2.0 * i + 1.0) * ${lnErfc("(-x)", "qv")}
       |              + (2.0 * (n - i) - 1.0) * ${lnErfc("x", "qv")} AS term
       |           FROM elq),
       | asum AS (SELECT user_id, any_value(n) AS n,
       |           ${fold("list(term ORDER BY i)")} AS ssum
       |          FROM terms GROUP BY user_id),
       | ad AS (SELECT user_id,
       |         (1.0 + 4.0 / n - pow(5.0 / n, 2)) *
       |         (n * (2.0 * ln(2.0) - 1.0) - ssum / n) AS adv
       |        FROM asum),
       | chi AS (SELECT qi.user_id,
       |          least(1.0, greatest(0.0, qo.qv)) AS pv
       |         FROM qin qi JOIN qout qo USING (rid) WHERE qi.kind = 'chi')
       |SELECT g.user_id,
       | round(CASE WHEN g.n >= 4 THEN a.adv
       |        ELSE CAST('nan' AS DOUBLE) END + $JitterSql, 6) + 0
       |   AS anderson_darling_normal,
       | round(c.pv + $JitterSql, 6) + 0 AS chi2_pvar
       |FROM g4 g LEFT JOIN ad a USING (user_id) LEFT JOIN chi c USING (user_id)
       |ORDER BY g.user_id""".stripMargin
  }

  /** The f32 flavor of the quantile-kernel battery
    * ([[graft.ref.FeaturesF32.evalQuantiles]]): Median / IPR / MAD /
    * PercentAmplitude / MBRP / PDMP / MagnitudePercentageRatio with
    * every sort, ppf interpolation and division in single precision —
    * closing the float-trait parity gap for the quantile kernels
    * (/root/reference/src/float_trait.rs:30-120,
    * sorted_array.rs:50-70). */
  private def qQuantilesF32(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("median_f32", "inter_percentile_range_f32",
      "median_absolute_deviation_f32", "percent_amplitude_f32",
      "median_buffer_range_percentage_f32",
      "percent_difference_magnitude_percentile_f32",
      "magnitude_percentage_ratio_f32")
    val evalU = udf((ms: Seq[Double]) =>
      graft.ref.FeaturesF32.evalQuantiles(ms.iterator.map(_.toFloat).toArray))
    val base = SeriesFeatures.boundedCollect(pts(s, dir), "user_id", 100000)
      .withColumn("mn", array_min(col("p").getField("m")))
      .withColumn("mx", array_max(col("p").getField("m")))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .withColumn("f", evalU(col("p").getField("m")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, r(col("f").getItem(i)))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  /** FLOAT-typed DuckDB mirror of the f32 quantile battery. The R-5
    * ppf replays the reference's f32 form exactly: `h = nf·q − 0.5f`
    * with nf and q FLOAT, floor cast back to FLOAT, interpolation in
    * FLOAT. Quantile complements are written `1.0f − q` (a FLOAT
    * subtraction, NOT a decimal literal like 0.95 whose nearest f32
    * may differ by one ulp). Divisions use the IEEE-mirror CASE from
    * the simple-stats f32 oracle; the two both-zero ZeroDivision
    * cases produce NaN on both engines. */
  private val sqlQuantilesF32: String = {
    def fl(x: String) = s"CAST($x AS FLOAT)"
    def fdiv(a: String, b: String) =
      s"(CASE WHEN ($b) = 0.0 THEN " +
        s"(CASE WHEN ($a) = 0.0 THEN ${fl("'nan'")} " +
        s"WHEN ((($a) > 0.0) <> signbit($b)) THEN ${fl("'infinity'")} " +
        s"ELSE ${fl("'-infinity'")} END) " +
        s"ELSE ($a) / ($b) END)"
    // R-5 ppf over the 1-indexed sorted FLOAT list `sf`, all-f32
    def r5(q: String): String = {
      val h = s"(nf * ($q) - ${fl("0.5")})"
      val hf = s"${fl(s"floor($h)")}"
      val i = s"CAST($hf AS BIGINT)"
      s"(CASE WHEN $hf < 0.0 THEN sf[1] " +
        s"WHEN $i >= n - 1 THEN sf[n] " +
        s"ELSE sf[$i + 1] + ($h - $hf) * (sf[$i + 2] - sf[$i + 1]) END)"
    }
    def comp(q: String) = s"(${fl("1.0")} - ${fl(q)})" // 1.0f - q
    val medSql =
      s"""CASE WHEN n % 2 = 0
         | THEN ${fl("0.5")} * (sf[CAST((n - 1) // 2 AS INT) + 1]
         |                      + sf[CAST((n - 1) // 2 AS INT) + 2])
         | ELSE sf[CAST((n - 1) // 2 AS INT) + 1] END""".stripMargin
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n,
       |        list(CAST(m AS FLOAT) ORDER BY t, idx) AS mf,
       |        max(CAST(m AS FLOAT)) AS mxf, min(CAST(m AS FLOAT)) AS mnf
       |       FROM p GROUP BY 1 HAVING $Guard2),
       | g0 AS (SELECT *, CAST(n AS FLOAT) AS nf, list_sort(mf) AS sf FROM g),
       | g1 AS (SELECT *, $medSql AS med FROM g0),
       | g2 AS (SELECT *,
       |         list_sort(list_transform(mf, x -> abs(x - med))) AS devf,
       |         ${r5(comp("0.25"))} - ${r5(fl("0.25"))} AS ipr,
       |         ${r5(comp("0.05"))} - ${r5(fl("0.05"))} AS pd05,
       |         ${r5(comp("0.4"))} - ${r5(fl("0.4"))} AS mprnum,
       |         CAST(len(list_filter(mf, x -> abs(x - med)
       |             < ${fl("0.1")} * (${fl("0.5")} * (mxf - mnf)))) AS FLOAT)
       |           / nf AS mbrp
       |        FROM g1),
       | g3 AS (SELECT *,
       |         CASE WHEN n % 2 = 0
       |          THEN ${fl("0.5")} * (devf[CAST((n - 1) // 2 AS INT) + 1]
       |                               + devf[CAST((n - 1) // 2 AS INT) + 2])
       |          ELSE devf[CAST((n - 1) // 2 AS INT) + 1] END AS mad,
       |         CASE WHEN mxf - med > med - mnf
       |          THEN mxf - med ELSE med - mnf END AS pa,
       |         CASE WHEN pd05 = 0.0 AND med = 0.0 THEN ${fl("'nan'")}
       |          ELSE ${fdiv("pd05", "med")} END AS pdmp,
       |         CASE WHEN mprnum = 0.0 AND pd05 = 0.0 THEN ${fl("'nan'")}
       |          ELSE ${fdiv("mprnum", "pd05")} END AS mpr
       |        FROM g2)
       |SELECT user_id,
       | round(med + $JitterSql, $R) + 0 AS median_f32,
       | round(ipr + $JitterSql, $R) + 0 AS inter_percentile_range_f32,
       | round(mad + $JitterSql, $R) + 0 AS median_absolute_deviation_f32,
       | round(pa + $JitterSql, $R) + 0 AS percent_amplitude_f32,
       | round(mbrp + $JitterSql, $R) + 0 AS median_buffer_range_percentage_f32,
       | round(pdmp + $JitterSql, $R) + 0 AS percent_difference_magnitude_percentile_f32,
       | round(mpr + $JitterSql, $R) + 0 AS magnitude_percentage_ratio_f32
       |FROM g3 ORDER BY user_id""".stripMargin
  }

  /** The f32 flavor of the sequential/time-kernel battery
    * ([[graft.ref.FeaturesF32.evalSequential]]): EtaE / LaflerKinman /
    * Duration / TimeMean / TimeStd / Max-/MinTimeInterval with f32
    * accumulation over the (t, idx)-ordered series. */
  private def qSequentialF32(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("eta_e_f32", "lafler_kinman_f32", "duration_f32",
      "time_mean_f32", "time_std_f32", "max_time_interval_f32",
      "min_time_interval_f32")
    val evalU = udf((ts: Seq[Double], ms: Seq[Double]) =>
      graft.ref.FeaturesF32.evalSequential(
        ts.iterator.map(_.toFloat).toArray, ms.iterator.map(_.toFloat).toArray))
    val base = SeriesFeatures.boundedCollect(pts(s, dir), "user_id", 100000)
      .withColumn("mn", array_min(col("p").getField("m")))
      .withColumn("mx", array_max(col("p").getField("m")))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .withColumn("f", evalU(col("p").getField("t"), col("p").getField("m")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, r(col("f").getItem(i)))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  /** FLOAT-typed DuckDB mirror of the f32 sequential battery: in-order
    * folds over the (t, idx)-ordered FLOAT lists; non-finite squared
    * slopes drop on both engines (FLOAT x/0 -> NULL here vs JVM Inf/
    * NaN — both fail the finite filter); EtaE's cube is the same
    * iterated f32 multiply chain. */
  private val sqlSequentialF32: String = {
    def fl(x: String) = s"CAST($x AS FLOAT)"
    def fsum(l: String) =
      s"list_reduce(list_prepend(${fl("0.0")}, $l), (a, x) -> a + x)"
    // IEEE-mirror division for the s2 denominators: Guard2 filters on
    // the DOUBLE values, so a series can still narrow to flat f32
    // (s2 = 0.0f) — the engine then yields Inf/NaN while plain DuckDB
    // FLOAT division would yield NULL (false oracle red)
    def fdiv(a: String, b: String) =
      s"(CASE WHEN ($b) = 0.0 THEN " +
        s"(CASE WHEN ($a) = 0.0 THEN ${fl("'nan'")} " +
        s"WHEN ((($a) > 0.0) <> signbit($b)) THEN ${fl("'infinity'")} " +
        s"ELSE ${fl("'-infinity'")} END) " +
        s"ELSE ($a) / ($b) END)"
    val ks2 = "range(2, CAST(n AS BIGINT) + 1)"
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n,
       |        list(CAST(m AS FLOAT) ORDER BY t, idx) AS mf,
       |        list(CAST(t AS FLOAT) ORDER BY t, idx) AS tf
       |       FROM p GROUP BY 1 HAVING $Guard2),
       | g0 AS (SELECT *, CAST(n AS FLOAT) AS nf,
       |         CAST(n AS FLOAT) - ${fl("1.0")} AS nm1
       |        FROM g),
       | g1 AS (SELECT *,
       |         ${fsum("mf")} / nf AS mu,
       |         ${fsum("tf")} / nf AS tmu,
       |         tf[n] - tf[1] AS dur,
       |         list_transform($ks2, k -> tf[k] - tf[k - 1]) AS dts
       |        FROM g0),
       | g2 AS (SELECT *,
       |         ${fsum("list_transform(mf, x -> (x - mu) * (x - mu))")}
       |           / nm1 AS s2,
       |         ${fsum("list_transform(tf, x -> (x - tmu) * (x - tmu))")}
       |           / nm1 AS ts2,
       |         ${fsum(s"list_filter(list_transform($ks2, " +
                 "k -> ((mf[k] - mf[k - 1]) / (tf[k] - tf[k - 1])) " +
                 "* ((mf[k] - mf[k - 1]) / (tf[k] - tf[k - 1]))), " +
                 "v -> isfinite(v))")} AS ssq,
       |         ${fsum("list_transform(range(1, CAST(n AS BIGINT) + 1), " +
                 "k -> CASE WHEN k < n THEN (mf[k + 1] - mf[k]) * (mf[k + 1] - mf[k]) " +
                 "ELSE (mf[1] - mf[k]) * (mf[1] - mf[k]) END)")} AS lks
       |        FROM g1)
       |SELECT user_id,
       | round(${fdiv("dur * dur * ssq", "s2")} / (nm1 * nm1 * nm1) + $JitterSql, $R) + 0 AS eta_e_f32,
       | round(${fdiv("lks", s"${fl("2.0")} * s2 * nm1")} + $JitterSql, $R) + 0 AS lafler_kinman_f32,
       | round(dur + $JitterSql, $R) + 0 AS duration_f32,
       | round(tmu + $JitterSql, $R) + 0 AS time_mean_f32,
       | round(${fl("sqrt(CAST(ts2 AS DOUBLE))")} + $JitterSql, $R) + 0 AS time_std_f32,
       | round(${fl("list_aggregate(dts, 'max')")} + $JitterSql, $R) + 0 AS max_time_interval_f32,
       | round(${fl("list_aggregate(dts, 'min')")} + $JitterSql, $R) + 0 AS min_time_interval_f32
       |FROM g2 ORDER BY user_id""".stripMargin
  }

  /** The f32 flavor of the Bins meta-feature
    * ([[graft.ref.FeaturesF32.evalBins]]): 60-second downsampling with
    * f32 bucket accumulators, then Mean / StandardDeviation /
    * Amplitude / WeightedMean over the binned series — the f32
    * instantiation of the reference's `Bins` meta-feature
    * (bins.rs:171-201), closing the meta-feature half of the
    * float-trait parity surface (the spectral/fit stack stays
    * f64-only by design — f32 trig has no bit-mirrorable oracle;
    * recorded in COVERAGE.md). */
  private def qBinsF32(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("bins_mean_f32", "bins_std_f32", "bins_amplitude_f32",
      "bins_weighted_mean_f32")
    val evalU = udf((ts: Seq[Double], ms: Seq[Double], ws: Seq[Double]) =>
      graft.ref.FeaturesF32.evalBins(
        ts.iterator.map(_.toFloat).toArray, ms.iterator.map(_.toFloat).toArray,
        ws.iterator.map(_.toFloat).toArray, 60.0f))
    val base = SeriesFeatures.boundedCollect(pts(s, dir), "user_id", 100000)
      .withColumn("f", evalU(col("p").getField("t"), col("p").getField("m"),
        col("p").getField("w")))
      .withColumn("n_bins", col("f").getItem(0).cast("long"))
      .filter(col("n_bins") >= 2)
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, r(col("f").getItem(i + 1)))
    }.select((col("user_id") +: col("n_bins") +: names.map(col)): _*)
      .orderBy(col("user_id"))
  }

  /** FLOAT-typed DuckDB mirror of the f32 bins battery: the bucket
    * index is the floor of the f32 quotient, per-bucket Σmw/Σw/count
    * accumulate as in-order FLOAT folds over (t, idx)-ordered lists,
    * and the inner kernels fold over the j-ordered binned series
    * (j is monotone in t, so bucket order equals first-appearance
    * order — the JVM loop's emission order). */
  private val sqlBinsF32: String = {
    def fl(x: String) = s"CAST($x AS FLOAT)"
    def fsum(l: String) =
      s"list_reduce(list_prepend(${fl("0.0")}, $l), (a, x) -> a + x)"
    s"""WITH p AS ($PTS),
       | pe AS (SELECT user_id, CAST(t AS FLOAT) AS tf, CAST(m AS FLOAT) AS mf,
       |         CAST(w AS FLOAT) AS wf, t, idx FROM p),
       | pb AS (SELECT *, floor(tf / ${fl("60.0")}) AS j FROM pe),
       | b AS (SELECT user_id, j,
       |        ${fsum("list(mf * wf ORDER BY t, idx)")} AS smw,
       |        ${fsum("list(wf ORDER BY t, idx)")} AS sw,
       |        CAST(count(*) AS FLOAT) AS cnt
       |       FROM pb GROUP BY 1, 2),
       | bs AS (SELECT user_id, j, smw / sw AS bm, sw / cnt AS bw FROM b),
       | g AS (SELECT user_id, count(*) AS nb,
       |        list(bm ORDER BY j) AS bmf, list(bw ORDER BY j) AS bwf,
       |        CAST(max(bm) AS FLOAT) AS mx, CAST(min(bm) AS FLOAT) AS mn
       |       FROM bs GROUP BY 1 HAVING count(*) >= 2),
       | g1 AS (SELECT *, ${fsum("bmf")} / CAST(nb AS FLOAT) AS mu FROM g),
       | g2 AS (SELECT *,
       |         CAST(sqrt(CAST(
       |           ${fsum("list_transform(bmf, x -> (x - mu) * (x - mu))")}
       |             / CAST(nb - 1 AS FLOAT) AS DOUBLE)) AS FLOAT) AS sd,
       |         ${fsum("list_transform(range(1, len(bmf) + 1), k -> bwf[k] * bmf[k])")} AS swm,
       |         ${fsum("bwf")} AS sw2
       |        FROM g1)
       |SELECT user_id, nb AS n_bins,
       | round(mu + $JitterSql, $R) + 0 AS bins_mean_f32,
       | round(sd + $JitterSql, $R) + 0 AS bins_std_f32,
       | round(${fl("0.5")} * (mx - mn) + $JitterSql, $R) + 0 AS bins_amplitude_f32,
       | round(swm / sw2 + $JitterSql, $R) + 0 AS bins_weighted_mean_f32
       |FROM g2 ORDER BY user_id""".stripMargin
  }

  /** The f32 flavor of the weighted-kernel battery
    * ([[graft.ref.FeaturesF32.evalWeighted]]): WeightedMean /
    * ReducedChi2 / ExcessVariance / StetsonK / Roms with f32
    * accumulators — the last portable float-trait parity slice
    * (weights narrowed at the series boundary like t and m). */
  private def qWeightedF32(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("weighted_mean_f32", "reduced_chi2_f32",
      "excess_variance_f32", "stetson_k_f32", "roms_f32")
    val evalU = udf((ms: Seq[Double], ws: Seq[Double]) =>
      graft.ref.FeaturesF32.evalWeighted(
        ms.iterator.map(_.toFloat).toArray, ws.iterator.map(_.toFloat).toArray))
    val base = SeriesFeatures.boundedCollect(pts(s, dir), "user_id", 100000)
      .withColumn("mn", array_min(col("p").getField("m")))
      .withColumn("mx", array_max(col("p").getField("m")))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .withColumn("f", evalU(col("p").getField("m"), col("p").getField("w")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, r(col("f").getItem(i)))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  /** FLOAT-typed DuckDB mirror of the f32 weighted battery: separate
    * in-order FLOAT folds per accumulator (the JVM loops carry sw/swm
    * as independent accumulators), sqrt via the shared
    * narrowed-double convention, divisions IEEE-mirrored. */
  private val sqlWeightedF32: String = {
    def fl(x: String) = s"CAST($x AS FLOAT)"
    def fsum(l: String) =
      s"list_reduce(list_prepend(${fl("0.0")}, $l), (a, x) -> a + x)"
    def fdiv(a: String, b: String) =
      s"(CASE WHEN ($b) = 0.0 THEN " +
        s"(CASE WHEN ($a) = 0.0 THEN ${fl("'nan'")} " +
        s"WHEN ((($a) > 0.0) <> signbit($b)) THEN ${fl("'infinity'")} " +
        s"ELSE ${fl("'-infinity'")} END) " +
        s"ELSE ($a) / ($b) END)"
    def fsqrt(x: String) = fl(s"sqrt(CAST($x AS DOUBLE))")
    val ks = "range(1, CAST(n AS BIGINT) + 1)"
    s"""WITH RECURSIVE p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n,
       |        list(CAST(m AS FLOAT) ORDER BY t, idx) AS mf,
       |        list(CAST(w AS FLOAT) ORDER BY t, idx) AS wf
       |       FROM p GROUP BY 1 HAVING $Guard2),
       | g0 AS (SELECT *, CAST(n AS FLOAT) AS nf, list_sort(mf) AS sf FROM g),
       | g1 AS (SELECT *,
       |         ${fdiv(fsum(s"list_transform($ks, k -> wf[k] * mf[k])"),
                        fsum("wf"))} AS wm,
       |         ${fsum("mf")} / nf AS mu,
       |         CASE WHEN n % 2 = 0
       |          THEN ${fl("0.5")} * (sf[CAST((n - 1) // 2 AS INT) + 1]
       |                               + sf[CAST((n - 1) // 2 AS INT) + 2])
       |          ELSE sf[CAST((n - 1) // 2 AS INT) + 1] END AS med
       |        FROM g0),
       | g2 AS (SELECT *,
       |         ${fsum(s"list_transform($ks, " +
                   "k -> (mf[k] - wm) * (mf[k] - wm) * wf[k])")} AS chi2,
       |         ${fsum(s"list_transform(wf, x -> ${fl("1.0")} / x)")} AS sinvw,
       |         ${fsum("list_transform(mf, x -> (x - mu) * (x - mu))")}
       |           / CAST(n - 1 AS FLOAT) AS s2,
       |         ${fsum(s"list_transform($ks, " +
                   s"k -> abs(mf[k] - wm) * ${fsqrt("wf[k]")})")} AS sk,
       |         ${fsum(s"list_filter(list_transform($ks, " +
                   s"k -> abs(mf[k] - med) * ${fsqrt("wf[k]")}), " +
                   "v -> isfinite(v))")} AS sr
       |        FROM g1)
       |SELECT user_id,
       | round(wm + $JitterSql, $R) + 0 AS weighted_mean_f32,
       | round(chi2 / (nf - ${fl("1.0")}) + $JitterSql, $R) + 0 AS reduced_chi2_f32,
       | round(${fdiv("s2 - sinvw / nf", "mu * mu")} + $JitterSql, $R) + 0
       |   AS excess_variance_f32,
       | round(${fdiv("sk", fsqrt("nf * chi2"))} + $JitterSql, $R) + 0 AS stetson_k_f32,
       | round(sr / (nf - ${fl("1.0")}) + $JitterSql, $R) + 0 AS roms_f32
       |FROM g2 ORDER BY user_id""".stripMargin
  }

  /** The f32 flavor of the simple-kernel battery
    * ([[graft.ref.FeaturesF32]]): the stored f64 columns are narrowed
    * to f32 at the series boundary and every kernel accumulation runs
    * in single precision, mirroring the reference's f32 instantiation
    * of its sealed float trait (float_trait.rs:30-120). */
  private def qSimpleStatsF32(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("amplitude_f32", "mean_f32", "median_f32", "std_f32",
      "mean_variance_f32", "beyond_1_std_f32", "cusum_f32", "eta_f32",
      "max_slope_f32", "skew_f32", "kurtosis_f32")
    val evalU = udf((ts: Seq[Double], ms: Seq[Double]) =>
      graft.ref.FeaturesF32.evalAll(
        ts.iterator.map(_.toFloat).toArray, ms.iterator.map(_.toFloat).toArray))
    // bounded collect (same 100k-point hot-series contract as the
    // spectral queries — far above every test series, so oracled
    // outputs are unchanged)
    val base = SeriesFeatures.boundedCollect(pts(s, dir), "user_id", 100000)
      .withColumn("mn", array_min(col("p").getField("m")))
      .withColumn("mx", array_max(col("p").getField("m")))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .withColumn("f", evalU(col("p").getField("t"), col("p").getField("m")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, r(col("f").getItem(i)))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  /** Full value oracle for the f32 battery: every FeaturesF32 loop is
    * replayed over `FLOAT`-typed DuckDB lists in the same order —
    * DuckDB FLOAT arithmetic is true single precision and list folds
    * preserve the type, so each accumulation matches the JVM
    * bit-for-bit (sqrt is the shared narrowed-double convention;
    * least/greatest promote to DOUBLE in DuckDB and are cast back,
    * which is exact because they only select one of their f32
    * arguments). FLOAT x/0 yields NULL here vs Infinity on the JVM —
    * both sides drop the slope term (NULL via the finite filter,
    * Infinity via isFinite), same outcome. */
  private val sqlSimpleStatsF32: String = {
    def fl(x: String) = s"CAST($x AS FLOAT)"
    def fsum(l: String) =
      s"list_reduce(list_prepend(${fl("0.0")}, $l), (a, x) -> a + x)"
    // f32 division mirroring JVM IEEE semantics: DuckDB division by
    // zero yields NULL (for DOUBLE too), so the zero-denominator case
    // constructs the IEEE result explicitly — NaN for 0/0, signed
    // infinity otherwise (sign = numerator sign XOR denominator zero
    // sign via signbit). Nonzero denominators take the plain FLOAT
    // division, the bit-exact mirror.
    def fdiv(a: String, b: String) =
      s"(CASE WHEN ($b) = 0.0 THEN " +
        s"(CASE WHEN ($a) = 0.0 THEN ${fl("'nan'")} " +
        s"WHEN ((($a) > 0.0) <> signbit($b)) THEN ${fl("'infinity'")} " +
        s"ELSE ${fl("'-infinity'")} END) " +
        s"ELSE ($a) / ($b) END)"
    s"""WITH RECURSIVE p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n,
       |        list(CAST(m AS FLOAT) ORDER BY t, idx) AS mf,
       |        list(CAST(t AS FLOAT) ORDER BY t, idx) AS tf,
       |        max(CAST(m AS FLOAT)) AS mxf, min(CAST(m AS FLOAT)) AS mnf
       |       FROM p GROUP BY 1
       |       HAVING count(*) >= 2 AND min(m) < max(m)),
       | g0 AS (SELECT *, CAST(n AS FLOAT) AS nf FROM g),
       | g1 AS (SELECT *, ${fsum("mf")} / nf AS mu FROM g0),
       | g2 AS (SELECT *,
       |         ${fsum("list_transform(mf, x -> (x - mu) * (x - mu))")}
       |           / CAST(n - 1 AS FLOAT) AS s2,
       |         list_sort(mf) AS sf
       |        FROM g1),
       | g3 AS (SELECT *, CAST(sqrt(CAST(s2 AS DOUBLE)) AS FLOAT) AS sd FROM g2),
       | g4 AS (SELECT *,
       |         ${fl("0.5")} * (mxf - mnf) AS v_amp,
       |         CASE WHEN n % 2 = 0
       |          THEN ${fl("0.5")} * (sf[CAST((n - 1) // 2 AS INT) + 1]
       |                               + sf[CAST((n - 1) // 2 AS INT) + 2])
       |          ELSE sf[CAST((n - 1) // 2 AS INT) + 1] END AS v_med,
       |         CAST(list_aggregate(list_transform(mf,
       |             x -> CASE WHEN abs(x - mu) > sd THEN 1 ELSE 0 END),
       |           'sum') AS FLOAT) / nf AS v_beyond,
       |         ${fsum("list_transform(range(2, CAST(n AS BIGINT) + 1), " +
                 "k -> (mf[k] - mf[k - 1]) * (mf[k] - mf[k - 1]))")} AS etasum,
       |         list_filter(list_transform(range(2, CAST(n AS BIGINT) + 1),
       |             k -> abs((mf[k] - mf[k - 1]) / (tf[k] - tf[k - 1]))),
       |           v -> isfinite(v)) AS slopes,
       |         ${fsum("list_transform(mf, x -> (x - mu) * (x - mu) * (x - mu))")} AS m3,
       |         ${fsum("list_transform(mf, x -> (x - mu) * (x - mu) * (x - mu) * (x - mu))")} AS m4
       |        FROM g3),
       | dme AS (SELECT user_id, unnest(list_transform(mf, x -> x - mu)) AS d,
       |          unnest(range(1, CAST(n AS BIGINT) + 1)) AS k
       |         FROM g3),
       | cusr AS (
       |  SELECT user_id, CAST(1 AS BIGINT) AS k, d AS s, d AS mn, d AS mx
       |  FROM dme WHERE k = 1
       |  UNION ALL
       |  SELECT c.user_id, c.k + 1, c.s + e.d,
       |    CAST(least(c.mn, c.s + e.d) AS FLOAT),
       |    CAST(greatest(c.mx, c.s + e.d) AS FLOAT)
       |  FROM cusr c JOIN dme e ON e.user_id = c.user_id AND e.k = c.k + 1),
       | cus AS (SELECT user_id, mn, mx FROM
       |   (SELECT *, row_number() OVER (PARTITION BY user_id
       |                ORDER BY k DESC) AS rk FROM cusr)
       |   WHERE rk = 1),
       | fin AS (SELECT user_id,
       |          v_amp, mu, v_med, sd,
       |          ${fdiv("sd", "mu")} AS v_mv,
       |          v_beyond,
       |          ${fdiv("cus.mx - cus.mn", "sd * nf")} AS v_cusum,
       |          ${fdiv("etasum / CAST(n - 1 AS FLOAT)", "s2")} AS v_eta,
       |          CASE WHEN len(slopes) > 0
       |            THEN CAST(list_aggregate(slopes, 'max') AS FLOAT)
       |            ELSE ${fl("'nan'")} END AS v_slope,
       |          CASE WHEN n >= 3
       |            THEN ${fdiv("m3", "sd * sd * sd")} * nf
       |                   / ((nf - ${fl("1.0")}) * (nf - ${fl("2.0")}))
       |            ELSE ${fl("'nan'")} END AS v_skew,
       |          CASE WHEN n >= 4
       |            THEN ${fdiv("m4", "s2 * s2")} * nf * (nf + ${fl("1.0")})
       |                   / ((nf - ${fl("1.0")}) * (nf - ${fl("2.0")})
       |                      * (nf - ${fl("3.0")}))
       |                 - ${fl("3.0")} * (nf - ${fl("1.0")}) * (nf - ${fl("1.0")})
       |                   / ((nf - ${fl("2.0")}) * (nf - ${fl("3.0")}))
       |            ELSE ${fl("'nan'")} END AS v_kurt
       |         FROM g4 JOIN cus USING (user_id))
       |SELECT user_id,
       | round(v_amp + $JitterSql, $R) + 0 AS amplitude_f32,
       | round(mu + $JitterSql, $R) + 0 AS mean_f32,
       | round(v_med + $JitterSql, $R) + 0 AS median_f32,
       | round(sd + $JitterSql, $R) + 0 AS std_f32,
       | round(v_mv + $JitterSql, $R) + 0 AS mean_variance_f32,
       | round(v_beyond + $JitterSql, $R) + 0 AS beyond_1_std_f32,
       | round(v_cusum + $JitterSql, $R) + 0 AS cusum_f32,
       | round(v_eta + $JitterSql, $R) + 0 AS eta_f32,
       | round(v_slope + $JitterSql, $R) + 0 AS max_slope_f32,
       | round(v_skew + $JitterSql, $R) + 0 AS skew_f32,
       | round(v_kurt + $JitterSql, $R) + 0 AS kurtosis_f32
       |FROM fin ORDER BY user_id""".stripMargin
  }

  /** Otsu split + Tukey biweight scale — sequential-scan kernels whose
    * exact fold IS expressible in DuckDB (struct-accumulator
    * list_reduce), so they carry a full value oracle. */
  private def qOtsuBiweight(s: SparkSession, dir: String): DataFrame =
    extracted(s, dir,
      Seq(Features.OtsuSplit, Features.BiweightScale()),
      Seq("otsu_mean_diff", "otsu_std_lower", "otsu_std_upper",
        "otsu_lower_to_all_ratio", "biweight_scale"))

  /** The Otsu/biweight oracle: every reference loop is mirrored as an
    * in-order DuckDB fold — prefix scan left-to-right, suffix scan
    * right-to-left (the reference's reversed cumsum), argmax with
    * strict >, biweight num/den accumulation in (t, idx) order — so
    * every double matches bit-for-bit before the shared rounding. */
  private val sqlOtsuBiweight: String = {
    // DuckDB 1.0 list_reduce pitfalls, found the hard way: (a) LIST-
    // valued accumulator fields reset every step, and (b) lambdas that
    // capture OUTER ROW COLUMNS give wrong results on multi-row
    // batches (single-row evaluation is fine). So: all row-dependent
    // math lives in list_transform (safe — every passing oracle uses
    // it) or at exploded-row level, and every list_reduce lambda is
    // PURE (acc + element only). Prefix/suffix sums are fresh in-order
    // folds per split point k — O(n²) adds per group, exact reference
    // op order: prefix ascending from the left, suffix accumulated
    // right-to-left like the reference's reversed cumsum.
    val prefK = // sum of arr[0..k] (0-based), ascending
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr[1 : k + 1]), (a, x) -> a + x)"
    val sufK = // sum of arr[k+1..n-1] (0-based), accumulated right-to-left
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_reverse(arr[k + 2 : CAST(n AS INT)])), (a, x) -> a + x)"
    def sumFold(l: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $l), (a, x) -> a + x)"
    def sq2Fold(l: String, mu: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform($l, x -> (x - $mu) * (x - $mu))), (a, x) -> a + x)"
    // medianOfSorted: midpoint of central elements (NOT the R-5 ppf)
    def medSorted(arr: String, n: String) =
      s"CASE WHEN ($n) % 2 = 0 THEN 0.5 * (($arr)[($n - 1) // 2 + 1] + ($arr)[($n - 1) // 2 + 2]) " +
        s"ELSE ($arr)[($n - 1) // 2 + 1] END"
    // biweight: per-element contributions via list_transform (outer
    // captures med/denom are safe there), then a PURE struct fold in
    // (t, idx) order; excluded elements contribute +0.0, which is
    // bit-exact vs the reference's skip for finite accumulators
    val bwContrib =
      """list_transform(ml, x -> CASE
        | WHEN ((x - med) / denom) * ((x - med) / denom) < 1.0
        | THEN {nu: (x - med) * (x - med)
        |         * (1.0 - ((x - med) / denom) * ((x - med) / denom))
        |         * (1.0 - ((x - med) / denom) * ((x - med) / denom))
        |         * (1.0 - ((x - med) / denom) * ((x - med) / denom))
        |         * (1.0 - ((x - med) / denom) * ((x - med) / denom)),
        |       de: (1.0 - ((x - med) / denom) * ((x - med) / denom))
        |         * (1.0 - 5.0 * ((x - med) / denom) * ((x - med) / denom))}
        | ELSE {nu: CAST(0.0 AS DOUBLE), de: CAST(0.0 AS DOUBLE)} END)""".stripMargin
    val bwFold =
      s"""list_reduce(
        | list_prepend({nu: CAST(0.0 AS DOUBLE), de: CAST(0.0 AS DOUBLE)}, $bwContrib),
        | (a, e) -> {nu: a.nu + e.nu, de: a.de + e.de})""".stripMargin
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, count(*) AS n, list_sort(list(m)) AS arr,
       |        list(m ORDER BY t, idx) AS ml
       |       FROM p GROUP BY user_id HAVING $Guard2),
       | ks AS (SELECT user_id, n, arr, unnest(range(0, n - 1)) AS k FROM g),
       | pk AS (SELECT user_id, n, k, $prefK AS pref, $sufK AS suf FROM ks),
       | ic AS (SELECT user_id, k,
       |         ((k + 1) / CAST(n AS DOUBLE) * (1.0 - (k + 1) / CAST(n AS DOUBLE)))
       |           * (pref / (k + 1) - suf / (n - 1 - k))
       |           * (pref / (k + 1) - suf / (n - 1 - k)) AS icv
       |        FROM pk),
       | -- first-max-wins argmax = the reference's strict `icv > bestVar`
       | ot AS (SELECT b.user_id, g.n, g.arr, g.ml, b.bk FROM (
       |         SELECT user_id, CAST(k AS INT) AS bk,
       |          row_number() OVER (PARTITION BY user_id ORDER BY icv DESC, k) AS rk
       |         FROM ic) b JOIN g ON b.user_id = g.user_id AND b.rk = 1),
       | cls AS (SELECT user_id, n, arr, ml, bk + 1 AS lowlen,
       |          arr[1 : bk + 1] AS lower, arr[bk + 2 : n] AS upper
       |         FROM ot),
       | ost AS (SELECT user_id, n, arr, ml, lowlen,
       |          ${sumFold("lower")} / lowlen AS mlow,
       |          ${sumFold("upper")} / (n - lowlen) AS mup,
       |          CASE WHEN lowlen = 1 THEN 0.0
       |           ELSE sqrt(${sq2Fold("lower", s"(${sumFold("lower")} / lowlen)")} / (lowlen - 1)) END AS slow,
       |          CASE WHEN n - lowlen = 1 THEN 0.0
       |           ELSE sqrt(${sq2Fold("upper", s"(${sumFold("upper")} / (n - lowlen))")} / (n - lowlen - 1)) END AS sup
       |         FROM cls),
       | bwm AS (SELECT user_id, n, ml, mlow, mup, slow, sup, lowlen,
       |          ${medSorted("arr", "n")} AS med,
       |          ${medSorted("list_sort(list_transform(ml, x -> abs(x - " + medSorted("arr", "n") + ")))", "n")} AS mad
       |         FROM ost),
       | bwf AS (SELECT user_id, n, mlow, mup, slow, sup, lowlen, mad, $bwFold AS f
       |         FROM (SELECT *, 9.0 * mad AS denom FROM bwm)),
       | outv AS (SELECT user_id, mup - mlow AS omd, slow, sup,
       |          CAST(lowlen AS DOUBLE) / n AS ratio,
       |          CASE WHEN mad <= 0.0 THEN 0.0
       |           ELSE sqrt(n * f.nu / (f.de * f.de)) END AS bws
       |         FROM bwf)
       |SELECT user_id,
       | round(omd + $JitterSql, $R) + 0 AS otsu_mean_diff,
       | round(slow + $JitterSql, $R) + 0 AS otsu_std_lower,
       | round(sup + $JitterSql, $R) + 0 AS otsu_std_upper,
       | round(ratio + $JitterSql, $R) + 0 AS otsu_lower_to_all_ratio,
       | round(bws + $JitterSql, $R) + 0 AS biweight_scale
       |FROM outv ORDER BY user_id""".stripMargin
  }

  /** Same R-5 quantile battery through the NATIVE Catalyst expression
    * ([[graft.plans.R5PpfExpression]], codegen'd — no UDF boundary)
    * instead of the collected-buffer port: proves the custom
    * Expression against the DuckDB oracle on real data. */
  private def qQuantilesNative(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    pts(s, dir).groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("m"))).as("arr"),
        count(lit(1)).as("n_obs"), min(col("m")).as("mn"), max(col("m")).as("mx"))
      .filter(col("n_obs") >= 2 && col("mn") < col("mx"))
      .selectExpr("user_id",
        s"round(r5_ppf(arr, 0.5) + $JitterSql, $R) + 0 AS median",
        s"round(r5_ppf(arr, 0.75) - r5_ppf(arr, 0.25) + $JitterSql, $R) + 0 AS inter_percentile_range",
        s"round((r5_ppf(arr, 0.95) - r5_ppf(arr, 0.05)) / r5_ppf(arr, 0.5) + $JitterSql, $R) + 0 AS percent_difference_magnitude_percentile",
        s"round((r5_ppf(arr, 0.6) - r5_ppf(arr, 0.4)) / (r5_ppf(arr, 0.95) - r5_ppf(arr, 0.05)) + $JitterSql, $R) + 0 AS magnitude_percentage_ratio")
      .orderBy(col("user_id"))
  }

  private val sqlQuantilesNative =
    s"""WITH p AS ($PTS),
       | g AS (SELECT user_id, list_sort(list(m)) AS arr, count(*) AS n
       |       FROM p GROUP BY user_id HAVING $Guard2)
       |SELECT user_id,
       | round(${r5Sql("arr", "n", "0.5")} + $JitterSql, $R) + 0 AS median,
       | round(${r5Sql("arr", "n", "0.75")} - ${r5Sql("arr", "n", "0.25")} + $JitterSql, $R) + 0 AS inter_percentile_range,
       | round((${r5Sql("arr", "n", "0.95")} - ${r5Sql("arr", "n", "0.05")}) / ${r5Sql("arr", "n", "0.5")} + $JitterSql, $R) + 0 AS percent_difference_magnitude_percentile,
       | round((${r5Sql("arr", "n", "0.6")} - ${r5Sql("arr", "n", "0.4")}) / (${r5Sql("arr", "n", "0.95")} - ${r5Sql("arr", "n", "0.05")}) + $JitterSql, $R) + 0 AS magnitude_percentage_ratio
       |FROM g ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Rollup / tier queries (the engine core)
  // ---------------------------------------------------------------

  private def qTier1m(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .withColumn("bucket", Kernels.binIndex(col("t"), 60.0))
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        count(lit(1)).as("n_pts"),
        r(Kernels.binTime(col("bucket"), 60.0)).as("bucket_t"),
        r(Kernels.binM(col("m"), col("w"))).as("bin_m"),
        r(Kernels.binW(col("w"))).as("bin_w"))
      .orderBy(col("user_id"), col("bucket"))

  private val sqlTier1m =
    s"""WITH p AS ($PTS)
       |SELECT user_id, CAST(floor(t / 60) AS BIGINT) AS bucket, count(*) AS n_pts,
       | round((floor(t / 60) + 0.5) * 60 + $JitterSql, $R) + 0 AS bucket_t,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS bin_m,
       | round(sum(w)/count(*) + $JitterSql, $R) + 0 AS bin_w
       |FROM p GROUP BY user_id, floor(t / 60) ORDER BY user_id, bucket""".stripMargin

  /** 1h tier rebuilt from 1m partial sums — the cascade carries
    * (sum_mw, sum_w, n) so coarser tiers compose exactly. */
  private def qTierCascade1h(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .withColumn("b1m", Kernels.binIndex(col("t"), 60.0))
      .groupBy(col("user_id"), col("b1m"))
      .agg(sum(col("m") * col("w")).as("sum_mw"), sum(col("w")).as("sum_w"),
        count(lit(1)).as("n"))
      .withColumn("bucket", floor(col("b1m") / 60.0))
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        sum(col("n")).as("n_pts"),
        r((col("bucket") + 0.5) * 3600.0).as("bucket_t"),
        r(sum(col("sum_mw")) / sum(col("sum_w"))).as("bin_m"),
        r(sum(col("sum_w")) / sum(col("n"))).as("bin_w"))
      .orderBy(col("user_id"), col("bucket"))

  private val sqlTierCascade1h =
    s"""WITH p AS ($PTS)
       |SELECT user_id, CAST(floor(floor(t / 60) / 60) AS BIGINT) AS bucket, count(*) AS n_pts,
       | round((floor(floor(t / 60) / 60) + 0.5) * 3600 + $JitterSql, $R) + 0 AS bucket_t,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS bin_m,
       | round(sum(w)/count(*) + $JitterSql, $R) + 0 AS bin_w
       |FROM p GROUP BY user_id, floor(floor(t / 60) / 60) ORDER BY user_id, bucket""".stripMargin

  /** Gap-fill the 1h tier: dense hourly buckets per user via
    * `sequence` + explode, LOCF via `last(ignoreNulls)` window —
    * pure Catalyst (SURVEY.md §7 step 5). */
  private def qGapfillLocf(s: SparkSession, dir: String): DataFrame = {
    val hourly = pts(s, dir)
      .groupBy(col("user_id"), floor(col("t") / 3600).cast("long").as("bucket"))
      .agg(avg(col("m")).as("hour_mean"))
    val spans = hourly.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("user_id"),
        explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans.join(hourly, Seq("user_id", "bucket"), "left")
      .withColumn("filled", last(col("hour_mean"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("bucket"),
        when(col("hour_mean").isNull, 1).otherwise(0).as("is_gap"),
        r(col("filled")).as("hour_mean_locf"))
      .orderBy(col("user_id"), col("bucket"))
  }

  private val sqlGapfillLocf =
    s"""WITH p AS ($PTS),
       | h AS (SELECT user_id, CAST(floor(t / 3600) AS BIGINT) AS bucket, avg(m) AS hour_mean
       |       FROM p GROUP BY 1, 2),
       | spans AS (SELECT user_id, unnest(generate_series(min(bucket), max(bucket))) AS bucket
       |           FROM h GROUP BY user_id),
       | j AS (SELECT spans.user_id, spans.bucket, h.hour_mean
       |       FROM spans LEFT JOIN h ON spans.user_id = h.user_id AND spans.bucket = h.bucket)
       |SELECT user_id, bucket,
       | CASE WHEN hour_mean IS NULL THEN 1 ELSE 0 END AS is_gap,
       | round(last_value(hour_mean IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + $JitterSql, $R) + 0 AS hour_mean_locf
       |FROM j ORDER BY user_id, bucket""".stripMargin

  /** Reference Bins-then-features semantics: features over the 1m-binned
    * series (t* = bucket center, m* = weighted mean, w* = mean weight). */
  private def qBinsFeatures(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .groupBy(col("user_id"), Kernels.binIndex(col("t"), 60.0).as("b"))
      .agg(Kernels.binM(col("m"), col("w")).as("bm"), Kernels.binW(col("w")).as("bw"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_bins"),
        r(avg(col("bm"))).as("bins_mean"),
        r(stddev_samp(col("bm"))).as("bins_std"),
        r((max(col("bm")) - min(col("bm"))) / 2.0).as("bins_amplitude"),
        r(sum(col("bm") * col("bw")) / sum(col("bw"))).as("bins_weighted_mean"))
      .filter(col("n_bins") >= 2)
      .orderBy(col("user_id"))

  private val sqlBinsFeatures =
    s"""WITH p AS ($PTS),
       | b AS (SELECT user_id, floor(t / 60) AS j, sum(m*w)/sum(w) AS bm,
       |        sum(w)/count(*) AS bw
       |       FROM p GROUP BY 1, 2)
       |SELECT user_id, count(*) AS n_bins,
       | round(avg(bm) + $JitterSql, $R) + 0 AS bins_mean,
       | round(stddev_samp(bm) + $JitterSql, $R) + 0 AS bins_std,
       | round((max(bm) - min(bm)) / 2 + $JitterSql, $R) + 0 AS bins_amplitude,
       | round(sum(bm*bw)/sum(bw) + $JitterSql, $R) + 0 AS bins_weighted_mean
       |FROM b GROUP BY user_id HAVING count(*) >= 2 ORDER BY user_id""".stripMargin

  private def qObsCount(s: SparkSession, dir: String): DataFrame =
    pts(s, dir).groupBy(col("user_id"))
      .agg(Kernels.observationCount().as("observation_count"))
      .orderBy(col("user_id"))

  private val sqlObsCount =
    "SELECT user_id, count(*) AS observation_count FROM events GROUP BY user_id ORDER BY user_id"

  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_obs_count" -> qObsCount _,
    "q_simple_stats" -> qSimpleStats _,
    "q_weighted" -> qWeighted _,
    "q_beyond_1_std" -> qBeyond1Std _,
    "q_eta" -> qEta _,
    "q_eta_e" -> qEtaE _,
    "q_slopes_intervals" -> qSlopesIntervals _,
    "q_cusum" -> qCusum _,
    "q_lafler_kinman" -> qLaflerKinman _,
    "q_quantiles" -> qQuantiles _,
    "q_quantiles_native" -> qQuantilesNative _,
    "q_moments" -> qMoments _,
    "q_linear_fits" -> qLinearFits _,
    "q_stetson_roms" -> qStetsonRoms _,
    "q_special_kernels" -> qSpecial _,
    "q_simple_stats_f32" -> qSimpleStatsF32 _,
    "q_quantiles_f32" -> qQuantilesF32 _,
    "q_weighted_f32" -> qWeightedF32 _,
    "q_sequential_f32" -> qSequentialF32 _,
    "q_bins_f32" -> qBinsF32 _,
    "q_otsu_biweight" -> qOtsuBiweight _,
    "q_tier_1m" -> qTier1m _,
    "q_tier_cascade_1h" -> qTierCascade1h _,
    "q_gapfill_locf" -> qGapfillLocf _,
    "q_bins_features" -> qBinsFeatures _)

  val oracles: Map[String, String] = Map(
    "q_obs_count" -> sqlObsCount,
    "q_simple_stats" -> sqlSimpleStats,
    "q_weighted" -> sqlWeighted,
    "q_beyond_1_std" -> sqlBeyond1Std,
    "q_eta" -> sqlEta,
    "q_eta_e" -> sqlEtaE,
    "q_slopes_intervals" -> sqlSlopesIntervals,
    "q_cusum" -> sqlCusum,
    "q_lafler_kinman" -> sqlLaflerKinman,
    "q_quantiles" -> sqlQuantiles,
    "q_quantiles_native" -> sqlQuantilesNative,
    "q_moments" -> sqlMoments,
    "q_linear_fits" -> sqlLinearFits,
    "q_stetson_roms" -> sqlStetsonRoms,
    "q_tier_1m" -> sqlTier1m,
    "q_tier_cascade_1h" -> sqlTierCascade1h,
    "q_gapfill_locf" -> sqlGapfillLocf,
    "q_bins_features" -> sqlBinsFeatures,
    "q_otsu_biweight" -> sqlOtsuBiweight,
    "q_special_kernels" -> sqlSpecial,
    "q_simple_stats_f32" -> sqlSimpleStatsF32,
    "q_quantiles_f32" -> sqlQuantilesF32,
    "q_weighted_f32" -> sqlWeightedF32,
    "q_sequential_f32" -> sqlSequentialF32,
    "q_bins_f32" -> sqlBinsF32)
}
