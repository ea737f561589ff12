package graft.queries

import graft.operators.SeriesFeatures
import graft.ref.{CurveFitFeature, Features, NonlinearFit, PeriodogramFeature, Transformed, Transformer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Periodogram and transformed-feature queries over the events series.
 * Every query here is value-oracled: the coarse/fixed-grid variants
 * (q_periodogram_direct, q_periodogram_fixed_grid,
 * q_mc_periodogram_direct) carry full relational DuckDB oracles, and
 * the dense default-grid queries — whose dynamic per-series frequency
 * grids + recurrent trig have no single-statement SQL mirror — are
 * hash-compared against reviewed frozen-golden parquet committed at
 * all three test scales (see [[sqlGolden]] and goldens/README.md).
 * PeriodogramSpec additionally golden-tests the kernel against scipy
 * values; the distributed path reuses the exact single-node code per
 * group (bit-parity by construction).
 */
object SpectralQueries {

  private val TBase = 1704067200.0

  /** Per-series point cap for the whole-series spectral kernels: a
    * periodogram/fit inherently needs the full series as group state,
    * but an unbounded hot series must not be able to OOM an executor —
    * beyond this, [[SeriesFeatures.boundedCollect]] downsamples by
    * reference Bins semantics first (scalar-state aggregation). Far
    * above every series in the test corpora (≈400 points), so oracled
    * outputs are unchanged; 100k points ≈ 3 MB of group state. */
  private val MaxSeriesPoints = 100000

  private def pts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet").select(
      col("user_id"),
      (unix_micros(col("ts").cast("timestamp")) / 1000000.0 - TBase).as("t"),
      col("value").as("m"),
      lit(1.0).as("w"),
      col("event_id").as("idx"))

  private def boundedPts(s: SparkSession, dir: String): DataFrame =
    SeriesFeatures.boundedCollect(pts(s, dir), "user_id", MaxSeriesPoints)

  /** Top-2 Lomb-Scargle peaks per series (default dynamic grid:
    * resolution 10, average Nyquist, PSD normalization). */
  private def qPeriodogram(s: SparkSession, dir: String): DataFrame = {
    val feats = Seq(PeriodogramFeature(peaks = 2))
    val names = SeriesFeatures.outputNames(feats)
    val base = boundedPts(s, dir)
      .filter(col("n_obs") >= 4)
      .withColumn("f", SeriesFeatures.extract(feats)(col("p")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, round(col("f").getItem(i), 6))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  /** Direct Lomb-Scargle on a COARSE grid (resolution 2, half average
    * Nyquist) — small enough that the O(N·Nfreq) per-point sin/cos
    * double loop is mirrorable in DuckDB SQL, giving the Direct
    * periodogram kernel a FULL value oracle (the dense default grid of
    * q_periodogram stays rows-only). The engine evaluates through the
    * recurrent sin/cos stream, which agrees with direct trig to ~1e-12
    * (asserted in PeriodogramSpec); the shared round-to-6 + jitter
    * scheme absorbs that plus hypot-vs-sqrt and summation-order ulps. */
  private def qPeriodogramDirect(s: SparkSession, dir: String): DataFrame = {
    val feats = Seq(PeriodogramFeature(peaks = 2,
      params = graft.ref.Periodogram.GridParams(resolution = 2.0, maxFreqFactor = 0.5)))
    val names = SeriesFeatures.outputNames(feats)
    val base = boundedPts(s, dir)
      .filter(col("n_obs") >= 4)
      .withColumn("f", SeriesFeatures.extract(feats)(col("p")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, round(col("f").getItem(i) + 1.2345e-9, 6))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  /** The Press §13.8 tau-corrected Lomb-Scargle, relationally, over a
    * `freqs(user_id, k, w0, n, mu, s2)` CTE supplied by the caller:
    * per-(series, freq, point) trig expansion, the two-pass tau then
    * power aggregation, strict local-maxima peak detection via
    * lag/lead, rank by power, zero-padded assembly. */
  private def sqlLombScargle(freqCtes: String): String = {
    s"""WITH p AS (SELECT user_id, epoch(ts) - $TBase AS t, value AS m FROM events),
       | g AS (SELECT user_id, count(*) AS n, min(t) AS t0, max(t) AS t1,
       |        avg(m) AS mu, var_samp(m) AS s2
       |       FROM p GROUP BY user_id HAVING count(*) >= 4),
       | $freqCtes,
       | -- pass 1: tau from sums of sin/cos(2 w t)
       | tau AS (SELECT f.user_id, f.k,
       |          sum(sin(2.0 * f.w0 * p.t)) AS ss, sum(cos(2.0 * f.w0 * p.t)) AS sc
       |         FROM freqs f JOIN p ON p.user_id = f.user_id
       |         GROUP BY 1, 2),
       | tau2 AS (SELECT user_id, k,
       |           sign(ss) * sqrt(0.5 * (1.0 - sc / sqrt(ss*ss + sc*sc))) AS sint,
       |           sqrt(0.5 * (1.0 + sc / sqrt(ss*ss + sc*sc))) AS cost
       |          FROM tau),
       | -- pass 2: tau-rotated projections
       | pw AS (SELECT f.user_id, f.k, f.n, f.s2, f.w0,
       |         sum((p.m - f.mu) * (sin(f.w0*p.t)*t2.cost - cos(f.w0*p.t)*t2.sint)) AS msin,
       |         sum((p.m - f.mu) * (cos(f.w0*p.t)*t2.cost + sin(f.w0*p.t)*t2.sint)) AS mcos,
       |         sum(pow(sin(f.w0*p.t)*t2.cost - cos(f.w0*p.t)*t2.sint, 2)) AS ssin2
       |        FROM freqs f
       |        JOIN tau2 t2 ON t2.user_id = f.user_id AND t2.k = f.k
       |        JOIN p ON p.user_id = f.user_id
       |        GROUP BY 1, 2, 3, 4, 5),
       | power AS (SELECT user_id, k, w0,
       |            CASE WHEN (msin = 0.0 AND ssin2 = 0.0)
       |                   OR (mcos = 0.0 AND (n - ssin2) = 0.0) OR s2 = 0.0 THEN 0.0
       |             ELSE 0.5 * (msin*msin/ssin2 + mcos*mcos/(n - ssin2)) / s2
       |            END AS pw
       |           FROM pw),
       | stats AS (SELECT user_id, avg(pw) AS pmean,
       |            CASE WHEN count(*) >= 2 THEN stddev_samp(pw) ELSE 0.0 END AS pstd
       |           FROM power GROUP BY 1),
       | -- strict local maxima: rise then (non-strict) fall
       | nb AS (SELECT user_id, k, pw, w0,
       |         lag(pw) OVER w AS pl, lead(pw) OVER w AS pn
       |        FROM power WINDOW w AS (PARTITION BY user_id ORDER BY k)),
       | cand AS (SELECT user_id, k, pw, w0,
       |           row_number() OVER (PARTITION BY user_id
       |             ORDER BY pw DESC, k) AS rk
       |          FROM nb
       |          WHERE pl IS NOT NULL AND pn IS NOT NULL AND pw > pl AND pn <= pw),
       | top AS (SELECT c.user_id, c.rk,
       |          2.0 * pi() / c.w0 AS period,
       |          (c.pw - s.pmean) / s.pstd AS snr
       |         FROM cand c JOIN stats s ON s.user_id = c.user_id
       |         WHERE c.rk <= 2)
       |SELECT g.user_id,
       | round(coalesce(max(CASE WHEN rk = 1 THEN period END), 0.0) + 1.2345e-9, 6) + 0
       |   AS period_0,
       | round(coalesce(max(CASE WHEN rk = 1 THEN snr END), 0.0) + 1.2345e-9, 6) + 0
       |   AS periodogram_peak_snr_0,
       | round(coalesce(max(CASE WHEN rk = 2 THEN period END), 0.0) + 1.2345e-9, 6) + 0
       |   AS period_1,
       | round(coalesce(max(CASE WHEN rk = 2 THEN snr END), 0.0) + 1.2345e-9, 6) + 0
       |   AS periodogram_peak_snr_1
       |FROM g LEFT JOIN top ON top.user_id = g.user_id
       |GROUP BY g.user_id ORDER BY g.user_id""".stripMargin
  }

  /** Dynamic linear grid (freq.rs:313-331 semantics, op order mirrored
    * exactly): step = 2 pi (n-1) / (n * res * duration), minf =
    * 4 pi / duration, maxf = avg-Nyquist * factor, size =
    * round((maxf-minf)/step) or 1. */
  private def sqlPeriodogramDirect: String = sqlLombScargle(
    s"""grid AS (SELECT user_id, n, mu, s2,
       |           4.0 * pi() / (t1 - t0) AS minf,
       |           2.0 * pi() * (n - 1.0) / (n * 2.0 * (t1 - t0)) AS step,
       |           pi() * (n - 1) / (t1 - t0) * 0.5 AS maxf
       |          FROM g),
       | gsize AS (SELECT *, CASE WHEN (maxf - minf) / step >= 1.0
       |            THEN CAST(floor((maxf - minf) / step + 0.5) AS BIGINT)
       |            ELSE 1 END AS sz
       |           FROM grid),
       | freqs AS (SELECT user_id, n, mu, s2, minf + step * k AS w0, k
       |           FROM (SELECT *, unnest(range(0, sz)) AS k FROM gsize))""".stripMargin)

  /** A NON-UNIFORM fixed physical grid shared by all series — the
    * FreqGrid::Arbitrary use case (freq.rs:146-162): 48 log-spaced
    * frequencies spanning the corpus' period range. Values are
    * serialized at 17 significant digits into BOTH the engine array
    * and the SQL literal list, so the two sides parse bit-identical
    * doubles. */
  private val FixedGridFreqs: Array[Double] =
    (0 until 48).map(i => 2.0e-5 * math.pow(1.07, i)).toArray

  /** Periodogram over the fixed arbitrary grid — exercises the
    * direct-trig (non-recurrent) stream distributed, with a full value
    * oracle through the shared relational Lomb-Scargle. */
  private def qPeriodogramFixedGrid(s: SparkSession, dir: String): DataFrame = {
    val feats = Seq(PeriodogramFeature(peaks = 2,
      fixedGrid = Some(graft.ref.Periodogram.ArbitraryGrid(FixedGridFreqs))))
    val names = SeriesFeatures.outputNames(feats)
    val base = boundedPts(s, dir)
      .filter(col("n_obs") >= 4)
      .withColumn("f", SeriesFeatures.extract(feats)(col("p")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, round(col("f").getItem(i) + 1.2345e-9, 6))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  private def sqlPeriodogramFixedGrid: String = {
    val lits = FixedGridFreqs.map(d => f"$d%.17e").mkString("[", ", ", "]")
    sqlLombScargle(
      s"""freqs AS (SELECT g.user_id, g.n, g.mu, g.s2, ks.k,
         |            ($lits)[ks.k + 1] AS w0
         |           FROM g, (SELECT unnest(range(0, ${FixedGridFreqs.length})) AS k) ks)"""
        .stripMargin)
  }

  /** Transformed meta-feature through the reference-port path
    * (Transformed(inner, transformer) evaluated per group), proving
    * the wrapper works distributed, not just as Catalyst columns. */
  private def qTransformedFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = Seq(
      Transformed(Features.Amplitude, Transformer.Ln1p),
      Transformed(Features.Mean, Transformer.Arcsinh),
      Transformed(Features.StandardDeviation, Transformer.Sqrt),
      Transformed(Features.Amplitude, Transformer.ClippedLg()))
    val names = SeriesFeatures.outputNames(feats)
    val base = pts(s, dir)
      .groupBy(col("user_id"))
      .agg(SeriesFeatures.collectSorted(col("t"), col("idx"), col("m"), col("w")).as("p"),
        count(lit(1)).as("n_obs"))
      .filter(col("n_obs") >= 2)
      .withColumn("f", SeriesFeatures.extract(feats)(col("p")))
    names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, round(col("f").getItem(i) + 1.2345e-9, 6))
    }.select((col("user_id") +: names.map(col)): _*).orderBy(col("user_id"))
  }

  private val sqlTransformedFeatures =
    s"""WITH p AS (SELECT user_id, value AS m FROM events),
       | g AS (SELECT user_id, count(*) AS n, avg(m) AS mean0,
       |        (max(m) - min(m))/2 AS amp0, stddev_samp(m) AS std0
       |       FROM p GROUP BY user_id HAVING count(*) >= 2)
       |SELECT user_id,
       | round(ln(1 + amp0) + 1.2345e-9, 6) AS ln1p_amplitude,
       | round(ln(mean0 + sqrt(mean0*mean0 + 1)) + 1.2345e-9, 6) AS arcsinh_mean,
       | round(sqrt(std0) + 1.2345e-9, 6) AS sqrt_standard_deviation,
       | round(CASE WHEN amp0 < 2.2250738585072014e-308
       |        THEN ${Transformer.ClippedLgZero}
       |        ELSE log10(amp0) END + 1.2345e-9, 6) AS clipped_lg_amplitude
       |FROM g ORDER BY user_id""".stripMargin

  /** Nonlinear SN-model fits per series (Bazin 5p + Villar 7p +
    * Linexp 4p via the deterministic MCMC + Nelder-Mead pipeline),
    * each both RAW (params + chi2) and through its fit-output
    * transformer (mag amplitude / B-over-A / ln1p chi2 reshape);
    * tolerance-tested in FitSpec, rows-only driver check (no SQL
    * oracle exists for an optimizer). */
  private def qCurveFits(s: SparkSession, dir: String): DataFrame = {
    import graft.ref.FitTransformer
    val feats = Seq(
      CurveFitFeature(NonlinearFit.BazinModel),
      CurveFitFeature(NonlinearFit.VillarModel),
      CurveFitFeature(NonlinearFit.LinexpModel))
    val names = SeriesFeatures.outputNames(feats)
    val base = boundedPts(s, dir)
      .filter(col("n_obs") >= 8)
      .withColumn("f", SeriesFeatures.extract(feats)(col("p")))
    val raw = names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(s"_$n", col("f").getItem(i))
    }
    // fit-output transformers (bazin_fit.rs:106-136 etc.), derived in
    // Catalyst from the raw params — same scalar ops as
    // graft.ref.FitTransformer, with a `tr_` prefix (the reference's
    // transformed names intentionally shadow raw param names; a
    // reference user picks raw OR transformed per extractor, this
    // query emits both).
    // IEEE semantics under ANSI mode: the reference's float math gives
    // +inf for log10(0) -> mag of a zero-amplitude fit, and signed
    // inf / NaN for B/0 — guard explicitly instead of erroring.
    val zp = lit(FitTransformer.DefaultMagZp)
    // IEEE semantics of the JVM form (zp - 2.5*log10(2a)): a > 0 finite,
    // a == 0 -> +Inf (log10(0) = -Inf), a < 0 -> NaN — keep the two
    // implementations of this transformer in exact agreement
    def magAmp(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(a > 0.0, zp - lit(2.5) * log10(lit(2.0) * a))
        .when(a === 0.0, lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NaN))
    def ratio(b: org.apache.spark.sql.Column,
        a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(a =!= 0.0, b / a)
        .when(b > 0.0, lit(Double.PositiveInfinity))
        .when(b < 0.0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    val withTr = raw
      .withColumn("tr_bazin_fit_mag_full_amplitude", magAmp(col("_bazin_fit_amplitude")))
      .withColumn("tr_bazin_fit_baseline_amplitude_ratio",
        ratio(col("_bazin_fit_baseline"), col("_bazin_fit_amplitude")))
      .withColumn("tr_ln1p_bazin_fit_reduced_chi2", log1p(col("_bazin_fit_reduced_chi2")))
      .withColumn("tr_villar_fit_mag_full_amplitude", magAmp(col("_villar_fit_amplitude")))
      .withColumn("tr_villar_fit_baseline_amplitude_ratio",
        ratio(col("_villar_fit_baseline"), col("_villar_fit_amplitude")))
      .withColumn("tr_ln1p_villar_fit_reduced_chi2", log1p(col("_villar_fit_reduced_chi2")))
      .withColumn("tr_linexp_fit_amplitude", magAmp(col("_linexp_fit_amplitude")))
      .withColumn("tr_linexp_fit_baseline",
        ratio(col("_linexp_fit_baseline"), col("_linexp_fit_amplitude")))
      .withColumn("tr_ln1p_linexp_fit_reduced_chi2", log1p(col("_linexp_fit_reduced_chi2")))
    val trNames = Seq(
      "tr_bazin_fit_mag_full_amplitude", "tr_bazin_fit_baseline_amplitude_ratio",
      "tr_ln1p_bazin_fit_reduced_chi2",
      "tr_villar_fit_mag_full_amplitude", "tr_villar_fit_baseline_amplitude_ratio",
      "tr_ln1p_villar_fit_reduced_chi2",
      "tr_linexp_fit_amplitude", "tr_linexp_fit_baseline",
      "tr_ln1p_linexp_fit_reduced_chi2")
    // the LM path (reference Lmsder) exercised on the same series:
    // pure Levenberg-Marquardt from the data-driven init — no second
    // MCMC chain rides this column (McmcLmsder would re-run the full
    // ensemble sampler the battery already paid for above)
    val lmFeats = Seq(CurveFitFeature(NonlinearFit.BazinModel,
      algorithm = graft.ref.FitAlgorithm.Lmsder))
    val withLm = withTr.withColumn("flm",
      SeriesFeatures.extract(lmFeats)(col("p")))
      .withColumn("lm_bazin_fit_reduced_chi2", col("flm").getItem(5))
    val outCols = names.map(n => round(col(s"_$n"), 6).as(n)) ++
      trNames.map(n => round(col(n), 6).as(n)) :+
      round(col("lm_bazin_fit_reduced_chi2"), 6).as("lm_bazin_fit_reduced_chi2")
    withLm.select((col("user_id") +: outCols): _*).orderBy(col("user_id"))
  }

  /** Combined multi-band periodogram per series (bands = event_type):
    * per-band sorted collection, then one union-grid evaluation per
    * series — two-level aggregation, both shuffles on bounded keys. */
  private def mcPeriodogram(s: SparkSession, dir: String,
      params: graft.ref.Periodogram.GridParams, jitter: Double): DataFrame = {
    val evalU = udf((bands: Seq[String], ts: Seq[Seq[Double]], ms: Seq[Seq[Double]],
        ws: Seq[Seq[Double]]) => {
      val lcs = bands.indices.map(i => bands(i) ->
        graft.ref.LightCurve(ts(i).toArray, ms(i).toArray, ws(i).toArray))
      graft.ref.MultiColorPeriodogram.eval(lcs.toSeq, peaks = 2, params = params)
    })
    val ptsB = s.read.parquet(s"$dir/events.parquet").select(
      col("user_id"),
      col("event_type").as("band"),
      (unix_micros(col("ts").cast("timestamp")) / 1000000.0 - TBase).as("t"),
      col("value").as("m"), lit(1.0).as("w"), col("event_id").as("idx"))
    // per-(series, band) bounded collect — a hot series must not OOM
    // the two-level aggregation (same MaxSeriesPoints contract as the
    // single-band spectral queries)
    val perBand = SeriesFeatures
      .boundedCollect(ptsB, Seq("user_id", "band"), MaxSeriesPoints)
      .filter(col("n_obs") >= 4)
    perBand
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("band"), col("p")))).as("bp"))
      .select(col("user_id"),
        size(col("bp")).as("n_bands"),
        evalU(col("bp.band"),
          transform(col("bp"), x => x.getField("p").getField("t")),
          transform(col("bp"), x => x.getField("p").getField("m")),
          transform(col("bp"), x => x.getField("p").getField("w"))).as("f"))
      .select(col("user_id"), col("n_bands"),
        round(col("f").getItem(0) + jitter, 6).as("mc_period_0"),
        round(col("f").getItem(1) + jitter, 6).as("mc_peak_snr_0"),
        round(col("f").getItem(2) + jitter, 6).as("mc_period_1"),
        round(col("f").getItem(3) + jitter, 6).as("mc_peak_snr_1"))
      .orderBy(col("user_id"))
  }

  private def qMcPeriodogram(s: SparkSession, dir: String): DataFrame =
    mcPeriodogram(s, dir, graft.ref.Periodogram.GridParams(), jitter = 0.0)

  /** MC periodogram on the coarse mirrorable grid — the FULL value
    * oracle for the multi-band combined-power kernel (the dense
    * default grid stays rows-only): count-weighted per-band powers on
    * the union-time grid, summed, peaks from the combined spectrum. */
  private def qMcPeriodogramDirect(s: SparkSession, dir: String): DataFrame =
    mcPeriodogram(s, dir,
      graft.ref.Periodogram.GridParams(resolution = 2.0, maxFreqFactor = 0.5),
      jitter = 1.2345e-9)

  /** multi_color_periodogram.rs:508-562 relationally: qualifying bands
    * (n >= 4), union-time grid derivation, per-(band, freq) tau +
    * power with the band's own mean/variance/count, count-weighted
    * combination, then the shared peak pipeline. */
  private def sqlMcPeriodogramDirect: String =
    s"""WITH p0 AS (SELECT user_id, event_type AS band, epoch(ts) - $TBase AS t,
       |             value AS m
       |            FROM events),
       | bs AS (SELECT user_id, band, count(*) AS nb, avg(m) AS mu, var_samp(m) AS s2
       |        FROM p0 GROUP BY 1, 2 HAVING count(*) >= 4),
       | p AS (SELECT p0.* FROM p0 JOIN bs USING (user_id, band)),
       | gate AS (SELECT user_id, count(*) AS n_bands, sum(nb) AS norm
       |          FROM bs GROUP BY 1),
       | u AS (SELECT user_id, count(*) AS n, min(t) AS t0, max(t) AS t1
       |       FROM p GROUP BY 1),
       | grid AS (SELECT user_id,
       |           4.0 * pi() / (t1 - t0) AS minf,
       |           2.0 * pi() * (n - 1.0) / (n * 2.0 * (t1 - t0)) AS step,
       |           pi() * (n - 1) / (t1 - t0) * 0.5 AS maxf
       |          FROM u),
       | gsize AS (SELECT *, CASE WHEN (maxf - minf) / step >= 1.0
       |            THEN CAST(floor((maxf - minf) / step + 0.5) AS BIGINT)
       |            ELSE 1 END AS sz
       |           FROM grid),
       | freqs AS (SELECT user_id, minf + step * k AS w0, k
       |           FROM (SELECT *, unnest(range(0, sz)) AS k FROM gsize)),
       | tau AS (SELECT f.user_id, p.band, f.k,
       |          sum(sin(2.0 * f.w0 * p.t)) AS ss, sum(cos(2.0 * f.w0 * p.t)) AS sc
       |         FROM freqs f JOIN p ON p.user_id = f.user_id
       |         GROUP BY 1, 2, 3),
       | tau2 AS (SELECT user_id, band, k,
       |           sign(ss) * sqrt(0.5 * (1.0 - sc / sqrt(ss*ss + sc*sc))) AS sint,
       |           sqrt(0.5 * (1.0 + sc / sqrt(ss*ss + sc*sc))) AS cost
       |          FROM tau),
       | bpw AS (SELECT f.user_id, p.band, f.k, f.w0,
       |          sum((p.m - b.mu) * (sin(f.w0*p.t)*t2.cost - cos(f.w0*p.t)*t2.sint)) AS msin,
       |          sum((p.m - b.mu) * (cos(f.w0*p.t)*t2.cost + sin(f.w0*p.t)*t2.sint)) AS mcos,
       |          sum(pow(sin(f.w0*p.t)*t2.cost - cos(f.w0*p.t)*t2.sint, 2)) AS ssin2
       |         FROM freqs f
       |         JOIN p ON p.user_id = f.user_id
       |         JOIN bs b ON b.user_id = p.user_id AND b.band = p.band
       |         JOIN tau2 t2 ON t2.user_id = f.user_id AND t2.band = p.band
       |           AND t2.k = f.k
       |         GROUP BY 1, 2, 3, 4),
       | bpower AS (SELECT w.user_id, w.band, w.k, w.w0,
       |             CASE WHEN (msin = 0.0 AND ssin2 = 0.0)
       |                    OR (mcos = 0.0 AND (b.nb - ssin2) = 0.0) OR b.s2 = 0.0 THEN 0.0
       |              ELSE 0.5 * (msin*msin/ssin2 + mcos*mcos/(b.nb - ssin2)) / b.s2
       |             END AS pw,
       |             b.nb
       |            FROM bpw w JOIN bs b ON b.user_id = w.user_id AND b.band = w.band),
       | power AS (SELECT bp.user_id, bp.k, bp.w0,
       |            sum(bp.nb / g.norm * bp.pw) AS pw
       |           FROM bpower bp JOIN gate g ON g.user_id = bp.user_id
       |           GROUP BY 1, 2, 3),
       | stats AS (SELECT user_id, avg(pw) AS pmean,
       |            CASE WHEN count(*) >= 2 THEN stddev_samp(pw) ELSE 0.0 END AS pstd
       |           FROM power GROUP BY 1),
       | nbr AS (SELECT user_id, k, pw, w0,
       |          lag(pw) OVER w AS pl, lead(pw) OVER w AS pn
       |         FROM power WINDOW w AS (PARTITION BY user_id ORDER BY k)),
       | cand AS (SELECT user_id, k, pw, w0,
       |           row_number() OVER (PARTITION BY user_id
       |             ORDER BY pw DESC, k) AS rk
       |          FROM nbr
       |          WHERE pl IS NOT NULL AND pn IS NOT NULL AND pw > pl AND pn <= pw),
       | top AS (SELECT c.user_id, c.rk, 2.0 * pi() / c.w0 AS period,
       |          (c.pw - s.pmean) / s.pstd AS snr
       |         FROM cand c JOIN stats s ON s.user_id = c.user_id
       |         WHERE c.rk <= 2)
       |SELECT g.user_id, CAST(g.n_bands AS INT) AS n_bands,
       | round(coalesce(max(CASE WHEN rk = 1 THEN period END), 0.0) + 1.2345e-9, 6) + 0
       |   AS mc_period_0,
       | round(coalesce(max(CASE WHEN rk = 1 THEN snr END), 0.0) + 1.2345e-9, 6) + 0
       |   AS mc_peak_snr_0,
       | round(coalesce(max(CASE WHEN rk = 2 THEN period END), 0.0) + 1.2345e-9, 6) + 0
       |   AS mc_period_1,
       | round(coalesce(max(CASE WHEN rk = 2 THEN snr END), 0.0) + 1.2345e-9, 6) + 0
       |   AS mc_peak_snr_1
       |FROM gate g LEFT JOIN top ON top.user_id = g.user_id
       |GROUP BY g.user_id, g.n_bands ORDER BY g.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_periodogram" -> qPeriodogram _,
    "q_periodogram_direct" -> qPeriodogramDirect _,
    "q_periodogram_fixed_grid" -> qPeriodogramFixedGrid _,
    "q_transformed_features" -> qTransformedFeatures _,
    "q_curve_fits" -> qCurveFits _,
    "q_mc_periodogram" -> qMcPeriodogram _,
    "q_mc_periodogram_direct" -> qMcPeriodogramDirect _)

  /** Frozen-golden oracle for the three queries whose math has no SQL
    * mirror: the stochastic nl-fit stack (MCMC/Nelder-Mead/LM) and the
    * dense recurrent-trig periodogram grids. The engine is fully
    * deterministic (fixed seeds; per-series sorted-array kernels), so
    * the committed sf0.01 output — generated once, bit-compared across
    * independent runs at DIFFERENT parallelism levels, range-reviewed,
    * checked in under goldens/ — is a sound value oracle: DuckDB reads
    * it back and the driver hash-compares like any other query. The
    * coarse-grid twins (q_periodogram_direct, q_periodogram_fixed_grid,
    * q_mc_periodogram_direct) remain fully relational-oracled, and
    * FitSpec/PeriodogramSpec carry the semantic tolerance checks. */
  /** Goldens are frozen at ALL THREE test scales and dispatched at
    * oracle-run time on the events-table row count (the scales'
    * deterministic sizes: 1000 / 10000 / 100000), so a cross-scale
    * verification sweep — or a driver sf change — compares against the
    * right golden instead of false-redding. A count matching none of
    * the scales selects no branch -> row-count mismatch, the correct
    * loud failure for unknown data. The goldens root is resolved at
    * oracle-BUILD time (when Verify dumps oracle_sql.json) from
    * GRAFT_REPO_ROOT, defaulting to /root/repo — the one filesystem
    * constant the driver contract runs under (goldens/README.md) —
    * so a relocated checkout sets the env var instead of false-redding
    * on a missing path. */
  private def sqlGolden(name: String): String = {
    val root = sys.env.getOrElse("GRAFT_REPO_ROOT", "/root/repo")
    val scales = Seq("sf0.001" -> 1000L, "sf0.01" -> 10000L, "sf0.1" -> 100000L)
    scales.map { case (sf, n) =>
      s"""SELECT g.* FROM read_parquet('$root/goldens/$sf/$name.parquet') g
         |WHERE (SELECT count(*) FROM events) = $n""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    "q_periodogram" -> sqlGolden("q_periodogram"),
    "q_curve_fits" -> sqlGolden("q_curve_fits"),
    "q_mc_periodogram" -> sqlGolden("q_mc_periodogram"),
    "q_periodogram_direct" -> sqlPeriodogramDirect,
    "q_mc_periodogram_direct" -> sqlMcPeriodogramDirect,
    "q_periodogram_fixed_grid" -> sqlPeriodogramFixedGrid,
    "q_transformed_features" -> sqlTransformedFeatures)
}
