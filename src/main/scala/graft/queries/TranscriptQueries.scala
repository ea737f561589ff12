package graft.queries

import graft.engine.{Gorilla, Rollup, Transcripts}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver-facing queries exercising the transcript rollup engine
 * end-to-end on a DuckDB-verifiable input: the `events` test table
 * viewed as transcripts ([[Transcripts.fromEvents]]: conv_id = user,
 * role = event_type, text = props, m = length(text), w = 1), so every
 * tier point the engine computes has an ANSI-SQL oracle.
 *
 * The engine path under test is the REAL one — Transcripts.series ->
 * Rollup.tierFromTurns -> Rollup.tierFromTier cascade -> gapFillLocf /
 * Gorilla — not a SQL re-expression.
 */
object TranscriptQueries {

  private val R = 6
  private val JitterSql = "1.2345e-9"
  private def r(c: Column): Column = round(c + JitterSql.toDouble, R)
  /** NaN (engine fill for short/flat buckets) -> NULL, matching SQL
    * aggregates' natural NULLs on the same guard conditions. */
  private def rn(c: Column): Column = when(isnan(c), lit(null)).otherwise(r(c))

  private val TB = Transcripts.EpochSeconds // 2024-01-01T00:00:00Z

  /** The DuckDB mirror of Transcripts.fromEvents + Transcripts.series. */
  private val SERIES =
    s"SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id, " +
      s"epoch(ts) - $TB AS t, CAST(length(props) AS DOUBLE) AS m, 1.0 AS w FROM events"

  private def series(s: SparkSession, dir: String): DataFrame =
    Transcripts.series(Transcripts.fromEvents(s, dir))

  /** Feature batteries for the tier queries, trimmed to what each
    * query SELECTS (guide §1.2 "don't compute things you throw away"):
    * [[Rollup.tierFromTurns]]/[[Rollup.tierFromTier]] evaluate their
    * whole feature list per bucket inside the aggregate finish, but
    * the carry-only queries (q_tr_tier_*, gapfill, gorilla) project
    * none of the feature columns and q_tr_features_1h projects five.
    * Each [[graft.ref.Feature]] evaluates independently over the same
    * sorted bucket arrays (evalOrFill is per-feature), so the
    * projected columns are bit-identical to the full-battery run —
    * asserted in RollupParitySpec. The ENGINE default
    * ([[Rollup.defaultFeatures]], the bench rollup's battery) is
    * untouched. */
  private val NoFeatures: Seq[graft.ref.Feature] = Seq.empty
  private val Features1h: Seq[graft.ref.Feature] = {
    import graft.ref.Features._
    Seq(Mean, Amplitude, StandardDeviation, WeightedMean, Median)
  }

  // ---------------------------------------------------------------

  /** Finest tier: every bucket's carries (exactness check on the
    * engine's deterministic in-bucket summation). */
  private def qTier1m(s: SparkSession, dir: String): DataFrame =
    Rollup.tierFromTurns(series(s, dir), 60L, NoFeatures)
      .select(col("conv_id"), col("bucket"), r(col("bucket_t")).as("bucket_t"),
        col("n"), r(col("sum_w")).as("sum_w"), r(col("sum_mw")).as("sum_mw"),
        r(col("bin_m")).as("bin_m"), r(col("bin_w")).as("bin_w"))
      .orderBy(col("conv_id"), col("bucket"))

  private val sqlTier1m =
    s"""WITH p AS ($SERIES)
       |SELECT conv_id, CAST(floor(t / 60) AS BIGINT) AS bucket,
       | round((floor(t / 60) + 0.5) * 60 + $JitterSql, $R) + 0 AS bucket_t,
       | count(*) AS n,
       | round(sum(w) + $JitterSql, $R) + 0 AS sum_w,
       | round(sum(m*w) + $JitterSql, $R) + 0 AS sum_mw,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS bin_m,
       | round(sum(w)/count(*) + $JitterSql, $R) + 0 AS bin_w
       |FROM p GROUP BY conv_id, floor(t / 60) ORDER BY conv_id, bucket""".stripMargin

  /** 1h tier built THROUGH the cascade (1m -> 1h); the oracle groups
    * raw turns directly — equality proves the carried sums compose. */
  private def qTier1h(s: SparkSession, dir: String): DataFrame = {
    val t1m = Rollup.tierFromTurns(series(s, dir), 60L, NoFeatures)
    Rollup.tierFromTier(t1m, 3600L, NoFeatures)
      .select(col("conv_id"), col("bucket"), col("n"),
        r(col("bin_m")).as("bin_m"), r(col("bin_w")).as("bin_w"))
      .orderBy(col("conv_id"), col("bucket"))
  }

  private val sqlTier1h =
    s"""WITH p AS ($SERIES)
       |SELECT conv_id, CAST(floor(t / 3600) AS BIGINT) AS bucket, count(*) AS n,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS bin_m,
       | round(sum(w)/count(*) + $JitterSql, $R) + 0 AS bin_w
       |FROM p GROUP BY conv_id, floor(t / 3600) ORDER BY conv_id, bucket""".stripMargin

  /** 1d tier through the full 1m -> 1h -> 1d cascade. */
  private def qTier1d(s: SparkSession, dir: String): DataFrame = {
    val t1m = Rollup.tierFromTurns(series(s, dir), 60L, NoFeatures)
    val t1h = Rollup.tierFromTier(t1m, 3600L, NoFeatures)
    Rollup.tierFromTier(t1h, 86400L, NoFeatures)
      .select(col("conv_id"), col("bucket"), col("n"),
        r(col("bin_m")).as("bin_m"), r(col("bin_w")).as("bin_w"))
      .orderBy(col("conv_id"), col("bucket"))
  }

  private val sqlTier1d =
    s"""WITH p AS ($SERIES)
       |SELECT conv_id, CAST(floor(t / 86400) AS BIGINT) AS bucket, count(*) AS n,
       | round(sum(m*w)/sum(w) + $JitterSql, $R) + 0 AS bin_m,
       | round(sum(w)/count(*) + $JitterSql, $R) + 0 AS bin_w
       |FROM p GROUP BY conv_id, floor(t / 86400) ORDER BY conv_id, bucket""".stripMargin

  /** Per-bucket feature kernels at the 1h tier (computed by the
    * engine's per-bucket pass over raw turns in the bucket). */
  private def qTierFeatures1h(s: SparkSession, dir: String): DataFrame =
    Rollup.tierFromTurns(series(s, dir), 3600L, Features1h)
      .filter(col("n") >= 2)
      .select(col("conv_id"), col("bucket"), col("n"),
        rn(col("mean")).as("mean"),
        rn(col("amplitude")).as("amplitude"),
        rn(col("standard_deviation")).as("standard_deviation"),
        rn(col("weighted_mean")).as("weighted_mean"),
        rn(col("median")).as("median"))
      .orderBy(col("conv_id"), col("bucket"))

  private val sqlTierFeatures1h = {
    val h = s"(n * 0.5 - 0.5)"
    val i = s"CAST(floor($h) AS BIGINT)"
    val med = s"CASE WHEN $i >= n - 1 THEN arr[n] " +
      s"ELSE arr[$i + 1] + ($h - floor($h)) * (arr[$i + 2] - arr[$i + 1]) END"
    s"""WITH p AS ($SERIES),
       | g AS (SELECT conv_id, CAST(floor(t / 3600) AS BIGINT) AS bucket,
       |        count(*) AS n, avg(m) AS mean, (max(m) - min(m))/2 AS amplitude,
       |        stddev_samp(m) AS standard_deviation,
       |        sum(m*w)/sum(w) AS weighted_mean,
       |        list_sort(list(m)) AS arr
       |       FROM p GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT conv_id, bucket, n,
       | round(mean + $JitterSql, $R) + 0 AS mean,
       | round(amplitude + $JitterSql, $R) + 0 AS amplitude,
       | round(standard_deviation + $JitterSql, $R) + 0 AS standard_deviation,
       | round(weighted_mean + $JitterSql, $R) + 0 AS weighted_mean,
       | round($med + $JitterSql, $R) + 0 AS median
       |FROM g ORDER BY conv_id, bucket""".stripMargin
  }

  /** Gap-filled 1h tier with LOCF — the engine's sequence+explode+
    * last(ignoreNulls) path vs DuckDB generate_series + window. */
  private def qGapfill1h(s: SparkSession, dir: String): DataFrame = {
    val t1h = Rollup.tierFromTier(
      Rollup.tierFromTurns(series(s, dir), 60L, NoFeatures), 3600L, NoFeatures)
    Rollup.gapFillLocf(t1h, 3600L)
      .select(col("conv_id"), col("bucket"), col("is_gap"),
        r(col("bin_m_locf")).as("bin_m_locf"))
      .orderBy(col("conv_id"), col("bucket"))
  }

  private val sqlGapfill1h =
    s"""WITH p AS ($SERIES),
       | h AS (SELECT conv_id, CAST(floor(t / 3600) AS BIGINT) AS bucket,
       |        sum(m*w)/sum(w) AS bin_m FROM p GROUP BY 1, 2),
       | spans AS (SELECT conv_id, unnest(generate_series(min(bucket), max(bucket))) AS bucket
       |           FROM h GROUP BY conv_id),
       | j AS (SELECT spans.conv_id, spans.bucket, h.bin_m
       |       FROM spans LEFT JOIN h ON spans.conv_id = h.conv_id AND spans.bucket = h.bucket)
       |SELECT conv_id, bucket,
       | CASE WHEN bin_m IS NULL THEN 1 ELSE 0 END AS is_gap,
       | round(last_value(bin_m IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + $JitterSql, $R) + 0 AS bin_m_locf
       |FROM j ORDER BY conv_id, bucket""".stripMargin

  /** Gorilla compression over each conversation's 1m series: the
    * oracle checks the exactly-decodable invariant (n_points) and the
    * compression wins are reported as plain columns. Decode equality
    * itself is asserted in-engine (all_points_roundtrip must be true
    * for every row; also covered bit-level in sbt test). */
  private def qGorilla(s: SparkSession, dir: String): DataFrame = {
    val t1m = Rollup.tierFromTurns(series(s, dir), 60L, NoFeatures)
    val pts = col("pts")
    t1m.groupBy(col("conv_id"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("bin_m")))).as("pts"))
      .select(col("conv_id"),
        pts.getField("bucket").as("ts"), pts.getField("bin_m").as("vs"),
        Gorilla.encodeCol(pts.getField("bucket"), pts.getField("bin_m")).as("block"))
      .withColumn("dec", Gorilla.decodeCol(col("block")))
      .select(col("conv_id"),
        size(col("ts")).cast("long").as("n_points"),
        // Spark SQL equality treats NaN = NaN as true, so array
        // equality is the right roundtrip check even with NaN fills
        (col("dec.ts") === col("ts") && col("dec.vs") === col("vs")).as("roundtrip_ok"),
        // compression invariant the oracle can assert: the block is
        // strictly smaller than the raw 16 B/point encoding (+header)
        (length(col("block")).cast("long") <
          lit(16L) * size(col("ts")) + lit(32L)).as("compressed_smaller"))
      .orderBy(col("conv_id"))
  }

  /** Oracle for the gorilla roundtrip query: n_points is recomputed
    * relationally; roundtrip_ok / compressed_smaller are the encoder's
    * contract, asserted as literal TRUE — a decode mismatch or an
    * incompressible block on the Spark side fails the value hash. */
  private val sqlGorilla =
    s"""WITH p AS ($SERIES),
       | b AS (SELECT conv_id, floor(t / 60) AS bucket FROM p GROUP BY 1, 2)
       |SELECT conv_id, count(*) AS n_points, TRUE AS roundtrip_ok,
       | TRUE AS compressed_smaller
       |FROM b GROUP BY conv_id ORDER BY conv_id""".stripMargin

  /** Gap-based sessionization ([[graft.engine.Sessionize]]) — one
    * summary row per (conv, session) split at >1-day silences. */
  private def qSessions(s: SparkSession, dir: String): DataFrame = {
    val withIdx = Transcripts.series(Transcripts.fromEvents(s, dir))
    // chunkSize well below the per-conversation turn count, so the
    // battery actually exercises the hierarchical chunk merge
    graft.engine.Sessionize.sessions(withIdx, gapSeconds = 86400.0,
        chunkSize = 64L)
      .select(col("conv_id"), col("session_idx"), col("n_turns"),
        r(col("t_start")).as("t_start"), r(col("t_end")).as("t_end"),
        r(col("duration")).as("duration"), r(col("sum_m")).as("sum_m"))
      .orderBy(col("conv_id"), col("session_idx"))
  }

  private val sqlSessions =
    s"""WITH p AS (SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       |            epoch(ts) - $TB AS t,
       |            CAST(length(props) AS DOUBLE) AS m,
       |            row_number() OVER (PARTITION BY user_id
       |              ORDER BY ts, event_id) - 1 AS turn_idx
       |           FROM events),
       | a AS (SELECT *, CASE WHEN t - lag(t) OVER w > 86400.0
       |          THEN 1 ELSE 0 END AS gap
       |       FROM p WINDOW w AS (PARTITION BY conv_id ORDER BY t, turn_idx)),
       | sidx AS (SELECT *, sum(gap) OVER (PARTITION BY conv_id
       |            ORDER BY t, turn_idx ROWS UNBOUNDED PRECEDING) AS session_idx
       |          FROM a)
       |SELECT conv_id, CAST(session_idx AS BIGINT) AS session_idx,
       | count(*) AS n_turns,
       | round(min(t) + $JitterSql, $R) + 0 AS t_start,
       | round(max(t) + $JitterSql, $R) + 0 AS t_end,
       | round(max(t) - min(t) + $JitterSql, $R) + 0 AS duration,
       | round(sum(m) + $JitterSql, $R) + 0 AS sum_m
       |FROM sidx GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tr_sessions" -> qSessions _,
    "q_tr_tier_1m" -> qTier1m _,
    "q_tr_tier_1h" -> qTier1h _,
    "q_tr_tier_1d" -> qTier1d _,
    "q_tr_features_1h" -> qTierFeatures1h _,
    "q_tr_gapfill_1h" -> qGapfill1h _,
    "q_tr_gorilla" -> qGorilla _)

  val oracles: Map[String, String] = Map(
    "q_tr_sessions" -> sqlSessions,
    "q_tr_tier_1m" -> sqlTier1m,
    "q_tr_tier_1h" -> sqlTier1h,
    "q_tr_tier_1d" -> sqlTier1d,
    "q_tr_features_1h" -> sqlTierFeatures1h,
    "q_tr_gapfill_1h" -> sqlGapfill1h,
    "q_tr_gorilla" -> sqlGorilla)
}
