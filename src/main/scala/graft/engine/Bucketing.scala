package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * Conv-hash bucketed tier storage — the co-location layer of the north
 * rule ("conv_id-hash bucketed Iceberg writes"): tiers written with
 * the same bucket count on `conv_id` expose a matching
 * `HashPartitioning` from their scans, so joins and aggregations on
 * the conversation key run with ZERO exchanges — the tier-vs-tier
 * reconciliation joins, per-conversation feature fan-ins and
 * incremental rebuild diffs never reshuffle the fact tables.
 *
 * Spark's table-catalog bucketing (`bucketBy` + `saveAsTable`) is the
 * sandbox-available analogue of Iceberg's `bucket(N, conv_id)`
 * partition transform; the write path, bucket count contract and the
 * shuffle-free join property carry over unchanged (asserted in
 * PlanSpec). Buckets are also sorted by (conv_id, bucket) so
 * merge-joins read pre-sorted runs.
 */
object Bucketing {

  /** Number of conv-hash buckets every tier table uses — both sides of
    * a co-located join must agree on it. */
  val DefaultBuckets = 32

  def writeBucketed(tier: DataFrame, table: String,
      buckets: Int = DefaultBuckets): Unit =
    tier.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "conv_id")
      .sortBy("conv_id", "bucket")
      .saveAsTable(table)
}
