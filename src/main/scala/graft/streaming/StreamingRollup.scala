package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental tier refresh via Structured Streaming. The reference
 * crate is batch-only (SURVEY.md §2.5 — no streaming counterpart);
 * this is the engine-side continuous-aggregate path: the same
 * associative carries the batch cascade uses (n, sum_w, sum_mw —
 * bins.rs:184-194 semantics) maintained incrementally per
 * (conv_id, 1-minute event-time window) with a watermark bounding
 * state. Because the carries are associative and commutative, a
 * closed streaming bucket equals the batch bucket exactly; feature
 * kernels are then computed from the carried sums downstream (or by
 * the batch path over closed buckets — the lambda-architecture
 * split).
 */
object StreamingRollup {

  /** 1-minute continuous aggregate over a (streaming or batch)
    * transcript DataFrame with the north-rule schema. */
  def tier1m(turns: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val withSeries = turns
      .withColumn("m", length(col("text")).cast("double"))
      .withColumn("w", lit(1.0))
    val streaming = withSeries.isStreaming
    val base = if (streaming) withSeries.withWatermark("ts", watermark) else withSeries
    base
      .groupBy(col("conv_id"), window(col("ts"), "1 minute").as("win"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("w")).as("sum_w"),
        sum(col("m") * col("w")).as("sum_mw"))
      .select(
        col("conv_id"),
        (unix_micros(col("win.start")) / 60000000L).cast("long").as("bucket"),
        col("n"), col("sum_w"), col("sum_mw"),
        (col("sum_mw") / col("sum_w")).as("bin_m"),
        (col("sum_w") / col("n")).as("bin_w"))
  }
}
