package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training-example assembly: lay documents out in
 * a deterministic stream order per group and cut the stream every
 * `budget` tokens — each document's bin is the fixed-size training
 * example its start offset falls into (the standard concat-and-split
 * packing of LLM data pipelines).
 *
 * The scalable part is the prefix sum. A single
 * `Window.partitionBy(group).orderBy(id)` running total puts an entire
 * group — at corpus scale, an entire language — into ONE task, the
 * same unbounded-window anti-pattern the dedup operators avoid. So the
 * offset is computed hierarchically, the classic distributed prefix
 * sum:
 *
 *  1. rows get a deterministic bounded chunk key `id / chunkSize`
 *     (NOT `spark_partition_id()`, which is plan-dependent);
 *  2. a window cumsum runs inside each (group, chunk) — bounded by
 *     `chunkSize` rows per task by construction;
 *  3. chunk totals (one row per chunk, ~corpus/chunkSize rows) get
 *     their own prefix offsets with a window over this TINY table;
 *  4. the chunk offset broadcasts back and the global offset is
 *     `chunk_offset + local_cumsum`.
 *
 * All arithmetic is integer (token counts), so results are exact and
 * engine-independent: a plain global window in an oracle produces
 * identical offsets.
 */
object Packing {

  /** Assign each doc its stream offset and packed-example bin.
    *
    * @param docs       input with `idCol` (unique NON-NEGATIVE long,
    *                   stream order), `groupCol` (pack stream key) and
    *                   `tokensCol`
    * @param budget     tokens per packed training example
    * @param chunkSize  rows per bounded prefix-sum chunk
    *
    * The chunk key uses integer division (`div`), not double division
    * + truncation: doubles lose integer precision past 2^53, which
    * would mis-chunk huge ids and break the monotone id→chunk
    * assumption the hierarchical prefix sum rests on. Ids must be
    * non-negative (truncation-toward-zero would merge the -0 and 0
    * chunks out of order).
    */
  def pack(docs: DataFrame, idCol: Column, groupCol: Column,
      tokensCol: Column, budget: Long, chunkSize: Long = 1 << 20): DataFrame = {
    val base = docs.select(idCol.cast("long").as("_id"), groupCol.as("_grp"),
      tokensCol.cast("long").as("_tok"))
      .withColumn("_chunk", expr(s"_id div ${chunkSize}L"))
    val wLocal = Window.partitionBy(col("_grp"), col("_chunk"))
      .orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("_cum", sum(col("_tok")).over(wLocal))
    val wChunks = Window.partitionBy(col("_grp")).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // chunk totals aggregate over BASE, not `local` (r06): the totals
    // only need sum(_tok) per chunk, and deriving them from `local`
    // re-ran the bounded cumsum window (a full shuffle + sort pass
    // over the corpus) purely to throw its output away — guide §1.2.
    // Identical result: the per-chunk token sum is the same either way.
    val offsets = base.groupBy(col("_grp"), col("_chunk"))
      .agg(sum(col("_tok")).as("_chunk_tok"))
      .withColumn("_chunk_off",
        coalesce(sum(col("_chunk_tok")).over(wChunks), lit(0L)))
      .select(col("_grp"), col("_chunk"), col("_chunk_off"))
    local.join(broadcast(offsets), Seq("_grp", "_chunk"))
      .select(col("_id").as("id"), col("_grp").as("group"),
        col("_tok").as("n_tokens"),
        (col("_chunk_off") + col("_cum") - col("_tok")).as("start_offset"))
      .withColumn("bin", expr(s"start_offset div ${budget}L"))
  }
}
