package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch gap-based sessionization of conversation series — the batch
 * twin of the streaming gap detector
 * ([[graft.streaming.StreamingRollup]]): split each conversation into
 * sessions wherever the inter-turn gap exceeds a threshold, and roll
 * each session up to one summary row.
 *
 * Scale shape: a plain `Window.partitionBy(conv_id)` running sum puts
 * an entire conversation into ONE task — bounded for normal
 * conversations, but an adversarially long (10⁶-turn) agent transcript
 * would buffer whole in a single window task. Instead the engine's
 * sorted-buffer pattern is applied at CHUNK granularity:
 *
 *  1. turns get a deterministic bounded chunk key
 *     `turn_idx div chunkSize`;
 *  2. ONE corpus aggregate collects each (conv, chunk)'s rows into a
 *     sorted buffer — bounded by `chunkSize` rows per group by
 *     construction (partial aggregation combines map-side; this is
 *     the only corpus-sized shuffle in the whole operator);
 *  3. a local in-buffer loop computes each row's cumulative intra-
 *     chunk gap count plus the chunk's boundary scalars (first/last
 *     t, total gaps);
 *  4. chunk-boundary gaps and exclusive chunk-offset prefixes are two
 *     window passes over the per-chunk rows themselves — one row per
 *     chunk (a 10⁶-turn conversation at the default chunk size is 16
 *     rows), so no join and no second corpus pass is needed;
 *  5. the buffers explode back to rows with
 *     `session_idx = chunk_offset + local_cum`.
 *
 * All arithmetic is integer flags + exact comparisons, so the result
 * is identical to the single-window form at any chunkSize
 * (spec-swept), with exactly one corpus shuffle and zero corpus
 * re-computation.
 *
 * Required invariant (the transcript contract — BASELINE.json's
 * "stable (conv_id, turn_idx) ordering"): `turn_idx` is unique and
 * non-negative within a conversation and `t` is non-decreasing in
 * `turn_idx`; session order is turn order.
 */
object Sessionize {

  /** Tag every turn with its 0-based `session_idx` within the
    * conversation: a new session starts when `t - prev_t > gapSeconds`
    * (strict, matching the streaming detector's convention). Output:
    * the input columns plus `session_idx`. */
  def assign(series: DataFrame, gapSeconds: Double,
      chunkSize: Long = 1L << 16): DataFrame = {
    val payload = struct(series.columns.map(col): _*)
    // (2) the one corpus shuffle: bounded sorted buffers per chunk.
    // The buffer sort is an array_sort COMPARATOR on (_t, _ti) only —
    // the engine's deterministic total order (t leads, turn_idx breaks
    // ties; _ti is unique per conversation so the order is total) —
    // never on the payload struct: sort_array over the whole struct
    // would (a) silently change the contract to lexicographic-over-
    // payload and (b) require every input column to be ORDERABLE,
    // rejecting e.g. map-typed payload columns at analysis time
    // (spec-covered with a map column in SessionizeSpec).
    val byTimeIdx = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =>
      when(l.getField("_t") < r.getField("_t"), -1)
        .when(l.getField("_t") > r.getField("_t"), 1)
        .when(l.getField("_ti") < r.getField("_ti"), -1)
        .when(l.getField("_ti") > r.getField("_ti"), 1)
        .otherwise(0)
    val chunks = series
      .withColumn("_chunk", expr(s"turn_idx div ${chunkSize}L"))
      .groupBy(col("conv_id"), col("_chunk"))
      .agg(array_sort(collect_list(
        struct(col("turn_idx").as("_ti"), col("t").as("_t"),
          payload.as("_row"))), byTimeIdx).as("pts"))
    // (3) local loop: per-row cumulative intra-chunk gap count
    val cumU = udf((ts: Seq[Double]) => {
      val out = new Array[Long](ts.length)
      var c = 0L
      var i = 1
      while (i < ts.length) {
        if (ts(i) - ts(i - 1) > gapSeconds) c += 1
        out(i) = c
        i += 1
      }
      out
    })
    val perChunk = chunks
      .withColumn("_cum", cumU(col("pts._t")))
      .withColumn("_first_t", element_at(col("pts._t"), 1))
      .withColumn("_last_t", element_at(col("pts._t"), -1))
      .withColumn("_gaps", element_at(col("_cum"), -1))
    // (4) boundary gaps + exclusive offsets over the per-chunk rows —
    // window partitions hold one row per chunk of one conversation
    val wB = Window.partitionBy(col("conv_id")).orderBy(col("_chunk"))
    val wOff = wB.rowsBetween(Window.unboundedPreceding, -1)
    val offset = perChunk
      .withColumn("_prev_last_t", lag(col("_last_t"), 1).over(wB))
      .withColumn("_bgap",
        when(col("_first_t") - col("_prev_last_t") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("_off",
        coalesce(sum(col("_gaps") + col("_bgap")).over(wOff), lit(0L))
          + col("_bgap"))
    // (5) explode back to rows
    offset
      .select(col("_off"), explode(arrays_zip(col("pts"), col("_cum"))).as("z"))
      .select(col("z.pts._row.*"), (col("_off") + col("z._cum")).as("session_idx"))
  }

  /** One row per (conv, session): span, size and text-mass summary. */
  def sessions(series: DataFrame, gapSeconds: Double,
      chunkSize: Long = 1L << 16): DataFrame =
    assign(series, gapSeconds, chunkSize)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("t")).as("t_start"),
        max(col("t")).as("t_end"),
        (max(col("t")) - min(col("t"))).as("duration"),
        sum(col("m")).as("sum_m"))
}
