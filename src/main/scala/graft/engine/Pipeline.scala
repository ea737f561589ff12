package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The complete north-star flow as one idempotent, resumable job:
 *
 *   transcripts parquet
 *     -> 1m tier   (resumable, conv-hash partitions, lineage manifests)
 *     -> 1h tier   (resumable, input-fingerprinted on the 1m snapshot)
 *     -> 1d tier   (resumable, fingerprinted on the 1h snapshot)
 *     -> gap-filled 1h view (sequence + LOCF)
 *     -> gorilla chunks (one compressed block per (conv, day) of 1m)
 *
 * Every stage commits an atomic snapshot; a rerun against unchanged
 * input is a no-op, a rerun after a mid-job death resumes from the
 * last committed partition set, and changing the input fingerprint
 * rebuilds exactly the stages downstream of the change.
 */
object Pipeline {

  final case class StageReport(stage: String, processedParts: Set[Int], rows: Long)

  def run(spark: SparkSession, inPath: String, outRoot: String,
      nParts: Int = 16, maxPartsPerRun: Int = Int.MaxValue): Seq[StageReport] = {
    val store = new Snapshots.Store(outRoot)
    val reports = Seq.newBuilder[StageReport]

    // input fingerprint: path + row count (cheap, catches regeneration)
    val turns = spark.read.parquet(inPath)
    val fpIn = s"$inPath#${turns.count()}"

    // Each downstream stage is GATED on a complete upstream snapshot:
    // its input fingerprint embeds the upstream snapshot id, which only
    // freezes once the upstream stops committing. A throttled run that
    // leaves a stage partial returns early; reruns converge stage by
    // stage, never rebuilding committed work.
    def complete(tier: String): Boolean =
      store.lastSnapshot(tier).exists(_.parts.map(_.part).toSet == (0 until nParts).toSet)

    // ---- 1m from raw turns ----
    val series = Transcripts.series(turns)
    val done1m = Snapshots.buildResumable(spark, series, "1m",
      s => Rollup.tierFromTurns(s, 60L), store, fpIn, nParts, maxPartsPerRun)
    val snap1m = store.lastSnapshot("1m").get
    reports += StageReport("tier_1m", done1m, snap1m.parts.map(_.rows).sum)
    if (!complete("1m")) return reports.result()

    // ---- 1h from committed 1m ----
    val t1m = spark.read.parquet(store.tierDir("1m")).drop("part")
    val fp1m = s"1m-snap-${snap1m.id}-${snap1m.inputFingerprint}"
    val done1h = Snapshots.buildResumable(spark, t1m, "1h",
      d => Rollup.tierFromTier(d, 3600L), store, fp1m, nParts, maxPartsPerRun)
    val snap1h = store.lastSnapshot("1h").get
    reports += StageReport("tier_1h", done1h, snap1h.parts.map(_.rows).sum)
    if (!complete("1h")) return reports.result()

    // ---- 1d from committed 1h ----
    val t1h = spark.read.parquet(store.tierDir("1h")).drop("part")
    val fp1h = s"1h-snap-${snap1h.id}-${snap1h.inputFingerprint}"
    val done1d = Snapshots.buildResumable(spark, t1h, "1d",
      d => Rollup.tierFromTier(d, 86400L), store, fp1h, nParts, maxPartsPerRun)
    reports += StageReport("tier_1d", done1d,
      store.lastSnapshot("1d").get.parts.map(_.rows).sum)

    // ---- gap-filled 1h (derived view; fingerprinted on 1h) ----
    val doneGf = Snapshots.buildResumable(spark, t1h, "1h_gapfill",
      d => Rollup.gapFillLocf(d, 3600L), store, fp1h, nParts, maxPartsPerRun)
    reports += StageReport("gapfill_1h", doneGf,
      store.lastSnapshot("1h_gapfill").get.parts.map(_.rows).sum)

    // ---- gorilla chunks: one block per (conv, utc day) of 1m points ----
    // The stage fingerprint embeds a SCHEMA VERSION alongside the input
    // snapshot: a resume only reuses committed parts when both the 1m
    // input AND the gorilla output shape are unchanged. Without it, an
    // output-schema change (e.g. v2's added block_days column) would
    // resume a partially-committed older-binary snapshot into a
    // mixed-schema parquet directory. Bump on any gorillaChunks output
    // change.
    val gorillaSchemaV = "gorilla-v2-blockdays"
    val doneGz = Snapshots.buildResumable(spark, t1m, "1m_gorilla",
      d => gorillaChunks(d), store, s"$fp1m-$gorillaSchemaV", nParts, maxPartsPerRun)
    reports += StageReport("gorilla_1m", doneGz,
      store.lastSnapshot("1m_gorilla").get.parts.map(_.rows).sum)

    reports.result()
  }

  /** Pack each (conv, block) run of 1m bucket points into one Gorilla
    * block (bucket indices as the timestamp stream, bin_m values).
    *
    * Block-coalescing policy: granularity is chosen PER CONVERSATION
    * from its point density — conversations averaging fewer than
    * `coalesceBelowPtsPerDay` points per active-span day coalesce to
    * conv×week blocks (amortizing the fixed ~25-byte block header);
    * dense conversations keep day blocks. Deterministic (a pure
    * function of the conversation's point set; the per-conv density
    * table is a tiny partial aggregate joined back, AQE broadcasts
    * it), so rebuild/resume reproduce identical blocks.
    *
    * MEASURED OFF BY DEFAULT (GorillaProbe, bench 1m tier, 10.7M
    * points — table in BASELINE.md): day-only 7.562 B/pt; policy at
    * 4/8/16/32/64 pts/day 7.561/7.560/7.558/7.558/7.559; week-only
    * 7.630. Transcript blocks are conversation-span-bounded (most
    * conversations fit inside one day, so day blocks ≈ conv blocks
    * already), and every cross-day merge pays TWO 64-bit
    * delta-of-delta escape codes at the silence gap (~17 bytes),
    * cancelling the ~25-byte header it saves. The policy stays
    * available for workloads with genuinely multi-day sparse series
    * (where the gap is one of many small deltas); this pipeline ships
    * with it disabled. Output key: (conv_id, day, block_days) with
    * `day` the block's first day index and block_days 1 or 7.
    *
    * Bucket indices must be NON-NEGATIVE (true by construction here:
    * tier buckets derive from timestamps at/after the 2024-01-01
    * epoch origin) — `div` truncates toward zero, so a pre-origin
    * bucket would merge days -1 and 0 into one block (the same
    * constraint [[graft.operators.Packing.pack]] documents for ids).
    */
  def gorillaChunks(t1m: DataFrame,
      coalesceBelowPtsPerDay: Double = 0.0): DataFrame = {
    val pts = col("pts")
    val dayOf = expr("bucket div 1440")
    val blocked =
      if (coalesceBelowPtsPerDay <= 0) t1m.withColumn("block_days", lit(1L))
      else {
        val density = t1m.groupBy(col("conv_id")).agg(
          (count(lit(1)) /
            (max(dayOf) - min(dayOf) + lit(1))).as("_pts_per_day"))
        t1m.join(density, Seq("conv_id"))
          .withColumn("block_days",
            when(col("_pts_per_day") < coalesceBelowPtsPerDay, lit(7L))
              .otherwise(lit(1L)))
      }
    blocked
      .groupBy(col("conv_id"), col("block_days"),
        (expr("bucket div (block_days * 1440)") * col("block_days")).as("day"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("bin_m")))).as("pts"))
      .select(col("conv_id"), col("day"), col("block_days"),
        size(pts).cast("long").as("n_points"),
        Gorilla.encodeCol(pts.getField("bucket"), pts.getField("bin_m")).as("block"))
      .withColumn("block_bytes", length(col("block")).cast("long"))
  }

  /** spark-submit / sbt entry: `runMain graft.engine.Pipeline <in> <out> [nParts]`. */
  def main(args: Array[String]): Unit = {
    val inPath = args(0)
    val outRoot = args(1)
    val nParts = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reports = run(spark, inPath, outRoot, nParts)
    reports.foreach(r =>
      println(s"""{"stage":"${r.stage}","processed_parts":${r.processedParts.size},"rows":${r.rows}}"""))
    spark.stop()
  }
}
