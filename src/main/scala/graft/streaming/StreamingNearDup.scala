package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming near-duplicate annotation against a STATIC reference
 * corpus — the incremental-ingest twin of the batch minhash-LSH
 * operator: every arriving document is annotated with whether it is a
 * near-duplicate of something already in the corpus, which corpus
 * document it matched, and the signature-estimated Jaccard.
 *
 * This is the shape a production training-data pipeline actually
 * runs day to day: the full corpus-vs-corpus pair job
 * ([[Dedup.minHashLshPairs]]) runs once to build the clusters, and new
 * data then streams against the STORED signature index (the 1-2%-of-
 * corpus artifact the batch operator documents) instead of re-pairing
 * the world. New-vs-new duplicates inside the stream window are the
 * exact-dedup operator's job ([[StreamingDedup]]); the periodic batch
 * rebuild reconciles both, exactly as the rollup's lambda split does.
 *
 * Scale shape (mirrors the batch guards):
 *  - The index is built over signature-dedup REPRESENTATIVES (one row
 *    per distinct corpus signature, min-id) with per-(band, bucket)
 *    population capped — so a stream row joins a bounded candidate
 *    set even when the corpus holds a million identical documents.
 *  - Only (band, bucket, id, sig) rides the join; text never does.
 *  - The stream side is a stateless projection (shingle -> signature
 *    -> band explode), a stream-static equi-join (re-executed per
 *    micro-batch — persist the index), and one watermark-bounded
 *    aggregation back to per-document rows; no custom state.
 *  - Empty-shingle documents (shorter than the shingle order) carry
 *    no minhash signal: they are annotated `is_near_dup = false`
 *    rather than joined (their all-sentinel signature would otherwise
 *    match every short corpus doc — the batch exclusion, mirrored).
 */
object StreamingNearDup {

  /** Banded representative index of a static corpus: one row per
    * (band, bucket, rep id, sig), signature-deduplicated and capped.
    * Persist (or store) the result — a stream-static join re-reads it
    * every micro-batch. `corpus` needs (id, text). */
  def buildBandIndex(corpus: DataFrame, k: Int = 16, bands: Int = 4,
      seed: Long = 42L, maxBucket: Int = 4096,
      shingleN: Int = 2): DataFrame = {
    val (sig, _) = Dedup.minHashCols(col("shingles"), k, bands, seed)
    val sigT = corpus
      .select(col("id"), Dedup.wordShingles(col("text"), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), sig.as("sig"))
    val reps = sigT.groupBy(col("sig")).agg(min(col("id")).as("id"))
    val exploded = reps.select(col("id"), col("sig"),
      posexplode(Dedup.bandArr(col("sig"), bands)).as(Seq("band", "bucket")))
    // the batch operators' cap helper — ONE definition, no drift
    Dedup.capBandBuckets(exploded, maxBucket)
  }

  /**
   * Annotate a (doc_id, text, ts) stream against `bandIndex` (from
   * [[buildBandIndex]], same k/bands/seed). Output, append-mode, one
   * row per document once the watermark passes its event time:
   * (doc_id, ts, is_near_dup, corpus_id, est_jaccard) — `corpus_id`
   * is the min-id best-estimate representative among candidates with
   * est >= `minEstJaccard`, null when none. Also callable on a batch
   * DataFrame (no watermark) for parity testing.
   */
  def annotate(docs: DataFrame, bandIndex: DataFrame, k: Int = 16,
      bands: Int = 4, seed: Long = 42L, minEstJaccard: Double = 0.5,
      watermark: String = "10 minutes", shingleN: Int = 2): DataFrame = {
    val (sig, _) = Dedup.minHashCols(col("shingles"), k, bands, seed)
    val base0 = docs.select(col("doc_id"), col("ts"),
      Dedup.wordShingles(col("text"), shingleN).as("shingles"))
    val base = (if (docs.isStreaming) base0.withWatermark("ts", watermark)
                else base0)
      // CaseWhen evaluates branches per-row: the signature/band UDFs
      // never see an empty shingle set, and posexplode_outer keeps the
      // null-band row so signal-less docs still get an output row
      .select(col("doc_id"), col("ts"),
        when(size(col("shingles")) > 0, sig).as("qsig"))
      .select(col("doc_id"), col("ts"), col("qsig"),
        posexplode_outer(when(col("qsig").isNotNull,
          Dedup.bandArr(col("qsig"), bands))).as(Seq("band", "bucket")))
    val idx = bandIndex.select(col("band"), col("bucket"),
      col("id").as("corpus_id"), col("sig").as("csig"))
    val scored = base.join(idx, Seq("band", "bucket"), "left")
      .select(col("doc_id"), col("ts"),
        when(col("csig").isNotNull,
          Dedup.sigAgreement(col("qsig"), col("csig"), k)).as("est"),
        col("corpus_id"))
    // per-document reduce: best estimate, min corpus id on ties; the
    // event-time column rides the grouping so append mode finalizes
    // each doc when the watermark passes (one doc = one ts)
    val best = scored.groupBy(col("doc_id"), col("ts"))
      .agg(max(when(col("est") >= minEstJaccard,
        struct(col("est"), (-col("corpus_id")).as("negId")))).as("best"))
    best.select(col("doc_id"), col("ts"),
      col("best").isNotNull.as("is_near_dup"),
      (-col("best.negId")).cast("long").as("corpus_id"),
      col("best.est").as("est_jaccard"))
  }
}
