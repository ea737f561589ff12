package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines:
 * exact (content-hash groupBy), MinHash + LSH banding (shingle ->
 * minhash signature -> band buckets -> within-bucket candidate join),
 * SimHash (64-bit, hamming-banded), and exact n-gram Jaccard.
 *
 * Scale design: every candidate-pair join is blocked — either by an
 * LSH band hash (minhash/simhash) or an explicit blocking key — so
 * the quadratic blowup is bounded per bucket, never global. All hash
 * functions are deterministic (fixed seeds), so reruns and resumes
 * produce identical candidate sets.
 */
object Dedup {

  // ---------------- shingling ----------------

  /** Word n-gram shingles (distinct) from a text column, built from
    * Catalyst primitives. Texts shorter than n tokens yield an empty
    * set.
    *
    * Shape matters: the obvious `transform(sequence(..), i =>
    * concat(element_at(toks, i), ..))` re-evaluates the `split` INSIDE
    * the lambda once per element per element_at (higher-order
    * functions are interpreted with no common-subexpression
    * elimination) — O(len²) string splitting per document. Zipping
    * shifted `slice`s evaluates the split O(n) times per row total. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), " ")
    val nShingles = size(toks) - (n - 1)
    def shifted(k: Int): Column = slice(toks, lit(k + 1), nShingles)
    val joined = (1 until n).foldLeft(shifted(0)) { (acc, k) =>
      zip_with(acc, shifted(k), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= n, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // ---------------- 64-bit mixing (splitmix64 finalizer) ----------------

  /** Deterministic 64-bit avalanche mix (public splitmix64 constant
    * schedule); basis for all signature hashes below. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def hashString(s: String): Long = {
    // FNV-1a 64 over UTF-8, then mixed — stable across JVMs
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  // ---------------- MinHash ----------------

  /** K-permutation minhash signature of a shingle set: permutation i
    * is `mix64(shingleHash ^ seed_i)`; the signature element is the
    * minimum over shingles (unsigned order). */
  def minHashSignature(shingles: Seq[String], k: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val base = shingles.map(hashString)
    var i = 0
    while (i < k) {
      val si = mix64(seed + i * 0x9e3779b97f4a7c15L)
      var best = Long.MaxValue
      base.foreach { h =>
        val v = mix64(h ^ si)
        // unsigned comparison for uniformity
        if (java.lang.Long.compareUnsigned(v, best) < 0) best = v
      }
      sig(i) = best
      i += 1
    }
    sig
  }

  /** Band hashes for LSH: signature split into `bands` equal bands,
    * each band hashed to one bucket key. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      h
    }
  }

  /** doc -> (minhash signature, band hashes) columns. */
  def minHashCols(shingles: Column, k: Int = 16, bands: Int = 4,
      seed: Long = 42L): (Column, Column) = {
    val sigU = udf((s: Seq[String]) => minHashSignature(s, k, seed))
    val bandU = udf((sig: Seq[Long]) => bandHashes(sig.toArray, bands))
    val sig = sigU(shingles)
    (sig, bandU(sig))
  }

  /**
   * MinHash-LSH candidate pairs. `df` must have a unique `id` column
   * and a `shingles` array column. Output: (id_a, id_b, est_jaccard
   * from signature agreement, jaccard exact).
   *
   * Scale shape (the 100 TB contract):
   *  1. SIGNATURE-DEDUP FIRST — documents with an identical full
   *     minhash signature (exact duplicates and byte-near clones)
   *     collapse to one min-id representative BEFORE banding, and the
   *     group is emitted as STAR pairs (rep, member): a corpus with a
   *     million identical documents — the normal case a dedup pipeline
   *     meets — yields n-1 linear pairs and ONE bucket row, instead of
   *     a B² clique inside every band bucket. Near-matches of other
   *     docs are reported against the representative (cluster-rep
   *     pairing; consumers resolve members transitively).
   *  2. Band self-join carries only (id, signature) — k longs per row.
   *     Shingle sets NEVER ride the bucket join.
   *  3. Buckets larger than `maxBucket` distinct signatures are
   *     dropped from pairing (deterministically, with the count
   *     observable via [[minHashBucketOverflow]]) — an adversarial
   *     hot bucket cannot take down the job.
   *  4. Exact Jaccard is confirmed by re-joining the (narrow) matched
   *     pairs back to the shingle table — two id-keyed shuffles of a
   *     few matched rows instead of shipping every shingle set through
   *     every bucket.
   */
  def minHashLshPairs(df: DataFrame, k: Int = 16, bands: Int = 4,
      seed: Long = 42L, maxBucket: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (sig, _) = minHashCols(col("shingles"), k, bands, seed)
    val withSig = df.select(col("id"), col("shingles")).withColumn("sig", sig)
    // 1. signature-duplicate groups -> min-id rep + linear star pairs
    val wSig = Window.partitionBy(col("sig"))
    val tagged = withSig.withColumn("rep", min(col("id")).over(wSig))
    val dupPairs = tagged.filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"),
        lit(1.0).as("est_jaccard")) // identical signatures agree on all k
    val reps = tagged.filter(col("id") === col("rep"))
      .select(col("id"), col("sig"))
      .withColumn("bands", bandArr2(bands)(col("sig")))
    // 2. band the representatives; 3. cap bucket size
    val exploded = reps.select(col("id"), col("sig"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val wB = Window.partitionBy(col("band"), col("bucket"))
    val capped = exploded.withColumn("bsz", count(lit(1)).over(wB))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    val lshPairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) =>
            when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, x) => acc + x) / k).as("est_jaccard"))
      // multi-band collisions of the same pair: partial-agg dedupe on
      // the narrow projection (no wide dropDuplicates shuffle)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
    // 4. exact-Jaccard confirm on the matched pairs only
    val sh = df.select(col("id"), col("shingles"))
    dupPairs.unionByName(lshPairs)
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** Band-hash UDF over a signature column (shared by the rep path). */
  private def bandArr2(bands: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sig: Seq[Long]) => bandHashes(sig.toArray, bands))

  /** Observability for cap (3) above: (band, bucket, size) of every
    * bucket whose DISTINCT-signature population exceeds `maxBucket` —
    * what `minHashLshPairs` dropped, never silently. */
  def minHashBucketOverflow(df: DataFrame, k: Int = 16, bands: Int = 4,
      seed: Long = 42L, maxBucket: Int = 4096): DataFrame = {
    val (sig, _) = minHashCols(col("shingles"), k, bands, seed)
    df.select(col("id"), col("shingles")).withColumn("sig", sig)
      .groupBy(col("sig")).agg(min(col("id")).as("id"))
      .withColumn("bands", bandArr2(bands)(col("sig")))
      .select(posexplode(col("bands")).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("size"))
      .filter(col("size") > maxBucket)
  }

  // ---------------- duplicate clustering ----------------

  /**
   * Connected components over candidate duplicate pairs — the actual
   * dedup deliverable (each document labeled with its cluster's min
   * id, so `id != cluster_id` IS the "drop this duplicate" predicate).
   *
   * Iterative min-label propagation: each round every node takes the
   * minimum label among itself and its neighbors; converges in
   * O(component diameter) rounds (near-dup graphs are shallow — exact
   * clones are stars around the min id by construction upstream).
   * Pure DataFrame joins — the per-round work is two shuffles on the
   * edge key, nothing is collected but a one-long convergence count;
   * this is the standard scalable CC shape (label propagation), with
   * an iteration cap as the adversarial-graph backstop.
   */
  def duplicateClusters(ids: DataFrame, pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    // cache the (narrow, pairs-sized) edge list: every propagation
    // round re-executes its lineage otherwise — with an LSH pair
    // pipeline upstream that would recompute signatures per round
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = ids.select(col("id"), col("id").as("label"))
    var cached: Option[DataFrame] = None
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min(col("label")).as("nlabel"))
      val updated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (col("nlabel").isNotNull && col("nlabel") < col("label")).as("changed"))
        .cache()
      converged = updated.filter(col("changed")).limit(1).count() == 0L
      cached.foreach(_.unpersist(blocking = false))
      cached = Some(updated)
      labels = updated.select(col("id"), col("label"))
      it += 1
    }
    edges.unpersist(blocking = false)
    val out = labels.withColumnRenamed("label", "cluster_id")
    // materialization note: each round's cache truncates recomputation;
    // a 10^12-row deployment would checkpoint every ~5 rounds to also
    // truncate lineage — diameter of dedup graphs keeps rounds single-digit
    out
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over token multiset: per bit, sum +1/-1 across
    * token hashes; bit set when the sum is positive. */
  def simHash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = hashString(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((tokens: Seq[String]) => simHash(tokens))

  /** Hamming distance between two 64-bit signatures. */
  val hamming64: (Column, Column) => Column = (a, b) => bit_count(a.bitwiseXOR(b))

  /** 16-bit bands of a simhash (for hamming-LSH: two signatures within
    * hamming distance 3 of each other share at least one of 4 bands). */
  def simHashBands(sim: Column): Column =
    array((0 until 4).map(b => shiftrightunsigned(sim, b * 16).bitwiseAND(lit(0xffffL))): _*)
}
