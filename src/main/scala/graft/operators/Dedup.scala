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
    * shifted `slice`s evaluates the split O(n) times per row total.
    *
    * Tokenization splits on WHITESPACE RUNS, not single spaces: real
    * corpora carry double spaces / tabs, and a single-space split
    * would mint empty tokens and shingles like `"foo "` that break
    * cross-document matching (a doc differing only in spacing would
    * never pair with its clone). The run class is spelled out
    * EXPLICITLY as `[ \t\n\f\r]+` — the oracles' RE2 `\s+` — instead
    * of Java's `\s` shorthand, which additionally matches vertical
    * tab (\x0B) and would silently diverge engine from oracle on a
    * VT-bearing document (the BpeTokenPattern convention, applied to
    * the dedup surface in r06 per the r05 advisory). */
  private[graft] val WsRun: String = "[ \\t\\n\\f\\r]+"

  private val WsRunPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(WsRun)

  /** Spark's `trim(col)` strips SPACE (0x20) only — NOT Java's
    * `String.trim` (every char <= 0x20). The JVM shingle path must
    * tokenize bit-identically to the previous Catalyst
    * `split(trim(text), WsRun)` form and to the DuckDB oracles'
    * `regexp_split_to_array(trim(text), '\s+')`. */
  @inline private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** JVM word-shingle kernel — one compiled pass per document.
    * Exact mirror of the previous Catalyst form
    * (`array_distinct(zip_with(slice..)..)` over
    * `split(trim(text), WsRun)`), kept bit-identical:
    *  - split keeps trailing empty tokens (Java `split(re, -1)`,
    *    Spark's `StringSplit` default limit);
    *  - fewer than n tokens (and null text) yield an EMPTY array (the
    *    old `when(size >= n)...otherwise(array())` semantics);
    *  - shingles join adjacent tokens with a single space;
    *  - distinct preserves FIRST-occurrence order (array_distinct).
    * Why not the Catalyst HOF chain: higher-order functions are
    * CodegenFallback — interpreted per element with no CSE — and the
    * shingle pipeline is the hot per-row path of six battery queries
    * (n-gram index, minhash, dup clusters, decontaminate). A compiled
    * singleton UDF does the same logical work in one tight loop. */
  private[graft] def wordShinglesJvm(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty[String]
    val toks = WsRunPattern.split(trimSpaces(text), -1)
    if (toks.length < n) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      if (n == 1) seen.add(toks(i))
      else {
        var len = n - 1
        var k = 0
        while (k < n) { len += toks(i + k).length; k += 1 }
        val sb = new java.lang.StringBuilder(len)
        k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        seen.add(sb.toString)
      }
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** SINGLETON shingle UDF (see the cache-canonicalization contract on
    * the minhash UDFs below: parameters ride as literal columns so
    * repeated plans canonicalize equal and persisted subtrees are
    * reused across passes). */
  private val wordShinglesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String, n: Int) => wordShinglesJvm(text, n))

  def wordShingles(text: Column, n: Int): Column =
    wordShinglesUdf(text, lit(n))

  /** Exact Jaccard similarity of two (distinct-element) arrays. Two
    * EMPTY sets are defined as identical (J = 1): they collapse to the
    * same minhash signature upstream, and the naive 0/0 disagrees
    * between engines (Spark Divide -> NULL, DuckDB -> NaN which sorts
    * greatest past every threshold). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - inter
    when(union > 0.0, inter / union).otherwise(lit(1.0))
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

  /** SINGLETON UDF instances — k/seed/bands ride as literal columns.
    * A `udf(...)` built inside an operator call captures its
    * parameters in a fresh closure per invocation, and ScalaUDF plan
    * equality compares the function REFERENCE — so two invocations of
    * the same query never canonicalize equal, and the session
    * CacheManager registers the second invocation's persisted subtree
    * as a NEW cache entry instead of reusing the materialized one
    * (measured in the r06 probe: queries whose persisted plan contains
    * a per-call closure UDF ran flat cold-to-steady — the steady pass
    * re-shingled and re-hashed the corpus — while val-UDF queries
    * improved >2x on their second pass). Val singletons with literal
    * parameters keep repeated plans canonically equal, restoring the
    * persist-reuse the battery's steady pass was designed to measure. */
  private val minHashSigUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: Seq[String], k: Int, seed: Long) => minHashSignature(s, k, seed))
  private val bandHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sig: Seq[Long], bands: Int) => bandHashes(sig.toArray, bands))

  /** doc -> (minhash signature, band hashes) columns. */
  def minHashCols(shingles: Column, k: Int = 16, bands: Int = 4,
      seed: Long = 42L): (Column, Column) = {
    val sig = minHashSigUdf(shingles, lit(k), lit(seed))
    (sig, bandHashUdf(sig, lit(bands)))
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
   *
   * Empty shingle sets — documents shorter than the shingle order
   * (e.g. single-token docs under word 2-grams) — are EXCLUDED from
   * pair generation: they all collapse to the same all-MaxValue
   * signature, so treating them as pairs would declare every short
   * document a mutual duplicate and the downstream drop-list
   * (`id != cluster_id`) would silently delete all but one of them.
   * MinHash carries no signal for them; they pass through unpaired
   * (and un-dropped). The J(empty,empty)=1 convention in [[jaccard]]
   * remains for direct column use only.
   *
   * The narrow `(id, sig)` projection is PERSISTED (memory+disk,
   * ~id + k longs per doc — a 1-2% sliver of the text corpus): it
   * feeds three unshared plan branches below, and without
   * materialization Spark recomputes the expensive shingle+minhash
   * projection once per branch — measured 2.2 s vs 1.7 s on the sf0.1
   * battery corpus (MinhashProbe, interleaved). The cache is pinned by
   * the session CacheManager until explicitly unpersisted (NOT
   * ContextCleaner-reclaimed); battery runs clear caches between
   * queries, and callers needing a deterministic lifecycle (or an
   * already-stored signature table) should build the table themselves
   * and call [[minHashLshPairsFromSignatures]], unpersisting after
   * materialization.
   */
  def minHashLshPairs(df: DataFrame, k: Int = 16, bands: Int = 4,
      seed: Long = 42L, maxBucket: Int = 4096): DataFrame = {
    graft.plans.GraftExtensions.adaptiveArtifactPartitioning(df.sparkSession)
    val (sig, _) = minHashCols(col("shingles"), k, bands, seed)
    val withSig = df.select(col("id"), col("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), sig.as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    minHashLshPairsFromSignatures(df, withSig, k, bands, maxBucket)
  }

  /** The post-signature half of [[minHashLshPairs]], taking the narrow
    * `(id, sig)` table explicitly so callers can MATERIALIZE it
    * (persist / checkpoint / a stored signature table): the signature
    * stream feeds three unshared plan branches below, and without
    * materialization Spark recomputes the expensive shingle+minhash
    * projection once per branch. */
  def minHashLshPairsFromSignatures(df: DataFrame, withSig: DataFrame,
      k: Int = 16, bands: Int = 4, maxBucket: Int = 4096): DataFrame = {
    // 1. signature-duplicate groups -> min-id rep + linear star pairs.
    //    groupBy+join, NOT min().over(Window.partitionBy(sig)): window
    //    aggregation has no map-side partial, so a million-identical-
    //    docs group would sort inside ONE task; the partial aggregate
    //    combines per-partition before the (narrow) shuffle.
    val repBySig = withSig.groupBy(col("sig")).agg(min(col("id")).as("rep"))
    val dupPairs = withSig.select(col("id"), col("sig"))
      .join(repBySig, Seq("sig"))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"),
        lit(1.0).as("est_jaccard")) // identical signatures agree on all k
    val reps = repBySig.select(col("rep").as("id"), col("sig"))
      .withColumn("bands", bandArr(col("sig"), bands))
    // 2. band the representatives; 3. cap bucket size (same
    //    partial-agg count + join shape — no Window over the bucket key)
    val exploded = reps.select(col("id"), col("sig"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val capped = capBandBuckets(exploded, maxBucket)
    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    val lshPairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sigAgreement(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
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

  /** Band-hash column over a signature column (shared by the rep
    * path, the overflow census and the streaming index): one singleton
    * ScalaUDF with `bands` as a literal, for the plan-equality reason
    * documented on [[minHashSigUdf]]. */
  def bandArr(sig: Column, bands: Int): Column = bandHashUdf(sig, lit(bands))

  /** Signature-agreement Jaccard estimate: the fraction of equal
    * positions of two equal-length signature arrays. ONE definition,
    * shared by the batch pair pipeline and the streaming annotator, so
    * the estimate can never drift between them. */
  private[graft] def sigAgreement(a: Column, b: Column, k: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x) / k

  /** Drop rows of an exploded (band, bucket, ...) table whose bucket
    * population exceeds `maxBucket` — partial-agg count + join, never
    * a Window over the bucket key. ONE definition shared by every
    * banded surface (minhash pairs, simhash pairs, the streaming
    * index) so the cap semantics cannot drift. */
  private[graft] def capBandBuckets(exploded: DataFrame,
      maxBucket: Int): DataFrame = {
    val small = exploded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    exploded.join(small, Seq("band", "bucket"))
  }

  /** Observability for cap (3) above: (band, bucket, size) of every
    * bucket whose DISTINCT-signature population exceeds `maxBucket` —
    * what `minHashLshPairs` dropped, never silently. */
  def minHashBucketOverflow(df: DataFrame, k: Int = 16, bands: Int = 4,
      seed: Long = 42L, maxBucket: Int = 4096): DataFrame = {
    graft.plans.GraftExtensions.adaptiveArtifactPartitioning(df.sparkSession)
    val (sig, _) = minHashCols(col("shingles"), k, bands, seed)
    // the same narrow (id, sig) artifact table minHashLshPairs
    // persists — identical plan prefix (same singleton UDF, same
    // projection), so a session running both the pair pipeline and
    // the census shares ONE materialization, and a repeated census
    // (the battery's steady pass; a production session polling the
    // overflow report against its stored signature table) reads the
    // cache instead of re-shingling and re-hashing the corpus
    val withSig = df.select(col("id"), col("shingles"))
      .filter(size(col("shingles")) > 0) // mirrors minHashLshPairs
      .select(col("id"), sig.as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withSig
      .groupBy(col("sig")).agg(min(col("id")).as("id"))
      .withColumn("bands", bandArr(col("sig"), bands))
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
   * Algorithm: alternating large-star / small-star edge contraction
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC '14) — converges in O(log n) rounds on ANY graph shape.
   * Min-label propagation (the round-2 form) is O(component diameter):
   * a near-dup CHAIN of d documents needs d rounds; the star
   * alternation needs ~log d. Each round is two groupBy+join passes
   * over the (narrow, two-long-column) edge set — partial aggregation
   * combines map-side, no Window funnels a hot component through one
   * task. Every round is `localCheckpoint`ed, truncating lineage AND
   * recomputation (the upstream LSH pair pipeline is materialized
   * exactly once); intermediates are unpersisted as soon as the next
   * round lands, and the final checkpoint is reclaimed by Spark's
   * ContextCleaner once the caller drops the result.
   *
   * Convergence contract: fixpoint is detected from a (count,
   * order-independent hash sum) signature of the checkpointed edges —
   * a single cheap job over in-memory blocks per round. If the edge
   * set has not reached its star fixpoint within `maxIters` rounds the
   * call THROWS instead of returning silently-split clusters (the
   * round-2 bug); the default 50 covers components of ~2^50 nodes.
   *
   * Local finish: when `localFinishEdges` > 0 and a round's live edge
   * count drops to or below it, the remaining frontier is collected
   * and closed with a driver-side union-find instead of paying
   * O(log diameter) more Spark rounds of fixed job cost. This is the
   * standard bounded tail fallback (a la GraphFrames/GraphX local
   * aggregation): driver memory is bounded by the threshold — boxed
   * edge tuples plus a HashMap of boxed Longs, ~50-100 bytes per
   * collected edge (so a 2^20 threshold is a ~100 MB transient) —
   * and the star rounds have already contracted any corpus-sized
   * clique structure before the frontier can shrink under a sane
   * threshold. Disabled (0) by default so the pure distributed path
   * stays the tested contract.
   */
  def duplicateClusters(ids: DataFrame, pairs: DataFrame,
      maxIters: Int = 50, localFinishEdges: Int = 0): DataFrame =
    duplicateClustersResult(ids, pairs, maxIters, localFinishEdges).labels

  /** [[duplicateClusters]] result with observability + lifecycle:
    * `starRounds` counts the distributed large-star/small-star rounds
    * actually executed (0 means the bounded local tail closed the
    * whole frontier), and `cleanup()` unpersists the final
    * checkpointed star edges — call it only AFTER `labels` has been
    * fully materialized (written / collected), since `labels` is a
    * lazy join against that checkpoint. */
  final case class ClusterResult(labels: DataFrame, starRounds: Int,
      cleanup: () => Unit)

  /** RDD-level unpersist of a `localCheckpoint`ed Dataset: the persist
    * lives on the internal checkpointed RDD (a `LogicalRDD` leaf), not
    * in the SQL cache, so `Dataset.unpersist` alone does not free it. */
  private def unpersistCheckpoint(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  def duplicateClustersResult(ids: DataFrame, pairs: DataFrame,
      maxIters: Int = 50, localFinishEdges: Int = 0): ClusterResult = {
    // canonical directed edges: larger id -> smaller id, deduplicated.
    // localCheckpoint is LAZY (r06): the signature aggregate right
    // below materializes the checkpoint and computes the fixpoint
    // signature in ONE job — the eager form cost a separate
    // materialization job per round, and at battery scale (tiny edge
    // sets) the per-job fixed cost was half the operator's runtime.
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    // (row count, two independent order-independent 64-bit XOR folds):
    // equal signatures across consecutive rounds == the star fixpoint
    // (both stars leave a union of min-id stars exactly in place).
    // XOR, not sum — overflow-free under ANSI mode; edges are distinct
    // within a round so nothing self-cancels.
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)),
        coalesce(bit_xor(xxhash64(col("v"), col("u"), lit(7L))), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var sig = signature(edges)
    var converged = sig._1 == 0L
    var it = 0
    var starRounds = 0
    var prev: DataFrame = null

    // Probed and rejected (r06): running the contraction rounds with
    // AQE off + an edge-count-derived static partition count DID cut
    // the per-round query-stage job count (43 -> 29 on the battery
    // corpus) but RAISED wall time ~50%: without AQE the round's two
    // min-table joins lose their runtime broadcast conversion (a
    // LogicalRDD leaf has no stats, so static planning falls back to
    // sort-merge with two extra exchanges per join). AQE's per-stage
    // jobs are cheaper than the extra sorts; the rounds keep the
    // session's adaptive config.

    /** Close a bounded frontier on the driver: union-find with path
      * compression, then re-emit the member -> component-min stars in
      * the same (u, v) shape the distributed fixpoint produces. */
    def localFinish(e: DataFrame): DataFrame = {
      val spark = e.sparkSession
      import spark.implicits._
      val rows = e.select(col("u"), col("v")).as[(Long, Long)].collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
        }
        r
      }
      rows.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) {
          // union by min id keeps the root the component minimum
          if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
        }
      }
      val members = rows.iterator.flatMap(p => Iterator(p._1, p._2))
        .toArray.distinct
      val stars = members.iterator.map(x => (x, find(x)))
        .filter(p => p._1 != p._2).toSeq
      stars.toDF("u", "v")
    }

    while (!converged && it < maxIters) {
      if (localFinishEdges > 0 && sig._1 <= localFinishEdges) {
        val finished = localFinish(edges)
        if (prev != null) unpersistCheckpoint(prev)
        prev = edges
        edges = finished
        converged = true
      } else {
      // large-star: hang every node's LARGER neighbors off the minimum
      // of its closed neighborhood (connectivity-preserving; keeps
      // u > v invariant since m <= u < v)
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym.join(lsMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: hang each node AND its (all smaller) neighbors off
      // the neighborhood minimum
      val ssMin = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(ssMin, Seq("u"))
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(eager = false) // materialized by signature(next)
      val nextSig = signature(next)
      converged = nextSig == sig
      if (prev != null) unpersistCheckpoint(prev)
      prev = edges
      edges = next
      sig = nextSig
      starRounds += 1
      }
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters: star contraction did not converge within " +
          s"$maxIters rounds (${sig._1} edges live) — refusing to return " +
          "partially-merged cluster labels")
    if (prev != null) unpersistCheckpoint(prev)
    // at fixpoint the edges are disjoint (member -> component-min) stars
    val finalEdges = edges
    val labels = ids.select(col("id"))
      .join(finalEdges.select(col("u").as("id"), col("v").as("label")), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster_id"))
    ClusterResult(labels, starRounds, () => unpersistCheckpoint(finalEdges))
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

  /**
   * SimHash near-duplicate pairs: every (id_a, id_b, hamming) with
   * hamming(simhash_a, simhash_b) <= `maxHamming`, under the
   * cluster-rep pairing convention shared with [[minHashLshPairs]].
   * `df` must carry a unique `id` and a 64-bit `simhash` column.
   *
   * Recall is EXACT for maxHamming <= 3 (absent bucket overflow): by
   * pigeonhole, <= 3 differing bits can touch at most 3 of the 4
   * 16-bit bands, so every qualifying pair collides in at least one
   * band bucket — unlike minhash banding, which is probabilistic,
   * this blocking loses nothing. Members of an identical-signature
   * group are collapsed to the min-id representative first (linear
   * star pairs at hamming 0; a member's near-match to another doc is
   * reported against its rep — hamming 0 to the rep means identical
   * distances), band buckets over `maxBucket` representatives are
   * dropped with the same deterministic-and-observable contract as
   * the minhash cap, and only (id, simhash) — 16 bytes — rides the
   * bucket self-join. Identical token MULTISETS share a simhash by
   * construction, so respaced/reordered clones land in the star path;
   * very short documents carry few voting tokens and can collide
   * spuriously — inherent simhash semantics, callers filter by length
   * if that matters.
   *
   * `df` is this operator's signature table (the FromSignatures-style
   * primitive): it is scanned from multiple unshared plan branches
   * (rep election, star join, banding), so a caller whose input is an
   * EXPENSIVE projection (a per-document hash UDF over text) must
   * materialize it first — persist, checkpoint, or a stored signature
   * table — or pay one corpus pass per branch (the minhash recompute
   * lesson, BASELINE.md round-4 probe; mirrored in qSimHashPairs).
   */
  def simHashPairs(df: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3, got $maxHamming")
    val sigT = df.select(col("id"), col("simhash"))
    // rep election: groupBy+join (map-side partial), never a window
    val repBySig = sigT.groupBy(col("simhash")).agg(min(col("id")).as("rep"))
    val dupPairs = sigT.join(repBySig, Seq("simhash"))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"),
        lit(0L).as("hamming"))
    val exploded = repBySig.select(col("rep").as("id"), col("simhash"))
      .select(col("id"), col("simhash"),
        posexplode(simHashBands(col("simhash"))).as(Seq("band", "bucket")))
    val capped = capBandBuckets(exploded, maxBucket)
    val a = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    val lshPairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // multi-band collisions of the same pair: narrow partial-agg
      // dedupe (hamming is signature-determined, first() is exact)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("hamming")).as("hamming"))
    dupPairs.unionByName(lshPairs)
  }

  /** Observability for the [[simHashPairs]] cap: every (band, bucket)
    * whose distinct-signature population exceeds `maxBucket`. */
  def simHashBucketOverflow(df: DataFrame, maxBucket: Int = 4096): DataFrame =
    df.select(col("id"), col("simhash"))
      .groupBy(col("simhash")).agg(min(col("id")).as("id"))
      .select(posexplode(simHashBands(col("simhash"))).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("size"))
      .filter(col("size") > maxBucket)
}
