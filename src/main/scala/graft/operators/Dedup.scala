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
    * Catalyst primitives (split + sequence + transform), codegen'd.
    * Texts shorter than n tokens yield an empty set. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, (i + k + 1).cast("int"))): _*))))
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
   * MinHash-LSH candidate pairs: explode band hashes, self-join within
   * (band index, band hash) buckets, dedupe pairs. `df` must have a
   * unique `id` column and a `shingles` array column. Output:
   * (id_a, id_b, est_jaccard from signature agreement, jaccard exact).
   */
  def minHashLshPairs(df: DataFrame, k: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    val (sig, bandArr) = minHashCols(col("shingles"), k, bands, seed)
    val withSig = df.withColumn("sig", sig).withColumn("bands", bandArr)
    val exploded = withSig.select(col("id"), col("sig"), col("shingles"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
    val a = exploded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("sig").as("sig_a"), col("shingles").as("sh_a"))
    val b = exploded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("sig").as("sig_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) =>
            when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, x) => acc + x) / k).as("est_jaccard"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .dropDuplicates("id_a", "id_b")
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
