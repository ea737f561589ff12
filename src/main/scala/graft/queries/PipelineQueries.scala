package graft.queries

import graft.operators.{Dedup, Multimodal, Packing, Similarity, TextStats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline queries over the `documents` and
 * `embeddings` test tables: deduplication (exact hash, MinHash+LSH,
 * SimHash, n-gram Jaccard), similarity search (brute-force cosine
 * top-k, hyperplane-LSH ANN), text analysis (token counts, quality,
 * fingerprints, language ID) and multimodal binary plumbing.
 *
 * Every query here carries a full DuckDB value oracle — including the
 * signature-based ops (minhash/simhash/LSH/IVF), whose deterministic
 * hash streams are mirrored in single-statement SQL via [[DuckMacros]]
 * — plus exact behavioural tests in PipelineSpec.
 */
object PipelineQueries {

  private val R = 6
  private val JitterSql = "1.2345e-9"
  private def r(c: Column): Column = round(c + JitterSql.toDouble, R)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embeds(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // ---------------- text stats (all-Catalyst, one scan) ----------------

  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextStats.nTokens(col("text")).as("n_tokens"),
      TextStats.nTokensBpe(col("text")).as("n_tokens_bpe"),
      TextStats.nDistinctTokens(col("text")).as("n_distinct_tokens"),
      r(TextStats.avgTokenLen(col("text"))).as("avg_token_len"),
      r(TextStats.stopwordRatio(col("text"))).as("stopword_ratio"),
      r(TextStats.typeTokenRatio(col("text"))).as("type_token_ratio"),
      r(TextStats.qualityScore(col("text"))).as("quality_score"),
      TextStats.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  private val sqlTextStats = {
    val toks = "string_split(trim(text), ' ')"
    val stop = TextStats.Stopwords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH g AS (SELECT doc_id, text, $toks AS toks,
       |            regexp_split_to_array(trim(text), '\\s+') AS wtoks FROM documents),
       | t AS (SELECT doc_id, text, len(toks) AS nt,
       |        len(regexp_extract_all(text, '${TextStats.BpeTokenPattern}')) AS ntb,
       |        len(list_distinct(toks)) AS nd,
       |        CAST(length(trim(text)) - (len(toks) - 1) AS DOUBLE) / len(toks) AS atl,
       |        CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE)
       |          / len(toks) AS swr,
       |        md5(array_to_string(list_sort(list_distinct(wtoks)), ' ')) AS fp
       |       FROM g)
       |SELECT doc_id, nt AS n_tokens, ntb AS n_tokens_bpe,
       | nd AS n_distinct_tokens,
       | round(atl + $JitterSql, $R) + 0 AS avg_token_len,
       | round(swr + $JitterSql, $R) + 0 AS stopword_ratio,
       | round(CAST(nd AS DOUBLE)/nt + $JitterSql, $R) + 0 AS type_token_ratio,
       | round(0.25*least(nt/50.0, 1.0) + 0.25*(CAST(nd AS DOUBLE)/nt)
       |   + 0.25*(1.0 - swr) + 0.25*least(atl/8.0, 1.0) + $JitterSql, $R) + 0 AS quality_score,
       | fp AS fingerprint
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---------------- exact dedup (hash groupBy) ----------------

  /** groupBy+join, NOT count/min over Window.partitionBy(content_hash):
    * window aggregation has no map-side partial, so a million-identical
    * -docs group would sort inside ONE task — the exact case an exact-
    * dedup operator exists for. The aggregate combines map-side and the
    * re-join streams the group. */
  private def qExactDedup(s: SparkSession, dir: String): DataFrame = {
    val hashed = docs(s, dir).select(col("doc_id"), md5(col("text")).as("content_hash"))
    val groups = hashed.groupBy(col("content_hash"))
      .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("_min_id"))
    hashed.join(groups, Seq("content_hash"))
      .select(col("doc_id"), col("content_hash"), col("group_size"),
        (col("doc_id") === col("_min_id")).cast("int").as("is_canonical"))
      .orderBy(col("doc_id"))
  }

  private val sqlExactDedup =
    s"""SELECT doc_id, md5(text) AS content_hash,
       | count(*) OVER (PARTITION BY md5(text)) AS group_size,
       | CAST(doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_canonical
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------- n-gram Jaccard pairs (blocked) ----------------

  /** Document-frequency cap for the n-gram inverted index: a shingle
    * held by P documents contributes P² candidate pair rows, and at a
    * fixed similarity threshold the highest-DF shingles ("of the") are
    * the least informative — standard practice is to drop them from
    * the shingle space entirely (sizes AND intersections), which keeps
    * the posting self-join bounded by cap² per shingle at ANY corpus
    * size. Deterministic; the dropped shingles are observable via
    * q_docs_ngram_hot_shingles. The oracle mirrors the cap exactly. */
  private val NgramMaxDf = 128

  /** SINGLETON pair-expansion kernel for the inverted index: all
    * C(k, 2) unordered (min, max) id pairs of one shingle's posting
    * list, k bounded by [[NgramMaxDf]]. A val singleton (not a
    * per-call closure) so repeated plans canonicalize equal — the
    * cache-reuse contract of [[graft.operators.Dedup]]'s UDFs. */
  private val pairCombosUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((ids: Seq[Long]) => {
      val a = ids.toArray
      val m = a.length
      val out = new Array[(Long, Long)](m * (m - 1) / 2)
      var p = 0
      var i = 0
      while (i < m) {
        val x = a(i)
        var j = i + 1
        while (j < m) {
          val y = a(j)
          out(p) = if (x <= y) (x, y) else (y, x)
          p += 1
          j += 1
        }
        i += 1
      }
      out
    })

  /** Exact word-2-gram Jaccard via an INVERTED INDEX: explode shingles,
    * self-join postings on (lang, source, shingle), count shared
    * shingles per pair, then jaccard = |A∩B| / (|A|+|B|-|A∩B|) from the
    * kept-posting set sizes. Work scales with Σ posting² (shingle
    * rarity, bounded by [[NgramMaxDf]]²), not Σ block² (corpus size) —
    * the naive blocked pair join is quadratic at fixed blocking-key
    * cardinality; this is the shape that survives 100×. Pairs with
    * empty intersection can't reach the 0.02 threshold, so the output
    * is identical to the all-pairs form over the capped shingle space. */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(docs(s, dir), NgramMaxDf)
      .orderBy(col("id_a"), col("id_b"))

  /** The capped inverted-index pair pipeline (testable shape).
    *
    * ONE corpus pass, ONE posting shuffle (r06, guide §2.3/§2.4): the
    * round-5 shape shuffled every posting twice (hot-shingle census,
    * then the kept-posting collect after a left-anti join) and
    * persisted a corpus-sized shingle table to feed both passes — the
    * battery's biggest cache, and the census shuffle was pure
    * duplicate work. The [[graft.plans.BoundedIdsAggExpr]] aggregate
    * now counts the true document frequency AND collects the id list
    * in the same partial-aggregated pass, with per-group memory
    * bounded by the DF cap (a stop-shingle held by 10^9 docs
    * accumulates cap ids + one counter per map task, never a
    * corpus-sized list); `df <= maxDf` drops exactly the shingles the
    * anti-join dropped, and surviving id lists are complete by the
    * size <= df invariant. Pair expansion and per-doc kept-sizes are
    * order-independent in the id list, so the collect order being
    * partition-dependent changes nothing.
    *
    * Materialization points (pinned by the session CacheManager until
    * unpersisted — the handle below or the battery's per-query
    * clearCache; a production run would STORE the index): the capped
    * inverted index (one row per distinct kept shingle, id lists
    * bounded by the DF cap) feeds pair expansion AND the per-doc
    * kept-size count; the tiny per-doc `sizes` table is persisted too
    * because BOTH jaccard denominator joins (id_a, id_b) read it —
    * unpersisted it was recomputed once per join branch. */
  private[graft] def ngramJaccardPairs(d: DataFrame, maxDf: Int): DataFrame =
    ngramJaccardPairsResult(d, maxDf)._1

  /** [[ngramJaccardPairs]] plus a cleanup handle that unpersists the
    * inverted index and the size table deterministically — call it
    * only AFTER the pair DataFrame has been fully materialized.
    * (The handle-less form leaves the caches pinned until the
    * battery's per-query clearCache — acceptable for the one-shot
    * battery query; long-lived sessions should use this form.) */
  private[graft] def ngramJaccardPairsResult(
      d: DataFrame, maxDf: Int): (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.GraftSqlBridge
    graft.plans.GraftExtensions.adaptiveArtifactPartitioning(d.sparkSession)
    val postings = d.select(col("lang"), col("source"), col("doc_id"),
      explode(Dedup.wordShingles(col("text"), 2)).as("g"))
    val biAgg = graft.plans.BoundedIdsAggExpr(
      GraftSqlBridge.expressionOf(col("doc_id").cast("long")), maxDf)
    // the capped inverted index — the reused core of the operator
    val index = postings.groupBy(col("lang"), col("source"), col("g"))
      .agg(GraftSqlBridge.aggColumn(biAgg).as("bi"))
      .filter(col("bi.df") <= maxDf)
      .select(col("lang"), col("source"), col("bi.ids").as("ids"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-doc kept-posting counts, derived from the index id lists
    // (each (shingle, doc) appears exactly once, so the explode count
    // equals the kept-posting count)
    val sizes = index
      .select(col("lang"), col("source"), explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // candidate pairs per shingle WITHOUT a posting self-join: one
    // groupBy ships the postings once (a self-join shuffles them
    // twice), then each shingle's id list — bounded by the DF cap —
    // explodes its C(df,2) unordered pairs map-side via the compiled
    // singleton pair kernel (the interpreted flatten/transform/slice
    // HOF chain allocated per element per element; same (min, max)
    // pair multiset — id lists are duplicate-free, and the unordered
    // pair set over all index combinations is list-order independent);
    // the shuffle this shape removes is corpus-sized.
    val pairCombos = pairCombosUdf(col("ids"))
    // pair counting groups by the id PAIR only — a pair lives in exactly
    // one (lang, source) block, which is re-derived from the sizes
    // table instead of riding the widest shuffle (AQE picks broadcast
    // vs shuffle join for the per-doc sizes side by its actual size)
    val pairs = index
      .select(explode(pairCombos).as("pr"))
      .select(col("pr._1").as("id_a"), col("pr._2").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .join(sizes.select(col("doc_id").as("id_a"), col("lang"),
        col("source"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .select(col("lang"), col("source"), col("id_a"), col("id_b"),
        r(col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.02)
    (pairs, () => {
      sizes.unpersist(blocking = false)
      index.unpersist(blocking = false)
    })
  }

  private val sqlNgramJaccard =
    s"""WITH g AS (SELECT doc_id, lang, source, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       | sh AS (SELECT doc_id, lang, source,
       |         list_distinct(CASE WHEN len(toks) >= 2
       |           THEN list_transform(generate_series(1, len(toks) - 1),
       |                i -> toks[i] || ' ' || toks[i + 1])
       |           ELSE [] END) AS sh
       |        FROM g),
       | post AS (SELECT doc_id, lang, source, unnest(sh) AS gram FROM sh),
       | hot AS (SELECT lang, source, gram FROM post
       |         GROUP BY 1, 2, 3 HAVING count(*) > $NgramMaxDf),
       | kept AS (SELECT p.* FROM post p ANTI JOIN hot h
       |          USING (lang, source, gram)),
       | sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
       | inter AS (SELECT a.lang, a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       |            count(*) AS i
       |           FROM kept a JOIN kept b
       |             ON a.lang = b.lang AND a.source = b.source
       |            AND a.gram = b.gram AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2, 3, 4),
       | pairs AS (SELECT i.lang, i.source, i.id_a, i.id_b,
       |            CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS j
       |           FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
       |           JOIN sizes sb ON sb.doc_id = i.id_b)
       |SELECT lang, source, id_a, id_b, round(j + $JitterSql, $R) + 0 AS jaccard
       |FROM pairs WHERE round(j + $JitterSql, $R) + 0 >= 0.02 ORDER BY id_a, id_b""".stripMargin

  /** Overflow observability for the DF cap: every (lang, source,
    * shingle) whose document frequency exceeds the threshold — what the
    * capped index WOULD drop, never silently. Driver-run at a low
    * threshold so truncation behavior stays visible in CI. */
  private def qNgramHotShingles(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("lang"), col("source"),
        explode(Dedup.wordShingles(col("text"), 2)).as("g"))
      .groupBy(col("lang"), col("source"), col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > 3)
      .orderBy(col("lang"), col("source"), col("g"))

  private val sqlNgramHotShingles =
    s"""WITH g AS (SELECT doc_id, lang, source, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       | sh AS (SELECT doc_id, lang, source,
       |         list_distinct(CASE WHEN len(toks) >= 2
       |           THEN list_transform(generate_series(1, len(toks) - 1),
       |                i -> toks[i] || ' ' || toks[i + 1])
       |           ELSE [] END) AS sh
       |        FROM g),
       | post AS (SELECT doc_id, lang, source, unnest(sh) AS g FROM sh)
       |SELECT lang, source, g, count(*) AS df FROM post
       |GROUP BY 1, 2, 3 HAVING count(*) > 3 ORDER BY lang, source, g""".stripMargin

  // ---------------- MinHash + LSH (rows-only + PipelineSpec) ----------------

  private def qMinHashLsh(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id").as("id"),
      Dedup.wordShingles(col("text"), 2).as("shingles"))
    Dedup.minHashLshPairs(base, k = 16, bands = 4)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Duplicate clusters over the MinHash-LSH candidate pairs with
    * exact-Jaccard >= 0.5: every document labeled with its connected
    * component's min id plus the component size — `doc_id !=
    * cluster_id` is the drop-list. Distributed min-label propagation
    * ([[Dedup.duplicateClusters]]); oracled by a DuckDB recursive-CTE
    * transitive closure over the SAME pair stream. */
  private def dupClusterLabels(s: SparkSession, dir: String,
      localFinishEdges: Int): DataFrame = {
    val base = docs(s, dir).select(col("doc_id").as("id"),
      Dedup.wordShingles(col("text"), 2).as("shingles"))
    val edges = Dedup.minHashLshPairs(base, k = 16, bands = 4)
      .filter(round(col("jaccard"), 6) >= 0.5)
      .select(col("id_a"), col("id_b"))
    val labeled = Dedup.duplicateClusters(base.select(col("id")), edges,
      localFinishEdges = localFinishEdges)
    // cluster_size via groupBy + re-join, NOT count().over(Window
    // .partitionBy(cluster_id)): a million-member duplicate cluster —
    // the normal case dedup exists for — would sort inside ONE task at
    // the output stage. The aggregate combines map-side and the join
    // streams the group (same shape as qExactDedup's rep election).
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, Seq("cluster_id"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Primary dup-clusters battery entry: localFinishEdges = 0, so the
    * oracle certifies the DISTRIBUTED large-star/small-star contraction
    * — the path that runs at 100 TB (the round-3 battery only ever
    * exercised the driver union-find tail). */
  private def qDupClusters(s: SparkSession, dir: String): DataFrame =
    dupClusterLabels(s, dir, localFinishEdges = 0)

  /** Companion entry for the bounded driver union-find tail: a
    * threshold above the test corpus's live edge count routes the whole
    * frontier through `localFinish`, so BOTH halves of the operator
    * stay oracle-covered (identical labels, same oracle SQL). */
  private def qDupClustersLocal(s: SparkSession, dir: String): DataFrame =
    dupClusterLabels(s, dir, localFinishEdges = 1 << 20)

  private lazy val sqlDupClusters: String = {
    // the full minhash-LSH pair stream (sqlMinHashLsh) as a CTE, then
    // transitive closure by recursive min-label propagation
    val pairSql = sqlMinHashLsh
      .replace("FROM scored ORDER BY id_a, id_b", "FROM scored")
    s"""WITH RECURSIVE mh AS ($pairSql),
       | e AS (SELECT id_a AS src, id_b AS dst FROM mh WHERE jaccard >= 0.5
       |       UNION ALL SELECT id_b, id_a FROM mh WHERE jaccard >= 0.5),
       | n AS (SELECT DISTINCT doc_id AS id FROM documents),
       | reach AS (
       |   SELECT id, id AS lbl FROM n
       |   UNION
       |   SELECT e.src AS id, r.lbl FROM reach r JOIN e ON e.dst = r.id),
       | lab AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
       |SELECT l.id AS doc_id, l.cluster_id,
       | count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
       |FROM lab l ORDER BY doc_id""".stripMargin
  }

  private def qSimHash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      Dedup.simHashUdf(TextStats.tokensWs(col("text"))).as("simhash"))
      .withColumn("bands", Dedup.simHashBands(col("simhash")))
      .select(col("doc_id"), col("simhash"),
        col("bands").getItem(0).as("band_0"), col("bands").getItem(1).as("band_1"),
        col("bands").getItem(2).as("band_2"), col("bands").getItem(3).as("band_3"))
      .orderBy(col("doc_id"))

  /** Shared CTE prefix of the SimHash oracles: whitespace-run tokens
    * -> FNV-1a-64 + splitmix64 token hashes -> 64-bit sign-sum,
    * mirrored in pure SQL via [[DuckMacros]] (wrapping arithmetic in
    * HUGEINT limbs), ending with `sim(doc_id, simhash)`. */
  private def sqlSimHashSigCtes: String = {
    import DuckMacros._
    val stages = mix64Stages(
      s"(SELECT doc_id, ${fnv64("w")} AS z0 FROM tok)", "z0", "h", Seq("doc_id"))
    s"""tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |        FROM documents),
       | th AS (SELECT * FROM $stages),
       | bits AS (SELECT doc_id, b,
       |           sum(CASE WHEN ${bit64("h", "b")} = 1 THEN 1 ELSE -1 END) AS cnt
       |          FROM th, (SELECT unnest(range(0, 64)) AS b)
       |          GROUP BY doc_id, b),
       | sim AS (SELECT doc_id,
       |          ${s64("sum(CASE WHEN cnt > 0 THEN CAST(power(2, b) AS HUGEINT) ELSE 0 END)")}
       |            AS simhash
       |         FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** Full value oracle for the simhash query. */
  private val sqlSimHash = {
    import DuckMacros._
    def band(i: Int) =
      s"CAST((${u64("simhash")} // CAST(power(2, ${16 * i}) AS HUGEINT)) % 65536 AS BIGINT) AS band_$i"
    s"""WITH $sqlSimHashSigCtes
       |SELECT doc_id, simhash, ${band(0)}, ${band(1)}, ${band(2)}, ${band(3)}
       |FROM sim ORDER BY doc_id""".stripMargin
  }

  private def qSimHashPairs(s: SparkSession, dir: String): DataFrame = {
    // persist the narrow (id, simhash) projection: simHashPairs scans
    // its input from multiple unshared plan branches (rep election,
    // star join, banding), and without materialization the
    // tokenize+simhash UDF re-runs over the corpus per branch — the
    // minhash recompute lesson (BASELINE.md round-4 probe). 16 bytes a
    // row; reclaimed by the battery's per-query clearCache.
    graft.plans.GraftExtensions.adaptiveArtifactPartitioning(s)
    val sigT = docs(s, dir).select(col("doc_id").as("id"),
      Dedup.simHashUdf(TextStats.tokensWs(col("text"))).as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.simHashPairs(sigT, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Full value oracle for the simhash pair query: the signature CTEs
    * above, then the exact operator shape — min-id rep election, star
    * pairs at hamming 0, 4x16-bit band blocking over representatives
    * (exact recall at hamming <= 3 by pigeonhole), capped buckets,
    * bit_count(xor) hamming verify. */
  private val sqlSimHashPairs = {
    import DuckMacros._
    val bucket =
      s"CAST((${u64("simhash")} // CAST(power(2, 16 * band) AS HUGEINT)) % 65536 AS BIGINT)"
    s"""WITH $sqlSimHashSigCtes,
       | rep AS (SELECT simhash, min(doc_id) AS rep FROM sim GROUP BY simhash),
       | dup AS (SELECT r.rep AS id_a, s.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
       |         FROM sim s JOIN rep r USING (simhash) WHERE s.doc_id <> r.rep),
       | ex AS (SELECT r.rep AS id, r.simhash, bd.band, $bucket AS bucket
       |        FROM rep r, (SELECT unnest(range(0, 4)) AS band) bd),
       | ok AS (SELECT band, bucket FROM ex GROUP BY band, bucket
       |        HAVING count(*) <= 4096),
       | cap AS (SELECT ex.* FROM ex JOIN ok USING (band, bucket)),
       | lsh AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |          CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |         FROM cap a JOIN cap b USING (band, bucket)
       |         WHERE a.id < b.id
       |           AND bit_count(xor(a.simhash, b.simhash)) <= 3)
       |SELECT id_a, id_b, hamming
       |FROM (SELECT * FROM dup UNION ALL SELECT * FROM lsh)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Shared CTE prefix of the MinHash oracles: shingles -> FNV+mix64
    * shingle hashes -> 16 permutation streams -> unsigned-min
    * signatures, ending with `sige(id, sig)`. Empty shingle sets never
    * reach `sige` (mirrors minHashLshPairs' size(shingles)>0 filter —
    * short docs carry no minhash signal and must not be declared
    * mutual duplicates). */
  private def sqlMinHashSigCtes: String = {
    import DuckMacros._
    val Golden = "-7046029254386353131" // 0x9e3779b97f4a7c15 as signed
    // shingle hash: FNV over the 2-gram, then mix64 (Dedup.hashString)
    val hh = mix64Stages(
      s"(SELECT id, ${fnv64("w")} AS hz FROM post)", "hz", "h", Seq("id"))
    // permutation seeds: mix64(42 + i * golden) (Dedup.minHashSignature)
    val seeds = mix64Stages(
      s"(SELECT i, ${add64("42", mul64("i", Golden))} AS sz " +
        "FROM (SELECT unnest(range(0, 16)) AS i))", "sz", "si", Seq("i"))
    // permuted value: mix64(h XOR si)
    val pv = mix64Stages(
      s"(SELECT h.id, s.i, ${xor64("h.h", "s.si")} AS vz " +
        "FROM hh h CROSS JOIN seeds s)", "vz", "v", Seq("id", "i"))
    s"""g AS (SELECT doc_id AS id,
       |            list_distinct(CASE WHEN len(toks) >= 2
       |              THEN list_transform(generate_series(1, len(toks) - 1),
       |                   k -> toks[k] || ' ' || toks[k + 1])
       |              ELSE [] END) AS sh
       |           FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |                 FROM documents)),
       | post AS (SELECT id, unnest(sh) AS w FROM g),
       | hh AS (SELECT * FROM $hh),
       | seeds AS (SELECT * FROM $seeds),
       | pv AS (SELECT * FROM $pv),
       | sigv AS (SELECT id, i, ${minU64("v")} AS sv FROM pv GROUP BY id, i),
       | sigl AS (SELECT id, list(sv ORDER BY i) AS sig FROM sigv GROUP BY id),
       | -- empty shingle sets have no postings, hence no signature row:
       | -- they are excluded from pairing (mirrors the engine's filter)
       | sige AS (SELECT id, sig FROM sigl)""".stripMargin
  }

  /** Band-hash fold over a `reps(id, sig)` CTE: acc0 = golden*(band+1);
    * 4 rounds of acc = mix64(acc XOR sig[band*4 + r + 1])
    * (Dedup.bandHashes). Yields (id, b, sig, acc). */
  private def sqlBandFold: String = {
    import DuckMacros._
    val Golden = "-7046029254386353131"
    val keep = Seq("id", "b", "sig")
    (0 until 4).foldLeft(
      s"(SELECT id, sig, b, ${mul64(Golden, "(b + 1)")} AS acc " +
        "FROM reps, (SELECT unnest(range(0, 4)) AS b))") { (src, r) =>
      mix64Stages(
        s"(SELECT id, b, sig, ${xor64("acc", s"sig[b * 4 + $r + 1]")} AS fz FROM $src)",
        "fz", "acc", keep)
    }
  }

  /** Full value oracle for MinHash-LSH: the complete operator —
    * 16-permutation signatures (splitmix64 streams, unsigned mins),
    * signature-duplicate star pairs, 4-band bucket hashes (seeded
    * wrapping-multiply init + per-row mix fold), bucket self-join,
    * signature-agreement estimate and exact-Jaccard confirm — mirrored
    * in single-statement SQL via [[DuckMacros]]. */
  private val sqlMinHashLsh: String = {
    s"""WITH $sqlMinHashSigCtes,
       | tagged AS (SELECT id, sig, min(id) OVER (PARTITION BY sig) AS rep FROM sige),
       | dup AS (SELECT rep AS id_a, id AS id_b, 1.0 AS est
       |         FROM tagged WHERE id <> rep),
       | reps AS (SELECT id, sig FROM tagged WHERE id = rep),
       | bk AS (SELECT id, b, sig, acc AS bucket FROM $sqlBandFold),
       | lsh AS (SELECT a.id AS id_a, b2.id AS id_b,
       |          CAST(len(list_filter(range(1, 17),
       |            k -> a.sig[k] = b2.sig[k])) AS DOUBLE) / 16 AS est
       |         FROM bk a JOIN bk b2
       |           ON a.b = b2.b AND a.bucket = b2.bucket AND a.id < b2.id
       |         GROUP BY 1, 2, 3),
       | pairs AS (SELECT * FROM dup UNION ALL SELECT * FROM lsh),
       | -- J(empty, empty) = 1 by convention (mirrors Dedup.jaccard)
       | scored AS (SELECT p.id_a, p.id_b, p.est,
       |             CASE WHEN len(ga.sh) + len(gb.sh) = 0 THEN 1.0
       |              ELSE CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE)
       |               / (len(ga.sh) + len(gb.sh) - len(list_intersect(ga.sh, gb.sh)))
       |             END AS j
       |            FROM pairs p JOIN g ga ON ga.id = p.id_a
       |            JOIN g gb ON gb.id = p.id_b)
       |SELECT id_a, id_b, round(est, 4) AS est_jaccard, round(j, 6) AS jaccard
       |FROM scored ORDER BY id_a, id_b""".stripMargin
  }

  /** Bucket-cap observability in the driver battery ([[Dedup
    * .minHashBucketOverflow]]): every (band, bucket) whose DISTINCT-
    * signature population exceeds the threshold — what the capped pair
    * join would drop at that cap. Run at maxBucket=1 so band
    * collisions are visible in CI on the test corpus. */
  private def qMinHashOverflow(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id").as("id"),
      Dedup.wordShingles(col("text"), 2).as("shingles"))
    Dedup.minHashBucketOverflow(base, k = 16, bands = 4, maxBucket = 1)
      .orderBy(col("band"), col("bucket"))
  }

  private val sqlMinHashOverflow: String =
    s"""WITH $sqlMinHashSigCtes,
       | reps AS (SELECT min(id) AS id, sig FROM sige GROUP BY sig),
       | bk AS (SELECT id, b, sig, acc AS bucket FROM $sqlBandFold)
       |SELECT b AS band, bucket, count(*) AS size FROM bk
       |GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY band, bucket""".stripMargin

  /** Full oracle for language ID: the add-one-smoothed top-64 token
    * profile and argmax scoring (TextStats.languageId) re-derived
    * relationally. The predicted label is integer/argmax-valued, so
    * SQL-vs-JVM summation-order ulps cannot flip it on a separable
    * corpus. */
  private val sqlLangId =
    s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS token
       |             FROM documents),
       | counts AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
       | totals AS (SELECT lang, sum(c) AS total, count(*) AS vocab FROM counts GROUP BY 1),
       | top AS (SELECT r.lang, r.token,
       |          ln((r.c + 1.0) / (t.total + t.vocab)) AS logp
       |         FROM (SELECT *, row_number() OVER (PARTITION BY lang
       |                 ORDER BY c DESC, token) AS rk FROM counts) r
       |         JOIN totals t ON r.lang = t.lang WHERE r.rk <= 64),
       | langs AS (SELECT lang, ln(1.0 / (total + vocab)) AS floor FROM totals),
       | scored AS (SELECT tk.doc_id, l.lang,
       |             sum(coalesce(p.logp, l.floor)) AS score
       |            FROM tok tk CROSS JOIN langs l
       |            LEFT JOIN top p ON p.lang = l.lang AND p.token = tk.token
       |            GROUP BY 1, 2),
       | best AS (SELECT doc_id, lang AS predicted_lang,
       |           row_number() OVER (PARTITION BY doc_id
       |             ORDER BY score DESC, lang) AS rk
       |          FROM scored)
       |SELECT d.doc_id, d.lang, b.predicted_lang
       |FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rk = 1
       |ORDER BY d.doc_id""".stripMargin

  /** Full oracle for the stub decoder: byte stats recomputed from the
    * (ASCII) text — exact-integer byte mean, in-order entropy fold,
    * FNV-1a checksum via the wrapping-arithmetic macros. */
  private val sqlMultimodalDecode = {
    import DuckMacros._
    s"""WITH ch AS (SELECT doc_id,
       |             unnest(list_transform(range(1, length(text) + 1),
       |               i -> ascii(text[i]))) AS b
       |            FROM documents),
       | hist AS (SELECT doc_id, b, count(*) AS c FROM ch GROUP BY 1, 2),
       | tot AS (SELECT doc_id, sum(b * c) AS bsum, sum(c) AS n FROM hist GROUP BY 1),
       | ent AS (SELECT h.doc_id,
       |          list_reduce(list_prepend(0.0,
       |            list((CAST(h.c AS DOUBLE) / t.n * ln(CAST(h.c AS DOUBLE) / t.n)) / ln(2.0)
       |              ORDER BY h.b)), (a, x) -> a - x) AS entropy
       |         FROM hist h JOIN tot t ON h.doc_id = t.doc_id
       |         GROUP BY h.doc_id),
       | chk AS (SELECT doc_id,
       |          CASE WHEN length(text) = 0 THEN 0 ELSE ${fnv64("text")} END AS checksum
       |         FROM documents)
       |SELECT d.doc_id, 'text/utf-8' AS format,
       | CAST(coalesce(t.n, 0) AS BIGINT) AS n_bytes,
       | round(coalesce(CAST(t.bsum AS DOUBLE) / t.n, 0.0), 6) + 0 AS byte_mean,
       | round(coalesce(e.entropy, 0.0), 6) + 0 AS byte_entropy,
       | c.checksum
       |FROM documents d
       |LEFT JOIN tot t ON d.doc_id = t.doc_id
       |LEFT JOIN ent e ON d.doc_id = e.doc_id
       |JOIN chk c ON d.doc_id = c.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------- similarity search ----------------

  private def qEmbedTopK(s: SparkSession, dir: String): DataFrame = {
    val all = embeds(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = all.filter(col("id") < 8)
    Similarity.bruteForceTopK(queries, all, k = 5)
      .select(col("query_id"), col("cand_id"), r(col("cosine")).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val sqlEmbedTopK =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       | q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       | scored AS (SELECT query_id, e.vec_id AS cand_id,
       |             list_cosine_similarity(qv, e.v) AS cos
       |            FROM q JOIN e ON e.vec_id <> q.query_id),
       | ranked AS (SELECT query_id, cand_id, cos,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY cos DESC, cand_id) AS rank
       |            FROM scored)
       |SELECT query_id, cand_id, round(cos + $JitterSql, $R) + 0 AS cosine, rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private def qEmbedAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val all = embeds(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    // planes <= 0 -> auto-derived from corpus size (log2(n/targetBucket))
    Similarity.lshTopK(all, planes = -1, k = 3, tables = 4)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Bucket cap the hyperplane-LSH oracle mirrors — must equal the
    * Spark calls' default ([[Similarity.lshTopK]] maxBucket). */
  private val LshMaxBucket = 4096

  /** Shared CTE prefix of the hyperplane-LSH oracles (ANN top-k,
    * near-dup clustering, bucket overflow), ending with
    * `scored(query_id, cand_id, cosine)` over every DIRECTED candidate
    * pair, mirroring the engine's scale guards exactly: identical
    * vectors collapse to a min-id representative (`grp`) with linear
    * star pairs (`stars`), the auto plane count derives from the REP
    * count, only reps are signed and bucketed (`sig`), buckets over
    * [[LshMaxBucket]] reps leave the pairing space (`keep`), and the
    * candidate set is capped bucket collisions plus the star pairs in
    * both directions. +-1 hyperplane components come from the
    * splitmix64 stream; sign signatures are in-order folds; cosine is
    * the engine's exact form (ascending-index dot / product of
    * ascending-index norms), so doubles are bit-equal. */
  private val sqlEmbedLshCtes: String = {
    import DuckMacros._
    // component key: mix64(seed ^ (p << 32) ^ d), seed = 7 + 1000*tb
    val comps = mix64Stages(
      s"(SELECT tb, p, d, ${xor64(xor64("(7 + 1000 * tb)", "p * 4294967296"), "d")} AS ck " +
        "FROM tpd)", "ck", "ch", Seq("tb", "p", "d"))
    s"""e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       | e2 AS (SELECT id, v,
       |         sqrt(list_reduce(list_prepend(0.0,
       |           list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
       |        FROM e),
       | -- identical-vector collapse: min-id rep per distinct vector
       | grp AS (SELECT v AS gv, min(id) AS rep FROM e GROUP BY v),
       | stars AS (SELECT g.rep AS id_a, e.id AS id_b
       |           FROM e JOIN grp g ON e.v = g.gv WHERE e.id <> g.rep),
       | -- auto planes from the REP count (buckets hold reps)
       | pl AS (SELECT GREATEST(2, LEAST(24,
       |          CAST(ceil(ln(GREATEST(1.0, count(*) / 64.0)) / ln(2)) AS INT))) AS planes
       |        FROM grp),
       | -- dims derived from the data (the Spark side iterates
       | -- vec.length), never hardcoded
       | tpd AS (SELECT tb, unnest(range(0, planes)) AS p, d
       |         FROM pl, (SELECT unnest(range(0, 4)) AS tb),
       |              (SELECT unnest(range(0, (SELECT max(len(v)) FROM e))) AS d)),
       | comp AS (SELECT tb, p, d,
       |           CASE WHEN ${bit64("ch", "0")} = 0 THEN 1.0 ELSE -1.0 END AS c
       |          FROM $comps),
       | cl AS (SELECT tb, p, list(c ORDER BY d) AS cs FROM comp GROUP BY tb, p),
       | rp AS (SELECT rep AS id, gv AS v FROM grp),
       | sg AS (SELECT id, tb, p,
       |         list_reduce(list_prepend(0.0,
       |           list_transform(range(1, len(v) + 1), k -> v[k] * cs[k])),
       |           (a, x) -> a + x) AS s
       |        FROM rp, cl),
       | sig AS (SELECT id, tb,
       |          CAST(sum(CASE WHEN s > 0.0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS INT)
       |            AS bucket
       |         FROM sg GROUP BY id, tb),
       | -- bucket cap: REP population per (table, bucket)
       | bsz AS (SELECT tb, bucket, count(*) AS bc FROM sig GROUP BY 1, 2),
       | keep AS (SELECT s.id, s.tb, s.bucket FROM sig s
       |          JOIN bsz ON bsz.tb = s.tb AND bsz.bucket = s.bucket
       |          WHERE bsz.bc <= $LshMaxBucket),
       | joined AS (SELECT a.id AS query_id, b.id AS cand_id
       |            FROM keep a JOIN keep b ON a.tb = b.tb AND a.bucket = b.bucket
       |              AND a.id <> b.id
       |            GROUP BY 1, 2),
       | allc AS (SELECT query_id, cand_id FROM joined
       |          UNION SELECT id_a, id_b FROM stars
       |          UNION SELECT id_b, id_a FROM stars),
       | scored AS (SELECT j.query_id, j.cand_id,
       |             list_reduce(list_prepend(0.0,
       |               list_transform(range(1, len(qa.v) + 1), k -> qa.v[k] * qb.v[k])),
       |               (a, x) -> a + x) / (qa.nrm * qb.nrm) AS cosine
       |            FROM allc j JOIN e2 qa ON qa.id = j.query_id
       |            JOIN e2 qb ON qb.id = j.cand_id)""".stripMargin
  }

  private val sqlEmbedAnnLsh: String =
    s"""WITH $sqlEmbedLshCtes,
       | ranked AS (SELECT query_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, cand_id) AS rank
       |            FROM scored)
       |SELECT query_id, cand_id, round(cosine, 6) + 0 AS cosine, rank
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Cosine threshold for the embedding near-dup clusters — below the
    * exact-duplicate regime on purpose so the synthetic corpus (max
    * pairwise cosine ~0.51) yields a non-trivial edge set; a
    * production run would set ~0.95+. Compared on the 6-decimal
    * rounding both engines share. */
  private val NearDupCosine = 0.4

  /** Embedding near-duplicate CLUSTERS — the vector twin of
    * q_docs_dup_clusters: LSH-bucketed candidate pairs
    * ([[Similarity.lshCosinePairs]] — ids-only bucket join, exact
    * cosine post-match), thresholded, then connected components via
    * the same distributed star contraction, each vector labeled with
    * its cluster's min id + size (groupBy+join, window-free). */
  private def qEmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    val all = embeds(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = Similarity.lshCosinePairs(all, planes = -1, tables = 4)
      .filter(round(col("cosine"), 6) >= NearDupCosine)
      .select(col("id_a"), col("id_b"))
    val labeled = Dedup.duplicateClusters(all.select(col("id")), pairs)
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, Seq("cluster_id"))
      .select(col("id").as("vec_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("vec_id"))
  }

  /** Full value oracle for the near-dup clusters: the LSH pair CTEs
    * (exact bucket collisions + bit-equal cosines) feed a recursive
    * min-label transitive closure — the same closure form as
    * sqlDupClusters. `scored` carries both directions of every
    * colliding pair, which is exactly the symmetric edge set the
    * closure needs. */
  private val sqlEmbedNearDup: String =
    s"""WITH RECURSIVE $sqlEmbedLshCtes,
       | ed AS (SELECT query_id AS src, cand_id AS dst FROM scored
       |        WHERE round(cosine, 6) >= $NearDupCosine),
       | n AS (SELECT vec_id AS id FROM embeddings),
       | reach AS (
       |   SELECT id, id AS lbl FROM n
       |   UNION
       |   SELECT ed.src AS id, r.lbl FROM reach r JOIN ed ON ed.dst = r.id),
       | lab AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
       |SELECT l.id AS vec_id, l.cluster_id,
       | count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
       |FROM lab l ORDER BY vec_id""".stripMargin

  /** Bucket-cap observability for the hyperplane-LSH paths
    * ([[Similarity.lshBucketOverflow]]): every (table, bucket) whose
    * REPRESENTATIVE population exceeds the threshold — what the capped
    * pair join would drop at that cap, never silently. Run at
    * maxBucket=1 so bucket collisions are visible in CI on the test
    * corpus (mirrors q_docs_minhash_overflow). */
  private def qEmbedLshOverflow(s: SparkSession, dir: String): DataFrame = {
    val all = embeds(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.lshBucketOverflow(all, planes = -1, tables = 4, maxBucket = 1)
      .orderBy(col("table"), col("bucket"))
  }

  private val sqlEmbedLshOverflow: String =
    s"""WITH $sqlEmbedLshCtes
       |SELECT tb AS "table", bucket, count(*) AS size FROM sig
       |GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY "table", bucket""".stripMargin

  /** IVF ANN (inverted file over a deterministic coarse quantizer,
    * multi-probe) — the second named scale path. This entry runs
    * `iters = 0` (init-only centroids: the k smallest-mix64(id)
    * vectors); the GENERIC distributed Lloyd step stays covered by
    * PipelineSpec's recall tests (its partial-sum order is
    * unmirrorable), and the deterministic one-step refinement is
    * value-oracled end-to-end by q_embed_ivf_lloyd below. */
  private def qEmbedIvf(s: SparkSession, dir: String): DataFrame = {
    val all = embeds(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfTopK(all, k = 3, nCells = 16, nProbe = 2, iters = 0)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Full value oracle for the IVF query: init centroids (16 smallest
    * mix64(id)), argmax-cosine cell assignment (first-max tie-break),
    * 2-cell multi-probe, bucket join, dedupe, rank — in SQL, with the
    * engine's exact float forms (single-pass cosineLocal is
    * dot/sqrt(na*nb); the pair score is dot/(sqrt(na)*sqrt(nb))). */
  private val sqlEmbedIvf: String = {
    import DuckMacros._
    val mixed = mix64Stages(
      "(SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, " +
        "CAST(vec_id AS BIGINT) AS h0 FROM embeddings)", "h0", "h", Seq("id", "v"))
    def dotf(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
        s"k -> ($a)[k] * ($b)[k])), (x, y) -> x + y)"
    def sqf(a: String) =
      s"list_reduce(list_prepend(0.0, list_transform($a, x -> x * x)), (x, y) -> x + y)"
    s"""WITH em AS (SELECT * FROM $mixed),
       | cents AS (SELECT row_number() OVER (ORDER BY h, id) - 1 AS cell, v AS cv,
       |            ${sqf("v")} AS cnb
       |           FROM em QUALIFY row_number() OVER (ORDER BY h, id) <= 16),
       | e2 AS (SELECT id, v, ${sqf("v")} AS na, sqrt(${sqf("v")}) AS nrm FROM em),
       | cellcos AS (SELECT e2.id, cents.cell,
       |              ${dotf("e2.v", "cents.cv")} / sqrt(e2.na * cents.cnb) AS cos
       |             FROM e2, cents),
       | assign AS (SELECT id, cell FROM (SELECT id, cell,
       |             row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) AS rk
       |            FROM cellcos) WHERE rk = 1),
       | probes AS (SELECT id, cell FROM (SELECT id, cell,
       |             row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) AS rk
       |            FROM cellcos) WHERE rk <= 2),
       | joined AS (SELECT q.id AS query_id, a.id AS cand_id
       |            FROM probes q JOIN assign a ON q.cell = a.cell AND q.id <> a.id
       |            GROUP BY 1, 2),
       | scored AS (SELECT j.query_id, j.cand_id,
       |             ${dotf("qa.v", "qb.v")} / (qa.nrm * qb.nrm) AS cosine
       |            FROM joined j JOIN e2 qa ON qa.id = j.query_id
       |            JOIN e2 qb ON qb.id = j.cand_id),
       | ranked AS (SELECT query_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, cand_id) AS rank
       |            FROM scored)
       |SELECT query_id, cand_id, round(cosine, 6) + 0 AS cosine, rank
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** IVF with ONE deterministic Lloyd refinement
    * ([[Similarity.ivfTopKLloyd]]): cell means summed in id order via
    * the sorted-buffer pattern, so — unlike the generic distributed
    * Lloyd step, whose partial-sum order no oracle can mirror — the
    * refined centroids and every downstream float are bit-reproducible
    * in SQL. Closes the refinement-oracle gap q_embed_ivf's iters=0
    * left open. */
  private def qEmbedIvfLloyd(s: SparkSession, dir: String): DataFrame = {
    val all = embeds(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.ivfTopKLloyd(all, k = 3, nCells = 16, nProbe = 2)
      .select(col("query_id"), col("cand_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Full value oracle for the Lloyd-refined IVF query: init centroids
    * (16 smallest mix64(id)), argmax-cosine assignment to init cells,
    * per-cell per-dim member sums folded IN ID ORDER (`list(v[d] ORDER
    * BY id)` + a pure fold — bit-equal to the JVM loop), mean = sum/n,
    * empty cells keep their init centroid, then the standard
    * assign/probe/score/rank tail over the REFINED centroids. */
  private val sqlEmbedIvfLloyd: String = {
    import DuckMacros._
    val mixed = mix64Stages(
      "(SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, " +
        "CAST(vec_id AS BIGINT) AS h0 FROM embeddings)", "h0", "h", Seq("id", "v"))
    def dotf(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
        s"k -> ($a)[k] * ($b)[k])), (x, y) -> x + y)"
    def sqf(a: String) =
      s"list_reduce(list_prepend(0.0, list_transform($a, x -> x * x)), (x, y) -> x + y)"
    s"""WITH em AS (SELECT * FROM $mixed),
       | cents0 AS (SELECT row_number() OVER (ORDER BY h, id) - 1 AS cell, v AS cv,
       |             ${sqf("v")} AS cnb
       |            FROM em QUALIFY row_number() OVER (ORDER BY h, id) <= 16),
       | e2 AS (SELECT id, v, ${sqf("v")} AS na, sqrt(${sqf("v")}) AS nrm FROM em),
       | cellcos0 AS (SELECT e2.id, cents0.cell,
       |               ${dotf("e2.v", "cents0.cv")} / sqrt(e2.na * cents0.cnb) AS cos
       |              FROM e2, cents0),
       | assign0 AS (SELECT id, cell FROM (SELECT id, cell,
       |              row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) AS rk
       |             FROM cellcos0) WHERE rk = 1),
       | mem AS (SELECT a.cell, e2.id, e2.v FROM assign0 a JOIN e2 ON e2.id = a.id),
       | dims AS (SELECT unnest(range(1, (SELECT max(len(v)) FROM em) + 1)) AS d),
       | -- per-cell per-dim member sum folded in id order: bit-equal
       | -- to the engine's sorted-buffer accumulation
       | sums AS (SELECT cell, d,
       |           list_reduce(list_prepend(0.0, list(v[d] ORDER BY id)),
       |             (x, y) -> x + y) AS s,
       |           count(*) AS n
       |          FROM mem, dims GROUP BY cell, d),
       | refined AS (SELECT cell, list(s / n ORDER BY d) AS cv FROM sums GROUP BY cell),
       | cents1 AS (SELECT c.cell, coalesce(r.cv, c.cv) AS cv,
       |             ${sqf("coalesce(r.cv, c.cv)")} AS cnb
       |            FROM cents0 c LEFT JOIN refined r ON r.cell = c.cell),
       | cellcos AS (SELECT e2.id, cents1.cell,
       |              ${dotf("e2.v", "cents1.cv")} / sqrt(e2.na * cents1.cnb) AS cos
       |             FROM e2, cents1),
       | assign AS (SELECT id, cell FROM (SELECT id, cell,
       |             row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) AS rk
       |            FROM cellcos) WHERE rk = 1),
       | probes AS (SELECT id, cell FROM (SELECT id, cell,
       |             row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) AS rk
       |            FROM cellcos) WHERE rk <= 2),
       | joined AS (SELECT q.id AS query_id, a.id AS cand_id
       |            FROM probes q JOIN assign a ON q.cell = a.cell AND q.id <> a.id
       |            GROUP BY 1, 2),
       | scored AS (SELECT j.query_id, j.cand_id,
       |             ${dotf("qa.v", "qb.v")} / (qa.nrm * qb.nrm) AS cosine
       |            FROM joined j JOIN e2 qa ON qa.id = j.query_id
       |            JOIN e2 qb ON qb.id = j.cand_id),
       | ranked AS (SELECT query_id, cand_id, cosine,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, cand_id) AS rank
       |            FROM scored)
       |SELECT query_id, cand_id, round(cosine, 6) + 0 AS cosine, rank
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------- language ID (rows-only + PipelineSpec) ----------------

  private def qLangId(s: SparkSession, dir: String): DataFrame =
    TextStats.languageId(docs(s, dir), "text", "lang")
      .select(col("doc_id"), col("lang"), col("predicted_lang"))
      .orderBy(col("doc_id"))

  // ---------------- multimodal plumbing ----------------

  private def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"))
      .orderBy(col("doc_id"))

  private val sqlMultimodalMeta =
    """SELECT doc_id, 'text/utf-8' AS format,
      | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  private def qMultimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeStage(Multimodal.withPayload(docs(s, dir), "text"))
      .select(col("doc_id"), col("meta.format").as("format"),
        col("features.n_bytes").as("n_bytes"),
        round(col("features.byte_mean"), 6).as("byte_mean"),
        round(col("features.byte_entropy"), 6).as("byte_entropy"),
        col("features.checksum").as("checksum"))
      .orderBy(col("doc_id"))

  /** REAL container-header decode over binary payloads: deterministic
    * minimal PNG/JPEG/WAV containers are built per document (this
    * sandbox ships no media files), then format + dimensions / audio
    * shape are parsed back from the raw bytes distributed
    * (Multimodal.sniffBytes — magic bytes, PNG IHDR, JPEG SOFn walk,
    * WAV fmt chunk). The oracle recomputes every field from the same
    * doc_id arithmetic. */
  private def qMultimodalSniff(s: SparkSession, dir: String): DataFrame = {
    val mk = udf((id: Long) => (id % 3) match {
      case 0 => Multimodal.syntheticPng((16 + id % 97).toInt, (16 + id % 53).toInt)
      case 1 => Multimodal.syntheticJpeg((16 + id % 97).toInt, (16 + id % 53).toInt)
      case _ => Multimodal.syntheticWav((8000 + (id % 5) * 4000).toInt, (1 + id % 2).toInt)
    })
    Multimodal.sniffStage(
        docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload")), "payload")
      .select(col("doc_id"),
        col("sniffed.format").as("format"),
        col("sniffed.n_bytes").as("n_bytes"),
        col("sniffed.width").as("width"),
        col("sniffed.height").as("height"),
        col("sniffed.sample_rate").as("sample_rate"),
        col("sniffed.channels").as("channels"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over deterministic synthetic animated GIFs: every
    * 2nd frame of a (1 + doc_id % 7)-frame container. The parser walks
    * the real GIF block structure; the oracle recomputes the expected
    * frame indices/offsets/delays in closed form from the generator's
    * layout (frame i's image descriptor at 13 + 23*i + 8, delay
    * 4 + i cs — Multimodal.syntheticGif scaladoc). */
  private def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val mk = udf((id: Long) => Multimodal.syntheticGif(
      (16 + id % 31).toInt, (16 + id % 17).toInt, (1 + id % 7).toInt))
    Multimodal.frameSampleStage(
        docs(s, dir).select(col("doc_id"), mk(col("doc_id")).as("payload")),
        "payload", everyK = 2)
      .select(col("doc_id"),
        col("frame.frame_idx").as("frame_idx"),
        col("frame.byte_offset").as("byte_offset"),
        col("frame.delay_cs").as("delay_cs"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val sqlMultimodalFrames =
    """SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      | CAST(13 + 23 * fi + 8 AS INT) AS byte_offset,
      | CAST(4 + fi AS INT) AS delay_cs
      |FROM documents, (SELECT unnest(range(0, 7)) AS fi)
      |WHERE fi < 1 + doc_id % 7 AND fi % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  private val sqlMultimodalSniff =
    """SELECT doc_id,
      | CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |  ELSE 'audio/wav' END AS format,
      | CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 42 ELSE 36 END AS BIGINT) AS n_bytes,
      | CAST(CASE WHEN doc_id % 3 IN (0, 1) THEN 16 + doc_id % 97 ELSE -1 END AS INT) AS width,
      | CAST(CASE WHEN doc_id % 3 IN (0, 1) THEN 16 + doc_id % 53 ELSE -1 END AS INT) AS height,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN 8000 + (doc_id % 5) * 4000 ELSE -1 END AS INT) AS sample_rate,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 2 ELSE -1 END AS INT) AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------- eval-set decontamination ----------------

  /** Word-trigram order for the containment check; 3 keeps the gram
    * space discriminative on the short synthetic docs (a production
    * run would use 8-13-gram windows — only this constant changes). */
  private val DecontamN = 3

  /** Held-out pseudo-eval set: every 29th doc_id. Deterministic, so
    * both engines and the tests agree without external data. */
  private val EvalMod = 29

  /** Training-corpus decontamination against a held-out eval set —
    * the step a real pretraining pipeline runs before training: flag
    * any training document sharing an exact word n-gram with the
    * benchmark/eval corpus (the n-gram containment rule used for
    * open-benchmark leakage scrubbing).
    *
    * Scale shape: the eval side of a 100 TB run is benchmark-sized
    * (MBs), so its DISTINCT gram set is collected into a broadcast
    * hash join — the training side streams through one scan + one
    * partial-aggregated groupBy(doc_id); no all-pairs work, no
    * shuffle of the corpus by gram. */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = docs(s, dir).select(col("doc_id"), col("lang"),
      Dedup.wordShingles(col("text"), DecontamN).as("sh"))
    val evalGrams = sh.filter(col("doc_id") % EvalMod === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val train = sh.filter(col("doc_id") % EvalMod =!= 0)
      .select(col("doc_id"), col("lang"), size(col("sh")).as("n_grams"), col("sh"))
    val hits = train.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
    train.drop("sh").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("n_hit"),
        r(when(col("n_grams") > 0,
            coalesce(col("hits"), lit(0L)).cast("double") / col("n_grams"))
          .otherwise(lit(0.0))).as("contamination"),
        (coalesce(col("hits"), lit(0L)) > 0).cast("int").as("is_contaminated"))
      .orderBy(col("doc_id"))
  }

  private val sqlDecontaminate =
    s"""WITH g AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       | sh AS (SELECT doc_id, lang,
       |         list_distinct(CASE WHEN len(toks) >= $DecontamN
       |           THEN list_transform(generate_series(1, len(toks) - ${DecontamN - 1}),
       |                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
       |           ELSE [] END) AS sh
       |        FROM g),
       | ev AS (SELECT DISTINCT unnest(sh) AS gram FROM sh
       |        WHERE doc_id % $EvalMod = 0),
       | tr AS (SELECT doc_id, lang, len(sh) AS n_grams, sh FROM sh
       |        WHERE doc_id % $EvalMod <> 0),
       | hits AS (SELECT t.doc_id, count(*) AS n_hit
       |          FROM (SELECT doc_id, unnest(sh) AS gram FROM tr) t
       |          JOIN ev USING (gram) GROUP BY 1)
       |SELECT t.doc_id, t.lang, t.n_grams, coalesce(h.n_hit, 0) AS n_hit,
       | round(CASE WHEN t.n_grams > 0
       |    THEN CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_grams
       |    ELSE 0.0 END + $JitterSql, $R) + 0 AS contamination,
       | CAST(coalesce(h.n_hit, 0) > 0 AS INT) AS is_contaminated
       |FROM tr t LEFT JOIN hits h USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // ---------------- deterministic stratified sampling ----------------

  /** Per-stratum row target for the balanced downsample — small
    * enough that the dominant strata of the test corpus are actually
    * downsampled (en is ~45% of docs). */
  private val SampleTarget = 60

  /** Balanced stratified downsampling with a DETERMINISTIC per-row
    * bernoulli draw — the corpus-mixing step of a training-data
    * pipeline (cap each language stratum at ~[[SampleTarget]] docs;
    * `source` rides along as an output column — a finer stratum key is
    * a one-line change to the grouping). The draw is `mix64(doc_id) >>> 11` scaled to [0, 1) — a
    * pure function of the row key, so the sample is reproducible
    * across runs/engines and stable under re-partitioning, unlike
    * `rand(seed)` whose stream is partition-order-dependent.
    *
    * Scale shape: stratum counts are a tiny partial-aggregated
    * groupBy broadcast back onto one corpus scan; the filter is
    * row-local (codegen'd [[graft.plans.Mix64Expression]]), so the
    * only corpus-wide shuffle is... none. */
  private def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    val d = docs(s, dir)
    val strata = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("rate",
        least(lit(1.0), lit(SampleTarget.toDouble) / col("n_stratum")))
    d.select(col("doc_id"), col("lang"), col("source"))
      .join(broadcast(strata), Seq("lang"))
      .withColumn("u",
        shiftrightunsigned(expr("mix64(doc_id)"), 11).cast("double")
          / 9007199254740992.0) // 2^53
      .filter(col("u") < col("rate"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_stratum"),
        r(col("rate")).as("rate"), r(col("u")).as("u"))
      .orderBy(col("doc_id"))
  }

  private val sqlSampleStratified = {
    val h = DuckMacros.mix64Stages("documents", "doc_id", "h",
      Seq("doc_id", "lang", "source"))
    s"""WITH st AS (SELECT lang, count(*) AS n_stratum,
       |             least(1.0, ${SampleTarget.toDouble} / count(*)) AS rate
       |            FROM documents GROUP BY 1),
       | hx AS (SELECT doc_id, lang, source,
       |         CAST(${DuckMacros.shr64("h", 11)} AS DOUBLE)
       |           / 9007199254740992.0 AS u
       |        FROM $h)
       |SELECT hx.doc_id, hx.lang, hx.source, st.n_stratum,
       | round(st.rate + $JitterSql, $R) + 0 AS rate,
       | round(hx.u + $JitterSql, $R) + 0 AS u
       |FROM hx JOIN st USING (lang)
       |WHERE hx.u < st.rate ORDER BY hx.doc_id""".stripMargin
  }

  // ---------------- sequence packing ----------------

  /** Tokens per packed training example. */
  private val PackBudget = 512L

  /** Concat-and-split sequence packing per language stream
    * ([[graft.operators.Packing]]): deterministic doc_id order,
    * hierarchical prefix sum (bounded chunk windows + a tiny chunk-
    * totals roll-up), integer-exact. chunkSize is set well below the
    * corpus size so the test data actually exercises the chunk merge
    * (PlanSpec asserts no unbounded per-language window exists). */
  private def qPack(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      TextStats.nTokens(col("text")).as("ntok"))
    Packing.pack(d, col("doc_id"), col("lang"), col("ntok"),
      budget = PackBudget, chunkSize = 100L)
      .select(col("id").as("doc_id"), col("group").as("lang"),
        col("n_tokens"), col("start_offset"), col("bin"))
      .orderBy(col("doc_id"))
  }

  private val sqlPack =
    s"""WITH g AS (SELECT doc_id, lang,
       |            CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ntok
       |           FROM documents),
       | c AS (SELECT doc_id, lang, ntok,
       |        sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
       |          ROWS UNBOUNDED PRECEDING) - ntok AS off
       |       FROM g)
       |SELECT doc_id, lang, ntok AS n_tokens,
       | CAST(off AS BIGINT) AS start_offset,
       | CAST(off // $PackBudget AS BIGINT) AS bin
       |FROM c ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_docs_pack" -> qPack _,
    "q_docs_decontaminate" -> qDecontaminate _,
    "q_docs_sample_stratified" -> qSampleStratified _,
    "q_docs_text_stats" -> qTextStats _,
    "q_docs_exact_dedup" -> qExactDedup _,
    "q_docs_ngram_jaccard" -> qNgramJaccard _,
    "q_docs_ngram_hot_shingles" -> qNgramHotShingles _,
    "q_docs_minhash_lsh" -> qMinHashLsh _,
    "q_docs_minhash_overflow" -> qMinHashOverflow _,
    "q_docs_simhash" -> qSimHash _,
    "q_docs_simhash_pairs" -> qSimHashPairs _,
    "q_docs_dup_clusters" -> qDupClusters _,
    "q_docs_dup_clusters_local" -> qDupClustersLocal _,
    "q_docs_langid" -> qLangId _,
    "q_embed_topk" -> qEmbedTopK _,
    "q_embed_ann_lsh" -> qEmbedAnnLsh _,
    "q_embed_neardup" -> qEmbedNearDup _,
    "q_embed_lsh_overflow" -> qEmbedLshOverflow _,
    "q_embed_ivf" -> qEmbedIvf _,
    "q_embed_ivf_lloyd" -> qEmbedIvfLloyd _,
    "q_multimodal_meta" -> qMultimodalMeta _,
    "q_multimodal_decode" -> qMultimodalDecode _,
    "q_multimodal_sniff" -> qMultimodalSniff _,
    "q_multimodal_frames" -> qMultimodalFrames _)

  val oracles: Map[String, String] = Map(
    "q_docs_pack" -> sqlPack,
    "q_docs_decontaminate" -> sqlDecontaminate,
    "q_docs_sample_stratified" -> sqlSampleStratified,
    "q_docs_text_stats" -> sqlTextStats,
    "q_docs_exact_dedup" -> sqlExactDedup,
    "q_docs_ngram_jaccard" -> sqlNgramJaccard,
    "q_docs_ngram_hot_shingles" -> sqlNgramHotShingles,
    "q_docs_simhash" -> sqlSimHash,
    "q_docs_simhash_pairs" -> sqlSimHashPairs,
    "q_docs_minhash_lsh" -> sqlMinHashLsh,
    "q_docs_minhash_overflow" -> sqlMinHashOverflow,
    "q_docs_dup_clusters" -> sqlDupClusters,
    "q_docs_dup_clusters_local" -> sqlDupClusters,
    "q_docs_langid" -> sqlLangId,
    "q_embed_topk" -> sqlEmbedTopK,
    "q_embed_ann_lsh" -> sqlEmbedAnnLsh,
    "q_embed_neardup" -> sqlEmbedNearDup,
    "q_embed_lsh_overflow" -> sqlEmbedLshOverflow,
    "q_embed_ivf" -> sqlEmbedIvf,
    "q_embed_ivf_lloyd" -> sqlEmbedIvfLloyd,
    "q_multimodal_meta" -> sqlMultimodalMeta,
    "q_multimodal_decode" -> sqlMultimodalDecode,
    "q_multimodal_sniff" -> sqlMultimodalSniff,
    "q_multimodal_frames" -> sqlMultimodalFrames)
}
