package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioural tests for the dedup / similarity / text / multimodal
  * operators whose hash streams have no SQL oracle. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Crafted corpus: 30 random docs + 5 planted near-duplicate pairs
    * (one-word edit) + 1 exact duplicate pair. */
  private def corpus: Seq[(Long, String)] = {
    val rng = new scala.util.Random(4242)
    val vocab = ('a' to 'z').map(_.toString)
    def doc(): String = Seq.fill(60)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val base = (0L until 30L).map(i => i -> doc())
    val nearDups = (0 until 5).map { i =>
      val (id, text) = base(i)
      val toks = text.split(" ")
      toks(30) = "zz" // one-token edit -> 2-gram jaccard ~ 0.95
      (100L + id) -> toks.mkString(" ")
    }
    val exactDup = Seq(200L -> base(10)._2)
    base ++ nearDups ++ exactDup
  }

  test("minhash-LSH finds every planted near-duplicate pair") {
    import spark.implicits._
    val df = corpus.toDF("id", "text")
      .withColumn("shingles", Dedup.wordShingles(col("text"), 2))
    val pairs = Dedup.minHashLshPairs(df, k = 16, bands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    // planted near-dups and the exact dup must all surface
    (0 until 5).foreach(i => assert(found.contains((i.toLong, 100L + i)), s"missing pair $i"))
    assert(found.contains((10L, 200L)))
    // exact dup: signature agreement and jaccard both 1
    val exact = pairs.find(p => p._1 == 10L && p._2 == 200L).get
    assert(exact._3 == 1.0 && exact._4 == 1.0)
    // high-jaccard pairs must have high signature agreement
    pairs.filter(_._4 > 0.9).foreach(p => assert(p._3 >= 0.5, s"est too low: $p"))
  }

  test("shingling splits on whitespace runs — a respaced clone pairs with its original") {
    import spark.implicits._
    val got = Seq(1).toDF("x")
      .select(Dedup.wordShingles(lit("foo  bar\tbaz qux"), 2).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(got.toSet == Set("foo bar", "bar baz", "baz qux"),
      s"double space / tab minted bad shingles: $got")
    // a clone differing only in spacing must minhash-pair with its
    // original at exact jaccard 1.0 (single-space splitting minted
    // empty tokens and "word "-style shingles that never matched)
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha  beta gamma\tdelta epsilon  zeta"),
      (2L, "totally different words over here entirely now")).toDF("id", "text")
      .withColumn("shingles", Dedup.wordShingles(col("text"), 2))
    val pairs = Dedup.minHashLshPairs(df, k = 16, bands = 4).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L &&
        r.getDouble(3) == 1.0),
      s"respaced clone did not pair: ${pairs.mkString(";")}")
    // every duplicate-verdict surface must agree on the respaced clone:
    // simhash and fingerprint use the same whitespace-run tokens
    val sigs = df.select(
        Dedup.simHashUdf(TextStats.tokensWs(col("text"))).as("sh"),
        TextStats.fingerprint(col("text")).as("fp"))
      .collect()
    assert(sigs(0).getLong(0) == sigs(1).getLong(0), "simhash differs on respaced clone")
    assert(sigs(0).getString(1) == sigs(1).getString(1), "fingerprint differs on respaced clone")
  }

  test("Lloyd-refined IVF handles a corpus smaller than the requested cell count") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val df = (0L until 10L).map(i => (i, Array.fill(8)(rng.nextGaussian()))).toDF("id", "vec")
    val cents = Similarity.trainIvfCentroidsLloyd1(df, k = 16)
    assert(cents.length == 10) // init sample bounded by the corpus
    assert(Similarity.ivfTopKLloyd(df, k = 2, nCells = 16).count() > 0)
  }

  test("minhash-LSH: 1000 identical docs collapse to linear star pairs, no B² bucket") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta " * 5
    val df = (0L until 1000L).map(i => (i, text)).toDF("id", "text")
      .withColumn("shingles", Dedup.wordShingles(col("text"), 2))
    val t0 = System.nanoTime()
    val pairs = Dedup.minHashLshPairs(df, k = 16, bands = 4).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // star expansion: exactly n-1 pairs, all against the min-id rep
    assert(pairs.length == 999, s"expected 999 star pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) == 0L))
    assert(pairs.forall(r => r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0))
    assert(secs < 30.0, s"duplicate-heavy corpus took ${secs}s - bucket blowup?")
  }

  test("simhash pairs: exact recall at hamming <= 3 against brute force") {
    import spark.implicits._
    // distinct signatures engineered around a base: hamming 1..5 from
    // id 0, plus unrelated values — output must be EXACTLY the <=3
    // pairs (pigeonhole recall guarantee over the 4x16-bit bands)
    val base = 0x0123456789abcdefL
    val sigs = Seq(
      0L -> base,
      1L -> (base ^ 1L),                        // hamming 1
      2L -> (base ^ (1L << 17) ^ (1L << 33)),   // hamming 2, two bands
      3L -> (base ^ (1L << 5) ^ (1L << 21) ^ (1L << 63)), // hamming 3, three bands
      4L -> (base ^ 0xf0L),                     // hamming 4 — out
      5L -> 0x7ea7beefL)                        // far away
    val df = sigs.toDF("id", "simhash")
    val got = Dedup.simHashPairs(df, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(got == want, s"got $got want $want")
  }

  test("simhash pairs: 1000 identical docs collapse to linear star pairs") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, 0x5eedL)).toDF("id", "simhash")
    val pairs = Dedup.simHashPairs(df).collect()
    assert(pairs.length == 999, s"expected 999 star pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) == 0L && r.getLong(2) == 0L))
    // one representative -> the overflow census sees no hot bucket
    assert(Dedup.simHashBucketOverflow(df).count() == 0L)
  }

  test("minhash-LSH: oversized buckets are capped and reported, not exploded") {
    import spark.implicits._
    // 40 distinct docs sharing most content -> most land in shared band buckets
    val df = (0L until 40L).map(i => (i, s"common one two three four five six w$i"))
      .toDF("id", "text")
      .withColumn("shingles", Dedup.wordShingles(col("text"), 2))
    val overflow = Dedup.minHashBucketOverflow(df, k = 16, bands = 4, maxBucket = 8)
    assert(overflow.count() > 0, "expected at least one overflowing bucket")
    // capped run completes and emits no pair from the oversized buckets' clique
    val capped = Dedup.minHashLshPairs(df, k = 16, bands = 4, maxBucket = 8).count()
    val uncapped = Dedup.minHashLshPairs(df, k = 16, bands = 4).count()
    assert(capped < uncapped, s"cap had no effect: $capped vs $uncapped")
  }

  test("duplicate clustering: transitive chains collapse to min-id components") {
    import spark.implicits._
    // components: {1,2,3,4} via chain, {10,11}, singletons 20, 21
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
    // drop-list predicate: keep exactly one doc per component
    assert(got.count { case (id, c) => id == c } == 4)
  }

  test("duplicate clustering: 10k-node path graph converges in O(log n) star rounds") {
    import spark.implicits._
    // worst case for min-label propagation (needs 10k rounds; the
    // round-2 implementation silently truncated at 20): a single chain
    // 0-1-2-...-9999. Star contraction must finish well within the cap.
    val n = 10000
    val ids = spark.range(n).toDF("id")
    val pairs = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val got = Dedup.duplicateClusters(ids, pairs, maxIters = 30)
      .agg(countDistinct(col("cluster_id")), max(col("cluster_id")), count(lit(1)))
      .head()
    assert(got.getLong(0) == 1L, "path graph must collapse to one component")
    assert(got.getLong(1) == 0L, "component label must be the min id")
    assert(got.getLong(2) == n.toLong)
  }

  test("duplicate clustering: bounded local finish equals the distributed fixpoint") {
    import spark.implicits._
    val n = 3000
    val ids = spark.range(n).toDF("id")
    // path graph + a disjoint triangle clique + singletons beyond n-10
    val pairs = spark.range(n - 10)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .union(Seq((2995L, 2997L), (2997L, 2999L), (2995L, 2999L))
        .toDF("id_a", "id_b"))
    val pure = Dedup.duplicateClusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hybrid = Dedup.duplicateClusters(ids, pairs, localFinishEdges = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hybrid == pure)
    assert(hybrid(2999L) == 2995L && hybrid(1500L) == 0L)
  }

  test("battery corpus runs >= 1 distributed star round and cleanup frees the checkpoint") {
    import graft.operators.Dedup
    // the same corpus + pair stream the driver battery clusters, with
    // local finish disabled: the oracle-green q_docs_dup_clusters path
    // must demonstrably execute the distributed large-star/small-star
    // contraction, not just the driver union-find tail
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), Dedup.wordShingles(col("text"), 2).as("shingles"))
    val edges = Dedup.minHashLshPairs(docs, k = 16, bands = 4)
      .filter(round(col("jaccard"), 6) >= 0.5)
      .select(col("id_a"), col("id_b"))
    // materialize the pair stream first: its signature cache has its
    // own (documented, ContextCleaner) lifecycle — this test scopes
    // leak detection to the clustering checkpoints
    edges.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = Dedup.duplicateClustersResult(docs.select(col("id")), edges,
      localFinishEdges = 0)
    assert(res.starRounds > 0,
      "battery-scale clustering must execute at least one distributed star round")
    assert(res.labels.count() > 0)
    res.cleanup()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"clustering left persistent RDDs behind: $leaked")
  }

  test("duplicate clustering: non-convergence throws instead of returning split labels") {
    import spark.implicits._
    val n = 512
    val ids = spark.range(n).toDF("id")
    val pairs = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(ids, pairs, maxIters = 1).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty-shingle (short) docs are excluded from LSH pairing, not declared duplicates") {
    import spark.implicits._
    // single-token docs shingle to empty sets and share the all-max
    // signature; pairing them would mark every short doc a duplicate
    // of the min-id one and the drop-list would silently delete them
    val df = Seq((1L, "x"), (2L, "y"), (3L, "alpha beta gamma delta"),
        (4L, "alpha beta gamma delta"))
      .toDF("id", "text")
      .withColumn("shingles", Dedup.wordShingles(col("text"), 2))
    val pairs = Dedup.minHashLshPairs(df, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.toSeq == Seq((3L, 4L, 1.0)),
      s"only the real duplicate pair must surface, got ${pairs.toSeq}")
    // the J(empty,empty)=1 column convention itself is unchanged
    // (engine-agreement guard for direct use of the jaccard column)
    val j = df.filter(col("id") <= 2).select(col("id"), col("shingles"))
      .crossJoin(df.filter(col("id") === 2).select(col("shingles").as("b")))
      .filter(col("id") === 1)
      .select(Dedup.jaccard(col("shingles"), col("b"))).head().getDouble(0)
    assert(j == 1.0)
  }

  test("minhash signatures are deterministic and permutation-count-sized") {
    val sh = Seq("a b", "b c", "c d", "d e")
    val s1 = Dedup.minHashSignature(sh, 16, 42L)
    val s2 = Dedup.minHashSignature(sh.reverse, 16, 42L)
    assert(s1.toSeq == s2.toSeq) // set semantics: order-invariant
    assert(s1.length == 16)
    assert(Dedup.bandHashes(s1, 4).length == 4)
  }

  test("simhash: identical texts collide, near texts are close, random texts far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val rng = new scala.util.Random(7)
    val toks = Seq.fill(100)(rng.nextInt(1000).toString)
    val same = Dedup.simHash(toks)
    assert(Dedup.simHash(toks) == same)
    val near = Dedup.simHash(toks.updated(3, "x").updated(50, "y"))
    val far = Dedup.simHash(Seq.fill(100)(rng.nextInt(1000).toString + "q"))
    assert(hamming(same, near) < 12, s"near hamming ${hamming(same, near)}")
    assert(hamming(same, far) > 12, s"far hamming ${hamming(same, far)}")
  }

  test("hyperplane LSH ANN: buckets partition, cosines exact, recall reasonable") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val brute = Similarity.bruteForceTopK(all.filter(col("id") < 50), all, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lsh = Similarity.lshTopK(all, planes = 4, k = 5, tables = 4)
      .filter(col("query_id") < 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // cosine values agree exactly between the two paths for shared pairs
    val bruteMap = brute.map(t => (t._1, t._2) -> t._3).toMap
    lsh.foreach { case (q, c, cos) =>
      bruteMap.get((q, c)).foreach(bc => assert(math.abs(bc - cos) < 1e-12))
    }
    // recall@5 of the multi-table path vs exact (4 planes x 4 tables)
    val bruteTop = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lshTop = lsh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bruteTop.collect { case (q, bs) if lshTop.contains(q) =>
      (bs & lshTop(q)).size.toDouble / bs.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall > 0.35, s"recall@5 $recall")
  }

  test("auto-planes: plane count scales log2 with corpus size; auto mode keeps recall") {
    // derived planes grow with n so per-bucket occupancy stays ~targetBucket
    assert(Similarity.autoPlanes(100, 64) == 2)
    assert(Similarity.autoPlanes(2048, 64) == 5)
    assert(Similarity.autoPlanes(2048L << 10, 64) == 15)
    assert(Similarity.autoPlanes(Long.MaxValue, 64) == 24) // capped
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val brute = Similarity.bruteForceTopK(all.filter(col("id") < 30), all, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val auto = Similarity.lshTopK(all, planes = -1, k = 5, tables = 4)
      .filter(col("query_id") < 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.collect { case (q, bs) if auto.contains(q) =>
      (bs & auto(q)).size.toDouble / bs.size
    }
    assert(recalls.sum / recalls.size > 0.35,
      s"auto-planes recall ${recalls.sum / recalls.size}")
  }

  test("IVF ANN: deterministic centroids, exact cosines, recall beats single-cell") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // deterministic training
    val c1 = Similarity.trainIvfCentroids(all, 8)
    val c2 = Similarity.trainIvfCentroids(all, 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 8 && c1.head.length == 64)

    val brute = Similarity.bruteForceTopK(all.filter(col("id") < 50), all, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val bruteMap = brute.map(t => (t._1, t._2) -> t._3).toMap
    val bruteTop = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recallOf(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(all, k = 5, nCells = 8, nProbe = nProbe)
        .filter(col("query_id") < 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // cosines agree exactly with the brute path for shared pairs
      ivf.foreach { case (q, c, cos) =>
        bruteMap.get((q, c)).foreach(bc => assert(math.abs(bc - cos) < 1e-12))
      }
      val ivfTop = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = bruteTop.collect { case (q, bs) if ivfTop.contains(q) =>
        (bs & ivfTop(q)).size.toDouble / bs.size
      }
      rs.sum / rs.size
    }
    val r1 = recallOf(1)
    val r4 = recallOf(4)
    assert(r4 >= r1, s"multi-probe must not lose recall: $r1 -> $r4")
    assert(r4 > 0.5, s"recall@5 with 4/8 cells probed: $r4")
  }

  test("deterministic Lloyd step bit-matches a local in-id-order reference") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val data = (0L until 100L).map(i => (i, Array.fill(8)(rng.nextGaussian())))
    val df = data.toDF("id", "vec").repartition(7) // partial order must not matter
    val k = 5
    val got = Similarity.trainIvfCentroidsLloyd1(df, k)
    // local reference: same init, argmax-cosine assign, id-order mean
    val vecs = df.select(col("id"), Similarity.asDouble(col("vec")).as("v"))
    val init = Similarity.centroidInitSample(vecs, k)
      .as[Seq[Double]].collect().map(_.toArray)
    val byCell = data.sortBy(_._1)
      .groupBy { case (_, v) => Similarity.nearestCentroid(v, init)._1 }
    val expect = Array.tabulate(k) { c =>
      byCell.get(c) match {
        case Some(ms) =>
          val acc = new Array[Double](8)
          ms.foreach { case (_, v) => (0 until 8).foreach(i => acc(i) += v(i)) }
          acc.map(_ / ms.length)
        case None => init(c)
      }
    }
    (0 until k).foreach { c =>
      assert(got(c).toSeq.map(java.lang.Double.doubleToLongBits) ==
        expect(c).toSeq.map(java.lang.Double.doubleToLongBits), s"cell $c not bit-equal")
    }
  }

  test("embedding near-dup: planted near-identical vectors cluster, distant ones stay apart") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    def vec(): Array[Double] = Array.fill(32)(rng.nextGaussian())
    // 20 random vectors; ids 100+i are tiny perturbations of ids 0..4
    val base = (0L until 20L).map(i => (i, vec()))
    val dups = (0 until 5).map { i =>
      (100L + i) -> base(i)._2.map(x => x + rng.nextGaussian() * 0.01)
    }
    val df = (base ++ dups).toDF("id", "vec")
    val pairs = Similarity.lshCosinePairs(df, planes = 3, tables = 6)
      .filter(col("cosine") >= 0.98)
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.duplicateClusters(df.select(col("id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach(i =>
      assert(labels(100L + i) == i.toLong, s"planted near-dup $i not clustered"))
    // the non-perturbed vectors stay singletons
    (5L until 20L).foreach(i => assert(labels(i) == i))
    // symmetric sanity: every pair cosine is within [-1, 1]
    val cos = Similarity.lshCosinePairs(df, planes = 2, tables = 2)
      .select(col("cosine")).collect().map(_.getDouble(0))
    assert(cos.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  test("hyperplane LSH: 1000 identical embeddings collapse to linear star pairs") {
    import spark.implicits._
    // the normal near-dup case: a corpus dominated by one duplicated
    // vector. Identical vectors collide in EVERY table at any plane
    // count, so without the collapse the ids-only self-join emits
    // ~n²/2 pairs per table; with it, n-1 star pairs and ONE bucket
    // occupant (the minhash guard ported to vectors)
    val v = Array.tabulate(16)(d => math.sin(d + 1.0))
    val dupes = (0L until 1000L).map(i => (i, v))
    val distinct = (2000L until 2010L).map(i =>
      (i, Array.tabulate(16)(d => math.cos(d * (i - 1999.0)))))
    val df = (dupes ++ distinct).toDF("id", "vec")
    val t0 = System.nanoTime()
    val pairs = Similarity.lshCosinePairs(df, planes = -1, tables = 4).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val cliquePairs = pairs.filter(r => r.getLong(0) < 1000L && r.getLong(1) < 1000L)
    assert(cliquePairs.length == 999,
      s"expected 999 linear star pairs for the clique, got ${cliquePairs.length}")
    assert(cliquePairs.forall(_.getLong(0) == 0L), "star pairs must anchor at the min-id rep")
    assert(cliquePairs.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))
    assert(secs < 30.0, s"duplicate-heavy corpus took ${secs}s - bucket blowup?")
    // member top-k resolves to its rep (cluster-rep pairing contract)
    val top = Similarity.lshTopK(df, planes = -1, k = 1, tables = 4)
      .filter(col("query_id") === 500L).collect()
    assert(top.length == 1 && top(0).getLong(1) == 0L)
  }

  test("hyperplane LSH: oversized buckets are capped and reported, not exploded") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // 60 DISTINCT vectors built around one direction: most land in the
    // same sign-signature buckets without being identical, so the
    // identical-vector collapse cannot help — only the cap can
    val anchor = Array.fill(16)(rng.nextGaussian())
    val df = (0L until 60L).map { i =>
      (i, anchor.map(x => x * (1.0 + 0.001 * (i + 1))))
    }.toDF("id", "vec")
    val overflow = Similarity.lshBucketOverflow(df, planes = 3, tables = 4, maxBucket = 8)
    assert(overflow.count() > 0, "expected at least one overflowing bucket")
    val capped = Similarity.lshCosinePairs(df, planes = 3, tables = 4, maxBucket = 8).count()
    val uncapped = Similarity.lshCosinePairs(df, planes = 3, tables = 4).count()
    assert(capped < uncapped, s"cap had no effect: $capped vs $uncapped")
  }

  test("BPE-ish token count: letter/digit runs one token, symbols one each") {
    import spark.implicits._
    val cases = Seq(
      "Hello, world!" -> 4,          // Hello , world !
      "it's 2026-08-17" -> 8,        // it ' s 2026 - 08 - 17
      "  spaced   out  " -> 2,
      "x2go" -> 3,                   // x 2 go
      "a\u000Bb" -> 2,            // vertical tab IS whitespace on both engines
      "" -> 0)
    val got = cases.map(_._1).toDF("text")
      .select(TextStats.nTokensBpe(col("text"))).collect().map(_.getInt(0))
    assert(got.toSeq == cases.map(_._2),
      s"got ${got.toSeq} want ${cases.map(_._2)}")
    // same counts from a plain Java-regex reference (the oracle's RE2
    // agrees by the disjoint-class construction)
    val p = java.util.regex.Pattern.compile(TextStats.BpeTokenPattern)
    val ref = cases.map { case (t, _) =>
      val m = p.matcher(t); var n = 0; while (m.find()) n += 1; n }
    assert(ref == cases.map(_._2))
  }

  test("fingerprint is word-order and repetition invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta"),
      (3L, "beta beta gamma alpha alpha"),
      (4L, "alpha beta delta")).toDF("id", "text")
      .select(col("id"), TextStats.fingerprint(col("text")).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(2L) == fp(3L))
    assert(fp(1L) != fp(4L))
  }

  test("multimodal sniffing parses real container headers, never throws") {
    val png = Multimodal.sniffBytes(Multimodal.syntheticPng(640, 480))
    assert(png.format == "image/png" && png.width == 640 && png.height == 480)
    val jpg = Multimodal.sniffBytes(Multimodal.syntheticJpeg(1920, 1080))
    assert(jpg.format == "image/jpeg" && jpg.width == 1920 && jpg.height == 1080)
    val wav = Multimodal.sniffBytes(Multimodal.syntheticWav(44100, 2))
    assert(wav.format == "audio/wav" && wav.sample_rate == 44100 && wav.channels == 2)
    assert(wav.width == -1 && png.sample_rate == -1)
    // malformed / truncated / empty payloads degrade, never fail
    assert(Multimodal.sniffBytes(null).format == "application/octet-stream")
    assert(Multimodal.sniffBytes(Array[Byte]()).format == "application/octet-stream")
    assert(Multimodal.sniffBytes("plain text bytes".getBytes).format
      == "application/octet-stream")
    assert(Multimodal.sniffBytes(
      Multimodal.syntheticPng(9, 9).take(12)).format == "application/octet-stream")
    val truncJpeg = Multimodal.syntheticJpeg(5, 5).take(6)
    assert(Multimodal.sniffBytes(truncJpeg).format == "application/octet-stream")
    // JPEG walk skips non-SOF segments (APP0 comes first in the builder)
    assert(jpg.n_bytes == Multimodal.syntheticJpeg(1920, 1080).length.toLong)
  }

  test("GIF frame index: synthetic roundtrip, GCT offsets, malformed safety") {
    import spark.implicits._
    // roundtrip on the deterministic builder
    val gif = Multimodal.syntheticGif(20, 10, 5)
    val frames = Multimodal.gifFrameIndex(gif)
    assert(frames.map(_.frame_idx) == Seq(0, 1, 2, 3, 4))
    assert(frames.map(_.byte_offset) == (0 until 5).map(i => 13 + 23 * i + 8))
    assert(frames.map(_.delay_cs) == Seq(4, 5, 6, 7, 8))
    assert(Multimodal.sniffBytes(gif).format == "image/gif")
    assert(Multimodal.sniffBytes(gif).width == 20)
    // a global color table shifts every offset by its 3*2^(N+1) bytes
    val withGct = {
      val b = gif.clone()
      b(10) = 0x80.toByte // GCT flag, size bits 0 -> 2 entries, 6 bytes
      val out = new Array[Byte](b.length + 6)
      System.arraycopy(b, 0, out, 0, 13)
      System.arraycopy(b, 13, out, 19, b.length - 13)
      out
    }
    assert(Multimodal.gifFrameIndex(withGct).map(_.byte_offset) ==
      (0 until 5).map(i => 19 + 23 * i + 8))
    // malformed and truncated payloads never throw
    assert(Multimodal.gifFrameIndex(null).isEmpty)
    assert(Multimodal.gifFrameIndex("not a gif at all".getBytes).isEmpty)
    assert(Multimodal.gifFrameIndex(gif.take(30)).size <= 1) // truncated mid-frame
    val rng = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      Multimodal.gifFrameIndex(
        "GIF89a".getBytes ++ Array.fill(40)(rng.nextInt().toByte))
    }
    // the stage explodes every 2nd frame only
    val rows = Multimodal.frameSampleStage(
        Seq((1L, gif)).toDF("doc_id", "payload"), "payload", everyK = 2)
      .select(col("frame.frame_idx")).as[Int].collect()
    assert(rows.toSeq == Seq(0, 2, 4))
  }

  test("multimodal stub decode: deterministic byte stats") {
    val payload = "hello world".getBytes("UTF-8")
    val f = Multimodal.decodeBytes(payload)
    assert(f.n_bytes == 11L)
    assert(math.abs(f.byte_mean - payload.map(_ & 0xff).sum.toDouble / 11) < 1e-12)
    assert(f.checksum == Multimodal.decodeBytes(payload).checksum)
    // uniform bytes -> entropy = 8 bits
    val uniform = Array.tabulate[Byte](256)(_.toByte)
    assert(math.abs(Multimodal.decodeBytes(uniform).byte_entropy - 8.0) < 1e-9)
    // constant bytes -> entropy 0
    assert(Multimodal.decodeBytes(Array.fill[Byte](64)(7)).byte_entropy == 0.0)
  }

  test("decontamination matches a local trigram-containment recompute") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val toks = t.trim.split(" ")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val evalGrams = rows.filter(_._1 % 29 == 0).values.flatMap(grams).toSet
    val expected = rows.collect { case (id, t) if id % 29 != 0 =>
      val g = grams(t)
      id -> (g.size, g.count(evalGrams.contains))
    }
    val out = graft.SparkEntry.queries("q_docs_decontaminate")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3).toInt)).toMap
    assert(out.keySet == expected.keySet) // eval docs excluded
    expected.foreach { case (id, (ng, nh)) =>
      assert(out(id) == ((ng, nh)), s"doc $id: got ${out(id)}, want ($ng, $nh)")
    }
    assert(expected.values.exists(_._2 > 0),
      "fixture should contain at least one contaminated doc")
  }

  test("stratified sampler: deterministic splitmix draw honors per-stratum rate") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q_docs_sample_stratified")
    val a = q(spark, dir).collect()
    val b = q(spark, dir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq) // reproducible
    // every kept row's draw is below its stratum rate, and the draw
    // matches the JVM mix64 recompute bit-for-bit (pre-rounding the
    // query rounds; recompute with the same rounding)
    a.foreach { r =>
      val id = r.getLong(0)
      val u = r.getDouble(5)
      val uRe = BigDecimal((Dedup.mix64(id) >>> 11).toDouble / 9007199254740992.0
        + 1.2345e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(u == uRe, s"doc $id draw mismatch: $u vs $uRe")
      assert(u <= r.getDouble(4) + 1e-6, s"doc $id kept above stratum rate")
    }
    // strata under the target keep everything
    val kept = a.map(_.getLong(0)).toSet
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perLang = all.groupBy(_._2)
    perLang.foreach { case (lang, docs) =>
      if (docs.length <= 60)
        docs.foreach { case (id, _) =>
          assert(kept.contains(id), s"under-target stratum $lang dropped $id") }
    }
  }

  test("hierarchical packing equals the single-stream layout at any chunk size") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = (0L until 400L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", 1 + rng.nextInt(300))).toSeq
    val df = docs.toDF("doc_id", "lang", "ntok")
    // expected: plain per-group running offset in doc_id order
    val expected = docs.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(_._1).scanLeft((-1L, "", 0, 0L)) { case ((_, _, _, cum), (id, l, t)) =>
        (id, l, t, cum + t)
      }.drop(1).map { case (id, _, t, cumAfter) => id -> (cumAfter - t) }
    }.toMap
    for (chunk <- Seq(1L, 7L, 64L, 1000L)) {
      val out = Packing.pack(df, col("doc_id"), col("lang"), col("ntok"),
        budget = 128L, chunkSize = chunk).collect()
      assert(out.length == 400)
      out.foreach { r =>
        val (id, off, bin) = (r.getLong(0), r.getLong(3), r.getLong(4))
        assert(off == expected(id), s"chunk=$chunk doc $id offset")
        assert(bin == off / 128L, s"chunk=$chunk doc $id bin")
      }
    }
  }

  test("packing plan: every corpus window is chunk-bounded (no whole-group window)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = s2.range(100).select(col("id").as("doc_id"),
      lit("en").as("lang"), lit(5).as("ntok"))
    val packed = Packing.pack(df, col("doc_id"), col("lang"), col("ntok"),
      budget = 64L, chunkSize = 10L)
    val windows = packed.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      // the per-row cumsum must be chunk-bounded; the only group-keyed
      // window is over the tiny chunk-totals table (one row per chunk)
      val rowsPerPartitionBounded = keys.contains("_chunk")
      val isChunkTotals = w.child.output.map(_.name).contains("_chunk_tok")
      assert(rowsPerPartitionBounded || isChunkTotals,
        s"unbounded window over $keys:\n$w")
    }
  }

  test("sessionization splits exactly at gaps over the threshold") {
    import spark.implicits._
    // conv A: gaps 10, 5000, 10 with threshold 1800 -> sessions [0,0,1,1]
    // conv B: all gaps small -> one session
    val turns = Seq(
      ("A", 0, 0.0, 2.0), ("A", 1, 10.0, 3.0), ("A", 2, 5010.0, 5.0),
      ("A", 3, 5020.0, 7.0),
      ("B", 0, 0.0, 1.0), ("B", 1, 100.0, 1.0), ("B", 2, 200.0, 1.0))
      .toDF("conv_id", "turn_idx", "t", "m")
    val out = graft.engine.Sessionize.sessions(turns, gapSeconds = 1800.0)
      .orderBy("conv_id", "session_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("A", 0L, 2L, 10.0), ("A", 1L, 2L, 10.0), ("B", 0L, 3L, 200.0)))
    // boundary: a gap EXACTLY at the threshold does not split (strict >)
    val edge = Seq(("C", 0, 0.0, 1.0), ("C", 1, 1800.0, 1.0))
      .toDF("conv_id", "turn_idx", "t", "m")
    assert(graft.engine.Sessionize.sessions(edge, 1800.0).count() == 1)
  }

  test("sessionize chunked prefix equals the single-window form at any chunk size") {
    import spark.implicits._
    // irregular cadence with gaps straddling chunk boundaries
    val rng = new scala.util.Random(99)
    var t = 0.0
    val turns = (0 until 500).map { i =>
      t += (if (rng.nextDouble() < 0.07) 4000.0 else rng.nextDouble() * 100)
      (s"c${i % 3}", i / 3, t, rng.nextInt(50).toDouble)
    }.toDF("conv_id", "turn_idx", "t", "m")
    val reference = graft.engine.Sessionize
      .sessions(turns, gapSeconds = 1800.0, chunkSize = Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (chunk <- Seq(1L, 7L, 64L, 1L << 16)) {
      val got = graft.engine.Sessionize.sessions(turns, 1800.0, chunkSize = chunk)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == reference, s"chunkSize=$chunk diverged")
    }
  }

  test("sessionize accepts non-orderable (map-typed) payload columns") {
    import spark.implicits._
    // the chunk-buffer sort is keyed on (_t, _ti) via an array_sort
    // comparator, so payload columns need not be ORDERABLE — a
    // map-typed column (rejected by a sort_array over the full row
    // struct at analysis time) must pass through unchanged
    val turns = Seq(
      ("A", 0, 0.0, Map("k" -> 1)), ("A", 1, 10.0, Map("k" -> 2)),
      ("A", 2, 5010.0, Map("k" -> 3)))
      .toDF("conv_id", "turn_idx", "t", "meta")
    val out = graft.engine.Sessionize.assign(turns, gapSeconds = 1800.0)
      .orderBy("turn_idx").collect()
    assert(out.map(_.getLong(4)).toSeq == Seq(0L, 0L, 1L))
    assert(out.map(_.getMap[String, Int](3)("k")).toSeq == Seq(1, 2, 3))
  }

  test("sessionize handles a million-turn conversation with bounded window tasks") {
    // one adversarially long conversation; every corpus window task is
    // bounded by chunkSize rows by construction — the whole conv never
    // buffers in a single window task
    val turns = spark.range(1000000L).select(
      lit("mega").as("conv_id"), col("id").cast("int").as("turn_idx"),
      // a >gap silence every 100k turns -> 10 sessions
      (col("id") * 10.0 + (col("id") / 100000L).cast("long") * 10000.0).as("t"),
      lit(1.0).as("m"))
    val out = graft.engine.Sessionize
      .sessions(turns, gapSeconds = 5000.0, chunkSize = 1L << 14)
      .orderBy(col("session_idx"))
      .collect()
    assert(out.length == 10, s"expected 10 sessions, got ${out.length}")
    assert(out.map(_.getLong(2)).sum == 1000000L)
  }

  test("sessionize plan: every corpus window is chunk-bounded (no whole-conversation window)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val turns = s2.range(100).select(
      concat(lit("c"), (col("id") % 2).cast("string")).as("conv_id"),
      col("id").cast("int").as("turn_idx"), (col("id") * 10.0).as("t"),
      lit(1.0).as("m"))
    val df = graft.engine.Sessionize.assign(turns, 1800.0, chunkSize = 10L)
    val windows = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      // the ONLY windows allowed run over the per-chunk roll-up rows
      // (one row per chunk — child carries the chunk buffer/scalars),
      // never over the exploded per-turn corpus
      val isChunkRollup = w.child.output.map(_.name)
        .exists(n => n == "pts" || n == "_gaps" || n == "_last_t")
      assert(keys.contains("_chunk") || isChunkRollup,
        s"whole-conversation window over $keys:\n$w")
    }
  }

  test("language ID mechanism: separable corpora classify correctly") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val en = Seq("the", "cat", "sat", "on", "mat", "dog", "runs")
    val fr = Seq("le", "chat", "est", "sur", "tapis", "chien", "court")
    def mk(v: Seq[String]): String = Seq.fill(30)(v(rng.nextInt(v.length))).mkString(" ")
    val docs = ((0 until 20).map(i => (i.toLong, mk(en), "en")) ++
      (20 until 40).map(i => (i.toLong, mk(fr), "fr"))).toDF("doc_id", "text", "lang")
    val out = TextStats.languageId(docs, "text", "lang")
      .select(col("lang"), col("predicted_lang")).collect()
    val acc = out.count(r => r.getString(0) == r.getString(1)).toDouble / out.length
    assert(acc == 1.0, s"separable corpora should classify perfectly, got $acc")
  }
}
