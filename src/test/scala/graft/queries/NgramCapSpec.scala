package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The n-gram Jaccard document-frequency cap: identical output when
  * the cap is above the corpus max DF, bounded pair blowup when a
  * stop-shingle saturates, and the dropped shingles observable. */
class NgramCapSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ngram-cap")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 24 docs in one (lang, source) block: 4 planted near-dup pairs +
    * unrelated fillers. Max DF stays tiny. */
  private def smallCorpus = {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val vocab = ('a' to 'z').map(c => s"w$c")
    def doc() = Seq.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val base = (0L until 20L).map(i => (i, "en", "web", doc()))
    val dups = (0 until 4).map { i =>
      val toks = base(i)._4.split(" "); toks(20) = "edited"
      (100L + i, "en", "web", toks.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "lang", "source", "text")
  }

  test("cleanup handle unpersists the shingle table and inverted index deterministically") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (pairs, cleanup) = PipelineQueries.ngramJaccardPairsResult(smallCorpus, maxDf = 128)
    assert(pairs.count() > 0)
    cleanup()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"ngram caches left persistent RDDs behind: $leaked")
  }

  test("cap above the corpus max DF leaves the pair output identical") {
    val loose = PipelineQueries.ngramJaccardPairs(smallCorpus, maxDf = 1 << 20)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).sorted.toSeq
    val capped = PipelineQueries.ngramJaccardPairs(smallCorpus, maxDf = 128)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).sorted.toSeq
    assert(loose.nonEmpty, "planted near-dups must pair")
    assert(loose == capped)
  }

  test("1k docs sharing one stop-shingle: capped pair count stays bounded") {
    import spark.implicits._
    // every doc contains the same hot bigram ("of the") plus unique tail:
    // uncapped, the hot posting alone contributes ~1M pair rows
    val df = (0L until 1000L)
      .map(i => (i, "en", "web", s"of the unique$i tail$i marker$i"))
      .toDF("doc_id", "lang", "source", "text")
    val t0 = System.nanoTime()
    val n = PipelineQueries.ngramJaccardPairs(df, maxDf = 64).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 0, s"hot-shingle-only overlaps must not pair, got $n")
    assert(secs < 30.0, s"capped run took ${secs}s — posting blowup?")
  }

  test("dropped hot shingles surface in the observability report") {
    import spark.implicits._
    val df = (0L until 50L)
      .map(i => (i, "en", "web", s"of the unique$i tail$i"))
      .toDF("doc_id", "lang", "source", "text")
    val hot = df.select(col("lang"), col("source"),
        explode(graft.operators.Dedup.wordShingles(col("text"), 2)).as("g"))
      .groupBy(col("lang"), col("source"), col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > 8)
      .collect()
    assert(hot.map(_.getString(2)).toSet == Set("of the"),
      s"expected the planted stop-shingle, got ${hot.toSeq}")
  }
}
