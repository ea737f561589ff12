package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines, all as Catalyst column
 * expressions (codegen'd, no UDFs): token counting, lexical quality
 * scoring, document fingerprinting, and a corpus-trained n-gram
 * language-ID scorer (the tiny per-language profile is learned with
 * one aggregation, collected — it is model-sized, not data-sized —
 * and shipped back as a broadcast literal map).
 */
object TextStats {

  /** Single-space tokens. This is the COUNTING convention: the
    * ratio/length stats below are exact for single-space-joined text
    * (avgTokenLen's chars-minus-spaces identity depends on it), and
    * empty tokens minted by irregular spacing are a legitimate
    * quality SIGNAL for this surface. Duplicate-verdict surfaces
    * (minhash shingles, simhash, fingerprint) tokenize on whitespace
    * RUNS instead — [[tokensWs]] — so a respaced clone gets the same
    * near-dup verdict from every dedup operator. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Whitespace-run tokens — the dedup-surface convention, matching
    * [[Dedup.wordShingles]] (the explicit `[ \t\n\f\r]+` class, i.e.
    * RE2 `\s` semantics exactly as the oracles'
    * `regexp_split_to_array(trim(text), '\s+')` — Java's `\s` also
    * matches \x0B and would diverge; see [[Dedup.WsRun]]). */
  def tokensWs(text: Column): Column = split(trim(text), Dedup.WsRun)

  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-regex token count: letter runs and digit runs
    * are one token each, every other non-space character is its own
    * token — the shape of a byte-pair pre-tokenizer's word/number/
    * punctuation split, without a vocab. The alternatives are DISJOINT
    * character classes, so Java regex (Spark) and RE2 (DuckDB
    * `regexp_extract_all`) tokenize identically by construction — no
    * leftmost-first vs leftmost-longest hazard, no lookarounds (RE2
    * has none). The whitespace set is spelled out EXPLICITLY instead
    * of `\s` because the engines disagree on vertical tab (Java `\s`
    * includes \x0B, RE2's does not) — a shorthand class here would
    * silently diverge the two sides on a VT-bearing document. */
  val BpeTokenPattern: String =
    "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  def nTokensBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  def nDistinctTokens(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length, exact for single-space-joined text:
    * (chars - spaces) / tokens. */
  def avgTokenLen(text: Column): Column =
    (length(trim(text)) - (nTokens(text) - 1)).cast("double") / nTokens(text)

  val Stopwords: Seq[String] =
    Seq("a", "the", "to", "of", "and", "in", "is", "on")

  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*))).cast("double") /
      nTokens(text)

  def typeTokenRatio(text: Column): Column =
    nDistinctTokens(text).cast("double") / nTokens(text)

  /** Composite lexical quality score in [0, 1]: length saturation,
    * lexical diversity, stopword moderation, word-length sanity. */
  def qualityScore(text: Column): Column =
    lit(0.25) * least(nTokens(text).cast("double") / 50.0, lit(1.0)) +
      lit(0.25) * typeTokenRatio(text) +
      lit(0.25) * (lit(1.0) - stopwordRatio(text)) +
      lit(0.25) * least(avgTokenLen(text) / 8.0, lit(1.0))

  /** Canonical-form fingerprint (Broder-style): md5 over the sorted
    * distinct token set — equal iff the documents share their
    * vocabulary set, robust to word order, repetition AND spacing
    * (whitespace-run tokens: a fingerprint is a duplicate verdict, so
    * it follows the dedup tokenization, not the counting one). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokensWs(text)))))

  // ---------------- language ID ----------------

  /**
   * Corpus-trained token-likelihood language ID. Training: one
   * groupBy(lang, token) count aggregation, kept to the top
   * `profileSize` tokens per language with add-one-smoothed log
   * probabilities. Scoring: sum of per-token log likelihoods (unknown
   * tokens get the smoothed floor), argmax over languages.
   *
   * The profile is a few KB — collected to the driver and embedded in
   * the scoring UDF closure (broadcast with the task), which is the
   * standard small-model pattern; the corpus itself never leaves the
   * executors.
   */
  def languageId(docs: DataFrame, textCol: String, langCol: String,
      profileSize: Int = 64): DataFrame = {
    val rows = languageProfile(docs, textCol, langCol, profileSize).collect()
    val floors: Map[String, Double] =
      rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val model: Map[String, Map[String, Double]] = rows
      .groupBy(_.getString(0))
      .map { case (lang, rs) =>
        lang -> rs.map(r => r.getString(1) -> r.getDouble(2)).toMap
      }
    val langs = model.keys.toSeq.sorted

    val scoreU = udf((toks: Seq[String]) => {
      var bestLang = ""
      var bestScore = Double.NegativeInfinity
      langs.foreach { lang =>
        val m = model(lang)
        val floor = floors(lang)
        var s = 0.0
        toks.foreach(t => s += m.getOrElse(t, floor))
        if (s > bestScore) { bestScore = s; bestLang = lang }
      }
      bestLang
    })
    docs.withColumn("predicted_lang", scoreU(tokens(col(textCol))))
  }

  /** The trained profile as a (lang, token, logp, floor) DataFrame —
    * the model-sized table [[languageId]] collects.
    *
    * The top-`profileSize` cut per language is the bounded-heap
    * aggregate [[graft.plans.TopKTokAggExpr]] over (count desc, token
    * asc) — NOT `row_number().over(Window.partitionBy(lang))`: the
    * window form sorted each language's ENTIRE distinct-token count
    * table through ONE task (a web-scale corpus has 10^8-10^9 distinct
    * "tokens" per language), while the heap keeps `profileSize` rows
    * per language per map task and ships only k·languages rows through
    * the shuffle. Identical selection by construction (same
    * comparator; UTF8String.compareTo is the byte order the window's
    * string sort used) — asserted window-free in PlanSpec. */
  private[graft] def languageProfile(docs: DataFrame, textCol: String,
      langCol: String, profileSize: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val tok = docs.select(col(langCol).as("lang"),
      explode(tokens(col(textCol))).as("token"))
    val counts = tok.groupBy(col("lang"), col("token")).count()
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("count")).as("total"), count(lit(1)).as("vocab"))
    val agg = graft.plans.TopKTokAggExpr(
      GraftSqlBridge.expressionOf(col("count").cast("long")),
      GraftSqlBridge.expressionOf(col("token")),
      profileSize)
    counts.groupBy(col("lang"))
      .agg(GraftSqlBridge.aggColumn(agg).as("topk"))
      .select(col("lang"), explode(col("topk")).as("e"))
      .select(col("lang"), col("e.token").as("token"),
        col("e.cnt").as("count"))
      .join(totals, "lang")
      .select(col("lang"), col("token"),
        log((col("count") + 1.0) / (col("total") + col("vocab"))).as("logp"),
        log(lit(1.0) / (col("total") + col("vocab"))).as("floor"))
  }
}
