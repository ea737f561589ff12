package graft.functions

import graft.operators.{Dedup, SeriesFeatures}
import graft.ref.{Feature, FeatureJson, LightCurve}
import org.apache.spark.sql.SparkSession

/**
 * SQL-callable surface: registers the engine's kernels as named
 * functions so the whole feature battery is reachable from
 * `spark.sql(...)` without touching the Scala API. The feature list
 * is passed as the JSON config (FeatureJson), parsed once per
 * distinct config per executor (small concurrent cache), so the hot
 * path is the same primitive-array evaluation the DataFrame API uses.
 */
object SqlFunctions {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Feature]]()

  private def featuresFor(json: String): Seq[Feature] =
    cache.computeIfAbsent(json, j => FeatureJson.parseList(j))

  /** Register all functions on the session; returns the names. */
  def register(spark: SparkSession): Seq[String] = {
    spark.udf.register("lcf_features",
      (json: String, t: Array[Double], m: Array[Double], w: Array[Double]) =>
        SeriesFeatures.evalSeries(featuresFor(json), Double.NaN)(t, m, w))

    spark.udf.register("lcf_feature_names",
      (json: String) => featuresFor(json).flatMap(_.names))

    spark.udf.register("lcf_r5_ppf",
      (sorted: Array[Double], q: Double) => LightCurve.ppf(sorted, q))

    spark.udf.register("gorilla_encode",
      (ts: Array[Long], vs: Array[Double]) => graft.engine.Gorilla.encode(ts, vs))
    spark.udf.register("gorilla_decode_ts",
      (block: Array[Byte]) => graft.engine.Gorilla.decode(block)._1)
    spark.udf.register("gorilla_decode_vs",
      (block: Array[Byte]) => graft.engine.Gorilla.decode(block)._2)

    spark.udf.register("simhash64",
      (tokens: Seq[String]) => Dedup.simHash(tokens))
    spark.udf.register("minhash_sig",
      (shingles: Seq[String], k: Int, seed: Long) =>
        Dedup.minHashSignature(shingles, k, seed))

    Seq("lcf_features", "lcf_feature_names", "lcf_r5_ppf", "gorilla_encode",
      "gorilla_decode_ts", "gorilla_decode_vs", "simhash64", "minhash_sig")
  }
}
