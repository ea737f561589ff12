package graft.operators

import graft.ref.{LightCurve, McExtractor}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed evaluation of the multicolor extractor
 * ([[graft.ref.McExtractor]] — reference multicolor_extractor.rs):
 * two-level aggregation, both shuffles on bounded keys — per
 * (series, band) sorted collects (per-band state bounded like the
 * monochrome path), then one per-series eval of the SAME single-node
 * extractor code, so distributed results bit-match the reference
 * layer by construction. Missing bands / inner evaluator errors fill
 * the feature's slice (eval_or_fill_multicolor semantics).
 */
object McSeriesFeatures {

  /** df columns: (seriesCol, bandCol, t, idx, m, w) -> one row per
    * series: seriesCol, n_bands, extractor output columns. */
  def extract(df: DataFrame, seriesCol: String, bandCol: String,
      ex: McExtractor, fill: Double = Double.NaN): DataFrame = {
    val evalU = udf((bands: Seq[String], ts: Seq[Seq[Double]], ms: Seq[Seq[Double]],
        ws: Seq[Seq[Double]]) => {
      val map = bands.indices.map(i => bands(i) ->
        LightCurve(ts(i).toArray, ms(i).toArray, ws(i).toArray)).toMap
      ex.evalOrFill(map, fill)
    })
    val perBand = df
      .groupBy(col(seriesCol), col(bandCol).as("band"))
      .agg(SeriesFeatures.collectSorted(col("t"), col("idx"), col("m"), col("w")).as("p"))
    val base = perBand
      .groupBy(col(seriesCol))
      .agg(sort_array(collect_list(struct(col("band"), col("p")))).as("bp"))
      .select(col(seriesCol),
        size(col("bp")).as("n_bands"),
        evalU(col("bp.band"),
          transform(col("bp"), (x: Column) => x.getField("p").getField("t")),
          transform(col("bp"), (x: Column) => x.getField("p").getField("m")),
          transform(col("bp"), (x: Column) => x.getField("p").getField("w"))).as("f"))
    ex.names.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, col("f").getItem(i))
    }.drop("f")
  }
}
