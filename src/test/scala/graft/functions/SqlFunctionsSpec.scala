package graft.functions

import graft.engine.Transcripts
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface must produce the same numbers as the Scala
  * API: an end-user can run the whole pipeline from spark.sql. */
class SqlFunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("sql-surface")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SqlFunctions.register(s)
    s
  }

  test("lcf_features from SQL matches the DataFrame API bit for bit") {
    Transcripts.series(
      Transcripts.synthetic(spark, 20, 30, seed = 51L).toDF)
      .createOrReplaceTempView("series")
    val cfg = """[{"Mean":{}},{"Amplitude":{}},{"StetsonK":{}},{"Median":{}}]"""
    val sqlOut = spark.sql(
      s"""SELECT conv_id, lcf_features('$cfg', pts.t, pts.m, pts.w) AS f FROM (
         |  SELECT conv_id,
         |    struct(sort_array(collect_list(struct(t, turn_idx, m, w))).t AS t,
         |           sort_array(collect_list(struct(t, turn_idx, m, w))).m AS m,
         |           sort_array(collect_list(struct(t, turn_idx, m, w))).w AS w) AS pts
         |  FROM series GROUP BY conv_id) ORDER BY conv_id""".stripMargin)
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]](1).map(java.lang.Double.doubleToLongBits).toSeq)

    import org.apache.spark.sql.functions._
    val feats = graft.ref.FeatureJson.parseList(cfg)
    val apiOut = Transcripts.series(Transcripts.synthetic(spark, 20, 30, seed = 51L).toDF)
      .groupBy(col("conv_id"))
      .agg(graft.operators.SeriesFeatures.collectSorted(
        col("t"), col("turn_idx"), col("m"), col("w")).as("p"))
      .withColumn("f", graft.operators.SeriesFeatures.extract(feats)(col("p")))
      .orderBy(col("conv_id"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("f").map(java.lang.Double.doubleToLongBits).toSeq)

    assert(sqlOut.toSeq == apiOut.toSeq)
  }

  test("gorilla and quantile functions work from SQL") {
    val row = spark.sql(
      """SELECT gorilla_decode_vs(gorilla_encode(array(0L, 60L, 120L),
        |                                        array(1.5, 2.5, 2.5))) AS vs,
        |       lcf_r5_ppf(array(0.0, 1.0, 2.0, 3.0), 0.5) AS med,
        |       simhash64(array('a','b','c')) AS sh""".stripMargin).collect()(0)
    assert(row.getAs[scala.collection.Seq[Double]]("vs").toSeq == Seq(1.5, 2.5, 2.5))
    assert(row.getDouble(1) == 1.5)
    assert(row.getLong(2) == graft.operators.Dedup.simHash(Seq("a", "b", "c")))
  }

  test("lcf_feature_names exposes the output contract") {
    val names = spark.sql(
      """SELECT lcf_feature_names('[{"Periodogram":{"peaks":2,"resolution":10.0,
        |"max_freq_factor":1.0,"nyquist":"average","normalization":"psd",
        |"fast":false,"phase_features":[]}}]') AS n""".stripMargin.replace("\n", ""))
      .collect()(0).getAs[scala.collection.Seq[String]](0)
    assert(names.toSeq == Seq("period_0", "periodogram_peak_snr_0",
      "period_1", "periodogram_peak_snr_1"))
  }
}
