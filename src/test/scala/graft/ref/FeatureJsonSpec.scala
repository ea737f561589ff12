package graft.ref

import org.scalatest.funsuite.AnyFunSuite

/** serde mirror (reference tests.rs:308-359): every feature config
  * JSON-round-trips to an evaluator producing identical output. */
class FeatureJsonSpec extends AnyFunSuite {

  private def lc: LightCurve = {
    val rng = new java.util.Random(2)
    var t = 0.0
    val ts = Array.fill(64) { t += 0.2 + rng.nextDouble(); t }
    new LightCurve(ts,
      Array.fill(64)(rng.nextGaussian() * 3 + 15),
      Array.fill(64)(0.5 + rng.nextDouble()))
  }

  private val battery: Seq[Feature] = Features.all ++ Seq(
    PeriodogramFeature(peaks = 2, useFft = true),
    PeriodogramFeature(peaks = 1,
      params = Periodogram.GridParams(5.0, 2.0, Periodogram.QuantileNyquist(0.1)),
      normalization = Periodogram.Standard,
      phaseFeatures = Seq(Features.Amplitude, Features.Eta)),
    PeriodogramFeature(peaks = 2,
      fixedGrid = Some(Periodogram.ArbitraryGrid(Array(0.5, 0.9, 1.7, 2.4, 6.0)))),
    PeriodogramFeature(peaks = 1,
      fixedGrid = Some(Periodogram.LinearGrid(0.25, 0.125, 33))),
    PeriodogramFeature(peaks = 1, useFft = true,
      fixedGrid = Some(Periodogram.ZeroBasedPow2Grid(0.125, 5))),
    Transformed(Features.Amplitude, Transformer.Ln1p),
    Transformed(Features.Mean, Transformer.ClippedLg(-300.0)),
    CurveFitFeature(NonlinearFit.BazinModel, nIterations = 8),
    CurveFitFeature(NonlinearFit.LinexpModel, nIterations = 8, seed = 5L),
    CurveFitFeature(NonlinearFit.BazinModel, nIterations = 8,
      algorithm = FitAlgorithm.Lmsder),
    CurveFitFeature(NonlinearFit.VillarModel, nIterations = 8,
      algorithm = FitAlgorithm.Nuts(Some(FitAlgorithm.Lmsder))),
    BinsFeature(Seq(Features.Mean, Features.StandardDeviation), window = 2.5, offset = 0.5))

  test("every feature JSON-round-trips to an equal evaluator") {
    val series = lc
    battery.foreach { f =>
      val json = FeatureJson.toJson(f)
      val back = FeatureJson.parseOne(json)
      assert(back == f || back.names == f.names, s"config mismatch for ${f.name}: $json")
      val a = f.evalOrFill(series, Double.NaN).map(java.lang.Double.doubleToLongBits).toSeq
      val b = back.evalOrFill(series, Double.NaN).map(java.lang.Double.doubleToLongBits).toSeq
      assert(a == b, s"${f.name} output changed after round-trip")
    }
  }

  test("extractor lists round-trip as arrays") {
    val json = FeatureJson.toJson(battery)
    val back = FeatureJson.parseList(json)
    assert(back.size == battery.size)
    back.zip(battery).foreach { case (b, f) => assert(b.names == f.names) }
    // stable re-serialization
    assert(FeatureJson.toJson(back) == json)
  }

  test("default-parameter JSON shapes parse") {
    assert(FeatureJson.parseOne("""{"Amplitude":{}}""") == Features.Amplitude)
    assert(FeatureJson.parseOne("""{"BeyondNStd":{"nstd":2.0}}""") ==
      Features.BeyondNStd(2.0))
    assert(FeatureJson.parseOne(
      """{"Bins":{"window":1.0,"offset":0.0,"features":[{"Mean":{}}]}}""") ==
      BinsFeature(Seq(Features.Mean), 1.0, 0.0))
    intercept[IllegalArgumentException] {
      FeatureJson.parseOne("""{"NoSuchFeature":{}}""")
    }
  }

  test("schema: draft-07 document covers every serializable feature form") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val m = new ObjectMapper()
    val root = m.readTree(FeatureJson.schema)
    assert(root.get("$schema").asText().contains("draft-07"))
    val oneOf = root.get("definitions").get("feature").get("oneOf")
    val tags = (0 until oneOf.size()).map(i =>
      oneOf.get(i).get("required").get(0).asText()).toSet
    // every tag the parser accepts appears exactly once in the schema
    val expected = Set("Amplitude", "BeyondNStd", "BiweightScale", "Periodogram",
      "Transformed", "BazinFit", "VillarFit", "LinexpFit", "Bins",
      "InterPercentileRange", "MagnitudePercentageRatio", "StetsonK")
    expected.foreach(t => assert(tags.contains(t), s"schema missing $t"))
    assert(oneOf.size() == tags.size, "duplicate variant tags")
    // serialized configs conform structurally: single-key objects whose
    // key is a schema variant
    val cfg = m.readTree(FeatureJson.toJson(Seq(
      Features.Amplitude, Features.BeyondNStd(2.0),
      Transformed(Features.Amplitude, Transformer.Ln1p))))
    (0 until cfg.size()).foreach { i =>
      val o = cfg.get(i)
      assert(o.size() == 1 && tags.contains(o.fieldNames().next()))
    }
    // extractor schema is an array of the same definition
    val ex = m.readTree(FeatureJson.extractorSchema)
    assert(ex.get("type").asText() == "array")
    assert(ex.get("definitions").get("feature").get("oneOf").size() == oneOf.size())
  }
}
