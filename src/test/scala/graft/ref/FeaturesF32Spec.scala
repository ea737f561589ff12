package graft.ref

import org.scalatest.funsuite.AnyFunSuite

/** The f32 kernel flavor: exact values on hand cases, f32-tolerance
  * agreement with the f64 flavor on random series (the two flavors
  * compute the same statistic at different precision — reference
  * float_trait.rs seals exactly these two instantiations). */
class FeaturesF32Spec extends AnyFunSuite {

  private def rand(n: Int, seed: Long): (Array[Float], Array[Float]) = {
    val rng = new scala.util.Random(seed)
    val t = Array.iterate(0.0f, n)(x => x + 1.0f + rng.nextFloat())
    val m = Array.fill(n)(50.0f + 30.0f * rng.nextFloat())
    (t, m)
  }

  test("hand case: exact f32 values") {
    val m = Array(1.0f, 2.0f, 3.0f, 4.0f)
    assert(FeaturesF32.amplitude(m) == 1.5f)
    assert(FeaturesF32.mean(m) == 2.5f)
    assert(FeaturesF32.median(m) == 2.5f)
    // var = (2.25+0.25+0.25+2.25)/3; exact in f32
    assert(FeaturesF32.std2(m, 2.5f) == 5.0f / 3.0f)
    assert(FeaturesF32.beyondNStd(m, 1.0f) == 0.5f)
    val modd = Array(3.0f, 1.0f, 2.0f)
    assert(FeaturesF32.median(modd) == 2.0f)
  }

  test("f32 accumulation happens in single precision (order-sensitive sum)") {
    // 2^24 + 1 is not representable in f32: adding 1.0f to 16777216f
    // is a no-op in f32 but not in f64 — proves the accumulator width
    val m = Array(16777216.0f, 1.0f)
    assert(FeaturesF32.sum(m) == 16777216.0f)
    assert(m.map(_.toDouble).sum == 16777217.0)
  }

  test("f32 ppf: exact hand cases and reference edge behavior") {
    val s = Array(1.0f, 2.0f, 3.0f, 4.0f)
    // h = 4*0.5 - 0.5 = 1.5 -> s[1] + 0.5*(s[2]-s[1]) = 2.5
    assert(FeaturesF32.ppf(s, 0.5f) == 2.5f)
    // h < 0 -> minimum; h floor past end -> maximum
    assert(FeaturesF32.ppf(s, 0.0f) == 1.0f)
    assert(FeaturesF32.ppf(s, 1.0f) == 4.0f)
    // h = 4*0.25 - 0.5 = 0.5 -> s[0] + 0.5*(s[1]-s[0]) = 1.5
    assert(FeaturesF32.ppf(s, 0.25f) == 1.5f)
  }

  test("f32 quantile battery tracks the f64 evaluators within single-precision tolerance") {
    for (seed <- 1L to 5L) {
      val (t, m) = rand(64, seed)
      val lc = LightCurve(t.map(_.toDouble), m.map(_.toDouble),
        Array.fill(64)(1.0))
      val f32 = FeaturesF32.evalQuantiles(m)
      val f64 = Seq(
        Features.Median, Features.InterPercentileRange(0.25),
        Features.MedianAbsoluteDeviation, Features.PercentAmplitude,
        Features.MedianBufferRangePercentage(0.1),
        Features.PercentDifferenceMagnitudePercentile(0.05),
        Features.MagnitudePercentageRatio(0.4, 0.05))
        .map(_.evalNoCheck(lc)(0))
      f32.zip(f64).zipWithIndex.foreach { case ((a, b), i) =>
        val rel = math.abs(a - b) / math.max(math.abs(b), 1e-6)
        assert(rel < 2e-3, s"quantile kernel $i diverged beyond f32 tolerance: $a vs $b")
      }
    }
  }

  test("f32 weighted battery tracks the f64 evaluators within single-precision tolerance") {
    for (seed <- 1L to 5L) {
      val (t, m) = rand(64, seed)
      val rng = new scala.util.Random(seed + 100)
      val w = Array.fill(64)(0.5f + rng.nextFloat())
      val lc = LightCurve(t.map(_.toDouble), m.map(_.toDouble), w.map(_.toDouble))
      val f32 = FeaturesF32.evalWeighted(m, w)
      val f64 = Seq(
        Features.WeightedMean, Features.ReducedChi2, Features.ExcessVariance,
        Features.StetsonK, Features.Roms)
        .map(_.evalNoCheck(lc)(0))
      f32.zip(f64).zipWithIndex.foreach { case ((a, b), i) =>
        val rel = math.abs(a - b) / math.max(math.abs(b), 1e-6)
        assert(rel < 2e-3, s"weighted kernel $i diverged beyond f32 tolerance: $a vs $b")
      }
    }
  }

  test("f32 sequential battery tracks the f64 evaluators within single-precision tolerance") {
    for (seed <- 1L to 5L) {
      val (t, m) = rand(64, seed)
      val lc = LightCurve(t.map(_.toDouble), m.map(_.toDouble),
        Array.fill(64)(1.0))
      val f32 = FeaturesF32.evalSequential(t, m)
      val f64 = Seq(
        Features.EtaE, Features.LaflerKinmanStringLength, Features.Duration,
        Features.TimeMean, Features.TimeStandardDeviation,
        Features.MaximumTimeInterval, Features.MinimumTimeInterval)
        .map(_.evalNoCheck(lc)(0))
      f32.zip(f64).zipWithIndex.foreach { case ((a, b), i) =>
        val rel = math.abs(a - b) / math.max(math.abs(b), 1e-6)
        assert(rel < 2e-3, s"sequential kernel $i diverged beyond f32 tolerance: $a vs $b")
      }
    }
  }

  test("f32 flavor tracks the f64 flavor within single-precision tolerance") {
    for (seed <- 1L to 5L) {
      val (t, m) = rand(64, seed)
      val lc = LightCurve(t.map(_.toDouble), m.map(_.toDouble),
        Array.fill(64)(1.0))
      val f32 = FeaturesF32.evalAll(t, m)
      val f64 = Seq(
        Features.Amplitude, Features.Mean, Features.Median,
        Features.StandardDeviation, Features.MeanVariance,
        Features.BeyondNStd(1.0), Features.Cusum, Features.Eta,
        Features.MaximumSlope, Features.Skew, Features.Kurtosis)
        .map(_.evalNoCheck(lc)(0))
      f32.zip(f64).zipWithIndex.foreach { case ((a, b), i) =>
        val rel = math.abs(a - b) / math.max(math.abs(b), 1e-6)
        assert(rel < 2e-4, s"kernel $i diverged beyond f32 tolerance: $a vs $b")
      }
    }
  }
}
