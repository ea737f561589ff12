package graft.ref

import scala.collection.immutable.SortedSet

/**
 * Library-level multicolor layer: the reference's `MultiColorFeature`
 * sum type and `MultiColorExtractor`
 * (/root/reference/src/multicolor/multicolor_extractor.rs:14-105,
 * features/color_of_median.rs, color_of_maximum.rs, color_of_minimum.rs,
 * color_spread.rs, per_band_feature.rs) as a Scala ADT over the
 * band -> [[LightCurve]] mapping of one series. The distributed path
 * ([[graft.operators.McSeriesFeatures]]) evaluates exactly this code
 * per group, so Spark results bit-match the single-node layer by
 * construction.
 */
sealed trait McFeature extends Serializable {
  def name: String
  def names: Seq[String] = Seq(name)
  final def size: Int = names.size
  /** Bands that must be present (reference `PassbandSet`). */
  def requiredBands: Set[String]
  /** Evaluate; callers use [[McExtractor.evalOrFill]] for the
    * fill-on-error contract. Throws on missing band / inner error. */
  def evalNoCheck(bands: Map[String, LightCurve]): Array[Double]
}

object McFeature {

  /** Inner monochrome eval; an inner [[EvalError]] becomes an
    * exception so [[McExtractor.evalOrFill]] fills the slice — the
    * reference's MonochromeEvaluatorError wrapping
    * (color_of_median.rs:116-121). */
  private[ref] def evalInner(f: Feature, lc: LightCurve): Array[Double] =
    f.eval(lc).fold(e => throw new IllegalStateException(e.toString), identity)

  /** `median(m in b1) - median(m in b2)` (color_of_median.rs:102-126;
    * median = the reference `Median` feature = midpoint-of-sorted). */
  final case class ColorOfMedian(b1: String, b2: String) extends McFeature {
    val name = s"color_median_${b1}_${b2}"
    val requiredBands = Set(b1, b2)
    def evalNoCheck(bands: Map[String, LightCurve]): Array[Double] =
      Array(McFeature.evalInner(Features.Median, bands(b1))(0) -
        McFeature.evalInner(Features.Median, bands(b2))(0))
  }

  /** `max(m in b1) - max(m in b2)` (color_of_maximum.rs:100-118). */
  final case class ColorOfMaximum(b1: String, b2: String) extends McFeature {
    val name = s"color_maximum_${b1}_${b2}"
    val requiredBands = Set(b1, b2)
    def evalNoCheck(bands: Map[String, LightCurve]): Array[Double] =
      Array(bands(b1).mMax - bands(b2).mMax)
  }

  /** `min(m in b1) - min(m in b2)` (color_of_minimum.rs). */
  final case class ColorOfMinimum(b1: String, b2: String) extends McFeature {
    val name = s"color_minimum_${b1}_${b2}"
    val requiredBands = Set(b1, b2)
    def evalNoCheck(bands: Map[String, LightCurve]): Array[Double] =
      Array(bands(b1).mMin - bands(b2).mMin)
  }

  /** Population sigma of per-band weighted means over the band set in
    * SORTED band order (the reference's BTreeSet iteration,
    * color_spread.rs:103-140). */
  final case class ColorSpread(bandSet: SortedSet[String]) extends McFeature {
    val name = "color_spread_" + bandSet.mkString("_")
    val requiredBands = bandSet.toSet
    def evalNoCheck(bands: Map[String, LightCurve]): Array[Double] = {
      val means = bandSet.toArray.map { b =>
        val lc = bands(b)
        var swm = 0.0; var sw = 0.0; var i = 0
        while (i < lc.n) { swm += lc.w(i) * lc.m(i); sw += lc.w(i); i += 1 }
        swm / sw
      }
      val n = means.length.toDouble
      var s = 0.0
      means.foreach(s += _)
      val mu = s / n
      var v = 0.0
      means.foreach { m => val d = m - mu; v += d * d }
      Array(math.sqrt(v / n))
    }
  }

  /** A monochrome feature applied to ONE band's series; output names
    * are `{inner_name}_{band}` (per_band_feature.rs:125). */
  final case class PerBand(inner: Feature, band: String) extends McFeature {
    val name = s"${inner.name}_$band"
    override val names: Seq[String] = inner.names.map(n => s"${n}_$band")
    val requiredBands = Set(band)
    def evalNoCheck(bands: Map[String, LightCurve]): Array[Double] =
      McFeature.evalInner(inner, bands(band))
  }
}

/**
 * Ordered list of multicolor features; output = concatenation of each
 * feature's vector (multicolor_extractor.rs:14-105). `evalOrFill`
 * replaces a failing feature's WHOLE slice with `fill`, per feature
 * independently (eval_or_fill_multicolor,
 * multicolor_evaluator.rs:108-122).
 */
final case class McExtractor(features: Seq[McFeature]) {
  val names: Seq[String] = features.flatMap(_.names)
  val size: Int = names.size
  /** Union passband set (multicolor_extractor.rs:47-57). */
  val passbandSet: Set[String] = features.flatMap(_.requiredBands).toSet

  def evalOrFill(bands: Map[String, LightCurve], fill: Double): Array[Double] = {
    val out = new Array[Double](size)
    var off = 0
    features.foreach { f =>
      val v =
        try {
          if (!f.requiredBands.subsetOf(bands.keySet)) null
          else f.evalNoCheck(bands)
        } catch { case _: Exception => null }
      if (v == null) java.util.Arrays.fill(out, off, off + f.size, fill)
      else System.arraycopy(v, 0, out, off, f.size)
      off += f.size
    }
    out
  }
}
