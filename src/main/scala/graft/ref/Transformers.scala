package graft.ref

/**
 * Element-wise post-transforms of a feature's output vector
 * (/root/reference/src/transformers/mod.rs:102-138,
 * transformers/clipped_lg.rs:13-41): Identity, Arcsinh, Ln1p, Lg,
 * Sqrt, ClippedLg(minValue), Composed.
 */
sealed trait Transformer extends Serializable {
  def tag: String
  def apply(x: Double): Double
  /** Transformed output names (reference prefixes the tag). */
  def names(inner: Seq[String]): Seq[String] = inner.map(n => s"${tag}_$n")
}

object Transformer {
  case object Identity extends Transformer {
    val tag = "identity"
    def apply(x: Double): Double = x
    override def names(inner: Seq[String]): Seq[String] = inner
  }
  case object Arcsinh extends Transformer {
    val tag = "arcsinh"
    def apply(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))
  }
  case object Ln1p extends Transformer {
    val tag = "ln1p"
    def apply(x: Double): Double = math.log1p(x)
  }
  case object Lg extends Transformer {
    val tag = "lg"
    def apply(x: Double): Double = math.log10(x)
  }
  case object Sqrt extends Transformer {
    val tag = "sqrt"
    def apply(x: Double): Double = math.sqrt(x)
  }

  /** Default clip output: log10 of the smallest positive normal f64
    * (clipped_lg.rs:26-28). */
  val ClippedLgZero: Double = math.log10(java.lang.Double.MIN_NORMAL)

  /** `log10(x)` for x >= min positive, `minValue` below
    * (clipped_lg.rs:33-41). */
  final case class ClippedLg(minValue: Double = ClippedLgZero) extends Transformer {
    val tag = "clipped_lg"
    def apply(x: Double): Double =
      if (x < java.lang.Double.MIN_NORMAL) minValue else math.log10(x)
  }

  /** Function composition, outer-applied-last (transformers/composed.rs). */
  final case class Composed(first: Transformer, second: Transformer) extends Transformer {
    val tag = s"${second.tag}_${first.tag}"
    def apply(x: Double): Double = second(first(x))
  }
}

/** A feature post-composed with an element-wise transformer
  * (/root/reference/src/features/transformed.rs:30-125); info flags
  * inherit from the inner feature. */
final case class Transformed(inner: Feature, transformer: Transformer) extends Feature {
  val name: String = s"${transformer.tag}_${inner.name}"
  override val names: Seq[String] = transformer.names(inner.names)
  override val minTsLength: Int = inner.minTsLength
  override val variabilityRequired: Boolean = inner.variabilityRequired
  override val tRequired: Boolean = inner.tRequired
  override val mRequired: Boolean = inner.mRequired
  override val wRequired: Boolean = inner.wRequired
  def evalNoCheck(lc: LightCurve): Array[Double] =
    inner.evalNoCheck(lc).map(transformer.apply)
}

/**
 * Vector-level fit-output reshapes (the "fit-specific transformers"):
 * consume a curve-fit feature's full output vector and emit the
 * pipeline-facing view — amplitude in AB magnitudes
 * (`zp - 2.5 log10(2A)`), baseline/amplitude ratio, timescales kept,
 * `ln1p` of the reduced chi2; the reference_time is dropped.
 * (/root/reference/src/transformers/bazin_fit.rs:58-136,
 * villar_fit.rs:58-137, linexp_fit.rs:55-122.)
 */
sealed trait FitTransformer extends Serializable {
  def magZp: Double
  def inputSize: Int
  def names: Seq[String]
  def apply(x: Array[Double]): Array[Double]
  protected def magFullAmplitude(a: Double): Double =
    magZp - 2.5 * math.log10(2.0 * a)
}

object FitTransformer {
  /** ZP for AB magnitudes / jansky fluxes; the reference declares the
    * literal as f32 and widens (bazin_fit.rs:41-43), so the f64 value
    * is the widened f32 approximation of 8.9. */
  val DefaultMagZp: Double = 8.9f.toDouble

  /** 6 -> 5: [A, B, t0, rise, fall, chi2] ->
    * [mag_amp, B/A, rise, fall, ln1p(chi2)] (bazin_fit.rs:106-136). */
  final case class BazinFitTransformer(magZp: Double = DefaultMagZp)
      extends FitTransformer {
    val inputSize = 6
    val names = Seq(
      "bazin_fit_mag_full_amplitude", "bazin_fit_baseline_amplitude_ratio",
      "bazin_fit_rise_time", "bazin_fit_fall_time",
      "ln1p_bazin_fit_reduced_chi2")
    def apply(x: Array[Double]): Array[Double] = {
      require(x.length == inputSize, s"BazinFitTransformer: expected $inputSize, got ${x.length}")
      Array(magFullAmplitude(x(0)), x(1) / x(0), x(3), x(4), math.log1p(x(5)))
    }
  }

  /** 8 -> 7: [A, B, t0, rise, fall, nu, gamma, chi2] ->
    * [mag_amp, B/A, rise, fall, nu, gamma, ln1p(chi2)]
    * (villar_fit.rs:106-136). */
  final case class VillarFitTransformer(magZp: Double = DefaultMagZp)
      extends FitTransformer {
    val inputSize = 8
    val names = Seq(
      "villar_fit_mag_full_amplitude", "villar_fit_baseline_amplitude_ratio",
      "villar_fit_rise_time", "villar_fit_fall_time",
      "villar_fit_plateau_rel_amplitude", "villar_fit_plateau_duration",
      "ln1p_villar_fit_reduced_chi2")
    def apply(x: Array[Double]): Array[Double] = {
      require(x.length == inputSize, s"VillarFitTransformer: expected $inputSize, got ${x.length}")
      Array(magFullAmplitude(x(0)), x(1) / x(0), x(3), x(4), x(5), x(6),
        math.log1p(x(7)))
    }
  }

  /** 5 -> 4: [A, t0, fall, B, chi2] ->
    * [mag_amp, fall, B/A, ln1p(chi2)] — note the reference keeps the
    * historic output names (`linexp_fit_amplitude`/`_baseline`) even
    * though the values are the magnitude amplitude and the B/A ratio
    * (linexp_fit.rs:71-78,97-121). */
  final case class LinexpFitTransformer(magZp: Double = DefaultMagZp)
      extends FitTransformer {
    val inputSize = 5
    val names = Seq(
      "linexp_fit_amplitude", "linexp_fit_fall_time",
      "linexp_fit_baseline", "ln1p_linexp_fit_reduced_chi2")
    def apply(x: Array[Double]): Array[Double] = {
      require(x.length == inputSize, s"LinexpFitTransformer: expected $inputSize, got ${x.length}")
      Array(magFullAmplitude(x(0)), x(2), x(3) / x(0), math.log1p(x(4)))
    }
  }
}

/** A curve-fit feature post-composed with its fit transformer —
  * the reshaped names/arity replace the raw parameter vector
  * (reference `Transformed` with a fit transformer,
  * features/transformed.rs + transformers/mod.rs). */
final case class TransformedFit(inner: Feature, transformer: FitTransformer)
    extends Feature {
  val name: String = s"transformed_${inner.name}"
  override val names: Seq[String] = transformer.names
  override val minTsLength: Int = inner.minTsLength
  override val variabilityRequired: Boolean = inner.variabilityRequired
  override val tRequired: Boolean = inner.tRequired
  override val mRequired: Boolean = inner.mRequired
  override val wRequired: Boolean = inner.wRequired
  def evalNoCheck(lc: LightCurve): Array[Double] =
    transformer(inner.evalNoCheck(lc))
}
