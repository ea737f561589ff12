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
