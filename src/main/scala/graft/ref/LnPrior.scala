package graft.ref

/**
 * Per-parameter log-priors for the curve-fit likelihood
 * (/root/reference/src/nl_fit/prior/ln_prior_1d.rs:25-60): none,
 * normal, log-normal, uniform, log-uniform, and weighted mixtures;
 * evaluated in parameter space and summed across parameters.
 */
object LnPrior {

  type LnPrior1D = Double => Double

  private val LnSqrt2Pi = 0.5 * math.log(2.0 * math.Pi)

  val none: LnPrior1D = _ => 0.0

  def normal(mu: Double, std: Double): LnPrior1D = {
    val invStd2 = 1.0 / (std * std)
    val coeff = -math.log(std) - LnSqrt2Pi
    x => coeff - 0.5 * (x - mu) * (x - mu) * invStd2
  }

  def logNormal(mu: Double, std: Double): LnPrior1D = {
    val invStd2 = 1.0 / (std * std)
    val coeff = -math.log(std) - LnSqrt2Pi
    x =>
      if (x <= 0.0) Double.NegativeInfinity
      else {
        val lnX = math.log(x)
        coeff - lnX - 0.5 * (lnX - mu) * (lnX - mu) * invStd2
      }
  }

  def uniform(left: Double, right: Double): LnPrior1D = {
    val lnDensity = -math.log(right - left)
    x => if (x >= left && x <= right) lnDensity else Double.NegativeInfinity
  }

  def logUniform(left: Double, right: Double): LnPrior1D = {
    val lnLnRatio = math.log(math.log(right / left))
    x =>
      if (x >= left && x <= right) -math.log(x) - lnLnRatio
      else Double.NegativeInfinity
  }

  /** Weighted mixture: ln(sum_i w_i exp(lnp_i(x))), log-sum-exp stable. */
  def mix(weightPriorPairs: Seq[(Double, LnPrior1D)]): LnPrior1D = {
    val total = weightPriorPairs.map(_._1).sum
    x => {
      val terms = weightPriorPairs.map { case (w, p) => math.log(w / total) + p(x) }
      val mx = terms.max
      if (mx == Double.NegativeInfinity) Double.NegativeInfinity
      else mx + math.log(terms.map(t => math.exp(t - mx)).sum)
    }
  }

  /** Independent per-parameter priors summed into a joint ln-prior. */
  def independent(priors: Seq[LnPrior1D]): Array[Double] => Double =
    p => {
      var s = 0.0
      var i = 0
      while (i < priors.length) { s += priors(i)(p(i)); i += 1 }
      s
    }

  val flat: Array[Double] => Double = _ => 0.0
}
