package graft.ref

/**
 * Nonlinear weighted least-squares curve fits of the reference's
 * *Fit features (/root/reference/src/nl_fit/): data standardization
 * (data.rs:16-76), data-driven inits/bounds (bazin_fit.rs:362-392,
 * linexp_fit.rs:334-366, villar_fit.rs:492-532), and an
 * affine-invariant ensemble sampler maximizing -chi2/2 + ln_prior
 * (mcmc.rs:16-135; Goodman & Weare 2010 stretch move, the emcee
 * algorithm) with a deterministic fixed-seed stream, plus a
 * Nelder-Mead polish stage (the reference's optional fine-tuning
 * slot, curve_fit.rs:24-52).
 *
 * Parity note (SURVEY.md §7 "what's hard" #4): the reference's MCMC
 * stream depends on emcee's PRNG internals, so *Fit outputs are
 * tolerance-tested, not bit-matched; determinism WITHIN this engine
 * is guaranteed by the fixed seed.
 */
object NonlinearFit {

  /** How each dimensionless parameter maps back to original units
    * (linexp_fit.rs:213-233 FitParametersOriginalDimLessTrait). */
  sealed trait ParamKind
  case object MScale extends ParamKind // amplitude-like: orig = norm * m_std
  case object MLoc extends ParamKind // baseline-like: orig = norm * m_std + m_mean
  case object TLoc extends ParamKind // time location: orig = norm * t_std + t_mean
  case object TScale extends ParamKind // time scale:   orig = norm * t_std
  case object Unitless extends ParamKind

  final case class InitsBounds(init: Array[Double], lower: Array[Double], upper: Array[Double])

  trait FitModel extends Serializable {
    def name: String
    def nParams: Int
    def paramNames: Seq[String]
    def paramKinds: Seq[ParamKind]
    /** Model value at (normalized) time t for dimensionless params. */
    def model(t: Double, p: Array[Double]): Double
    /** Analytic gradient d model / d p at (normalized) time t — the
      * Jacobian row the LM fitter needs (each reference model ships
      * `derivatives` alongside `model` for the same reason; formulas
      * derived from the model definitions, checked against central
      * finite differences in FitSpec). */
    def jacobian(t: Double, p: Array[Double]): Array[Double]
    /** Data-driven inits/bounds from (normalized) series extrema. */
    def initsBounds(tMin: Double, tMax: Double, tPeak: Double,
        mMin: Double, mMax: Double): InitsBounds
  }

  /** 5-param SN flux: B + A exp((t0-t)/tau_fall) / (exp((t0-t)/tau_rise) + 1)
    * (bazin_fit.rs:165-184); params [A, B, t0, tau_rise, tau_fall]. */
  case object BazinModel extends FitModel {
    val name = "bazin_fit"
    val nParams = 5
    val paramNames = Seq("amplitude", "baseline", "reference_time", "rise_time", "fall_time")
    val paramKinds = Seq(MScale, MLoc, TLoc, TScale, TScale)
    def model(t: Double, p: Array[Double]): Double = {
      val minusDt = p(2) - t
      p(1) + p(0) * math.exp(minusDt / p(4)) / (math.exp(minusDt / p(3)) + 1.0)
    }
    def jacobian(t: Double, p: Array[Double]): Array[Double] = {
      val x = p(2) - t
      val ef = math.exp(x / p(4))
      val er = math.exp(x / p(3))
      val d = er + 1.0
      val g = ef / d // model shape without amplitude/baseline
      Array(
        g, // dA
        1.0, // dB
        p(0) * g * (1.0 / p(4) - er / (p(3) * d)), // dt0 (x = t0 - t)
        p(0) * g * er * x / (p(3) * p(3) * d), // dtau_rise
        -p(0) * g * x / (p(4) * p(4))) // dtau_fall
    }
    def initsBounds(tMin: Double, tMax: Double, tPeak: Double,
        mMin: Double, mMax: Double): InitsBounds = {
      val tAmp = tMax - tMin
      val mAmp = mMax - mMin
      InitsBounds(
        Array(0.5 * mAmp, mMin, tPeak, 0.5 * tAmp, 0.5 * tAmp),
        Array(0.0, mMin - 100.0 * mAmp, tMin - 10.0 * tAmp, 0.0, 0.0),
        Array(100.0 * mAmp, mMax + 100.0 * mAmp, tMax + 10.0 * tAmp, 10.0 * tAmp, 10.0 * tAmp))
    }
  }

  /** 4-param rise-decay: B + A dt/tau exp(-dt/tau), dt = (t-t0)/tau
    * (linexp_fit.rs:158-170); params [A, t0, tau, B]. */
  case object LinexpModel extends FitModel {
    val name = "linexp_fit"
    val nParams = 4
    val paramNames = Seq("amplitude", "reference_time", "fall_time", "baseline")
    val paramKinds = Seq(MScale, TLoc, TScale, MLoc)
    def model(t: Double, p: Array[Double]): Double = {
      val dt = (t - p(1)) / p(2)
      p(3) + p(0) * dt * math.exp(-dt)
    }
    def jacobian(t: Double, p: Array[Double]): Array[Double] = {
      val u = (t - p(1)) / p(2)
      val e = math.exp(-u)
      val core = e * (1.0 - u) // d(u e^-u)/du
      Array(
        u * e, // dA
        -p(0) * core / p(2), // dt0 (du/dt0 = -1/tau)
        -p(0) * core * u / p(2), // dtau (du/dtau = -u/tau)
        1.0) // dB
    }
    def initsBounds(tMin: Double, tMax: Double, tPeak: Double,
        mMin: Double, mMax: Double): InitsBounds = {
      val tAmp = tMax - tMin
      val mAmp = mMax - mMin
      val tauInit = 0.25 * tAmp
      InitsBounds(
        Array(3.0 * mAmp, tPeak - 1.5 * tauInit, tauInit, mMin),
        Array(0.0, tMin - 10.0 * tAmp, 0.0, mMin - 100.0 * mAmp),
        Array(100.0 * mAmp, tMax + 10.0 * tAmp, 10000.0 * tAmp, mMax + 100.0 * mAmp))
    }
  }

  /** 7-param Villar SN model: c + a rise(t) plateau(t) fall(t)
    * (villar_fit.rs:139-146,450-466); params
    * [a, c, t0, tau_rise, tau_fall, nu, gamma]. */
  case object VillarModel extends FitModel {
    val name = "villar_fit"
    val nParams = 7
    val paramNames = Seq("amplitude", "baseline", "reference_time", "rise_time",
      "fall_time", "plateau_rel_amplitude", "plateau_duration")
    val paramKinds = Seq(MScale, MLoc, TLoc, TScale, TScale, Unitless, TScale)
    def model(t: Double, p: Array[Double]): Double = {
      val dt = t - p(2)
      val rise = 1.0 / (1.0 + math.exp(-dt / p(3)))
      val plateau = 1.0 - p(5) * math.min(dt / p(6), 1.0)
      val t1 = p(2) + p(6)
      val fall = if (t <= t1) 1.0 else math.exp(-(t - t1) / p(4))
      p(1) + p(0) * rise * plateau * fall
    }
    def jacobian(t: Double, p: Array[Double]): Array[Double] = {
      val dt = t - p(2)
      val r = 1.0 / (1.0 + math.exp(-dt / p(3)))
      val onPlateau = dt / p(6) < 1.0
      val pl = 1.0 - p(5) * (if (onPlateau) dt / p(6) else 1.0)
      val t1 = p(2) + p(6)
      val falling = t > t1
      val f = if (falling) math.exp(-(t - t1) / p(4)) else 1.0
      val dRdt0 = -r * (1.0 - r) / p(3) // dsigma(dt/tau_r)/dt0
      val dPdt0 = if (onPlateau) p(5) / p(6) else 0.0
      val dFdt0 = if (falling) f / p(4) else 0.0
      Array(
        r * pl * f, // da
        1.0, // dc
        p(0) * (dRdt0 * pl * f + r * dPdt0 * f + r * pl * dFdt0), // dt0
        p(0) * pl * f * r * (1.0 - r) * (-dt / (p(3) * p(3))), // dtau_rise
        if (falling) p(0) * r * pl * f * (t - t1) / (p(4) * p(4)) else 0.0, // dtau_fall
        -p(0) * r * f * (if (onPlateau) dt / p(6) else 1.0), // dnu
        p(0) * (r * f * (if (onPlateau) p(5) * dt / (p(6) * p(6)) else 0.0)
          + (if (falling) r * pl * f / p(4) else 0.0))) // dgamma
    }
    def initsBounds(tMin: Double, tMax: Double, tPeak: Double,
        mMin: Double, mMax: Double): InitsBounds = {
      val tAmp = tMax - tMin
      val mAmp = mMax - mMin
      InitsBounds(
        Array(0.5 * mAmp, mMin, tPeak, 0.5 * tAmp, 0.5 * tAmp, 0.0, 0.1 * tAmp),
        Array(0.0, mMin - 100.0 * mAmp, tMin - 20.0 * tAmp, 0.0, 0.0, 0.0, 0.0),
        Array(100.0 * mAmp, mMax + 100.0 * mAmp, tMax + 10.0 * tAmp,
          10.0 * tAmp, 10.0 * tAmp, 1.0, 10.0 * tAmp))
    }
  }

  // ---------------- optimizer ----------------

  private def chi2(model: FitModel, t: Array[Double], m: Array[Double],
      invErr: Array[Double], p: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < t.length) {
      val r = invErr(i) * (model.model(t(i), p) - m(i))
      s += r * r
      i += 1
    }
    s
  }

  /** Goodman-Weare affine-invariant ensemble sampler maximizing
    * -chi2/2 within bounds, 4 walkers per dimension, fixed seed
    * (mcmc.rs:60-135 structure; independent implementation). */
  def mcmcFit(model: FitModel, t: Array[Double], m: Array[Double],
      invErr: Array[Double], ib: InitsBounds,
      nIterations: Int = 128, seed: Long = 0L,
      lnPrior: Array[Double] => Double = LnPrior.flat): Array[Double] = {
    val np = model.nParams
    val nWalkers = 4 * np
    val rng = new java.util.SplittableRandom(seed)

    def clamp(p: Array[Double]): Array[Double] = {
      var i = 0
      while (i < np) {
        if (p(i) < ib.lower(i)) p(i) = ib.lower(i)
        if (p(i) > ib.upper(i)) p(i) = ib.upper(i)
        i += 1
      }
      p
    }
    def lnProb(p: Array[Double]): Double = {
      var i = 0
      while (i < np) {
        if (p(i) < ib.lower(i) || p(i) > ib.upper(i)) return Double.NegativeInfinity
        i += 1
      }
      // maximize -chi2/2 + ln_prior (mcmc.rs:80-100)
      -0.5 * chi2(model, t, m, invErr, p) + lnPrior(p)
    }

    // init walkers: gaussian sigma=0.1 around x0 (mcmc.rs:106-111)
    val walkers = Array.tabulate(nWalkers) { k =>
      val p = Array.tabulate(np)(i =>
        ib.init(i) + (if (k == 0) 0.0 else 0.1 * rng.nextGaussian()))
      clamp(p)
    }
    val lnp = walkers.map(lnProb)
    var bestP = walkers(0).clone()
    var bestLnp = lnp(0)
    var it = 0
    while (it < nIterations) {
      var k = 0
      while (k < nWalkers) {
        var j = rng.nextInt(nWalkers - 1)
        if (j >= k) j += 1
        // stretch move, a = 2: z = ((a-1)u + 1)^2 / a
        val u = rng.nextDouble()
        val z = (u + 1.0) * (u + 1.0) / 2.0
        val prop = Array.tabulate(np)(i => walkers(j)(i) + z * (walkers(k)(i) - walkers(j)(i)))
        val lp = lnProb(prop)
        val lnAccept = (np - 1) * math.log(z) + lp - lnp(k)
        if (lnAccept >= 0.0 || math.log(rng.nextDouble()) < lnAccept) {
          walkers(k) = prop
          lnp(k) = lp
          if (lp > bestLnp) { bestLnp = lp; bestP = prop.clone() }
        }
        k += 1
      }
      it += 1
    }
    bestP
  }

  /** Bounded Nelder-Mead polish (the fine-tuning slot,
    * curve_fit.rs:24-52); deterministic, derivative-free. */
  def nelderMead(f: Array[Double] => Double, x0: Array[Double],
      lower: Array[Double], upper: Array[Double],
      maxIter: Int = 400): Array[Double] = {
    val n = x0.length
    def clamp(p: Array[Double]): Array[Double] = {
      var i = 0
      while (i < n) {
        if (p(i) < lower(i)) p(i) = lower(i)
        if (p(i) > upper(i)) p(i) = upper(i)
        i += 1
      }
      p
    }
    var simplex = Array.tabulate(n + 1) { k =>
      val p = x0.clone()
      if (k > 0) {
        val i = k - 1
        val h = math.max(1e-3, 0.05 * (upper(i) - lower(i)).min(math.abs(x0(i)) + 1.0) * 0.1)
        p(i) = p(i) + h
      }
      clamp(p)
    }
    var fv = simplex.map(f)
    var it = 0
    while (it < maxIter) {
      val order = fv.indices.sortBy(fv(_))
      simplex = order.map(simplex(_)).toArray
      fv = order.map(fv(_)).toArray
      val centroid = Array.tabulate(n)(i => simplex.init.map(_(i)).sum / n)
      def combine(alpha: Double): Array[Double] =
        clamp(Array.tabulate(n)(i => centroid(i) + alpha * (centroid(i) - simplex(n)(i))))
      val refl = combine(1.0)
      val fRefl = f(refl)
      if (fRefl < fv(0)) {
        val exp = combine(2.0)
        val fExp = f(exp)
        if (fExp < fRefl) { simplex(n) = exp; fv(n) = fExp }
        else { simplex(n) = refl; fv(n) = fRefl }
      } else if (fRefl < fv(n - 1)) {
        simplex(n) = refl; fv(n) = fRefl
      } else {
        val con = combine(-0.5)
        val fCon = f(con)
        if (fCon < fv(n)) { simplex(n) = con; fv(n) = fCon }
        else {
          // shrink toward best
          var k = 1
          while (k <= n) {
            simplex(k) = clamp(Array.tabulate(n)(i =>
              simplex(0)(i) + 0.5 * (simplex(k)(i) - simplex(0)(i))))
            fv(k) = f(simplex(k))
            k += 1
          }
        }
      }
      it += 1
    }
    simplex(fv.indices.minBy(fv(_)))
  }

  /** Reference PARAMETER_TOLERANCE (nl_fit/constants.rs:1). */
  val ParamTol = 1e-4

  /** No-U-Turn sampler over the fit posterior — the engine's analogue
    * of the reference's `NutsCurveFit` (nl_fit/nuts.rs:24-60, 124-170):
    * logp = -chi2/2 + ln_prior with -Infinity outside the bounds,
    * gradient = -0.5 * grad(chi2) (analytic, via the model jacobians)
    * + grad(ln_prior) (central differences; exactly zero for the flat
    * prior), num_tune + num_draws iterations, and the returned guess
    * is the visited position with the minimum chi2 — maximum
    * likelihood over the whole run, exactly the reference's pick.
    *
    * Independent implementation of Hoffman & Gelman (2014): efficient
    * slice-NUTS (Algorithm 3) with dual-averaging step-size adaptation
    * toward 0.8 acceptance during the tune phase (Algorithm 6), max
    * tree depth 10, identity mass matrix — the data are standardized
    * before fitting, so parameter scales are O(1) (the reference
    * adapts a diagonal mass via nuts-rs; documented deviation). */
  def nutsFit(model: FitModel, t: Array[Double], m: Array[Double],
      invErr: Array[Double], ib: InitsBounds,
      numTune: Int = 200, numDraws: Int = 200, seed: Long = 0L,
      lnPrior: Array[Double] => Double = LnPrior.flat): Array[Double] = {
    val np = model.nParams
    val rng = new java.util.SplittableRandom(seed)
    val flatPrior = lnPrior eq LnPrior.flat

    def inBounds(p: Array[Double]): Boolean = {
      var i = 0
      while (i < np) {
        if (p(i) < ib.lower(i) || p(i) > ib.upper(i)) return false
        i += 1
      }
      true
    }

    var bestP = ib.init.clone()
    var bestChi = chi2(model, t, m, invErr, bestP)

    /** (logp, grad logp); tracks the global min-chi2 position. */
    def logpGrad(p: Array[Double]): (Double, Array[Double]) = {
      val g = new Array[Double](np)
      if (!inBounds(p)) return (Double.NegativeInfinity, g)
      var chi = 0.0
      var i = 0
      while (i < t.length) {
        val diff = model.model(t(i), p) - m(i)
        val w2 = invErr(i) * invErr(i)
        chi += w2 * diff * diff
        val jr = model.jacobian(t(i), p)
        var j = 0
        while (j < np) { g(j) += 2.0 * w2 * diff * jr(j); j += 1 }
        i += 1
      }
      if (chi < bestChi && java.lang.Double.isFinite(chi)) {
        bestChi = chi; bestP = p.clone()
      }
      val lp = lnPrior(p)
      var j = 0
      while (j < np) {
        val pg = if (flatPrior) 0.0 else {
          val h = 1e-6 * math.max(1.0, math.abs(p(j)))
          val pp = p.clone(); pp(j) += h
          val pm = p.clone(); pm(j) -= h
          (lnPrior(pp) - lnPrior(pm)) / (2 * h)
        }
        g(j) = -0.5 * g(j) + pg
        j += 1
      }
      (-0.5 * chi + lp, g)
    }

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    final case class State(p: Array[Double], r: Array[Double],
      logp: Double, grad: Array[Double])

    def leapfrog(s: State, eps: Double): State = {
      val r1 = Array.tabulate(np)(i => s.r(i) + 0.5 * eps * s.grad(i))
      val p1 = Array.tabulate(np)(i => s.p(i) + eps * r1(i))
      val (lp, g) = logpGrad(p1)
      val r2 = Array.tabulate(np)(i => r1(i) + 0.5 * eps * g(i))
      State(p1, r2, lp, g)
    }

    def joint(s: State): Double = s.logp - 0.5 * dot(s.r, s.r)

    val DeltaMax = 1000.0
    val MaxDepth = 10

    // tree node: (minus, plus, sample, nValid, noUturn, sumAlpha, nAlpha)
    final case class Tree(minus: State, plus: State, sample: Array[Double],
      n: Long, s: Boolean, alpha: Double, nAlpha: Long)

    def noUturn(minus: State, plus: State): Boolean = {
      val dp = Array.tabulate(np)(i => plus.p(i) - minus.p(i))
      dot(dp, minus.r) >= 0.0 && dot(dp, plus.r) >= 0.0
    }

    def buildTree(s0: State, logu: Double, dir: Int, depth: Int,
        eps: Double, joint0: Double): Tree = {
      if (depth == 0) {
        val s1 = leapfrog(s0, dir * eps)
        val j1 = joint(s1)
        val n = if (logu <= j1) 1L else 0L
        val keep = logu < j1 + DeltaMax
        val a = math.min(1.0, math.exp(j1 - joint0))
        Tree(s1, s1, s1.p, n, keep, if (j1.isNaN) 0.0 else a, 1L)
      } else {
        val inner = buildTree(s0, logu, dir, depth - 1, eps, joint0)
        if (!inner.s) inner
        else {
          val outer =
            if (dir == -1) buildTree(inner.minus, logu, dir, depth - 1, eps, joint0)
            else buildTree(inner.plus, logu, dir, depth - 1, eps, joint0)
          val minus = if (dir == -1) outer.minus else inner.minus
          val plus = if (dir == -1) inner.plus else outer.plus
          val nTot = inner.n + outer.n
          val sample =
            if (nTot > 0 && rng.nextDouble() < outer.n.toDouble / nTot) outer.sample
            else inner.sample
          Tree(minus, plus, sample, nTot,
            outer.s && noUturn(minus, plus),
            inner.alpha + outer.alpha, inner.nAlpha + outer.nAlpha)
        }
      }
    }

    // initial state + reasonable first step size (Alg. 4, simplified:
    // double/halve until the first leapfrog's acceptance crosses 0.5)
    var (lp0, g0) = logpGrad(ib.init)
    var cur = State(ib.init.clone(), new Array[Double](np), lp0, g0)
    var eps = 0.1
    if (java.lang.Double.isFinite(lp0)) {
      val r0 = Array.fill(np)(rng.nextGaussian())
      val s0 = cur.copy(r = r0)
      val j0 = joint(s0)
      var a0 = joint(leapfrog(s0, eps)) - j0
      if (!a0.isNaN) {
        val dir = if (a0 > math.log(0.5)) 1 else -1
        var guard = 0
        while (guard < 40 && {
          val jj = joint(leapfrog(s0, eps)) - j0
          !jj.isNaN && dir * jj > -dir * math.log(2.0)
        }) { eps *= math.pow(2.0, dir); guard += 1 }
      }
    }

    // dual averaging constants (Alg. 6)
    val mu = math.log(10.0 * eps)
    val gammaDA = 0.05; val t0 = 10.0; val kappa = 0.75
    val targetAccept = 0.8
    var hBar = 0.0; var logEpsBar = 0.0

    var it = 1
    val total = numTune + numDraws
    while (it <= total) {
      val r0 = Array.fill(np)(rng.nextGaussian())
      val s0 = cur.copy(r = r0)
      val j0 = joint(s0)
      if (java.lang.Double.isFinite(j0)) {
        val logu = j0 + math.log(rng.nextDouble())
        var minus = s0; var plus = s0
        var sample = cur.p
        var n = 1L; var keep = true; var depth = 0
        var alpha = 0.0; var nAlpha = 1L
        while (keep && depth < MaxDepth) {
          val dir = if (rng.nextBoolean()) 1 else -1
          val tree =
            if (dir == -1) buildTree(minus, logu, dir, depth, eps, j0)
            else buildTree(plus, logu, dir, depth, eps, j0)
          if (dir == -1) minus = tree.minus else plus = tree.plus
          if (tree.s && tree.n > 0 &&
              rng.nextDouble() < math.min(1.0, tree.n.toDouble / n))
            sample = tree.sample
          n += tree.n
          keep = tree.s && noUturn(minus, plus)
          alpha = tree.alpha; nAlpha = tree.nAlpha
          depth += 1
        }
        val (lpNew, gNew) = logpGrad(sample)
        cur = State(sample, new Array[Double](np), lpNew, gNew)
        // step-size adaptation during tune only
        if (it <= numTune) {
          val w = 1.0 / (it + t0)
          hBar = (1.0 - w) * hBar + w * (targetAccept - alpha / nAlpha)
          val logEps = mu - math.sqrt(it.toDouble) / gammaDA * hBar
          val wk = math.pow(it.toDouble, -kappa)
          logEpsBar = wk * logEps + (1.0 - wk) * logEpsBar
          eps = math.exp(logEps)
          if (it == numTune) eps = math.exp(logEpsBar)
        }
      }
      it += 1
    }
    bestP
  }

  /** Levenberg-Marquardt weighted least squares — the engine's
    * analogue of the reference's GSL `LmsderCurveFit`
    * (nl_fit/lmsder.rs:24-44: analytic-Jacobian LM, max_iter 10,
    * parameter tolerance 1e-4, NO bounds and NO priors), built on
    * commons-math3's LevenbergMarquardtOptimizer instead of GSL.
    * Minimizes sum((invErr * (model - m))^2) from `x0`; returns `x0`
    * unchanged if the solver fails or diverges to non-finite
    * parameters (GSL likewise hands back its last iterate). */
  def lmFit(model: FitModel, t: Array[Double], m: Array[Double],
      invErr: Array[Double], x0: Array[Double], maxIter: Int = 10): Array[Double] = {
    import org.apache.commons.math3.fitting.leastsquares.{LeastSquaresBuilder, LevenbergMarquardtOptimizer, MultivariateJacobianFunction}
    import org.apache.commons.math3.linear.{Array2DRowRealMatrix, ArrayRealVector, RealMatrix, RealVector}
    val mjf = new MultivariateJacobianFunction {
      override def value(point: RealVector): org.apache.commons.math3.util.Pair[RealVector, RealMatrix] = {
        val p = point.toArray
        val n = t.length
        val r = new Array[Double](n)
        val jac = Array.ofDim[Double](n, p.length)
        var i = 0
        while (i < n) {
          r(i) = invErr(i) * (model.model(t(i), p) - m(i))
          val g = model.jacobian(t(i), p)
          var j = 0
          while (j < g.length) { jac(i)(j) = invErr(i) * g(j); j += 1 }
          i += 1
        }
        new org.apache.commons.math3.util.Pair(
          new ArrayRealVector(r, false): RealVector,
          new Array2DRowRealMatrix(jac, false): RealMatrix)
      }
    }
    val problem = new LeastSquaresBuilder()
      .start(x0.clone())
      .model(mjf)
      .target(new Array[Double](t.length))
      .maxEvaluations(200 * math.max(1, maxIter))
      .maxIterations(20 * math.max(1, maxIter))
      .build()
    val opt = new LevenbergMarquardtOptimizer(100.0, ParamTol, ParamTol,
      ParamTol, org.apache.commons.math3.util.Precision.SAFE_MIN)
    try {
      val fitted = opt.optimize(problem).getPoint.toArray
      if (fitted.forall(java.lang.Double.isFinite)) fitted else x0
    } catch {
      // commons-math LM failures (TooManyEvaluations, Convergence
      // "singular problem", SingularMatrix) extend
      // MathIllegalState/ArgumentException, i.e. plain
      // IllegalState/IllegalArgumentException — NOT MathRuntimeException
      case scala.util.control.NonFatal(_) => x0
    }
  }
}

/** Fit driver selection, mirroring the reference's CurveFitAlgorithm
  * (nl_fit/mod.rs): the MCMC path with a derivative-free polish (our
  * default), the pure LM path (reference `Lmsder`), and MCMC with LM
  * fine-tuning (reference `Mcmc { fine_tuning: Some(lmsder) }`). */
sealed trait FitAlgorithm extends Serializable
object FitAlgorithm {
  case object McmcNm extends FitAlgorithm
  case object Lmsder extends FitAlgorithm
  case object McmcLmsder extends FitAlgorithm
  /** NUTS HMC with an optional fine-tuning pass on the best draw
    * (reference `Nuts { fine_tuning_algorithm }`). */
  final case class Nuts(fineTune: Option[FitAlgorithm] = None) extends FitAlgorithm
}

/** A *Fit feature: normalize, fit (MCMC + Nelder-Mead polish), emit
  * original-units parameters followed by the reduced chi2
  * (fit_eval! macro, macros.rs:128-177). */
final case class CurveFitFeature(model: NonlinearFit.FitModel,
    nIterations: Int = 128, seed: Long = 0L,
    algorithm: FitAlgorithm = FitAlgorithm.McmcNm) extends Feature {
  import NonlinearFit._

  val name: String = model.name
  override val names: Seq[String] =
    model.paramNames.map(p => s"${model.name}_$p") :+ s"${model.name}_reduced_chi2"
  override val minTsLength: Int = model.nParams + 1
  override val variabilityRequired = true
  override val tRequired = true
  override val wRequired = true

  def evalNoCheck(lc: LightCurve): Array[Double] = {
    // standardize t, m; scale 1/sigma by m_std (data.rs:16-76)
    val tMean = lc.tMean
    val tStd = lc.tStd
    val mMean = lc.mMean
    val mStd = lc.mStd
    if (mStd == 0.0 || tStd == 0.0) throw FlatSeriesException
    val t = lc.t.map(x => (x - tMean) / tStd)
    val m = lc.m.map(x => (x - mMean) / mStd)
    val invErr = lc.w.map(w => math.sqrt(w) * mStd)

    // data-driven inits/bounds on the normalized series
    var tPeak = t(0); var mMax = m(0); var mMin = m(0)
    var i = 1
    while (i < m.length) {
      if (m(i) >= mMax) { mMax = m(i); tPeak = t(i) }
      if (m(i) < mMin) mMin = m(i)
      i += 1
    }
    val ib = model.initsBounds(t(0), t(t.length - 1), tPeak, mMin, mMax)

    val best = algorithm match {
      case FitAlgorithm.McmcNm =>
        val coarse = mcmcFit(model, t, m, invErr, ib, nIterations, seed)
        nelderMead(p => chi2Of(t, m, invErr, p), coarse, ib.lower, ib.upper)
      case FitAlgorithm.Lmsder =>
        lmFit(model, t, m, invErr, ib.init)
      case FitAlgorithm.McmcLmsder =>
        val coarse = mcmcFit(model, t, m, invErr, ib, nIterations, seed)
        lmFit(model, t, m, invErr, coarse)
      case FitAlgorithm.Nuts(fineTune) =>
        val draw = nutsFit(model, t, m, invErr, ib, seed = seed)
        fineTune match {
          case None => draw
          case Some(FitAlgorithm.Lmsder) | Some(FitAlgorithm.McmcLmsder) =>
            lmFit(model, t, m, invErr, draw)
          case Some(_) =>
            nelderMead(p => chi2Of(t, m, invErr, p), draw, ib.lower, ib.upper)
        }
    }
    val redChi2 = chi2Of(t, m, invErr, best) / (t.length - model.nParams).toDouble

    // dimensionless -> original units
    val out = new Array[Double](model.nParams + 1)
    i = 0
    while (i < model.nParams) {
      out(i) = model.paramKinds(i) match {
        case MScale => best(i) * mStd
        case MLoc => best(i) * mStd + mMean
        case TLoc => best(i) * tStd + tMean
        case TScale => best(i) * tStd
        case Unitless => best(i)
      }
      i += 1
    }
    out(model.nParams) = redChi2
    out
  }

  private def chi2Of(t: Array[Double], m: Array[Double], invErr: Array[Double],
      p: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < t.length) {
      val r = invErr(i) * (model.model(t(i), p) - m(i))
      s += r * r
      i += 1
    }
    s
  }
}
