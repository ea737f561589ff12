package graft.ref

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * JSON (de)serialization of feature configurations — the reference's
 * serde surface (its features ser/de as externally-tagged JSON and
 * round-trip to equal evaluators, src/tests.rs:308-359): a user can
 * persist an extractor configuration and rebuild the identical
 * pipeline. Format: `{"Name": {param: value, ...}}`, nested features
 * as arrays of the same shape.
 */
object FeatureJson {

  private val mapper = new ObjectMapper()

  // ---------------- write ----------------

  def toJson(f: Feature): String = mapper.writeValueAsString(node(f))

  def toJson(fs: Seq[Feature]): String = {
    val arr = mapper.createArrayNode()
    fs.foreach(f => arr.add(node(f)))
    mapper.writeValueAsString(arr)
  }

  /** Flat string form of a fit algorithm (the reference nests a
    * CurveFitAlgorithm object; a string keeps this schema simple while
    * covering the same choices, incl. NUTS fine-tuning as a suffix). */
  private[ref] def algName(a: FitAlgorithm): String = a match {
    case FitAlgorithm.McmcNm => "mcmc_nm"
    case FitAlgorithm.Lmsder => "lmsder"
    case FitAlgorithm.McmcLmsder => "mcmc_lmsder"
    case FitAlgorithm.Nuts(None) => "nuts"
    case FitAlgorithm.Nuts(Some(ft)) => s"nuts+${algName(ft)}"
  }

  private[ref] def parseAlg(s: String): FitAlgorithm = s match {
    case "mcmc_nm" => FitAlgorithm.McmcNm
    case "lmsder" => FitAlgorithm.Lmsder
    case "mcmc_lmsder" => FitAlgorithm.McmcLmsder
    case "nuts" => FitAlgorithm.Nuts(None)
    case n if n.startsWith("nuts+") =>
      FitAlgorithm.Nuts(Some(parseAlg(n.stripPrefix("nuts+"))))
    case other => throw new IllegalArgumentException(s"unknown fit algorithm: $other")
  }

  private def tag(name: String)(fill: ObjectNode => Unit): ObjectNode = {
    val outer = mapper.createObjectNode()
    val inner = outer.putObject(name)
    fill(inner)
    outer
  }

  private def node(f: Feature): ObjectNode = f match {
    case Features.BeyondNStd(nstd) => tag("BeyondNStd")(_.put("nstd", nstd))
    case Features.BiweightScale(c) => tag("BiweightScale")(_.put("c", c))
    case Features.InterPercentileRange(q) =>
      tag("InterPercentileRange")(_.put("quantile", q))
    case Features.MagnitudePercentageRatio(qn, qd) =>
      tag("MagnitudePercentageRatio")(o => { o.put("quantile_numerator", qn); o.put("quantile_denominator", qd) })
    case Features.MedianBufferRangePercentage(q) =>
      tag("MedianBufferRangePercentage")(_.put("quantile", q))
    case Features.PercentDifferenceMagnitudePercentile(q) =>
      tag("PercentDifferenceMagnitudePercentile")(_.put("quantile", q))
    case p: PeriodogramFeature =>
      tag("Periodogram") { o =>
        o.put("peaks", p.peaks)
        o.put("resolution", p.params.resolution)
        o.put("max_freq_factor", p.params.maxFreqFactor)
        o.put("nyquist", p.params.nyquist match {
          case Periodogram.AverageNyquist => "average"
          case Periodogram.MedianNyquist => "median"
          case Periodogram.QuantileNyquist(q) => s"quantile:$q"
          case Periodogram.FixedNyquist(v) => s"fixed:$v"
        })
        o.put("normalization", p.normalization match {
          case Periodogram.Psd => "psd"
          case Periodogram.Standard => "standard"
          case Periodogram.Model => "model"
          case Periodogram.LogNorm => "log"
        })
        o.put("fast", p.useFft)
        // FreqGridStrategy: absent = dynamic (from resolution/nyquist),
        // present = fixed grid (freq.rs FreqGridStrategy::Fixed)
        p.fixedGrid.foreach { g =>
          val fg = o.putObject("freq_grid")
          g match {
            case Periodogram.ArbitraryGrid(freqs) =>
              val a = fg.putArray("arbitrary")
              freqs.foreach(a.add)
            case Periodogram.LinearGrid(start, step, size) =>
              val l = fg.putObject("linear")
              l.put("start", start); l.put("step", step); l.put("size", size)
            case Periodogram.ZeroBasedPow2Grid(step, log2) =>
              val z = fg.putObject("pow2")
              z.put("step", step); z.put("log2_size_m1", log2)
          }
        }
        val arr = o.putArray("phase_features")
        p.phaseFeatures.foreach(pf => arr.add(node(pf)))
      }
    case Transformed(inner, tr) =>
      tag("Transformed") { o =>
        o.set[JsonNode]("feature", node(inner))
        o.put("transformer", tr match {
          case Transformer.Identity => "identity"
          case Transformer.Arcsinh => "arcsinh"
          case Transformer.Ln1p => "ln1p"
          case Transformer.Lg => "lg"
          case Transformer.Sqrt => "sqrt"
          case Transformer.ClippedLg(mv) => s"clipped_lg:$mv"
          case c: Transformer.Composed =>
            throw new IllegalArgumentException(s"composed transformer not serializable: $c")
        })
      }
    case cf: CurveFitFeature =>
      tag(cf.model match {
        case NonlinearFit.BazinModel => "BazinFit"
        case NonlinearFit.VillarModel => "VillarFit"
        case NonlinearFit.LinexpModel => "LinexpFit"
      })(o => {
        o.put("niterations", cf.nIterations); o.put("seed", cf.seed)
        o.put("algorithm", FeatureJson.algName(cf.algorithm))
      })
    case BinsFeature(inner, window, offset) =>
      tag("Bins") { o =>
        o.put("window", window)
        o.put("offset", offset)
        val arr = o.putArray("features")
        inner.foreach(f => arr.add(node(f)))
      }
    case simple =>
      // parameterless case objects serialize by their class name
      tag(simple.getClass.getSimpleName.stripSuffix("$"))(_ => ())
  }

  // ---------------- read ----------------

  def parseOne(json: String): Feature = fromNode(mapper.readTree(json))

  def parseList(json: String): Seq[Feature] = {
    val root = mapper.readTree(json)
    require(root.isArray, "expected a JSON array of features")
    (0 until root.size()).map(i => fromNode(root.get(i)))
  }

  private def fromNode(n: JsonNode): Feature = {
    require(n.isObject && n.size() == 1, s"expected externally-tagged object, got $n")
    val name = n.fieldNames().next()
    val b = n.get(name)
    def d(field: String, dflt: Double): Double =
      if (b.has(field)) b.get(field).asDouble() else dflt
    name match {
      case "BeyondNStd" => Features.BeyondNStd(d("nstd", 1.0))
      case "BiweightScale" => Features.BiweightScale(d("c", 9.0))
      case "InterPercentileRange" => Features.InterPercentileRange(d("quantile", 0.25))
      case "MagnitudePercentageRatio" =>
        Features.MagnitudePercentageRatio(
          d("quantile_numerator", 0.4), d("quantile_denominator", 0.05))
      case "MedianBufferRangePercentage" =>
        Features.MedianBufferRangePercentage(d("quantile", 0.1))
      case "PercentDifferenceMagnitudePercentile" =>
        Features.PercentDifferenceMagnitudePercentile(d("quantile", 0.05))
      case "Periodogram" =>
        val nyquist = b.get("nyquist").asText() match {
          case "average" => Periodogram.AverageNyquist
          case "median" => Periodogram.MedianNyquist
          case s if s.startsWith("quantile:") =>
            Periodogram.QuantileNyquist(s.stripPrefix("quantile:").toDouble)
          case s if s.startsWith("fixed:") =>
            Periodogram.FixedNyquist(s.stripPrefix("fixed:").toDouble)
        }
        val norm = b.get("normalization").asText() match {
          case "psd" => Periodogram.Psd
          case "standard" => Periodogram.Standard
          case "model" => Periodogram.Model
          case "log" => Periodogram.LogNorm
        }
        val phase = Option(b.get("phase_features"))
          .map(a => (0 until a.size()).map(i => fromNode(a.get(i))).toSeq)
          .getOrElse(Seq.empty)
        val fixedGrid = Option(b.get("freq_grid")).map { fg =>
          if (fg.has("arbitrary")) {
            val a = fg.get("arbitrary")
            Periodogram.ArbitraryGrid(
              (0 until a.size()).map(i => a.get(i).asDouble()).toArray)
          } else if (fg.has("linear")) {
            val l = fg.get("linear")
            Periodogram.LinearGrid(l.get("start").asDouble(),
              l.get("step").asDouble(), l.get("size").asInt())
          } else if (fg.has("pow2")) {
            val z = fg.get("pow2")
            Periodogram.ZeroBasedPow2Grid(z.get("step").asDouble(),
              z.get("log2_size_m1").asInt())
          } else throw new IllegalArgumentException(s"unknown freq_grid: $fg")
        }
        PeriodogramFeature(b.get("peaks").asInt(),
          Periodogram.GridParams(d("resolution", 10.0), d("max_freq_factor", 1.0), nyquist),
          norm, b.get("fast").asBoolean(), phase, fixedGrid)
      case "Transformed" =>
        val tr = b.get("transformer").asText() match {
          case "identity" => Transformer.Identity
          case "arcsinh" => Transformer.Arcsinh
          case "ln1p" => Transformer.Ln1p
          case "lg" => Transformer.Lg
          case "sqrt" => Transformer.Sqrt
          case s if s.startsWith("clipped_lg:") =>
            Transformer.ClippedLg(s.stripPrefix("clipped_lg:").toDouble)
        }
        Transformed(fromNode(b.get("feature")), tr)
      case "BazinFit" =>
        CurveFitFeature(NonlinearFit.BazinModel, b.get("niterations").asInt(),
          b.get("seed").asLong(),
          if (b.has("algorithm")) parseAlg(b.get("algorithm").asText())
          else FitAlgorithm.McmcNm)
      case "VillarFit" =>
        CurveFitFeature(NonlinearFit.VillarModel, b.get("niterations").asInt(),
          b.get("seed").asLong(),
          if (b.has("algorithm")) parseAlg(b.get("algorithm").asText())
          else FitAlgorithm.McmcNm)
      case "LinexpFit" =>
        CurveFitFeature(NonlinearFit.LinexpModel, b.get("niterations").asInt(),
          b.get("seed").asLong(),
          if (b.has("algorithm")) parseAlg(b.get("algorithm").asText())
          else FitAlgorithm.McmcNm)
      case "Bins" =>
        val arr = b.get("features")
        BinsFeature((0 until arr.size()).map(i => fromNode(arr.get(i))).toSeq,
          d("window", 1.0), d("offset", 0.0))
      case simple => simpleByName.getOrElse(simple,
        throw new IllegalArgumentException(s"unknown feature: $simple"))
    }
  }

  // ---------------- schema emission ----------------

  /** JSON Schema (draft-07) of the configuration format accepted by
    * [[parseOne]] — the reference's schemars surface (its extractor
    * emits a schema document for config validation,
    * extractor.rs:180-184). Every feature is an externally-tagged
    * single-key object; nested features `$ref` the root definition. */
  lazy val schema: String = {
    val root = mapper.createObjectNode()
    root.put("$schema", "http://json-schema.org/draft-07/schema#")
    root.put("title", "Feature")
    root.put("$ref", "#/definitions/feature")
    val defs = root.putObject("definitions")
    val feature = defs.putObject("feature")
    feature.put("type", "object")
    feature.put("minProperties", 1)
    feature.put("maxProperties", 1)
    val oneOf = feature.putArray("oneOf")

    def variant(tag: String)(fill: ObjectNode => Unit): Unit = {
      val v = oneOf.addObject()
      v.put("type", "object")
      val props = v.putObject("properties")
      val body = props.putObject(tag)
      body.put("type", "object")
      fill(body)
      v.putArray("required").add(tag)
      v.put("additionalProperties", false)
    }
    def num(o: ObjectNode, name: String, default: Double): Unit = {
      val p = o.`with`("properties").putObject(name)
      p.put("type", "number")
      p.put("default", default)
    }
    simpleByName.keys.toSeq.sorted.foreach(t => variant(t) { b =>
      b.putObject("properties"); b.put("additionalProperties", false)
    })
    variant("BeyondNStd")(num(_, "nstd", 1.0))
    variant("BiweightScale")(num(_, "c", 9.0))
    variant("InterPercentileRange")(num(_, "quantile", 0.25))
    variant("MagnitudePercentageRatio") { b =>
      num(b, "quantile_numerator", 0.4); num(b, "quantile_denominator", 0.05)
    }
    variant("MedianBufferRangePercentage")(num(_, "quantile", 0.1))
    variant("PercentDifferenceMagnitudePercentile")(num(_, "quantile", 0.05))
    variant("Periodogram") { b =>
      val props = b.putObject("properties")
      props.putObject("peaks").put("type", "integer")
      props.putObject("resolution").put("type", "number").put("default", 10.0)
      props.putObject("max_freq_factor").put("type", "number").put("default", 1.0)
      props.putObject("nyquist").put("type", "string")
        .put("pattern", "^(average|median|quantile:.*|fixed:.*)$")
      val norm = props.putObject("normalization")
      norm.put("type", "string")
      Seq("psd", "standard", "model", "log").foreach(norm.withArray("enum").add)
      props.putObject("fast").put("type", "boolean")
      val fg = props.putObject("freq_grid")
      fg.put("type", "object")
      fg.put("minProperties", 1)
      fg.put("maxProperties", 1)
      val fgp = fg.putObject("properties")
      val arb = fgp.putObject("arbitrary")
      arb.put("type", "array")
      arb.putObject("items").put("type", "number")
      val lin = fgp.putObject("linear")
      lin.put("type", "object")
      val linp = lin.putObject("properties")
      linp.putObject("start").put("type", "number")
      linp.putObject("step").put("type", "number")
      linp.putObject("size").put("type", "integer")
      val pw2 = fgp.putObject("pow2")
      pw2.put("type", "object")
      val pw2p = pw2.putObject("properties")
      pw2p.putObject("step").put("type", "number")
      pw2p.putObject("log2_size_m1").put("type", "integer")
      val pf = props.putObject("phase_features")
      pf.put("type", "array")
      pf.putObject("items").put("$ref", "#/definitions/feature")
    }
    variant("Transformed") { b =>
      val props = b.putObject("properties")
      props.putObject("feature").put("$ref", "#/definitions/feature")
      props.putObject("transformer").put("type", "string")
        .put("pattern", "^(identity|arcsinh|ln1p|lg|sqrt|clipped_lg:.*)$")
      b.putArray("required").add("feature").add("transformer")
    }
    Seq("BazinFit", "VillarFit", "LinexpFit").foreach(t => variant(t) { b =>
      val props = b.putObject("properties")
      props.putObject("niterations").put("type", "integer")
      props.putObject("seed").put("type", "integer")
      props.putObject("algorithm").put("type", "string")
        .put("pattern", "^(nuts\\+)?(mcmc_nm|lmsder|mcmc_lmsder|nuts)$")
        .put("default", "mcmc_nm")
    })
    variant("Bins") { b =>
      val props = b.putObject("properties")
      props.putObject("window").put("type", "number").put("default", 1.0)
      props.putObject("offset").put("type", "number").put("default", 0.0)
      val fs = props.putObject("features")
      fs.put("type", "array")
      fs.putObject("items").put("$ref", "#/definitions/feature")
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Schema of an extractor configuration: a JSON array of features. */
  lazy val extractorSchema: String = {
    val root = mapper.createObjectNode()
    root.put("$schema", "http://json-schema.org/draft-07/schema#")
    root.put("title", "FeatureExtractor")
    root.put("type", "array")
    root.putObject("items").put("$ref", "#/definitions/feature")
    root.set[JsonNode]("definitions",
      mapper.readTree(schema).get("definitions"))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private val simpleByName: Map[String, Feature] = {
    import Features._
    Seq(Amplitude, AndersonDarlingNormal, Chi2Pvar, Cusum, Duration, Eta, EtaE,
      ExcessVariance, Kurtosis, LaflerKinmanStringLength, LinearFit, LinearTrend,
      MaximumSlope, MaximumTimeInterval, MinimumTimeInterval, Mean, MeanVariance,
      Median, MedianAbsoluteDeviation, ObservationCount, OtsuSplit,
      PercentAmplitude, ReducedChi2, Roms, Skew, StandardDeviation, StetsonK,
      TimeMean, TimeStandardDeviation, WeightedMean)
      .map(f => f.getClass.getSimpleName.stripSuffix("$") -> (f: Feature)).toMap
  }
}
