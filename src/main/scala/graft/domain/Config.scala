package graft.domain

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** The query language: a validated config ADT (reference: the Cerberus
  * schema IS the query grammar, catlas/config_validation.py:67-321; YAML +
  * Jinja2 env templating, prediction_steps.py:79-93).
  *
  * Here: JSON → ADT via Jackson (already on the Spark classpath), `${VAR}`
  * env substitution (the Jinja2 subset the reference actually uses), and
  * validation that reproduces the schema's cross-field rules — mutual
  * exclusions, regexes, ordered filter lists. Filters apply in USER ORDER
  * (filters.py:38): order is semantically visible through the cardinality
  * ledger, so it is part of the plan, not an optimizer suggestion
  * (SURVEY §4.1).
  */
sealed trait BulkFilter
case class ByIds(ids: Seq[String]) extends BulkFilter                  // F1
case class IgnoreIds(ids: Seq[String]) extends BulkFilter              // F2
case class AcceptableElements(els: Seq[String]) extends BulkFilter     // F3
case class NumElements(ns: Seq[Int]) extends BulkFilter                // F4
case class RequiredElements(els: Seq[String]) extends BulkFilter       // F5
case class MaxSize(n: Int) extends BulkFilter                          // F6
case class ActiveHost(active: Seq[String], host: Seq[String]) extends BulkFilter // F7
case class MaxHull(v: Double) extends BulkFilter                       // F10
case class BandGapRange(lo: Option[Double], hi: Option[Double]) extends BulkFilter // F11
case class SampleFraction(f: Double) extends BulkFilter                // F12
/** F9 — exactly one of conditionsList / range may be set
  * (config_validation.py:138-162: `conditions_list` excludes the pH/V
  * range keys and vice versa); resolved via [[Config.pourbaixConditions]].
  */
case class PourbaixRange(pHLower: Double, pHUpper: Double,
                         vLower: Double, vUpper: Double,
                         maxDecompositionEnergy: Double,
                         pHStep: Option[Double], vStep: Option[Double])
case class PourbaixStability(conditionsList: Option[Seq[Pourbaix.Condition]],
                             range: Option[PourbaixRange]) extends BulkFilter

sealed trait SlabFilterCfg
case class TopKByScore(score: String, topK: Option[Int],
                       topProportion: Option[Double]) extends SlabFilterCfg // A8
case class BestShift(score: String, threshold: Double) extends SlabFilterCfg // A9
case class MaxMillerCfg(v: Int) extends SlabFilterCfg // pushed INTO enumeration (SURVEY §4.1)

sealed trait StepCfg
case class InferCfg(label: String) extends StepCfg
case class TargetCfg(smiles: String, target: Option[Double], range: Option[Double],
                     lo: Option[Double], hi: Option[Double]) extends StepCfg

case class ScreenConfig(
    bulkFilters: Seq[BulkFilter],
    adsorbateSmiles: Seq[String],
    slabFilters: Seq[SlabFilterCfg],
    maxMiller: Int,
    steps: Seq[StepCfg],
    outputVerbose: Boolean)

object Config {

  val mpidRe: Regex = "^mp-\\d+$|^mvc-\\d+$".r // config_validation.py:6

  /** `${VAR}` substitution from env (prediction_steps.py:79-80's Jinja2 use). */
  def substituteEnv(raw: String, env: Map[String, String]): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r.replaceAllIn(raw,
      m => Regex.quoteReplacement(env.getOrElse(m.group(1), "")))

  def fromJson(json: String, env: Map[String, String] = sys.env): ScreenConfig = {
    val node = new ObjectMapper().readTree(substituteEnv(json, env))
    def strs(n: JsonNode): Seq[String] = n.elements().asScala.map(_.asText()).toSeq
    def ints(n: JsonNode): Seq[Int] = n.elements().asScala.map(_.asInt()).toSeq
    def optD(n: JsonNode, f: String): Option[Double] =
      if (n.has(f)) Some(n.get(f).asDouble()) else None

    // properties() comes back as a java Set — convert to Seq FIRST or the
    // user's filter order (semantically load-bearing, filters.py:38) is
    // lost to hash iteration.
    val bulkFilters = Option(node.get("bulk_filters")).toSeq
      .flatMap(_.properties().asScala.toSeq.map(e => (e.getKey, e.getValue)))
      .map {
        case ("filter_by_bulk_ids", v) => ByIds(strs(v))
        case ("filter_ignore_bulk_ids", v) => IgnoreIds(strs(v))
        case ("filter_by_acceptable_elements", v) => AcceptableElements(strs(v))
        case ("filter_by_num_elements", v) => NumElements(ints(v))
        case ("filter_by_required_elements", v) => RequiredElements(strs(v))
        case ("filter_by_object_size", v) => MaxSize(v.asInt())
        case ("filter_by_elements_active_host", v) =>
          ActiveHost(strs(v.get("active")), strs(v.get("host")))
        case ("filter_by_bulk_e_above_hull", v) => MaxHull(v.asDouble())
        case ("filter_by_bulk_band_gap", v) =>
          BandGapRange(optD(v, "min_gap"), optD(v, "max_gap"))
        case ("filter_fraction", v) => SampleFraction(v.asDouble())
        case ("filter_by_pourbaix_stability", v) =>
          val cl = if (v.has("conditions_list"))
            Some(v.get("conditions_list").elements().asScala.toSeq.map(c =>
              Pourbaix.Condition(c.get("pH").asDouble(), c.get("V").asDouble(),
                c.get("max_decomposition_energy").asDouble())))
          else None
          val rng = if (v.has("pH_lower")) {
            // pH_lower makes the whole window required (config_validation
            // .py:138-162 dependency rules): defaulting a missing bound to
            // 0.0 would silently screen the wrong pH/V window
            def req(f: String): Double = {
              // hasNonNull: an explicit JSON null must be an error too, not
              // a silent 0.0 via NullNode.asDouble()
              if (!v.hasNonNull(f)) throw new IllegalArgumentException(
                s"filter_by_pourbaix_stability: '$f' is required when pH_lower is given")
              v.get(f).asDouble()
            }
            Some(PourbaixRange(v.get("pH_lower").asDouble(),
              req("pH_upper"), req("V_lower"), req("V_upper"),
              req("max_decomposition_energy"),
              optD(v, "pH_step"), optD(v, "V_step")))
          } else None
          PourbaixStability(cl, rng)
        case (k, _) =>
          // the reference warns on unknown keys (filters.py:134-135); a
          // typed plan makes it a hard validation error instead
          throw new IllegalArgumentException(s"unknown bulk filter: $k")
      }

    val slabFilters = Option(node.get("slab_filters")).toSeq
      .flatMap(_.properties().asScala.toSeq.map(e => (e.getKey, e.getValue)))
      .map {
        case ("filter_by_max_miller_index", v) => MaxMillerCfg(v.asInt())
        case ("filter_best_shift_by_score", v) =>
          BestShift(v.get("score").asText(), v.get("threshold").asDouble())
        case ("filter_by_surface_property", v) =>
          TopKByScore(v.get("score").asText(),
            if (v.has("top_k")) Some(v.get("top_k").asInt()) else None,
            optD(v, "top_proportion"))
        case (k, _) => throw new IllegalArgumentException(s"unknown slab filter: $k")
      }

    val steps = Option(node.get("steps")).toSeq
      .flatMap(_.elements().asScala)
      .map { s =>
        s.get("type").asText() match {
          case "inference" => InferCfg(s.get("label").asText())
          case "filter_by_adsorption_energy_target" =>
            TargetCfg(s.get("adsorbate_smiles").asText(),
              optD(s, "target"), optD(s, "range"), optD(s, "min"), optD(s, "max"))
          case t => throw new IllegalArgumentException(s"unknown step type: $t")
        }
      }

    ScreenConfig(
      bulkFilters = bulkFilters,
      adsorbateSmiles = Option(node.get("adsorbate_smiles")).map(strs).getOrElse(Nil),
      slabFilters = slabFilters,
      maxMiller = Option(node.get("max_miller_index")).map(_.asInt()).getOrElse(2),
      steps = steps,
      outputVerbose = Option(node.get("verbose")).exists(_.asBoolean()))
  }

  /** Cross-field validation (config_validation.py:138-316 equivalents).
    * Returns human-readable errors; empty = valid.
    */
  def validate(c: ScreenConfig): Seq[String] = {
    val errs = Seq.newBuilder[String]
    c.bulkFilters.foreach {
      case ByIds(ids) => ids.filterNot(mpidRe.matches)
        .foreach(id => errs += s"bulk id '$id' fails ^mp-\\d+$$|^mvc-\\d+$$")
      case IgnoreIds(ids) => ids.filterNot(mpidRe.matches)
        .foreach(id => errs += s"bulk id '$id' fails ^mp-\\d+$$|^mvc-\\d+$$")
      case BandGapRange(None, None) =>
        errs += "filter_by_bulk_band_gap: at least one of min_gap/max_gap required"
      case SampleFraction(f) if f <= 0 || f > 1 =>
        errs += s"filter_fraction: $f outside (0, 1]"
      // conditions_list XOR pH/V range (config_validation.py:138-162)
      case PourbaixStability(cl, rng) =>
        if (cl.isDefined == rng.isDefined)
          errs += "filter_by_pourbaix_stability: exactly one of " +
            "conditions_list / (pH_lower..V_upper range)"
        if (cl.exists(_.isEmpty))
          errs += "filter_by_pourbaix_stability: conditions_list is empty"
        rng.foreach { r =>
          if (r.pHUpper < r.pHLower || r.vUpper < r.vLower)
            errs += "filter_by_pourbaix_stability: range upper below lower"
          if (r.pHStep.exists(_ <= 0) || r.vStep.exists(_ <= 0))
            errs += "filter_by_pourbaix_stability: steps must be positive"
        }
      case _ =>
    }
    val knownScores = Set("broken_bonds", "surface_density")
    c.slabFilters.foreach {
      case TopKByScore(score, k, p) =>
        // top_k XOR top_proportion (config_validation.py:194-203)
        if (k.isDefined == p.isDefined)
          errs += "filter_by_surface_property: exactly one of top_k/top_proportion"
        if (!knownScores.contains(score))
          errs += s"unknown slab score '$score' (known: ${knownScores.mkString(", ")})"
      case BestShift(score, thr) =>
        if (!knownScores.contains(score))
          errs += s"unknown slab score '$score' (known: ${knownScores.mkString(", ")})"
        if (thr < 0)
          errs += s"filter_best_shift_by_score: threshold $thr must be >= 0"
      case _ =>
    }
    // the reference's schema rejects unknown SMILES at validation time
    // (config_validation.py allowed-value lists); a typo here would
    // otherwise produce a silently empty screen
    val known = Fixtures.adsorbates.map(_.adsorbate_smiles).toSet
    c.adsorbateSmiles.filterNot(known.contains)
      .foreach(sm => errs += s"unknown adsorbate_smiles '$sm' (known: ${known.mkString(", ")})")
    c.steps.foreach {
      case TargetCfg(sm, t, r, lo, hi) =>
        // target±range XOR [min,max] (config_validation.py:288-316)
        val hasTarget = t.isDefined && r.isDefined
        val hasRange = lo.isDefined && hi.isDefined
        if (hasTarget == hasRange)
          errs += "energy target filter: exactly one of (target, range) / (min, max)"
        if (!known.contains(sm))
          errs += s"unknown adsorbate_smiles '$sm' in energy target filter"
        // a known-but-unselected probe smiles also soft-deletes every
        // group: the target filter must probe a smiles the cross join
        // actually enumerates
        else if (c.adsorbateSmiles.nonEmpty && !c.adsorbateSmiles.contains(sm))
          errs += s"energy target filter probes '$sm' but adsorbate_smiles " +
            s"selects only ${c.adsorbateSmiles.mkString(", ")}"
      case _ =>
    }
    if (c.steps.nonEmpty && !c.steps.head.isInstanceOf[InferCfg])
      errs += "steps: first step must be an inference"
    errs.result()
  }

  /** Resolve a validated PourbaixStability to its condition list. */
  def pourbaixConditions(p: PourbaixStability): Seq[Pourbaix.Condition] =
    p.conditionsList.getOrElse {
      val r = p.range.get
      Pourbaix.rangeConditions(r.pHLower, r.pHUpper, r.vLower, r.vUpper,
        r.maxDecompositionEnergy,
        r.pHStep.getOrElse(0.2), r.vStep.getOrElse(0.1))
    }

  def targetBounds(t: TargetCfg): (Double, Double) = (t.target, t.range) match {
    case (Some(tv), Some(r)) => (tv - r, tv + r)
    case _ => (t.lo.get, t.hi.get)
  }
}
