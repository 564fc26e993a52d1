package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst rewrite: point-in-interval joins become binned EQUI-joins.
  *
  * A join whose only predicate is `p >= lo AND p < hi` (any strictness
  * spelling, including BETWEEN's pair of inclusive bounds) has no equi
  * keys, so Spark plans BroadcastNestedLoopJoin (small side) or a
  * cartesian product — quadratic work, unusable at 100 TB unless one side
  * is tiny.
  * [[graft.ops.RangeJoin.pointInInterval]] is the explicit-API fix; this
  * rule applies the SAME rewrite transparently to any declarative join —
  * `points.join(ivs, p >= lo && p < hi)` or the spark.sql equivalent —
  * so SQL users get the scale plan without knowing the trick:
  *
  *   Join(P, I, p>=lo && p<hi)
  *   ⇒ Project(orig output,
  *       Filter(p>=lo && p<hi,                        // exact predicate
  *         Join(Project(P, bin=floor(p/w)),           // point: ONE bin
  *              Generate(explode(sequence(floor(lo/w), floor(hi/w))),
  *                       Filter(lo<=hi, I)),          // interval: touched bins
  *              Inner, pbin = ibin)))                  // ordinary equi-join
  *
  * Exactly-once without distinct: a point lives in exactly one bin. The
  * reversed-interval pre-filter mirrors RangeJoin (`sequence(start>stop)`
  * DESCENDS — a malformed row would replicate into bins it doesn't touch;
  * such rows match no point under the exact predicate either, so dropping
  * them is semantics-preserving). Null handling is unchanged: a null p /
  * lo / hi fails the original comparison, and here fails the equi-join
  * (null bin key) or the pre-filter.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (unset/≤0 ⇒ rule inert);
  * fires only on Inner joins whose condition is EXACTLY the two double
  * comparisons (any extra conjunct — e.g. an equi key Spark can already
  * use — leaves the plan alone). The rewritten join's condition is a pure
  * equality, so the rule cannot re-fire on its own output (the optimizer
  * runs this batch to fixpoint). Registered by
  * [[graft.functions.GraftExtensions]] via `injectOptimizerRule`.
  */
object RangeJoinBinningRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Option[Double] =
    try Option(SQLConf.get.getConfString(ConfKey, "")).filter(_.nonEmpty)
      .map(_.toDouble).filter(_ > 0)
    catch { case _: NumberFormatException => None }

  /** Canonicalize a comparison to "(bounded, bound)". Any inequality is a
    * lower bound read one way and an upper bound read the other; the
    * caller's `semanticEquals` + per-side reference checks pick the one
    * consistent reading (or none). Strictness doesn't matter for BINNING —
    * bins are coarse and the exact predicate is re-applied as the residual
    * — so >=, >, <=, < (and thus BETWEEN) all qualify.
    */
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThan(a, b)        => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((a, b))
    case LessThan(b, a)           => Some((a, b))
    case LessThanOrEqual(b, a)    => Some((a, b))
    case _                        => None
  }
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(a, b)           => Some((a, b))
    case LessThanOrEqual(a, b)    => Some((a, b))
    case GreaterThan(b, a)        => Some((a, b))
    case GreaterThanOrEqual(b, a) => Some((a, b))
    case _                        => None
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType == DoubleType

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        val rewritten = splitConjunctivePredicates(cond) match {
          case preds @ Seq(_, _) =>
            // try both (lower-pred, upper-pred) assignments; a candidate is
            // valid only when both comparisons bound the SAME expression
            // and the point/bound sides are consistent
            val point = preds.permutations.flatMap { case Seq(lp, up) =>
              for {
                (p1, lo) <- asLower(lp)
                (p2, hi) <- asUpper(up)
                if p1.semanticEquals(p2)
                out <-
                  if (refsOnly(p1, l) && refsOnly(lo, r) && refsOnly(hi, r))
                    Some(rewrite(j, w, p1, lo, hi, pointsOnLeft = true))
                  else if (refsOnly(p1, r) && refsOnly(lo, l) && refsOnly(hi, l))
                    Some(rewrite(j, w, p1, lo, hi, pointsOnLeft = false))
                  else None
              } yield out
            }.nextOption()
            point.orElse {
              // interval OVERLAP: two "≤"-type comparisons CROSSING sides
              // (lLo ≤ rHi AND rLo ≤ lHi) — each side is an interval
              preds.permutations.flatMap { case Seq(c1, c2) =>
                for {
                  (a, b) <- asUpper(c1) // a ≤ b
                  (c, d) <- asUpper(c2) // c ≤ d
                  if refsOnly(a, l) && refsOnly(b, r) &&
                    refsOnly(c, r) && refsOnly(d, l)
                } yield rewriteOverlap(j, w, lLo = a, lHi = d, rLo = c, rHi = b)
              }.nextOption()
            }
          case _ => None
        }
        rewritten.getOrElse(j)
    }
  }

  /** Overlap rewrite: both sides replicate into every bin their
    * [min(lo,hi), max(lo,hi)] span touches (min/max, NOT a proper-interval
    * filter: the raw predicate `lLo ≤ rHi AND rLo ≤ lHi` can match pairs
    * whose L or R interval is REVERSED, and a transparent rewrite must
    * preserve those rows exactly — unlike graft.ops.RangeJoin's explicit
    * API, which defines them away). Exactly-once without distinct: the
    * pair is emitted only in the bin owning max(lLo, rLo) — when the
    * predicate holds, that value provably lies inside BOTH sides' min/max
    * spans, so its bin is in both replication ranges. Reversed intervals
    * with huge spans replicate proportionally — the explicit API is the
    * right tool when inputs aren't sanitized.
    */
  private def rewriteOverlap(j: Join, w: Double,
                             lLo: Expression, lHi: Expression,
                             rLo: Expression, rHi: Expression): LogicalPlan = {
    val wLit = Literal(w, DoubleType)
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    def bin(e: Expression) = Floor(Divide(e, wLit))
    def gen(child: LogicalPlan, lo: Expression, hi: Expression, name: String) = {
      val attr = AttributeReference(name, LongType, nullable = false)()
      (attr, Generate(
        Explode(new Sequence(bin(Least(Seq(lo, hi))), bin(Greatest(Seq(lo, hi))), None, tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(attr), child = child))
    }
    val (lBin, lGen) = gen(j.left, lLo, lHi, "__graft_lbin")
    val (rBin, rGen) = gen(j.right, rLo, rHi, "__graft_rbin")
    val owner = EqualTo(lBin, bin(Greatest(Seq(lLo, rLo))))
    val equi = Join(lGen, rGen, Inner, Some(EqualTo(lBin, rBin)), j.hint)
    Project(j.output, Filter(And(j.condition.get, owner), equi))
  }

  private def rewrite(j: Join, w: Double, p: Expression,
                      lo: Expression, hi: Expression,
                      pointsOnLeft: Boolean): LogicalPlan = {
    val (points, intervals) = if (pointsOnLeft) (j.left, j.right) else (j.right, j.left)
    val wLit = Literal(w, DoubleType)
    def bin(e: Expression) = Floor(Divide(e, wLit))

    val pBin = Alias(bin(p), "__graft_pbin")()
    val pSide = Project(points.output :+ pBin, points)

    val tz = Some(SQLConf.get.sessionLocalTimeZone) // TimeZoneAware resolution
    val iBin = AttributeReference("__graft_ibin", LongType, nullable = false)()
    val iSide = Generate(
      Explode(new Sequence(bin(lo), bin(hi), None, tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iBin),
      child = Filter(LessThanOrEqual(lo, hi), intervals))

    val (nl, nr) = if (pointsOnLeft) (pSide, iSide) else (iSide, pSide)
    val equi = Join(nl, nr, Inner,
      Some(EqualTo(pBin.toAttribute, iBin)), j.hint)
    Project(j.output, Filter(j.condition.get, equi))
  }
}
