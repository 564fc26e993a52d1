package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Contract checks for the driver gate (smoke at sf0.001; the full oracle
  * diff runs via graft.Verify + tools/compare.py at sf0.01).
  */
class RegistrySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 with a stable non-empty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.columns.nonEmpty)
        df.count() // executes the plan
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("output column names are identifier-safe and unique (oracle contract)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, sf).columns
      assert(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
        s"$name: non-identifier columns ${cols.mkString(",")}")
      assert(cols.distinct.length == cols.length, s"$name: duplicate columns")
    }
  }

  // ---------------------------------------------------------------------
  // The Q_CAP plan lint — mechanizing the rule the sf10 probes had to
  // re-discover THREE times (sim10 r8, sim14 r9, sr2 r10, latent in
  // sim1/sim4/sim5/sim7/sim8/sim9): a query set sampled with a bare
  // `id % MOD == r` grows proportionally to the corpus, and when that
  // set feeds a join (broadcast query set × corpus scan) the query goes
  // quadratic at scale. The rule: every modulo-SAMPLE filter (modulus
  // ≥ 10 — parity/small-bucket splits are linear partitions, not
  // samples) that sits under a join must be accompanied by an absolute
  // cap (`attr < K`) on the same attribute somewhere in the plan.
  // Runs on the ANALYZED plan, so any spelling (Column DSL, expr(),
  // SQL) is caught at birth.
  // ---------------------------------------------------------------------

  private object SampleCapLint {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

    private def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case other => other
    }
    private def attrName(e: Expression): Option[String] = stripCast(e) match {
      case a: Attribute => Some(a.name)
      case _ => None
    }
    private def litLong(e: Expression): Option[Long] =
      if (e.foldable) e.eval() match {
        case n: java.lang.Number => Some(n.longValue)
        case _ => None
      } else None

    /** Attribute names filtered by `attr % m == r` with a sampling-rate
      * modulus (m ≥ 10) against a constant residue.
      */
    private def samples(cond: Expression): Seq[String] = cond.collect {
      case EqualTo(l, r) =>
        Seq((l, r), (r, l)).flatMap { case (x, v) =>
          stripCast(x) match {
            case m: Remainder =>
              for (a <- attrName(m.left); mod <- litLong(m.right)
                   if mod >= 10; _ <- litLong(v)) yield a
            case m: Pmod =>
              for (a <- attrName(m.left); mod <- litLong(m.right)
                   if mod >= 10; _ <- litLong(v)) yield a
            case _ => None
          }
        }
    }.flatten

    /** Attribute names bounded above by a constant (`a < K`, `a <= K`,
      * `K > a`, `K >= a`) — the absolute-cap side of the rule.
      */
    private def caps(cond: Expression): Seq[String] = cond.collect {
      case LessThan(l, r) if litLong(r).isDefined => attrName(l)
      case LessThanOrEqual(l, r) if litLong(r).isDefined => attrName(l)
      case GreaterThan(l, r) if litLong(l).isDefined => attrName(r)
      case GreaterThanOrEqual(l, r) if litLong(l).isDefined => attrName(r)
    }.flatten

    /** Violations: sampled-but-uncapped attribute names on Filters that
      * sit under (are descendants of) a Join — the exhaustive-side shape.
      * The cap may live in any Filter of the plan (the cap and the sample
      * are often separate conjuncts after pushdown).
      */
    def violations(plan: LogicalPlan): Seq[String] = {
      val capped: Set[String] =
        plan.collect { case f: Filter => caps(f.condition) }.flatten.toSet
      def walk(p: LogicalPlan, underJoin: Boolean): Seq[String] = {
        val here = p match {
          case f: Filter if underJoin =>
            samples(f.condition).distinct.filterNot(capped)
              .map(a => s"'$a' is %-sampled under a join with no absolute cap")
          case _ => Nil
        }
        val childUnder = underJoin || p.isInstanceOf[Join]
        here ++ p.children.flatMap(walk(_, childUnder))
      }
      walk(plan, underJoin = false).distinct
    }
  }

  test("plan lint: modulo-sampled query sets under a join carry an " +
    "absolute cap (the Q_CAP rule, mechanized)") {
    // deliberate exceptions, each with the documented linearity argument
    val allow: Map[String, String] = Map(
      // SemDeDup's recipe NEEDS C ∝ N seeds: within-cluster pair work is
      // N²/C, so a GROWING cluster count is what keeps the query linear
      // (SimilarityQueries' CENT_CAP scaladoc documents the measurement)
      "d11b_semdedup_kmeans" -> "C ∝ N is the SemDeDup linearity recipe",
      "d11_semdedup_apply" -> "same k-means seed recipe as d11b",
      // Deterministic corpus PARTITIONS (not query samples): both halves
      // of the split flow into a KEYED equi-join whose cost is
      // output-bounded, so a split growing with the corpus is the
      // intended linear semantics. The defect class the lint hunts is a
      // sampled set × corpus-scan (broadcast/exhaustive scoring).
      "cdc2_snapshot_diff" -> ("residue splits SIMULATE two snapshots; " +
        "one keyed full-outer join"),
      "cdc4_delta_join" -> ("residue splits SIMULATE insert deltas; " +
        "keyed dim joins, partials merged"),
      "dq4_profile_drift" -> ("residue splits SIMULATE two versions; " +
        "profiles are single aggregates, join is O(columns)"),
      "t8_decontaminate" -> ("bench slice is a corpus partition; " +
        "gram-keyed posting join is output-bounded"),
      "t22_contamination_report" -> "same bench-slice partition as t8",
      "t17_bloom_decontaminate" -> ("bench slice feeds a BOUNDED Bloom " +
        "bitset aggregate, never a row join"),
      "mm6_payload_neardup" -> ("residue INJECTS retouched twin fixtures " +
        "(near-dups scale with the corpus by design); banded simhash join"))
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if allow.contains(name) => Nil
      case (name, fn) =>
        SampleCapLint.violations(fn(spark, sf).queryExecution.analyzed)
          .map(v => s"$name: $v")
    }
    assert(failures.isEmpty,
      "uncapped modulo samples under a join (add `attr < CAP` per the " +
        "Q_CAP rule):\n" + failures.mkString("\n"))
  }

  test("plan lint is failing-by-construction on the pre-fix sr2 spelling") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
    // sr2's round-9 query-set derivation: bare % QMOD, no absolute cap —
    // the exact shape the round-10 sf10 probe measured at 33.1× per 10×
    val preFix = graft.ops.Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 5)
    assert(SampleCapLint.violations(preFix.queryExecution.analyzed).nonEmpty,
      "the lint must flag the pre-fix sr2 query-set spelling")
    // and the fixed spelling (absolute cap alongside the sample) passes
    val postFix = graft.ops.Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2000),
      "vec_id", "embedding", 5)
    assert(SampleCapLint.violations(postFix.queryExecution.analyzed).isEmpty,
      "the lint must accept the capped spelling")
  }

  // ---------------------------------------------------------------------
  // The broadcast-cross-join lint — mechanizing the other standing scale
  // rule (until now enforced only by per-round grep): a join with NO
  // equi-key executes as CartesianProduct / BroadcastNestedLoopJoin, and
  // at 100 TB that is only survivable when one side is a KNOWN-small
  // frame that actually broadcasts. Every such join in every registered
  // query must either carry an explicit broadcast hint or have a side
  // whose row bound is statically ≤ 1 (scalar aggregates). Runs on the
  // OPTIMIZED plan so pushed-down/rewritten joins (range-join binning,
  // as-of plans) are judged in their executable shape.
  // ---------------------------------------------------------------------

  private object CrossJoinLint {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._

    private def equiKeyed(j: Join): Boolean = j.condition.exists { c =>
      c.collect {
        case EqualTo(l, r) => (l, r)
        case EqualNullSafe(l, r) => (l, r)
      }.exists { case (l, r) =>
        (l.references.subsetOf(j.left.outputSet) &&
          r.references.subsetOf(j.right.outputSet)) ||
        (r.references.subsetOf(j.left.outputSet) &&
          l.references.subsetOf(j.right.outputSet))
      }
    }

    private def broadcastHinted(j: Join): Boolean =
      j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
        j.hint.rightHint.exists(_.strategy.contains(BROADCAST))

    /** A side that cannot exceed one row (scalar aggregate / limit 1)
      * broadcasts by construction — no hint needed.
      */
    private def scalarSide(j: Join): Boolean =
      j.left.maxRows.exists(_ <= 1L) || j.right.maxRows.exists(_ <= 1L)

    def violations(plan: LogicalPlan): Seq[String] = plan.collect {
      case j: Join if !equiKeyed(j) && !broadcastHinted(j) && !scalarSide(j) =>
        s"non-equi ${j.joinType} join with no broadcast hint " +
          s"(cond: ${j.condition.map(_.sql).getOrElse("none")})"
    }

    def check(df: org.apache.spark.sql.DataFrame): Seq[String] =
      violations(df.queryExecution.optimizedPlan)
  }

  test("plan lint: every non-equi join broadcasts a known-small side " +
    "(the cross-join rule, mechanized)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        CrossJoinLint.check(fn(spark, sf)).map(v => s"$name: $v")
    }
    assert(failures.isEmpty,
      "non-equi joins without a broadcast side (hint the dimension or " +
        "re-key the join):\n" + failures.mkString("\n"))
  }

  test("cross-join lint is failing-by-construction on an unhinted " +
    "cartesian and green on the hinted spelling") {
    import org.apache.spark.sql.functions.broadcast
    val a = graft.Tables.region(spark, sf)
    val b = graft.Tables.nation(spark, sf)
    assert(CrossJoinLint.check(a.crossJoin(b)).nonEmpty,
      "the lint must flag an unhinted cartesian join")
    assert(CrossJoinLint.check(a.crossJoin(broadcast(b))).isEmpty,
      "the lint must accept the broadcast-hinted spelling")
  }

  test("every query is run-to-run deterministic (hash of sorted rows)") {
    def fingerprint(name: String): Int = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect().map(_.toString).sorted.mkString("\n").hashCode
    }
    // skip the seeded sample (partitioning-dependent by design)
    val names = SparkEntry.queries.keys.filterNot(_ == "f12_sample_fraction").toSeq.sorted
    val first = names.map(n => n -> fingerprint(n)).toMap
    val diffs = names.filter(n => fingerprint(n) != first(n))
    assert(diffs.isEmpty, s"nondeterministic queries: $diffs")
  }
}
