package graft.domain

import org.scalatest.funsuite.AnyFunSuite

class EnumerateSpec extends AnyFunSuite {

  test("miller indices: maxMiller=1 gives the 13 distinct directions") {
    val ms = Enumerate.millerIndices(1)
    assert(ms.size == 13)            // 26 coprime triples / sign symmetry
    assert(ms.contains(Seq(1, 1, 1)) && ms.contains(Seq(0, 0, 1)))
    assert(!ms.contains(Seq(0, 0, -1))) // sign-normalized away
  }

  test("miller indices: coprime only") {
    assert(!Enumerate.millerIndices(2).contains(Seq(2, 2, 2)))
    assert(Enumerate.millerIndices(2).contains(Seq(1, 2, 2)))
  }

  test("spacegroup reduction: fcc/bcc collapse 13 directions to 3 facets") {
    val fcc = Fixtures.bulks.find(_.bulk_id == "mp-126").get.bulk_structure
    val bcc = Fixtures.bulks.find(_.bulk_id == "mp-13").get.bulk_structure
    assert(Enumerate.millerIndices(fcc, 1) == Seq(Seq(1, 0, 0), Seq(1, 1, 0), Seq(1, 1, 1)))
    assert(Enumerate.millerIndices(bcc, 1).size == 3)
    // cubic point group has 48 rotation parts
    assert(Enumerate.symmetryRotations(fcc).size == 48)
    // coverage: every coprime direction is in some emitted orbit — a
    // structure with NO symmetry beyond identity emits the full set
    val asym = Structure(
      Seq(Seq(5.0, 0, 0), Seq(0, 6.0, 0), Seq(0, 0, 7.0)),
      Seq(Site("C", Seq(0.0, 0.0, 0.0), "a"),
        Site("O", Seq(0.13, 0.27, 0.41), "b")))
    assert(Enumerate.millerIndices(asym, 1).size > 3)
  }

  test("hexagonal cell: 24 rotation parts, orbits partition the candidates") {
    val a = 2.95; val c = 4.68
    val hcp = Structure(
      Seq(Seq(a, 0, 0), Seq(-a / 2, a * math.sqrt(3) / 2, 0), Seq(0, 0, c)),
      Seq(Site("Ti", Seq(0.0, 0.0, 0.0), "a"),
        Site("Ti", Seq(1.0 / 3, 2.0 / 3, 0.5), "a")))
    val ops = Enumerate.symmetryRotations(hcp)
    // P6₃/mmc rotation parts = D6h order 24 (the 6₃ screw's fractional
    // translation is found by the site test)
    assert(ops.size == 24, s"got ${ops.size}")
    val reps = Enumerate.millerIndices(hcp, 1)
    val all = Enumerate.millerIndices(1)
    assert(reps.size < all.size) // reduction happened
    def normalize(m: Seq[Int]) = {
      val sgn = if (m.find(_ != 0).get < 0) -1 else 1; m.map(_ * sgn)
    }
    def orbit(m: Seq[Int]): Set[Seq[Int]] = ops.map { w =>
      normalize(Seq(
        w(0)(0) * m(0) + w(0)(1) * m(1) + w(0)(2) * m(2),
        w(1)(0) * m(0) + w(1)(1) * m(1) + w(1)(2) * m(2),
        w(2)(0) * m(0) + w(2)(1) * m(1) + w(2)(2) * m(2)))
    }.toSet
    val orbits = reps.map(orbit)
    // pairwise disjoint and jointly covering (within the candidate range)
    for (Seq(o1, o2) <- orbits.combinations(2))
      assert(o1.intersect(o2).isEmpty, "orbits must be disjoint")
    val covered = orbits.reduce(_ ++ _)
    assert(all.forall(covered.contains), "every candidate is in some orbit")
  }

  test("symmetry rotations form a group (closure, identity, inverses)") {
    val fcc = Fixtures.bulks.find(_.bulk_id == "mp-126").get.bulk_structure
    val ops = Enumerate.symmetryRotations(fcc)
    def mul(a: Array[Array[Int]], b: Array[Array[Int]]) =
      Array.tabulate(3, 3)((i, j) =>
        a(i)(0) * b(0)(j) + a(i)(1) * b(1)(j) + a(i)(2) * b(2)(j))
    def key(w: Array[Array[Int]]) = w.map(_.toSeq).toSeq
    val set = ops.map(key).toSet
    assert(set.size == 48) // no duplicates
    assert(set.contains(Seq(Seq(1, 0, 0), Seq(0, 1, 0), Seq(0, 0, 1))))
    // closure: product of any two ops is an op (spot-check a sample)
    for (a <- ops.take(8); b <- ops.take(8))
      assert(set.contains(key(mul(a, b))))
  }

  test("termination shifts are the real atomic plane positions") {
    val fcc = Fixtures.bulks.find(_.bulk_id == "mp-126").get.bulk_structure
    // fcc (100): planes at h·f ∈ {0, 0.5}; (111): ABC stacking → all sites
    // on integer planes → single termination
    assert(Enumerate.shifts(fcc, Seq(0, 0, 1)) == Seq(0.0, 0.5))
    assert(Enumerate.shifts(fcc, Seq(1, 1, 1)) == Seq(0.0))
    val binary = Fixtures.bulks.find(_.bulk_id == "mp-79").get.bulk_structure
    assert(Enumerate.shifts(binary, Seq(0, 0, 1)) == Seq(0.0, 0.5))
  }

  test("termination dedup: equivalent lateral cuts collapse, chemistry distinct cuts stay") {
    val fcc = Fixtures.bulks.find(_.bulk_id == "mp-126").get.bulk_structure
    // fcc(100): both atomic planes are Pt and differ by an in-plane shift
    // → ONE distinct termination from the two candidates
    assert(Enumerate.distinctTerminations(fcc, Seq(1, 0, 0)).size == 1)
    val binary = Fixtures.bulks.find(_.bulk_id == "mp-79").get.bulk_structure
    // rocksalt-ish (001): Zn-terminated vs O-terminated cuts are NOT
    // translation-equivalent → both kept
    assert(Enumerate.distinctTerminations(binary, Seq(0, 0, 1)).size == 2)
  }

  test("enumeration is deterministic and copies parent columns") {
    val b = Fixtures.bulks.head
    val s1 = Enumerate.enumerateSlabs(b, 1)
    val s2 = Enumerate.enumerateSlabs(b, 1)
    assert(s1 == s2)
    assert(s1.nonEmpty)
    assert(s1.forall(_.bulk_id == b.bulk_id))
    assert(s1.forall(_.slab_max_miller_index <= 1))
  }

  test("miller slab geometry: areas and atom counts are exact for cubic cells") {
    val fcc = Fixtures.bulks.find(_.bulk_id == "mp-126").get.bulk_structure // a=3.92
    val a = 3.92
    def slab(m: Seq[Int]) = Enumerate.slabStructure(fcc, m, 0.0, nLayers = 2)
    // (001): area a², (110): a²√2, (111): a²√3 — textbook cross sections
    assert(math.abs(Geometry.surfaceArea(slab(Seq(0, 0, 1))) - a * a) < 1e-9)
    assert(math.abs(Geometry.surfaceArea(slab(Seq(1, 1, 0))) - a * a * math.sqrt(2)) < 1e-9)
    assert(math.abs(Geometry.surfaceArea(slab(Seq(1, 1, 1))) - a * a * math.sqrt(3)) < 1e-9)
    // atom conservation: |det [v1;v2;2·v3]| × 4 basis atoms
    Seq(Seq(0, 0, 1), Seq(1, 1, 0), Seq(1, 1, 1), Seq(1, 2, 2)).foreach { m =>
      val (v1, v2, v3) = Enumerate.millerBasis(m(0), m(1), m(2))
      val rows = Seq(v1, v2, v3.map(_ * 2))
      val det = math.abs(
        rows(0)(0).toLong * (rows(1)(1) * rows(2)(2) - rows(1)(2) * rows(2)(1)) -
        rows(0)(1).toLong * (rows(1)(0) * rows(2)(2) - rows(1)(2) * rows(2)(0)) +
        rows(0)(2).toLong * (rows(1)(0) * rows(2)(1) - rows(1)(1) * rows(2)(0)))
      val st = slab(m)
      assert(st.sites.size == det * 4,
        s"miller $m: expected ${det * 4} atoms, got ${st.sites.size}")
      assert(st.sites.forall(_.frac_coords.forall(c => c >= 0.0 && c < 1.0)))
    }
  }

  test("miller basis: plane vectors are orthogonal to (hkl), stacking hits 1") {
    for (h <- -2 to 2; k <- -2 to 2; l <- -2 to 2
         if !(h == 0 && k == 0 && l == 0)
         if Seq(h, k, l).map(math.abs).filter(_ != 0).reduce((a, b) =>
           BigInt(a).gcd(BigInt(b)).toInt) == 1) {
      val (v1, v2, v3) = Enumerate.millerBasis(h, k, l)
      assert(h * v1(0) + k * v1(1) + l * v1(2) == 0, s"v1 not in plane for ($h,$k,$l)")
      assert(h * v2(0) + k * v2(1) + l * v2(2) == 0, s"v2 not in plane for ($h,$k,$l)")
      assert(h * v3(0) + k * v3(1) + l * v3(2) == 1, s"v3 wrong for ($h,$k,$l)")
    }
  }

  test("adslab configs: 1..4 per combo, deterministic") {
    val c1 = Enumerate.enumerateAdslabs("k1", "*CO")
    assert(c1.nonEmpty && c1.size <= 4)
    assert(c1 == Enumerate.enumerateAdslabs("k1", "*CO"))
    assert(c1.forall(c => c.site_x >= 0 && c.site_x < 1))
  }
}

class NuclearitySpec extends AnyFunSuite {

  private val lat = Seq(Seq(10.0, 0, 0), Seq(0, 10.0, 0), Seq(0, 0, 10.0))

  test("isolated surface atom → finite nuclearity 1") {
    val s = Structure(lat, Seq(
      Site("Pt", Seq(0.5, 0.5, 0.8), "a"),   // lone surface Pt
      Site("Cu", Seq(0.1, 0.1, 0.1), "a")))  // sub-surface other
    val n = Nuclearity.nuclearity(s, Seq("Pt", "Cu"))
    assert(n("Pt").nuclearity == "1")
    assert(n("Cu").nuclearity == "0") // below surface
  }

  test("adjacent surface pair → nuclearity 2") {
    val s = Structure(lat, Seq(
      Site("Pt", Seq(0.50, 0.5, 0.8), "a"),
      Site("Pt", Seq(0.75, 0.5, 0.8), "a"))) // 2.5 Å apart → bonded
    assert(Nuclearity.nuclearity(s, Seq("Pt"))("Pt").nuclearity == "2")
  }

  test("dense wrap-around chain → infinite under replication") {
    // chain across x at spacing 2.5 Å in a 10 Å cell: connects to its own
    // periodic image → component scales with replication
    val s = Structure(lat, (0 until 4).map(i =>
      Site("Pt", Seq(i / 4.0, 0.5, 0.8), "a")))
    val label = Nuclearity.nuclearity(s, Seq("Pt"))("Pt").nuclearity
    assert(label == "infinite" || label == "semi-finite")
  }
}

class AnomalySpec extends AnyFunSuite {

  private val lat = Seq(Seq(10.0, 0, 0), Seq(0, 10.0, 0), Seq(0, 0, 10.0))
  private def st(sites: (String, Double, Double, Double)*): Structure =
    Structure(lat, sites.map { case (e, x, y, z) => Site(e, Seq(x, y, z), "a") })

  test("U12 dissociation: C-O bond broken between frames") {
    val init = st(("Pt", 0.5, 0.5, 0.4), ("C", 0.5, 0.5, 0.60), ("O", 0.5, 0.5, 0.72))
    val fin  = st(("Pt", 0.5, 0.5, 0.4), ("C", 0.5, 0.5, 0.60), ("O", 0.5, 0.5, 0.95))
    assert(Anomaly.isDissociated(init, fin, Seq(1, 2)))
    assert(!Anomaly.isDissociated(init, init, Seq(1, 2)))
  }

  test("U14 desorption: adsorbate loses all slab bonds") {
    val bound = st(("Pt", 0.5, 0.5, 0.40), ("H", 0.5, 0.5, 0.55))
    val gone  = st(("Pt", 0.5, 0.5, 0.40), ("H", 0.5, 0.5, 0.90))
    assert(!Anomaly.isDesorbed(bound, Seq(1)))
    assert(Anomaly.isDesorbed(gone, Seq(1)))
  }

  test("U13 reconstruction: slab bond broken between frames") {
    val init = st(("Pt", 0.50, 0.5, 0.4), ("Pt", 0.75, 0.5, 0.4))
    val fin  = st(("Pt", 0.50, 0.5, 0.4), ("Pt", 0.10, 0.5, 0.7))
    assert(Anomaly.hasSurfaceChanged(init, fin, Seq(0, 1)))
    assert(!Anomaly.hasSurfaceChanged(init, init, Seq(0, 1)))
  }
}

/** Seeded-mutation property tests for the U12–U14 flags: random geometry
  * perturbations (bond stretches/breaks at generator-chosen distances)
  * must flip each flag exactly when the mutation crosses the operator's
  * covalent-radius threshold — so the thresholds are falsifiable
  * off-fixture, not just pinned on the three hand-built cases above.
  * Distances are drawn from bands strictly AWAY from each cutoff (a
  * generator landing on a boundary would test float noise, not
  * semantics). All structures live on the x-axis of a 40 Å cube, far
  * from cell walls, so periodic images never participate.
  */
class AnomalyPropertySpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private val L = 40.0
  private val lat = Seq(Seq(L, 0, 0), Seq(0, L, 0), Seq(0, 0, L))
  private def chain(elems: Seq[String], xs: Seq[Double]): Structure =
    Structure(lat, elems.zip(xs).map { case (e, x) =>
      Site(e, Seq(x / L, 0.5, 0.5), "a") })

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("identical frames never flag dissociation or reconstruction") {
    val genSites = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, for {
      e <- Gen.oneOf("Pt", "Cu", "C", "O", "H")
      x <- Gen.choose(4.0, 36.0)
    } yield (e, x)))
    check(Prop.forAll(genSites) { sites =>
      val s = chain(sites.map(_._1), sites.map(_._2))
      val idx = sites.indices.take(2)
      !Anomaly.isDissociated(s, s, idx) &&
        !Anomaly.hasSurfaceChanged(s, s, sites.indices.drop(2))
    })
  }

  test("U12: a mutated C-O distance flags iff it crosses the bond cutoff") {
    // C-O cutoff at the 1.2 sub-adjacency cushion: (0.76 + 0.66) * 1.2 =
    // 1.704 Å; bands keep 0.1 Å clear of it
    val bonded = Gen.choose(0.9, 1.6)
    val broken = Gen.choose(1.9, 6.0)
    val gen = for {
      d0 <- bonded; d1 <- Gen.oneOf(bonded, broken)
      pt <- Gen.choose(8.0, 12.0)
    } yield (pt, d0, d1)
    check(Prop.forAll(gen) { case (pt, d0, d1) =>
      val init = chain(Seq("Pt", "C", "O"), Seq(pt, 20.0, 20.0 + d0))
      val fin = chain(Seq("Pt", "C", "O"), Seq(pt, 20.0, 20.0 + d1))
      Anomaly.isDissociated(init, fin, Seq(1, 2)) == (d1 > 1.704)
    })
  }

  test("U12: bond FORMATION flags too (connectivity change is symmetric)") {
    val gen = for { d0 <- Gen.choose(1.9, 6.0); d1 <- Gen.choose(0.9, 1.6) } yield (d0, d1)
    check(Prop.forAll(gen) { case (d0, d1) =>
      val init = chain(Seq("C", "O"), Seq(20.0, 20.0 + d0))
      val fin = chain(Seq("C", "O"), Seq(20.0, 20.0 + d1))
      Anomaly.isDissociated(init, fin, Seq(0, 1))
    })
  }

  test("U14: desorption flags iff every slab bond exceeds the 1.5 cushion, " +
    "and is monotone in distance") {
    // H-Pt cutoff at the 1.5 desorption cushion: (0.31 + 1.36) * 1.5 =
    // 2.505 Å; bands keep 0.1 Å clear
    val gen = for {
      d <- Gen.oneOf(Gen.choose(1.2, 2.4), Gen.choose(2.7, 12.0))
      stretch <- Gen.choose(1.05, 3.0)
    } yield (d, stretch)
    check(Prop.forAll(gen) { case (d, stretch) =>
      val fin = chain(Seq("Pt", "H"), Seq(20.0, 20.0 + d))
      val farther = chain(Seq("Pt", "H"), Seq(20.0, 20.0 + d * stretch))
      val flagged = Anomaly.isDesorbed(fin, Seq(1))
      flagged == (d > 2.505) &&
        // monotone: once desorbed, moving farther can never re-adsorb
        (!flagged || Anomaly.isDesorbed(farther, Seq(1)))
    })
  }

  test("U13: hysteresis — only a mutation crossing BOTH thresholds flags") {
    // Pt-Pt: tight (1.0) cutoff 2.72 Å, loose (1.5) cutoff 4.08 Å; three
    // bands — T = tight-bonded [2.0, 2.6], B = between [2.9, 3.9],
    // F = free [4.3, 8.0] — each 0.1+ Å clear of both cutoffs
    val band = Gen.oneOf(
      Gen.choose(2.0, 2.6), Gen.choose(2.9, 3.9), Gen.choose(4.3, 8.0))
    val gen = for { di <- band; df <- band } yield (di, df)
    check(Prop.forAll(gen) { case (di, df) =>
      val init = chain(Seq("Pt", "Pt"), Seq(20.0, 20.0 + di))
      val fin = chain(Seq("Pt", "Pt"), Seq(20.0, 20.0 + df))
      val formed = di > 4.08 && df < 2.72   // was not even loose; now tight
      val broken = di < 2.72 && df > 4.08   // was tight; now not even loose
      Anomaly.hasSurfaceChanged(init, fin, Seq(0, 1)) == (formed || broken)
    })
  }
}

class ConfigSpec extends AnyFunSuite {

  private val good =
    """{
      "bulk_filters": {
        "filter_by_bulk_ids": ["mp-126", "mp-30"],
        "filter_by_object_size": 50
      },
      "adsorbate_smiles": ["*CO"],
      "max_miller_index": 1,
      "slab_filters": {
        "filter_best_shift_by_score": {"score": "broken_bonds", "threshold": 0.5}
      },
      "steps": [
        {"type": "inference", "label": "cheap"},
        {"type": "filter_by_adsorption_energy_target",
         "adsorbate_smiles": "*CO", "target": -1.0, "range": 0.5},
        {"type": "inference", "label": "expensive"}
      ]
    }"""

  test("parses filters in order and validates clean") {
    val c = Config.fromJson(good, Map.empty)
    assert(c.bulkFilters == Seq(ByIds(Seq("mp-126", "mp-30")), MaxSize(50)))
    assert(c.steps.size == 3)
    assert(Config.validate(c).isEmpty)
  }

  test("env substitution replaces ${VAR}") {
    val c = Config.fromJson(
      """{"bulk_filters": {"filter_by_bulk_ids": ["${MPID}"]}}""",
      Map("MPID" -> "mp-7"))
    assert(c.bulkFilters == Seq(ByIds(Seq("mp-7"))))
  }

  test("mpid regex violation is reported (config_validation.py:6)") {
    val c = Config.fromJson("""{"bulk_filters": {"filter_by_bulk_ids": ["xx-1"]}}""", Map.empty)
    assert(Config.validate(c).exists(_.contains("xx-1")))
  }

  test("top_k XOR top_proportion (config_validation.py:194-203)") {
    val c = ScreenConfig(Nil, Nil, Seq(TopKByScore("broken_bonds", Some(2), Some(0.5))),
      1, Nil, outputVerbose = false)
    assert(Config.validate(c).exists(_.contains("exactly one")))
  }

  test("target±range XOR min/max (config_validation.py:288-316)") {
    val c = ScreenConfig(Nil, Nil, Nil, 1,
      Seq(InferCfg("m"), TargetCfg("*CO", Some(-1.0), None, None, None)),
      outputVerbose = false)
    assert(Config.validate(c).exists(_.contains("energy target")))
  }

  test("target filter probing an unselected smiles fails validation") {
    val c = ScreenConfig(Nil, Seq("*H"), Nil, 1,
      Seq(InferCfg("m"), TargetCfg("*CO", Some(-1.0), Some(0.5), None, None)),
      outputVerbose = false)
    assert(Config.validate(c).exists(_.contains("selects only")))
  }

  test("pourbaix: conditions_list XOR pH/V range (config_validation.py:138-162)") {
    val both = Config.fromJson(
      """{"bulk_filters": {"filter_by_pourbaix_stability": {
          "conditions_list": [{"pH": 7.0, "V": 0.0, "max_decomposition_energy": 0.5}],
          "pH_lower": 0.0, "pH_upper": 14.0, "V_lower": -1.0, "V_upper": 1.0,
          "max_decomposition_energy": 0.5}}}""", Map.empty)
    assert(Config.validate(both).exists(_.contains("exactly one")))
    val neither = ScreenConfig(Seq(PourbaixStability(None, None)), Nil, Nil, 1,
      Nil, outputVerbose = false)
    assert(Config.validate(neither).exists(_.contains("exactly one")))
    val list = Config.fromJson(
      """{"bulk_filters": {"filter_by_pourbaix_stability": {
          "conditions_list": [{"pH": 7.0, "V": 0.0, "max_decomposition_energy": 0.5}]}}}""",
      Map.empty)
    assert(Config.validate(list).isEmpty)
    assert(Config.pourbaixConditions(
      list.bulkFilters.head.asInstanceOf[PourbaixStability]) ==
      Seq(Pourbaix.Condition(7.0, 0.0, 0.5)))
  }

  test("pourbaix range grid: np.arange semantics with upper appended") {
    val cs = Pourbaix.rangeConditions(0.0, 14.0, -1.0, 1.0, 0.5,
      pHStep = 2.0, vStep = 0.5)
    assert(cs.map(_.pH).distinct == Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 14.0))
    assert(cs.map(_.V).distinct == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
    assert(cs.size == 40)
  }

  test("unknown filter key is a hard error (vs reference warn, filters.py:134)") {
    intercept[IllegalArgumentException] {
      Config.fromJson("""{"bulk_filters": {"filter_by_nonsense": 1}}""", Map.empty)
    }
  }
}
