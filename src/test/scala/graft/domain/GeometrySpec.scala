package graft.domain

import org.scalatest.funsuite.AnyFunSuite

class GeometrySpec extends AnyFunSuite {

  private val cubic = Fixtures.bulks.find(_.bulk_id == "mp-126").get.bulk_structure // Pt fcc a=3.92

  test("U1 surface area of cubic cell = a²") {
    assert(math.abs(Geometry.surfaceArea(cubic) - 3.92 * 3.92) < 1e-9)
  }

  test("U8 center of mass of symmetric fcc cell") {
    val com = Geometry.centerOfMass(cubic)
    assert(math.abs(com(0) - 0.25) < 1e-9 && math.abs(com(1) - 0.25) < 1e-9)
  }

  test("pbc distance: fcc nearest neighbor = a/sqrt(2)") {
    val lat = cubic.lattice.map(_.toArray).toArray
    val d = Geometry.pbcDistance(lat, Seq(0.0, 0.0, 0.0), Seq(0.0, 0.5, 0.5))
    assert(math.abs(d - 3.92 / math.sqrt(2)) < 1e-9)
  }

  test("U2/U3 fcc coordination number is 12") {
    val cn = Geometry.bulkCoordination(cubic)
    assert(cn("a") == 12)
  }

  test("U17 flip is an involution on the site set") {
    val flipped = Geometry.flip(Geometry.flip(cubic))
    val orig = cubic.sites.map(_.frac_coords.map(x => math.round(x * 1e6)))
    val round = flipped.sites.map(_.frac_coords.map(x => math.round(x * 1e6)))
    assert(orig.toSet == round.toSet)
  }

  test("U16 invertibility: fcc cell is z-inversion symmetric; distorted is not") {
    assert(Geometry.isInvertible(cubic))
    val broken = Structure(cubic.lattice,
      cubic.sites :+ Site("Pt", Seq(0.1, 0.1, 0.3), "b"))
    assert(!Geometry.isInvertible(broken))
  }

  test("U2/U3 one-atom primitive cell: nn from self-images, CN 6") {
    val sc = Structure(
      Seq(Seq(3.0, 0, 0), Seq(0, 3.0, 0), Seq(0, 0, 3.0)),
      Seq(Site("Cu", Seq(0.0, 0.0, 0.0), "a")))
    val bl = Geometry.bondLengths(sc, 1.1)
    assert(math.abs(bl("a") - 3.0 * 1.1) < 1e-9) // nn = lattice constant
    assert(Geometry.bulkCoordination(sc, 1.1)("a") == 6) // simple cubic
  }

  test("union-find components: two disconnected pairs") {
    val adj = Array(
      Array(false, true, false, false),
      Array(true, false, false, false),
      Array(false, false, false, true),
      Array(false, false, true, false))
    val comp = Geometry.components(adj)
    assert(comp(0) == comp(1) && comp(2) == comp(3) && comp(0) != comp(2))
  }

  test("U4/U6 vacuum slab loses coordination vs bulk → strictly positive score") {
    val slab = Enumerate.slabStructure(cubic, Seq(0, 0, 1), 0.0)
    val score = Geometry.brokenBondScore(slab, cubic)
    assert(score > 0.0, s"surface must break bonds, got $score")
    // and the periodic bulk itself would not: sanity anchor for the vacuum
    val density = Geometry.surfaceDensityScore(slab, cubic)
    assert(density > 0.0)
  }

  test("U16 slab invertibility: symmetric slab true; asymmetric termination false") {
    val slab = Enumerate.slabStructure(cubic, Seq(0, 0, 1), 0.0)
    assert(Geometry.isInvertibleSlab(slab))
    val broken = Structure(slab.lattice,
      slab.sites :+ Site("Pt", Seq(0.1, 0.2, 0.62), "b"))
    assert(!Geometry.isInvertibleSlab(broken))
  }

  test("translation equivalence is a bijection: co-located targets cannot " +
       "absorb two sources") {
    // two a-sites 0.1 apart, both within tol=0.11 of b's site at 0.05; b's
    // other site (0.5) matches neither one-to-one. forall/exists matching
    // wrongly declared these equivalent (both a-sites claiming b@0.05) and
    // distinctTerminations then dropped a genuinely distinct termination.
    val lat = Seq(Seq(4.0, 0.0, 0.0), Seq(0.0, 4.0, 0.0), Seq(0.0, 0.0, 4.0))
    def st(xs: Double*) =
      Structure(lat, xs.map(x => Site("Cu", Seq(x, 0.0, 0.5), "a")))
    assert(!Geometry.sameUpToInPlaneTranslation(st(0.0, 0.1), st(0.05, 0.5), tol = 0.11))
    // sanity: a true rigid translation still matches under the same tol
    assert(Geometry.sameUpToInPlaneTranslation(st(0.0, 0.1), st(0.05, 0.15), tol = 0.11))
  }
}
