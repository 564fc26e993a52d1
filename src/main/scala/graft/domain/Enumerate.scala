package graft.domain

import graft.functions.StableHash

/** G1–G5 enumeration fan-out (reference:
  * catlas/enumerate_slabs_adslabs.py:31-122, enumeration_utils.py:21-68).
  *
  * Spark-first shape: `enumerateSlabs` is a pure function Bulk → Seq[Surface]
  * used as a typed flatMap (1 row → N rows, all parent columns copied — the
  * reference's dict-accretion), and `enumerateAdslabs` returns the config
  * list as an ARRAY column (the downstream aggregate is per-surface, so the
  * fan-out is never materialized through a shuffle — SURVEY G3 note).
  *
  * Geometry per SURVEY §7.4 #1: [[slabStructure]] builds the REAL
  * reoriented slab cell for each Miller plane (integer plane basis +
  * extended-gcd stacking + vacuum padding); the symmetric-distinct
  * *selection* of planes is the sign-normalized coprime set (full
  * spacegroup reduction is future scope), and top + flipped-bottom
  * augmentation uses slab-center invertibility (U16/U17).
  */
object Enumerate {

  private def gcd(a: Int, b: Int): Int = if (b == 0) math.abs(a) else gcd(b, a % b)

  /** Symmetrically-distinct Miller indices up to maxMiller
    * (enumeration_utils.py:40-55): coprime triples, sign-normalized on the
    * first nonzero component, deduplicated, in deterministic order.
    */
  def millerIndices(maxMiller: Int): Seq[Seq[Int]] = {
    val r = -maxMiller to maxMiller
    val set = for {
      h <- r; k <- r; l <- r
      if !(h == 0 && k == 0 && l == 0)
      if gcd(gcd(math.abs(h), math.abs(k)), math.abs(l)) == 1
    } yield {
      val firstNonzero = Seq(h, k, l).find(_ != 0).get
      val sgn = if (firstNonzero < 0) -1 else 1
      Seq(h * sgn, k * sgn, l * sgn)
    }
    set.distinct.sortBy(m => (m(0), m(1), m(2)))
  }

  /** Termination shifts for (bulk, miller): deterministic count in 1..3
    * derived from the content hash (stands in for the reference's
    * termination-plane search).
    */
  def shifts(bulkId: String, miller: Seq[Int]): Seq[Double] = {
    val h = StableHash.P + hashOf(s"$bulkId|${miller.mkString(",")}")
    val n = (1 + (h % 3)).toInt
    (0 until n).map(i => i.toDouble / n)
  }

  private def hashOf(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % StableHash.P)

  /** Integer basis of the Miller plane lattice {x ∈ Z³ : h·x = 0} plus a
    * stacking vector with h·v₃ = 1 (exists for coprime (h,k,l), via the
    * extended Euclid construction). This is the real reorientation step of
    * slab construction (enumeration_utils.py:21-68 gets it from pymatgen):
    * the slab cell is spanned by (v₁A, v₂A, n·v₃A) with A the bulk lattice.
    */
  def millerBasis(h: Int, k: Int, l: Int): (Seq[Int], Seq[Int], Seq[Int]) = {
    def reduce(v: Seq[Int]): Seq[Int] = {
      val g = v.map(math.abs).filter(_ != 0) match {
        case Nil => 1
        case xs  => xs.reduce(gcd)
      }
      v.map(_ / g)
    }
    val (v1, v2) =
      if (l != 0) (reduce(Seq(l, 0, -h)), reduce(Seq(0, l, -k)))
      else if (k != 0) (reduce(Seq(k, -h, 0)), Seq(0, 0, 1))
      else (Seq(0, 1, 0), Seq(0, 0, 1))
    // extended-gcd stacking vector: h·x + k·y + l·z = 1. Scala's % keeps
    // the dividend's sign, so the recursive gcd can come out negative —
    // normalize each step to a positive gcd.
    def extGcd(a: Long, b: Long): (Long, Long, Long) = {
      val (g, x, y) =
        if (b == 0) (a, 1L, 0L)
        else { val (g0, x0, y0) = extGcd(b, a % b); (g0, y0, x0 - (a / b) * y0) }
      if (g < 0) (-g, -x, -y) else (g, x, y)
    }
    val (g1, xh, yk) = extGcd(h, k)          // xh·h + yk·k = g1 ≥ 0
    val (_, u, zl) = extGcd(g1, l)           // u·g1 + zl·l = 1
    val v3 = Seq((xh * u).toInt, (yk * u).toInt, zl.toInt)
    require(h * v3(0) + k * v3(1) + l * v3(2) == 1,
      s"stacking vector failed for ($h,$k,$l)")
    (v1, v2, v3)
  }

  /** Real slab geometry for a Miller plane: reorient the bulk into the
    * cell spanned by (v₁, v₂, nLayers·v₃) in lattice coordinates, fill it
    * with every lattice translate of the basis (|det M| × natoms sites —
    * exact atom conservation), and apply the termination `shift` along the
    * stacking axis. Exact for any lattice; the symmetric-distinct
    * *selection* of planes remains the sign-normalized coprime set
    * (full spacegroup reduction per SURVEY §7.4 #1 is round-2 scope).
    */
  def slabStructure(bulk: Structure, miller: Seq[Int], shift: Double,
                    nLayers: Int = 2): Structure = {
    val Seq(h, k, l) = miller
    val (v1, v2, v3) = millerBasis(h, k, l)
    val m = Array(v1.toArray, v2.toArray, v3.map(_ * nLayers).toArray)
    val det =
      m(0)(0).toLong * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1).toLong * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2).toLong * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    require(det != 0, s"degenerate miller basis for $miller")
    // adj(M)ᵀ / det = M⁻¹ (for g = (f + t)·M⁻¹ row-vector convention)
    val adj = Array(
      Array(m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1),
        m(0)(2) * m(2)(1) - m(0)(1) * m(2)(2),
        m(0)(1) * m(1)(2) - m(0)(2) * m(1)(1)),
      Array(m(1)(2) * m(2)(0) - m(1)(0) * m(2)(2),
        m(0)(0) * m(2)(2) - m(0)(2) * m(2)(0),
        m(0)(2) * m(1)(0) - m(0)(0) * m(1)(2)),
      Array(m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0),
        m(0)(1) * m(2)(0) - m(0)(0) * m(2)(1),
        m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)))
    def newFrac(f: Array[Double]): Array[Double] = Array(
      (f(0) * adj(0)(0) + f(1) * adj(1)(0) + f(2) * adj(2)(0)) / det,
      (f(0) * adj(0)(1) + f(1) * adj(1)(1) + f(2) * adj(2)(1)) / det,
      (f(0) * adj(0)(2) + f(1) * adj(1)(2) + f(2) * adj(2)(2)) / det)
    // new lattice rows: Mᵢ · A
    val a = bulk.lattice.map(_.toArray).toArray
    val newLat = (0 until 3).map(i => (0 until 3).map(c =>
      m(i)(0) * a(0)(c) + m(i)(1) * a(1)(c) + m(i)(2) * a(2)(c)).toSeq)
    // Fill the cell: every integer-translate residue class of the bulk
    // lattice modulo the new cell contributes exactly one wrapped site →
    // |det M| sites per basis atom (exact conservation). The scan box is
    // wide enough to hit every residue class; wrapping + dedup collapses
    // repeats.
    val bound = (0 until 3).map(c => m.map(row => math.abs(row(c))).sum + 1)
    def wrap(x: Double): Double = { val w = x - math.floor(x); if (w >= 1.0) 0.0 else w }
    val sites = for {
      s <- bulk.sites
      tx <- -bound(0) to bound(0)
      ty <- -bound(1) to bound(1)
      tz <- -bound(2) to bound(2)
      f = Array(s.frac_coords(0) + tx, s.frac_coords(1) + ty, s.frac_coords(2) + tz)
      g = newFrac(f)
    } yield s.copy(frac_coords = Seq(
      wrap(g(0)), wrap(g(1)), wrap(g(2) + shift / nLayers)))
    val unique = sites
      .groupBy(s => (s.element, s.wyckoff,
        math.round(wrap(s.frac_coords(0) + 1e-7) * 1e6),
        math.round(wrap(s.frac_coords(1) + 1e-7) * 1e6),
        math.round(wrap(s.frac_coords(2) + 1e-7) * 1e6)))
      .map(_._2.head).toSeq
      .sortBy(s => (s.element, s.frac_coords(2), s.frac_coords(0), s.frac_coords(1)))
    // VACUUM: a slab is not a periodic supercell — without vacuum along the
    // stacking axis every "surface" site keeps bulk coordination and the
    // broken-bond score is identically zero (and the termination shift is a
    // rigid translation). Stretch c by (1+vacuumFrac) and compress the
    // occupied region, so PBC images across z are separated by empty space
    // and real top/bottom surfaces exist.
    val vacuumFrac = 0.5
    val vacLat = Seq(newLat(0), newLat(1), newLat(2).map(_ * (1 + vacuumFrac)))
    val vacSites = unique.map(s => s.copy(frac_coords = Seq(
      s.frac_coords(0), s.frac_coords(1), s.frac_coords(2) / (1 + vacuumFrac))))
    Structure(vacLat, vacSites)
  }

  /** G1 `enumerate_slabs` (enumerate_slabs_adslabs.py:31-78): one bulk →
    * all (miller, shift, top) surfaces; non-invertible slabs contribute a
    * flipped bottom (G5 union, enumeration_utils.py:59-67).
    */
  def enumerateSlabs(b: Bulk, maxMiller: Int): Seq[Surface] =
    for {
      m <- millerIndices(maxMiller)
      sh <- shifts(b.bulk_id, m)
      slab = slabStructure(b.bulk_structure, m, sh)
      (struct, top) <- if (Geometry.isInvertibleSlab(slab))
        Seq((slab, true))
      else Seq((slab, true), (Geometry.flip(slab), false))
    } yield Surface(
      b.bulk_id, b.bulk_data_source, b.bulk_natoms, b.bulk_xc,
      b.bulk_nelements, b.bulk_elements, b.bulk_e_above_hull, b.bulk_band_gap,
      b.bulk_structure,
      slab_millers = m,
      slab_max_miller_index = m.map(math.abs).max,
      slab_shift = sh,
      slab_top = top,
      slab_natoms = struct.sites.size,
      slab_structure = struct)

  /** One adslab placement configuration: id + fractional site. */
  case class AdslabConfig(config_id: Int, site_x: Double, site_y: Double)

  /** G3 `enumerate_adslabs` (enumerate_slabs_adslabs.py:81-122): per
    * (surface, adsorbate), M ∈ 1..4 placement configs at hash-derived
    * heuristic sites. Returned as a list → stored as an array column.
    */
  def enumerateAdslabs(surfaceKey: String, smiles: String): Seq[AdslabConfig] = {
    val h = hashOf(s"$surfaceKey|$smiles")
    val n = (1 + (h % 4)).toInt
    (0 until n).map { i =>
      val hi = hashOf(s"$surfaceKey|$smiles|$i")
      AdslabConfig(i, (hi % 1000) / 1000.0, ((hi / 1000) % 1000) / 1000.0)
    }
  }

  /** Canonical surface content key (U10 discipline: ints/strings only,
    * never raw floats — shift enters via its hash-stable rational index).
    */
  def surfaceKey(bulkId: String, millers: Seq[Int], shift: Double, top: Boolean): String =
    s"$bulkId|${millers.mkString(",")}|${math.round(shift * 1000)}|$top"
}
