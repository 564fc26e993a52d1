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
  * Geometry strategy per SURVEY §7.4 #1: the slab *transformation* is a
  * deterministic surrogate (z-doubled cell with termination shift); the
  * enumeration *semantics* — symmetric-distinct Miller set, per-termination
  * shifts, top + flipped-bottom augmentation via real invertibility (U16/
  * U17) — follow the reference.
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

  /** Surrogate slab geometry: double the cell along c, apply the
    * termination shift to z, wrap. Deterministic and invertibility-aware.
    */
  def slabStructure(bulk: Structure, shift: Double): Structure = {
    def wrap(x: Double): Double = x - math.floor(x)
    val lat = Seq(bulk.lattice(0), bulk.lattice(1), bulk.lattice(2).map(_ * 2))
    val sites = bulk.sites.flatMap { s =>
      Seq(0.0, 0.5).map(off => s.copy(frac_coords = Seq(
        s.frac_coords(0), s.frac_coords(1),
        wrap(s.frac_coords(2) / 2 + off + shift / 2))))
    }
    Structure(lat, sites)
  }

  /** G1 `enumerate_slabs` (enumerate_slabs_adslabs.py:31-78): one bulk →
    * all (miller, shift, top) surfaces; non-invertible slabs contribute a
    * flipped bottom (G5 union, enumeration_utils.py:59-67).
    */
  def enumerateSlabs(b: Bulk, maxMiller: Int): Seq[Surface] =
    for {
      m <- millerIndices(maxMiller)
      sh <- shifts(b.bulk_id, m)
      slab = slabStructure(b.bulk_structure, sh)
      (struct, top) <- if (Geometry.isInvertible(slab))
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
