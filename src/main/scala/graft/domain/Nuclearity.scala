package graft.domain

/** A11 nuclearity (reference: catlas/nuclearity.py:14-124): per slab ×
  * active element, connected components over like-element surface atoms;
  * comparing max component size on the 1× cell vs a 2×2 replica
  * distinguishes finite clusters from semi-infinite/infinite networks.
  *
  * Pure per-row computation (graphs are ≤ hundreds of nodes) — runs as a
  * UDF; the reference's graph-tool dependency becomes union-find
  * ([[Geometry.components]]).
  */
object Nuclearity {

  /** Surface atoms = top-half sites (tag convention: the reference uses
    * ocdata's surface tagging; z ≥ 0.5 is the fixture-compatible proxy).
    */
  private def surfaceIdx(s: Structure): Seq[Int] =
    s.sites.zipWithIndex.collect { case (t, i) if t.frac_coords(2) >= 0.5 => i }

  /** Replicate the cell nx×ny in-plane (nuclearity.py:86-105 replicates
    * 2×2 to detect wrap-around connectivity).
    */
  def replicate(s: Structure, nx: Int, ny: Int): Structure = {
    val lat = s.lattice
    val newLat = Seq(
      lat(0).map(_ * nx), lat(1).map(_ * ny), lat(2))
    val sites = for {
      i <- 0 until nx; j <- 0 until ny; t <- s.sites
    } yield t.copy(frac_coords = Seq(
      (t.frac_coords(0) + i) / nx, (t.frac_coords(1) + j) / ny, t.frac_coords(2)))
    Structure(newLat, sites)
  }

  private def maxComponentAndSizes(s: Structure, element: String): (Int, Seq[Int]) = {
    val surf = surfaceIdx(s).filter(i => s.sites(i).element == element)
    if (surf.isEmpty) return (0, Nil)
    val sub = Structure(s.lattice, surf.map(s.sites))
    val comp = Geometry.components(Geometry.connectivity(sub))
    val sizes = comp.groupBy(identity).values.map(_.length).toSeq.sorted
    (sizes.max, sizes)
  }

  /** Per-element nuclearity label (nuclearity.py:39-61):
    *  - no surface atoms of the element → "0"
    *  - max component grows under 2×2 replication → "semi-finite" (grows
    *    < 4×) or "infinite" (grows ≥ 4×, i.e., scales with area)
    *  - otherwise the finite cluster size as a string.
    */
  def nuclearity(slab: Structure, activeElements: Seq[String]): Map[String, NuclearityInfo] =
    activeElements.map { el =>
      val (m1, sizes1) = maxComponentAndSizes(slab, el)
      if (m1 == 0) el -> NuclearityInfo("0", Nil)
      else {
        val (m4, _) = maxComponentAndSizes(replicate(slab, 2, 2), el)
        val label =
          if (m4 >= 4 * m1) "infinite"
          else if (m4 > m1) "semi-finite"
          else m1.toString
        el -> NuclearityInfo(label, sizes1)
      }
    }.toMap
}
