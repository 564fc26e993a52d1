package graft.domain

/** U12–U14 trajectory anomaly detection (reference:
  * catlas/flag_systems.py:6-114): given (initial, final) structures of an
  * ML relaxation with site roles (bulk / surface / adsorbate — the
  * reference's ase tag 0/1/2 convention, flag_systems.py:21), flag
  * dissociation, desorption, and surface reconstruction from connectivity-
  * matrix changes. Pure per-row functions → one UDF over a struct pair.
  */
object Anomaly {

  case class Flags(dissociation: Boolean, desorption: Boolean, reconstruction: Boolean)

  /** U12 `is_adsorbate_dissociated` (flag_systems.py:40-52): the adsorbate-
    * internal connectivity changed between frames.
    */
  def isDissociated(initial: Structure, fin: Structure, adsorbateIdx: Seq[Int]): Boolean = {
    val a0 = subAdj(initial, adsorbateIdx)
    val a1 = subAdj(fin, adsorbateIdx)
    a0.indices.exists(i => a0(i).indices.exists(j => a0(i)(j) != a1(i)(j)))
  }

  /** U14 `is_adsorbate_desorbed` (flag_systems.py:78-96): no adsorbate–slab
    * bond remains in the final frame (cushion 1.5×).
    */
  def isDesorbed(fin: Structure, adsorbateIdx: Seq[Int], cushion: Double = 1.5): Boolean = {
    val adj = Geometry.connectivity(fin, cushion)
    val ads = adsorbateIdx.toSet
    !adsorbateIdx.exists(i => adj(i).indices.exists(j => !ads.contains(j) && adj(i)(j)))
  }

  /** U13 `has_surface_changed` (flag_systems.py:54-76): two-threshold
    * hysteresis — FORMED requires absent under the LOOSE cushion initially
    * AND present under the TIGHT cushion finally; BROKEN requires present
    * under the TIGHT cushion initially AND absent under the LOOSE one
    * finally. A jittering bond crosses only one threshold and never fires.
    */
  def hasSurfaceChanged(initial: Structure, fin: Structure, slabIdx: Seq[Int],
                        tight: Double = 1.0, loose: Double = 1.5): Boolean = {
    val i0t = subAdj(initial, slabIdx, tight)
    val i1t = subAdj(fin, slabIdx, tight)
    val i0l = subAdj(initial, slabIdx, loose)
    val i1l = subAdj(fin, slabIdx, loose)
    // real hysteresis crosses BOTH thresholds: formed = wasn't bonded even
    // loosely before AND is tightly bonded now; broken = was tightly
    // bonded before AND isn't even loosely bonded now. Jitter around a
    // single cutoff flips only one test and never fires.
    i0t.indices.exists(i => i0t(i).indices.exists { j =>
      val formed = !i0l(i)(j) && i1t(i)(j)
      val broken = i0t(i)(j) && !i1l(i)(j)
      formed || broken
    })
  }

  def flags(initial: Structure, fin: Structure, adsorbateIdx: Seq[Int],
            slabIdx: Seq[Int]): Flags = Flags(
    dissociation = isDissociated(initial, fin, adsorbateIdx),
    desorption = isDesorbed(fin, adsorbateIdx),
    reconstruction = hasSurfaceChanged(initial, fin, slabIdx))

  private def subAdj(s: Structure, idx: Seq[Int], cushion: Double = 1.2): Array[Array[Boolean]] =
    Geometry.connectivity(Structure(s.lattice, idx.map(s.sites)), cushion)
}
