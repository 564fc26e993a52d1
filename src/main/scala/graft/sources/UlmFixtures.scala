package graft.sources

import Ulm._

/** Deterministic spec-conformant ASE-Trajectory fixtures (the validation
  * corpus for [[UlmTraj]] — no ASE exists in this container, so these are
  * the ground truth the reader round-trips against; UlmSpec pins them and
  * the s6 gate query exposes them to the driver's oracle).
  *
  * Both are a 4-Cu slab (tags 1) with a CO adsorbate (tags 2) in a
  * 10×10×14 Å cell; `desorbed` lifts CO ~5 Å off the surface in its final
  * frame, which the reference's anomaly screen must flag
  * (parity/data_processing_utils.py:85-105).
  */
object UlmFixtures {

  private def frame(zC: Double, energy: Double, first: Boolean): VObj = {
    val cu = Seq(Seq(0.0, 0.0, 2.0), Seq(2.5, 0.0, 2.0),
      Seq(0.0, 2.5, 2.0), Seq(2.5, 2.5, 2.0))
    val co = Seq(Seq(0.0, 0.0, zC), Seq(0.0, 0.0, zC + 1.14))
    val atoms = Seq(
      "positions" -> VArrD(Seq(6, 3), (cu ++ co).flatten.toArray),
      "cell" -> VArrD(Seq(3, 3),
        Array(10.0, 0, 0, 0, 10.0, 0, 0, 0, 14.0))) ++
      (if (first) Seq(
        "numbers" -> VArrL(Seq(6), Array(29L, 29L, 29L, 29L, 6L, 8L)),
        "pbc" -> VArrB(Seq(3), Array(true, true, false)),
        "tags" -> VArrL(Seq(6), Array(1L, 1L, 1L, 1L, 2L, 2L)))
       else Nil)
    VObj(Seq(
      "atoms" -> VObj(atoms),
      "calculator" -> VObj(Seq("name" -> VStr("emt"), "energy" -> VNum(energy)))))
  }

  /** CO stays bound; energies descend. */
  def stable: Array[Byte] = Ulm.write("ASE-Trajectory", Seq(
    frame(3.9, -3.25, first = true),
    frame(3.92, -3.5, first = false),
    frame(3.91, -3.75, first = false)))

  /** CO desorbs in the final frame. */
  def desorbed: Array[Byte] = Ulm.write("ASE-Trajectory", Seq(
    frame(3.9, -3.25, first = true),
    frame(9.0, -1.5, first = false)))

  /** Write both fixtures into a directory; returns the directory path.
    * Pre-existing `*.traj` files are removed first — the s6 gate query
    * globs the directory against a hard-pinned oracle, so a stale file
    * from an older fixture set would poison the comparison.
    */
  def writeTo(dir: java.nio.file.Path): String = {
    java.nio.file.Files.createDirectories(dir)
    val old = java.nio.file.Files.list(dir)
    try old.filter(_.toString.endsWith(".traj"))
      .forEach(p => java.nio.file.Files.delete(p))
    finally old.close()
    java.nio.file.Files.write(dir.resolve("stable.traj"), stable)
    java.nio.file.Files.write(dir.resolve("desorbed.traj"), desorbed)
    dir.toString
  }
}
