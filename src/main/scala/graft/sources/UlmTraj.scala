package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import graft.domain.{Anomaly, Featurize, Site, Structure}

/** ASE-Trajectory adapter over the [[Ulm]] container — frame extraction
  * with first-frame inheritance, cartesian→fractional conversion, and the
  * anomaly screen of the reference's ProcessValTraj
  * (parity/data_processing_utils.py:85-124: DetectTrajAnomaly on
  * (traj[0], traj[-1], traj[0].get_tags()) + per-frame
  * get_potential_energy()).
  */
object UlmTraj {

  /** One trajectory frame: `numbers`/`pbc`/`tags` inherit from frame 0 when
    * a later item omits them (ASE stores per-file-constant arrays once).
    */
  case class TrajFrame(index: Int, numbers: Seq[Int],
                       positions: Seq[Seq[Double]], cell: Seq[Seq[Double]],
                       pbc: Seq[Boolean], tags: Seq[Int],
                       energy: Option[Double])

  def frames(bytes: Array[Byte]): Seq[TrajFrame] = {
    val (tag, _, items) = Ulm.readItems(bytes)
    require(tag == "ASE-Trajectory", s"not an ASE trajectory (tag '$tag')")
    var inherited = Map.empty[String, JsonNode]
    items.zipWithIndex.flatMap { case (item, i) =>
      // frame data may sit under "atoms" (TrajectoryWriter's nesting) or at
      // item level; a pure-metadata item (no positions anywhere) is skipped
      val atoms = if (item.has("atoms")) item.get("atoms") else item
      def lookup(k: String): Option[JsonNode] = {
        val here = Option(atoms.get(k)).orElse(Option(item.get(k)))
        here.foreach(n => inherited += k -> n)
        here.orElse(inherited.get(k))
      }
      val posN = lookup("positions")
      if (posN.isEmpty) None
      else {
        def nd(n: JsonNode) = Ulm.ndarray(bytes, n)
        val pos = nd(posN.get) match {
          case Ulm.NdDoubles(Seq(n, 3), d) => (0 until n).map(r => Seq(d(3 * r), d(3 * r + 1), d(3 * r + 2)))
          case other => throw new IllegalArgumentException(s"positions must be (n,3) float64, got $other")
        }
        val numbers = lookup("numbers").map(nd).map {
          case Ulm.NdLongs(_, d) => d.map(_.toInt).toSeq
          case Ulm.NdInts(_, d)  => d.toSeq
          case other => throw new IllegalArgumentException(s"numbers must be int, got $other")
        }.getOrElse(throw new IllegalArgumentException(s"frame $i has no 'numbers'"))
        val cell = lookup("cell").map(nd).map {
          case Ulm.NdDoubles(Seq(3, 3), d) => (0 until 3).map(r => Seq(d(3 * r), d(3 * r + 1), d(3 * r + 2)))
          case other => throw new IllegalArgumentException(s"cell must be (3,3) float64, got $other")
        }.getOrElse(throw new IllegalArgumentException(s"frame $i has no 'cell'"))
        val pbc = lookup("pbc").map(nd).map {
          case Ulm.NdBools(_, d) => d.toSeq
          case other => throw new IllegalArgumentException(s"pbc must be bool, got $other")
        }.getOrElse(Seq(true, true, true))
        val tags = lookup("tags").map(nd).map {
          case Ulm.NdLongs(_, d) => d.map(_.toInt).toSeq
          case Ulm.NdInts(_, d)  => d.toSeq
          case other => throw new IllegalArgumentException(s"tags must be int, got $other")
        }.getOrElse(Seq.fill(numbers.size)(0))
        // energies live under "calculator" (TrajectoryWriter) with an
        // item-level fallback
        val calc = Option(item.get("calculator"))
        val energy = Option(item.get("energy")).orElse(calc.flatMap(c => Option(c.get("energy"))))
          .filter(_.isNumber).map(_.asDouble())
        require(pos.size == numbers.size,
          s"frame $i: ${pos.size} positions vs ${numbers.size} numbers")
        Some(TrajFrame(i, numbers, pos, cell, pbc, tags, energy))
      }
    }
  }

  private val symbolOf: Map[Int, String] = Featurize.atomicNumber.map(_.swap)

  /** Cartesian rows → fractional via cell⁻¹ (rows are lattice vectors). */
  def toStructure(f: TrajFrame): Structure = {
    val c = f.cell
    val det =
      c(0)(0) * (c(1)(1) * c(2)(2) - c(1)(2) * c(2)(1)) -
      c(0)(1) * (c(1)(0) * c(2)(2) - c(1)(2) * c(2)(0)) +
      c(0)(2) * (c(1)(0) * c(2)(1) - c(1)(1) * c(2)(0))
    require(math.abs(det) > 1e-12, "singular cell")
    // inverse of the row-vector cell: frac = cart · inv
    val inv = Array(
      Array(c(1)(1) * c(2)(2) - c(1)(2) * c(2)(1), c(0)(2) * c(2)(1) - c(0)(1) * c(2)(2), c(0)(1) * c(1)(2) - c(0)(2) * c(1)(1)),
      Array(c(1)(2) * c(2)(0) - c(1)(0) * c(2)(2), c(0)(0) * c(2)(2) - c(0)(2) * c(2)(0), c(0)(2) * c(1)(0) - c(0)(0) * c(1)(2)),
      Array(c(1)(0) * c(2)(1) - c(1)(1) * c(2)(0), c(0)(1) * c(2)(0) - c(0)(0) * c(2)(1), c(0)(0) * c(1)(1) - c(0)(1) * c(1)(0)))
    val sites = f.positions.zip(f.numbers).map { case (p, z) =>
      val fr = (0 until 3).map(j =>
        (p(0) * inv(0)(j) + p(1) * inv(1)(j) + p(2) * inv(2)(j)) / det)
      Site(symbolOf.getOrElse(z, s"Z$z"), fr, "")
    }
    Structure(f.cell, sites)
  }

  /** The reference's good-trajectory screen: anomaly flags between frame 0
    * and the last frame with frame-0 tags (2 = adsorbate, 1 = surface);
    * any parse/geometry failure reads as a bad trajectory, never a crash
    * (data_processing_utils.py:104-105,135-141).
    */
  object Parser extends Sources.TrajParser {
    def parse(path: String, bytes: Array[Byte]): Sources.TrajRecord =
      try {
        val fs = frames(bytes)
        require(fs.nonEmpty, s"$path: no frames")
        val energies = fs.map(_.energy.getOrElse(Double.NaN))
        val good =
          try {
            val tags = fs.head.tags
            val ads = tags.indices.filter(tags(_) == 2)
            val slab = tags.indices.filter(tags(_) == 1)
            val fl = Anomaly.flags(toStructure(fs.head), toStructure(fs.last), ads, slab)
            !fl.dissociation && !fl.desorption && !fl.reconstruction
          } catch { case _: Exception => false }
        Sources.TrajRecord(path, energies, good)
      } catch {
        case _: Exception => Sources.TrajRecord(path, Seq.empty, goodTrajectory = false)
      }
  }
}
