package graft.domain

/** G4 adslab → graph featurization (reference: OCP's atoms-to-graph inside
  * `BatchOCPPredictor.make_dataloader`, catlas/adslab_predictions.py:
  * 117-147 — torch_geometric `Data` objects built per structure, then
  * batched into a dataloader).
  *
  * The GRAPH BUILD here is real: nodes = sites, directed edge list from
  * the covalent-radius periodic neighbor test ([[Geometry.connectivity]]
  * — the same kernel A11/U15 use), node features = atomic number + 3D
  * fractional position. Only the model WEIGHTS are a stub (no ML runtime
  * in this container): [[GraphSurrogateBackend]] scores deterministically
  * from graph invariants, behind the same [[BatchedBackend]]-shaped seam
  * a real GNN session would bind to.
  */
object Featurize {

  /** torch_geometric-shaped graph: parallel src/dst arrays (directed, both
    * orientations per bond), per-node atomic number and fractional coords.
    */
  case class Graph(nNodes: Int, atomicNumbers: Seq[Int],
                   edgeSrc: Seq[Int], edgeDst: Seq[Int],
                   frac: Seq[Seq[Double]])

  /** Public standard atomic numbers for the fixture elements. */
  val atomicNumber: Map[String, Int] = Map(
    "H" -> 1, "C" -> 6, "N" -> 7, "O" -> 8,
    "Al" -> 13, "Si" -> 14, "Ti" -> 22, "V" -> 23, "Cr" -> 24,
    "Mn" -> 25, "Fe" -> 26, "Co" -> 27, "Ni" -> 28, "Cu" -> 29,
    "Zn" -> 30, "Pd" -> 46, "Ag" -> 47, "Pt" -> 78, "Au" -> 79)

  /** Build the graph of one structure: covalent-radius adjacency →
    * directed edge_index (i→j and j→i per bond, ascending src order —
    * deterministic).
    */
  def graph(s: Structure, cushion: Double = 1.2): Graph = {
    val adj = Geometry.connectivity(s, cushion)
    val n = s.sites.size
    val src = Seq.newBuilder[Int]
    val dst = Seq.newBuilder[Int]
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (adj(i)(j)) { src += i; dst += j }
        j += 1
      }
      i += 1
    }
    Graph(n, s.sites.map(x => atomicNumber.getOrElse(x.element, 0)),
      src.result(), dst.result(), s.sites.map(_.frac_coords))
  }
}

/** Structure-level batched model seam: the real-GNN call shape — a batch
  * of graphs in, a batch of per-config energies out. Binds either to a
  * native runtime session or to the deterministic surrogate below.
  */
trait GraphEnergyBackend extends Serializable {
  def label: String
  def bytesPerSample: Long
  /** (graph, smiles, nConfigs) per row → energies per row. */
  def predictGraphs(batch: Seq[(Featurize.Graph, String, Int)]): Seq[Seq[Double]]
}

/** Deterministic graph-scoring stub: energies derive from real graph
  * invariants (node count, edge count, composition hash) through the same
  * [-4, 2) surrogate range, so cascades stay exactly reproducible. The
  * honest split: featurization REAL, weights FAKE.
  */
case class GraphSurrogateBackend(label: String, seed: String = "g0",
                                 bytesPerSample: Long = 64L << 20)
    extends GraphEnergyBackend {
  def predictGraphs(batch: Seq[(Featurize.Graph, String, Int)]): Seq[Seq[Double]] =
    batch.map { case (g, smiles, n) =>
      val key = s"$seed|$label|${g.nNodes}|${g.edgeSrc.size}|" +
        s"${g.atomicNumbers.sum}|$smiles"
      (0 until n).map { i =>
        val h = s"$key|$i".foldLeft(0L)((a, c) =>
          (a * 31 + c.toInt) % graft.functions.StableHash.P)
        (h % 6000L) / 1000.0 - 4.0
      }
    }
}
