package graft.domain

/** Deterministic crystal fixtures — the 5 CI mpids of the reference's
  * no-inference test (configs/tests/test_metals.yml:16; shapes per
  * FIXTURES.md §1). Used by ScalaTest and the domain demo pipeline; the
  * driver corpus stays the source of truth for oracle queries.
  */
object Fixtures {

  private def fcc(el: String, a: Double): Structure = Structure(
    lattice = Seq(Seq(a, 0, 0), Seq(0, a, 0), Seq(0, 0, a)),
    sites = Seq(
      Site(el, Seq(0.0, 0.0, 0.0), "a"),
      Site(el, Seq(0.0, 0.5, 0.5), "a"),
      Site(el, Seq(0.5, 0.0, 0.5), "a"),
      Site(el, Seq(0.5, 0.5, 0.0), "a")))

  private def bcc(el: String, a: Double): Structure = Structure(
    lattice = Seq(Seq(a, 0, 0), Seq(0, a, 0), Seq(0, 0, a)),
    sites = Seq(
      Site(el, Seq(0.0, 0.0, 0.0), "a"),
      Site(el, Seq(0.5, 0.5, 0.5), "a")))

  /** Binary rocksalt-ish cell for multi-element filters. */
  private def binary(el1: String, el2: String, a: Double): Structure = Structure(
    lattice = Seq(Seq(a, 0, 0), Seq(0, a, 0), Seq(0, 0, a)),
    sites = Seq(
      Site(el1, Seq(0.0, 0.0, 0.0), "a"),
      Site(el2, Seq(0.5, 0.5, 0.5), "b")))

  val bulks: Seq[Bulk] = Seq(
    Bulk("mp-126", "test_fixtures", 4, "RPBE", 1, Seq("Pt"),
      Some(0.0), Some(0.0), fcc("Pt", 3.92)),
    Bulk("mp-30", "test_fixtures", 4, "RPBE", 1, Seq("Cu"),
      Some(0.0), Some(0.0), fcc("Cu", 3.61)),
    Bulk("mp-81", "test_fixtures", 4, "RPBE", 1, Seq("Au"),
      Some(0.0), Some(0.0), fcc("Au", 4.08)),
    Bulk("mp-13", "test_fixtures", 2, "RPBE", 1, Seq("Fe"),
      Some(0.0), Some(0.0), bcc("Fe", 2.87)),
    Bulk("mp-79", "test_fixtures", 2, "RPBE", 2, Seq("Zn", "O"),
      Some(0.01), Some(3.2), binary("Zn", "O", 4.27)))

  /** Per-bulk Pourbaix diagram pieces — the deterministic stand-in for the
    * reference's LMDB diagram store (filter_utils.py:194-268): decomp
    * energy e(pH, V) = max over pieces of a·pH + b·V + c. Chosen so under
    * the standard grid (pH 0–14, V −1–1, cap 0.5) the noble/coinage metals
    * are stable, Fe corrodes everywhere, and ZnO sits just above the cap
    * (min decomp 0.55 at pH 6.5).
    */
  val pourbaixDiagrams: Seq[Pourbaix.DiagramEntry] = Seq(
    Pourbaix.DiagramEntry("mp-126", Seq(
      Pourbaix.DiagramPiece(0.0, 0.2, -0.3), Pourbaix.DiagramPiece(0.0, -0.2, -0.3))),
    Pourbaix.DiagramEntry("mp-30", Seq(
      Pourbaix.DiagramPiece(0.05, 0.4, -0.2), Pourbaix.DiagramPiece(-0.03, -0.6, 0.1))),
    Pourbaix.DiagramEntry("mp-81", Seq(
      Pourbaix.DiagramPiece(0.0, 0.1, -0.8), Pourbaix.DiagramPiece(0.0, -0.1, -0.8))),
    Pourbaix.DiagramEntry("mp-13", Seq(
      Pourbaix.DiagramPiece(0.2, 0.0, 0.8), Pourbaix.DiagramPiece(0.0, 0.0, 0.7))),
    Pourbaix.DiagramEntry("mp-79", Seq(
      Pourbaix.DiagramPiece(0.1, 0.0, -0.1), Pourbaix.DiagramPiece(-0.1, 0.0, 1.2))))

  /** Adsorbate dimension (reference SMILES set excerpt,
    * documentation/making_a_config.md).
    */
  val adsorbates: Seq[Adsorbate] = Seq(
    Adsorbate("*H", Seq("H"), Seq(0), "ocdata_adsorbates"),
    Adsorbate("*CO", Seq("C", "O"), Seq(0), "ocdata_adsorbates"),
    Adsorbate("*OH", Seq("O", "H"), Seq(0), "ocdata_adsorbates"))
}
