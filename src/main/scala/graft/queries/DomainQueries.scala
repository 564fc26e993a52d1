package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain._

/** Domain-engine entries for the driver gate: these run the REAL screening
  * engine (crystal fixtures → enumeration → geometry scores → cascade) —
  * not SQL-expressible, so the driver records rows-only checks; full
  * semantics are pinned by the ScalaTest suites (PipelineSpec etc.).
  * sfDir is accepted per the contract but the inputs are the deterministic
  * crystal fixtures (FIXTURES.md §1).
  */
object DomainQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A11 nuclearity over enumerated slabs of the fixture bulks.
    "a11_nuclearity" -> ((s, _) => {
      import s.implicits._
      val nucUdf = udf((slab: Structure, els: Seq[String]) =>
        Nuclearity.nuclearity(slab, els).map { case (el, info) =>
          (el, info.nuclearity) }.toSeq.sortBy(_._1))
      s.createDataset(Fixtures.bulks)
        .flatMap(b => Enumerate.enumerateSlabs(b, 1))
        .toDF()
        .select(col("bulk_id"), col("slab_millers"), col("slab_shift"),
          explode(nucUdf(col("slab_structure"), col("bulk_elements"))).as("n"))
        // stringified: the driver comparator cannot sort/hash array columns
        .select(col("bulk_id"),
          concat_ws(",", col("slab_millers")).as("slab_millers"),
          col("slab_shift"),
          col("n._1").as("element"), col("n._2").as("nuclearity"))
        .orderBy("bulk_id", "slab_millers", "slab_shift", "element")
    }),

    // The full config-driven screen (G1→J1→G3→M1→A7) on fixtures.
    "screen_e2e_fixture" -> ((s, _) => {
      val cfg = Config.fromJson(
        """{
          "bulk_filters": {"filter_by_object_size": 50},
          "adsorbate_smiles": ["*CO", "*H"],
          "max_miller_index": 1,
          "slab_filters": {
            "filter_best_shift_by_score": {"score": "broken_bonds", "threshold": 0.5}},
          "steps": [
            {"type": "inference", "label": "cheap"},
            {"type": "filter_by_adsorption_energy_target",
             "adsorbate_smiles": "*CO", "target": -1.0, "range": 1.0},
            {"type": "inference", "label": "expensive"}]
        }""", Map.empty)
      Pipeline.compile(s, cfg).results
        // stringified: the driver comparator cannot sort/hash array columns
        .select(col("bulk_id"),
          concat_ws(",", col("slab_millers")).as("slab_millers"),
          col("slab_shift"),
          col("slab_top"), col("adsorbate_smiles"), col("min_dE_cheap"),
          col("min_dE_expensive"), col("filter_reason"))
        .orderBy("bulk_id", "slab_millers", "slab_shift", "slab_top",
          "adsorbate_smiles")
    }),

    // F9-through-the-pipeline: the same screen driven by a Pourbaix bulk
    // filter (broadcast diagram join) — Pt/Cu/Au survive, Fe/ZnO drop
    // before enumeration ever fans out (PipelineSpec pins the kept set).
    "screen_e2e_pourbaix" -> ((s, _) => {
      val cfg = Config.fromJson(
        """{
          "bulk_filters": {"filter_by_pourbaix_stability": {
            "pH_lower": 0.0, "pH_upper": 14.0, "pH_step": 2.0,
            "V_lower": -1.0, "V_upper": 1.0, "V_step": 0.5,
            "max_decomposition_energy": 0.5}},
          "adsorbate_smiles": ["*CO"],
          "max_miller_index": 1,
          "steps": [{"type": "inference", "label": "cheap"}]
        }""", Map.empty)
      Pipeline.compile(s, cfg).results
        .select(col("bulk_id"),
          concat_ws(",", col("slab_millers")).as("slab_millers"),
          col("slab_shift"), col("slab_top"), col("adsorbate_smiles"),
          col("min_dE_cheap"))
        .orderBy("bulk_id", "slab_millers", "slab_shift", "slab_top",
          "adsorbate_smiles")
    }),

    // U16/U17 invertibility + flip over enumerated fixture slabs: for each
    // slab, whether z→−z maps it onto itself and whether flip is an
    // involution on the site set (values pinned in GeometrySpec).
    "u16_invertibility" -> ((s, _) => {
      import s.implicits._
      val invUdf = udf((slab: Structure) => Geometry.isInvertibleSlab(slab))
      val involUdf = udf((slab: Structure) => {
        val ff = Geometry.flip(Geometry.flip(slab))
        val r = (st: Structure) => st.sites.map(x =>
          (x.element, x.frac_coords.map(v => math.round(v * 1e6)))).toSet
        r(ff) == r(slab)
      })
      s.createDataset(Fixtures.bulks)
        .flatMap(b => Enumerate.enumerateSlabs(b, 1))
        .toDF()
        // stringified: the driver comparator cannot sort/hash array columns
        .select(col("bulk_id"),
          concat_ws(",", col("slab_millers")).as("slab_millers"),
          col("slab_shift"),
          col("slab_top"),
          invUdf(col("slab_structure")).as("invertible"),
          involUdf(col("slab_structure")).as("flip_involution"))
        .orderBy("bulk_id", "slab_millers", "slab_shift", "slab_top")
    }),

    // U12–U14 anomaly flags over synthetic (initial, final) frame pairs.
    "u12_anomaly_flags" -> ((s, _) => {
      import s.implicits._
      val lat = Seq(Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0), Seq(0.0, 0.0, 10.0))
      def frame(zAds: Double) = Structure(lat, Seq(
        Site("Pt", Seq(0.5, 0.5, 0.40), "a"),
        Site("C", Seq(0.5, 0.5, 0.55), "a"),
        Site("O", Seq(0.5, 0.5, zAds), "a")))
      val rows = (0 until 20).map { i =>
        val zFin = 0.60 + i * 0.02
        (i.toLong, frame(0.67), frame(zFin))
      }
      s.createDataset(rows).toDF("pair_id", "initial", "final")
        .withColumn("flags", udf((a: Structure, b: Structure) => {
          val f = Anomaly.flags(a, b, Seq(1, 2), Seq(0))
          Seq(f.dissociation, f.desorption, f.reconstruction)
        }).apply(col("initial"), col("final")))
        .select(col("pair_id"),
          col("flags")(0).as("dissociation"),
          col("flags")(1).as("desorption"),
          col("flags")(2).as("reconstruction"))
        .orderBy("pair_id")
    }),
  )

  val oracles: Map[String, String] = Map()
}
