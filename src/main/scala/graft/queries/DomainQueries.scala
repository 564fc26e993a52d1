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

  /** Literal expected-value oracles: these queries run the fixture-driven
    * domain engine (deterministic, sf-independent), so the oracle is the
    * PINNED output itself -- values cross-audited against the ScalaTest
    * pins (GeometrySpec/DomainSpec/AnomalySpec semantics) and frozen as a
    * VALUES table. This upgrades the driver check from rows-only to full
    * rows+schema+hash: any drift in enumeration, nuclearity union-find,
    * flip/invertibility, or anomaly thresholds now fails the gate loudly.
    * (Doubles serialized as shortest round-trip strings CAST to DOUBLE --
    * string->double parse is nearest-even in DuckDB, so bits match.)
    */
  val oracles: Map[String, String] = Map(
    "a11_nuclearity" ->
      """SELECT * FROM (VALUES
          ('mp-126', '1,0,0', CAST('0.0' AS DOUBLE), 'Pt', 'infinite'),
          ('mp-126', '1,1,0', CAST('0.0' AS DOUBLE), 'Pt', 'semi-finite'),
          ('mp-126', '1,1,1', CAST('0.0' AS DOUBLE), 'Pt', 'infinite'),
          ('mp-13', '1,0,0', CAST('0.0' AS DOUBLE), 'Fe', 'infinite'),
          ('mp-13', '1,1,0', CAST('0.0' AS DOUBLE), 'Fe', 'infinite'),
          ('mp-13', '1,1,1', CAST('0.0' AS DOUBLE), 'Fe', '1'),
          ('mp-30', '1,0,0', CAST('0.0' AS DOUBLE), 'Cu', 'infinite'),
          ('mp-30', '1,1,0', CAST('0.0' AS DOUBLE), 'Cu', 'semi-finite'),
          ('mp-30', '1,1,1', CAST('0.0' AS DOUBLE), 'Cu', 'infinite'),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), 'O', '0'),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), 'O', '1'),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), 'Zn', '1'),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), 'Zn', '0'),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), 'O', '1'),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), 'O', '0'),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), 'Zn', '0'),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), 'Zn', '1'),
          ('mp-79', '1,1,0', CAST('0.0' AS DOUBLE), 'O', '1'),
          ('mp-79', '1,1,0', CAST('0.0' AS DOUBLE), 'Zn', '1'),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), 'O', '0'),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), 'O', '1'),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), 'Zn', '1'),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), 'Zn', '0'),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), 'O', '1'),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), 'O', '0'),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), 'Zn', '0'),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), 'Zn', '1'),
          ('mp-81', '1,0,0', CAST('0.0' AS DOUBLE), 'Au', 'infinite'),
          ('mp-81', '1,1,0', CAST('0.0' AS DOUBLE), 'Au', 'semi-finite'),
          ('mp-81', '1,1,1', CAST('0.0' AS DOUBLE), 'Au', 'infinite'))
          AS t(bulk_id, slab_millers, slab_shift, element, nuclearity)""",
    "u12_anomaly_flags" ->
      """SELECT * FROM (VALUES
          (CAST(0 AS BIGINT), false, false, false),
          (CAST(1 AS BIGINT), false, false, false),
          (CAST(2 AS BIGINT), false, false, false),
          (CAST(3 AS BIGINT), false, false, false),
          (CAST(4 AS BIGINT), false, false, false),
          (CAST(5 AS BIGINT), false, false, false),
          (CAST(6 AS BIGINT), false, false, false),
          (CAST(7 AS BIGINT), true, false, false),
          (CAST(8 AS BIGINT), true, false, false),
          (CAST(9 AS BIGINT), true, false, false),
          (CAST(10 AS BIGINT), true, false, false),
          (CAST(11 AS BIGINT), true, false, false),
          (CAST(12 AS BIGINT), true, false, false),
          (CAST(13 AS BIGINT), true, false, false),
          (CAST(14 AS BIGINT), true, false, false),
          (CAST(15 AS BIGINT), true, false, false),
          (CAST(16 AS BIGINT), true, false, false),
          (CAST(17 AS BIGINT), true, false, false),
          (CAST(18 AS BIGINT), true, false, false),
          (CAST(19 AS BIGINT), true, false, false))
          AS t(pair_id, dissociation, desorption, reconstruction)""",
    "u16_invertibility" ->
      """SELECT * FROM (VALUES
          ('mp-126', '1,0,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-126', '1,1,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-126', '1,1,1', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-13', '1,0,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-13', '1,1,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-13', '1,1,1', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-30', '1,0,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-30', '1,1,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-30', '1,1,1', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), false, false, true),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), true, false, true),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), false, false, true),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), true, false, true),
          ('mp-79', '1,1,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), false, false, true),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), true, false, true),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), false, false, true),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), true, false, true),
          ('mp-81', '1,0,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-81', '1,1,0', CAST('0.0' AS DOUBLE), true, true, true),
          ('mp-81', '1,1,1', CAST('0.0' AS DOUBLE), true, true, true))
          AS t(bulk_id, slab_millers, slab_shift, slab_top, invertible, flip_involution)""",
  )
}
