package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash
import graft.ops.Grouped

/** The flagship: the reference's whole screening shape (SURVEY §3.1) as ONE
  * oracle-checked corpus query — filter (F6) → enumeration fan-out (G1) →
  * broadcast cross join vs the adsorbate dim (J1) → per-combo config
  * enumeration + surrogate inference as an array column (G3/M1) → per-row
  * min/argmin (A3) → grouped-EXISTS soft delete (A7) — all driven by the
  * same deterministic surrogate energies on both engines.
  *
  * Plan shape at scale: one narrow stage end-to-end until the A7 window
  * (single shuffle on the group key); the adsorbate side is a 3-row
  * broadcast; no other exchange except the output sort.
  */
object PipelineQueries extends QueryPack {

  private val SMILES = Seq("*H", "*CO", "*OH")
  private val LO = -2.5
  private val HI = -1.5

  private def energyExpr(key: Column, i: Column): Column =
    (StableHash.polyHash(concat_ws("#", key, i)) % 6000) / lit(1000.0) - lit(4.0)

  private def energySql(key: String, i: String): String =
    s"(${StableHash.polyHashSql(s"concat_ws('#', $key, $i)")} % 6000) / 1000.0 - 4.0"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5_pipeline_screen" -> ((s, d) => {
      import s.implicits._
      val ads = SMILES.toDF("adsorbate_smiles")
      val surfaces = Tables.part(s, d)
        .filter(col("p_size") <= 40)                                    // F6
        .select(col("p_partkey"), col("p_brand"),
          explode(sequence(lit(0), col("p_size") % 3)).as("slab_shift")) // G1
      val adslabs = surfaces
        .crossJoin(broadcast(ads))                                      // J1
        .withColumn("surface_key",
          concat_ws("|", col("p_partkey"), col("slab_shift"), col("adsorbate_smiles")))
        .withColumn("n_configs",
          (StableHash.polyHash(col("surface_key")) % 3 + 1).cast("int")) // G3
        .withColumn("dE",
          transform(sequence(lit(0), col("n_configs") - 1),
            i => energyExpr(col("surface_key"), i)))                    // M1
        .withColumn("min_dE", array_min(col("dE")))                     // A3
        .withColumn("argmin_cfg",
          array_position(col("dE"), array_min(col("dE"))).cast("int"))
      Grouped.groupedExistsMark(adslabs, Seq("p_partkey"),              // A7
          col("adsorbate_smiles") === "*CO" && col("min_dE").between(LO, HI),
          "no_target_CO")
        .select("p_partkey", "slab_shift", "adsorbate_smiles",
          "n_configs", "min_dE", "argmin_cfg", "filter_reason")
        .orderBy("p_partkey", "slab_shift", "adsorbate_smiles")
    }),
  )

  val oracles: Map[String, String] = Map(
    "m5_pipeline_screen" -> {
      val key = "concat_ws('|', p_partkey, slab_shift, adsorbate_smiles)"
      s"""WITH surfaces AS (
            SELECT p_partkey, p_brand,
                   CAST(unnest(generate_series(0, p_size % 3)) AS INT) AS slab_shift
            FROM part WHERE p_size <= 40),
          adslabs AS (
            SELECT p_partkey, slab_shift, adsorbate_smiles,
                   $key AS surface_key,
                   CAST(${StableHash.polyHashSql(key)} % 3 + 1 AS INT) AS n_configs
            FROM surfaces CROSS JOIN (VALUES ('*H'), ('*CO'), ('*OH')) ads(adsorbate_smiles)),
          scored AS (
            SELECT p_partkey, slab_shift, adsorbate_smiles, n_configs,
                   list_min(list_transform(generate_series(0, n_configs - 1),
                     i -> ${energySql("surface_key", "i")})) AS min_dE,
                   CAST(list_position(
                     list_transform(generate_series(0, n_configs - 1),
                       i -> ${energySql("surface_key", "i")}),
                     list_min(list_transform(generate_series(0, n_configs - 1),
                       i -> ${energySql("surface_key", "i")}))) AS INT) AS argmin_cfg
            FROM adslabs)
          SELECT p_partkey, slab_shift, adsorbate_smiles, n_configs, min_dE, argmin_cfg,
                 CASE WHEN max(CASE WHEN adsorbate_smiles = '*CO'
                                     AND min_dE BETWEEN $LO AND $HI
                                    THEN 1 ELSE 0 END)
                        OVER (PARTITION BY p_partkey) = 0
                      THEN 'no_target_CO' ELSE NULL END AS filter_reason
          FROM scored
          ORDER BY p_partkey, slab_shift, adsorbate_smiles"""
    },
  )
}
