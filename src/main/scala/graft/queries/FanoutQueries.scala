package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.4 fan-out / table-generating operators + §2.7 set ops.
  *
  * catlas's enumerate_slabs (G1) is 1 bulk → N surfaces with all parent
  * columns copied into each child; in Spark that is `explode` of an array
  * built per row — a *narrow* transformation (no shuffle) whose output
  * cardinality is data-dependent. After a big fan-out the stage is
  * rebalanced by AQE / an explicit repartition (SURVEY D3), not by Dask
  * graph surgery. The real crystal-geometry enumeration lives in
  * [[graft.domain]]; these corpus queries pin the *engine semantics*.
  */
object FanoutQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G1/G2: parameterized fan-out — 1 part → (p_size mod 4 + 1) configs,
    // parent columns copied into children (schema accretion).
    "g1_enumerate_explode" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"),
          explode(sequence(lit(0), col("p_size") % 4)).as("config_id"))
        .select(col("p_partkey"), col("config_id").cast("int").as("config_id"),
          col("p_brand"))
        .orderBy("p_partkey", "config_id")),

    // G2 with position: ordinal-preserving explode of a token array.
    "g2_posexplode_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")),

    // G3: enumerate kept as an ARRAY column (not exploded) because the
    // downstream consumer is a per-parent min-aggregate — matches the
    // reference's granularity (enumerate_slabs_adslabs.py:81-122), and at
    // scale avoids materializing the fan-out through a shuffle.
    "g3_enumerate_as_array" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          transform(sequence(lit(0), col("p_size") % 4),
            i => col("p_partkey") * 100 + i).as("configs"))
        .select(col("p_partkey"), size(col("configs")).as("n_configs"),
          element_at(col("configs"), 1).as("first_config"))
        .orderBy("p_partkey")),

    // G5 flip augmentation: UNION ALL of a base set and a transformed
    // derived set (enumeration_utils.py:59-67).
    "g5_union_flip" -> ((s, d) => {
      val p = Tables.part(s, d)
      val top = p.filter(col("p_size") <= 10)
        .select(col("p_partkey"), lit("top").as("variant"))
      val flipped = p.filter(col("p_size") >= 45)
        .select(col("p_partkey"), lit("flipped").as("variant"))
      top.union(flipped).orderBy("p_partkey", "variant")
    }),
  )

  val oracles: Map[String, String] = Map(
    "g1_enumerate_explode" ->
      """SELECT p_partkey, CAST(unnest(generate_series(0, p_size % 4)) AS INT)
                  AS config_id, p_brand
         FROM part ORDER BY p_partkey, config_id""",
    "g2_posexplode_tokens" ->
      """SELECT doc_id,
                CAST(unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS INT) AS pos,
                unnest(string_split(text, ' ')) AS token
         FROM documents WHERE doc_id < 100 ORDER BY doc_id, pos""",
    "g3_enumerate_as_array" ->
      """SELECT p_partkey, CAST(p_size % 4 + 1 AS INT) AS n_configs,
                p_partkey * 100 AS first_config
         FROM part ORDER BY p_partkey""",
    "g5_union_flip" ->
      """SELECT * FROM (
           SELECT p_partkey, 'top' AS variant FROM part WHERE p_size <= 10
           UNION ALL
           SELECT p_partkey, 'flipped' FROM part WHERE p_size >= 45)
         ORDER BY p_partkey, variant""",
  )
}
