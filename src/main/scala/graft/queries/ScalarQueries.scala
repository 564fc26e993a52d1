package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.8 scalar-function surface over the corpus. The geometry UDFs
  * proper (U1–U8 on crystal structs) live in [[graft.domain.Geometry]] with
  * ScalaTest fixtures; here each op's *computational shape* runs as pure
  * built-in column expressions — per-row IEEE-754 math is bit-identical
  * across engines, so these oracle-match exactly. No Scala closures: every
  * expression stays inside whole-stage codegen.
  */
object ScalarQueries extends QueryPack {

  /** U1 `surface_area` (filter_utils.py:394-405): ‖a⃗ × b⃗‖ — composed from
    * built-ins rather than a UDF so Catalyst sees through it.
    */
  private def crossNorm(a: (Column, Column, Column), b: (Column, Column, Column)): Column = {
    val cx = a._2 * b._3 - a._3 * b._2
    val cy = a._3 * b._1 - a._1 * b._3
    val cz = a._1 * b._2 - a._2 * b._1
    sqrt(cx * cx + cy * cy + cz * cz)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_cross_product_norm" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          crossNorm(
            (col("l_quantity"), col("l_discount"), col("l_tax")),
            (col("l_extendedprice") / lit(1000.0), lit(1.0), lit(2.0)))
            .as("area"))
        .orderBy("l_orderkey", "l_linenumber")),

    // U10/U11 content-addressed hashing (cache_utils.py:49-99): canonical
    // field concatenation → SHA-256. Only integers/strings enter the key —
    // float rendering is engine-specific, so canonical keys must never
    // stringify raw doubles (SURVEY §7.4 hard-part #2).
    "u10_content_hash" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          sha2(concat_ws("|", col("p_partkey"), col("p_name"), col("p_brand"),
            col("p_size")), 256).as("content_key"))
        .orderBy("p_partkey")),

    // U20 per-frame error transform (bin/optimize_frame.py:16-19): higher-
    // order `transform`, scalarized through posexplode for stable compare.
    "u20_transform_abs_error" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(
          transform(col("embedding"), e => abs(e.cast("double") - lit(0.5))))
          .as(Seq("pos", "abs_err")))
        .orderBy("vec_id", "pos")),

    // U21 model-id extraction (parity_utils.py:12-16).
    "u21_regexp_extract" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
        .orderBy("p_partkey")),

    // U22 digit extraction (data_processing_utils.py:28).
    "u22_digit_extract" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("bigint").as("cust_num"))
        .orderBy("c_custkey")),

    // Semi-structured cell values (the reference stores nested objects in
    // cells, §1.3): JSON path extraction stays a column op.
    "u23_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .orderBy("event_id")),

    // U19 map/array introspection (data_processing_utils.py:43-49).
    "u19_elements_and_num" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("elems"))
        .select(col("doc_id"), size(col("elems")).as("n_distinct"),
          array_join(array_sort(col("elems")), ",").as("elems_sorted"))
        .orderBy("doc_id")),
  )

  val oracles: Map[String, String] = Map(
    "u1_cross_product_norm" ->
      """SELECT l_orderkey, l_linenumber,
                sqrt((l_discount * 2.0 - l_tax * 1.0) * (l_discount * 2.0 - l_tax * 1.0)
                   + (l_tax * (l_extendedprice / 1000.0) - l_quantity * 2.0)
                   * (l_tax * (l_extendedprice / 1000.0) - l_quantity * 2.0)
                   + (l_quantity * 1.0 - l_discount * (l_extendedprice / 1000.0))
                   * (l_quantity * 1.0 - l_discount * (l_extendedprice / 1000.0)))
                  AS area
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "u10_content_hash" ->
      """SELECT p_partkey,
                sha256(concat_ws('|', p_partkey, p_name, p_brand, p_size))
                  AS content_key
         FROM part ORDER BY p_partkey""",
    "u20_transform_abs_error" ->
      """SELECT vec_id,
                CAST(unnest(generate_series(1, len(embedding))) - 1 AS INT) AS pos,
                abs(CAST(unnest(embedding) AS DOUBLE) - 0.5) AS abs_err
         FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, pos""",
    "u21_regexp_extract" ->
      """SELECT p_partkey, regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
         FROM part ORDER BY p_partkey""",
    "u22_digit_extract" ->
      """SELECT c_custkey,
                CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num
         FROM customer ORDER BY c_custkey""",
    "u23_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "u19_elements_and_num" ->
      """SELECT doc_id,
                len(list_distinct(string_split(text, ' '))) AS n_distinct,
                array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
                  AS elems_sorted
         FROM documents ORDER BY doc_id""",
  )
}
