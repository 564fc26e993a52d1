package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableHash
import graft.ops.Filters

/** SURVEY §2.2 filter inventory (F1–F14, P14–P16, F9 grid-EXISTS) exercised
  * over the driver corpus. The catlas column analogies: `part` plays the
  * bulk table (p_size ~ natoms), `documents.text` tokens play
  * `bulk_elements`, `customer.c_acctbal` plays band-gap/e-above-hull.
  *
  * All predicates are [[graft.ops.Filters]] Column builders — pushed into
  * the parquet scan by Catalyst, zero UDFs, zero shuffles (filters are
  * narrow; the only exchange in these plans is the final order-by for
  * deterministic output, which the driver compare needs).
  */
object FilterQueries extends QueryPack {

  private val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  private val allowed = vocab.filterNot(Set("dup", "vector", "stream"))
  private val active  = Seq("spark", "join", "hash", "merge", "sort")
  private val host    = vocab.filterNot((active ++ Seq("dup", "vector")).toSet)

  // F8 element-group expansion: the fixed periodic-table-group lookup of
  // catlas/filter_utils.py:133-191 becomes a static Scala map.
  private val wordGroups: Map[String, Seq[String]] = Map(
    "engine" -> Seq("spark", "query", "join", "scan", "sort", "merge", "hash",
      "filter", "agg", "group", "window", "batch", "stream"),
    "shape" -> Seq("row", "column", "table", "line", "vector", "key", "value",
      "data", "part", "order", "customer", "dup"),
    "misc" -> Seq("a", "the", "fast", "slow", "big", "small"))

  private def tokens(c: String = "text") = split(col(c), " ")

  // single definition for every membership list: the Spark predicate AND
  // the oracle SQL interpolate the same Seq
  private val brandIds = Seq("Brand#2", "Brand#15", "Brand#19")
  private val ignorePriorities = Seq("5-LOW", "4-NOT SPECIFIED")
  private val sizeList = Seq(1, 5, 10, 15, 20)
  private val segments = Seq("BUILDING", "AUTOMOBILE")

  // f12b's sample coin: same affine family as st1 (one definition, both
  // engines), distinct "sample|" prefix so the kept sets are independent
  private val (sA, sB) = StableHash.affineParams(1).head

  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ", ", "]")
  private def sqlIn(xs: Seq[String])   = xs.map(x => s"'$x'").mkString("(", ", ", ")")

  // F9b condition grid — ONE definition feeds the Spark filter and the
  // oracle's VALUES list (pH 0–14 step 2, V −1–1 step 0.5, cap 0.5)
  private val pbxConds = graft.domain.Pourbaix.rangeConditions(
    0.0, 14.0, -1.0, 1.0, 0.5, pHStep = 2.0, vStep = 0.5)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f01_filter_by_ids" -> ((s, d) =>
      Tables.part(s, d)
        .filter(Filters.byIds(col("p_brand"), brandIds))
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")),

    "f02_filter_ignore_ids" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(Filters.ignoreIds(col("o_orderpriority"), ignorePriorities))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")),

    "f03_acceptable_elements" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(Filters.acceptableElements(tokens(), allowed))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "f04_num_elements" -> ((s, d) =>
      Tables.part(s, d)
        .filter(Filters.numElements(col("p_size"), sizeList))
        .select("p_partkey", "p_size")
        .orderBy("p_partkey")),

    "f05_required_elements" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(Filters.requiredElements(tokens(), Seq("spark", "join", "hash")))
        .select("doc_id", "source")
        .orderBy("doc_id")),

    "f06_object_size" -> ((s, d) =>
      Tables.part(s, d)
        .filter(Filters.maxSize(col("p_size"), 20))
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")),

    "f07_elements_active_host" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(Filters.activeHost(tokens(), active, host))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // group set chosen satisfiable: docs made only of engine+shape words
    // exist; engine+misc matched nothing (every doc has a "shape" word)
    "f08_element_groups" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(Filters.acceptableElements(
          tokens(), Seq("engine", "shape").flatMap(wordGroups)))
        .select("doc_id")
        .orderBy("doc_id")),

    // F9 Pourbaix-stability analog (catlas/filter_utils.py:271-318): keep a
    // row if, at ANY condition of a (pH, V)-style grid, its "decomposition
    // energy" is under the cap. The grid is a tiny array literal evaluated
    // with the `exists` higher-order function — per-row, codegen'd, no join
    // and no shuffle; the LMDB side-store becomes a broadcast value.
    "f09_stability_grid" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(exists(
          lit(Array(0.0, 2500.0, 5000.0, 7500.0)),
          v => col("c_acctbal") * lit(0.001) - v * lit(0.0002) <= lit(0.5)))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")),

    // F9 REAL Pourbaix shape (filter_utils.py:194-346): a per-bulk diagram
    // table (linear decomposition-energy pieces) broadcast-joined onto the
    // bulk side, stability = EXISTS over the pH×V condition grid with
    // decomp = max over pieces — all higher-order column functions,
    // codegen'd, no UDF. The diagram here is synthesized deterministically
    // from c_custkey so DuckDB can build the identical table.
    "f09b_pourbaix_stability" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val diagram = cust.select(col("c_custkey").as("bulk_id"),
        array(
          struct(((col("c_custkey") % 5).cast("double") * lit(0.1)).as("a"),
            lit(-0.2).as("b"),
            ((col("c_custkey") % 11).cast("double") * lit(0.2) - lit(0.5)).as("c")),
          struct(lit(-0.1).as("a"),
            ((col("c_custkey") % 7).cast("double") * lit(0.1)).as("b"),
            ((col("c_custkey") % 3).cast("double") * lit(0.3) - lit(0.4)).as("c"))
        ).as("pieces"))
      graft.domain.Pourbaix.filterStable(
          cust.select(col("c_custkey").as("bulk_id"), col("c_acctbal")),
          diagram, pbxConds)
        .orderBy("bulk_id")
    }),

    "f10_one_sided_range" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(Filters.range(col("c_acctbal"), Some(0.0), None))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")),

    "f11_two_sided_range" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(Filters.range(col("c_acctbal"), Some(1000.0), Some(5000.0)))
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")),

    // F12: seeded Bernoulli sample — reproducible per run, but the kept set
    // depends on Spark's per-partition RNG, so no cross-engine oracle.
    "f12_sample_fraction" -> ((s, d) =>
      Tables.documents(s, d)
        .sample(withReplacement = false, 0.25, Filters.sampleSeed)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // F12b: the deterministic twin of F12 — identical Bernoulli-sample
    // semantics, but the coin is a row-local hash of the key (st1
    // discipline: u(doc_id) < 0.25), so the kept set is the same on any
    // engine, any partitioning, any cluster layout — and therefore fully
    // hash-gated, where F12's engine-RNG kept set can only be rows-gated.
    // Pure codegen'd predicate in the scan; the only exchange is the
    // deterministic output sort.
    "f12b_sample_deterministic" -> ((s, d) => {
      val u = ((StableHash.polyHash(concat_ws("",
        lit("sample|"), col("doc_id").cast("string")))
        * lit(sA) + lit(sB)) % lit(StableHash.P) + lit(1.0))
        .cast("double") / lit((StableHash.P + 1).toDouble)
      Tables.documents(s, d)
        .filter(u < lit(0.25))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    "f14_smiles_isin" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(Filters.byIds(col("c_mktsegment"), segments))
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")),

    // P14 `filter_columns_by_type` (catlas/filter_utils.py:349-391): drop
    // heavy non-atomic columns. Static schemas make this a dataType scan
    // instead of runtime value sniffing.
    "p14_drop_heavy_columns" -> ((s, d) => {
      val df = Tables.embeddings(s, d)
      val keep = df.schema.fields
        .filter(f => f.dataType.typeName != "array" && f.dataType.typeName != "struct")
        .map(f => col(f.name))
      df.select(keep.toIndexedSeq: _*).orderBy("vec_id")
    }),

    // P15 verbose projection (prediction_steps.py:424-435): display columns
    // + a derived column; pure per-row double math (bit-exact both engines).
    "p15_verbose_projection" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")),
  )

  val oracles: Map[String, String] = Map(
    "f01_filter_by_ids" ->
      s"""SELECT p_partkey, p_brand, p_size FROM part
          WHERE p_brand IN ${sqlIn(brandIds)}
          ORDER BY p_partkey""",
    "f02_filter_ignore_ids" ->
      s"""SELECT o_orderkey, o_orderpriority FROM orders
          WHERE o_orderpriority NOT IN ${sqlIn(ignorePriorities)}
          ORDER BY o_orderkey""",
    "f03_acceptable_elements" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
          WHERE list_has_all(${sqlList(allowed)}, string_split(text, ' '))
          ORDER BY doc_id""",
    "f04_num_elements" ->
      s"""SELECT p_partkey, p_size FROM part
          WHERE p_size IN ${sizeList.mkString("(", ", ", ")")} ORDER BY p_partkey""",
    "f05_required_elements" ->
      """SELECT doc_id, source FROM documents
         WHERE list_contains(string_split(text,' '), 'spark')
           AND list_contains(string_split(text,' '), 'join')
           AND list_contains(string_split(text,' '), 'hash')
         ORDER BY doc_id""",
    "f06_object_size" ->
      """SELECT p_partkey, p_name, p_size FROM part
         WHERE p_size <= 20 ORDER BY p_partkey""",
    "f07_elements_active_host" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE list_has_all(${sqlList(active ++ host)}, string_split(text, ' '))
            AND list_has_any(string_split(text, ' '), ${sqlList(active)})
            AND list_has_any(string_split(text, ' '), ${sqlList(host)})
          ORDER BY doc_id""",
    "f08_element_groups" ->
      s"""SELECT doc_id FROM documents
          WHERE list_has_all(${sqlList(Seq("engine", "shape").flatMap(wordGroups))},
                             string_split(text, ' '))
          ORDER BY doc_id""",
    "f09_stability_grid" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM (VALUES (0.0), (2500.0), (5000.0), (7500.0)) g(v)
                       WHERE c_acctbal * 0.001 - v * 0.0002 <= 0.5)
         ORDER BY c_custkey""",
    "f09b_pourbaix_stability" -> {
      val grid = pbxConds.map(c => s"(${c.pH}, ${c.V})").mkString(", ")
      s"""SELECT c_custkey AS bulk_id, c_acctbal FROM customer
          WHERE EXISTS (
            SELECT 1 FROM (
              SELECT CAST(ph AS DOUBLE) AS ph, CAST(v AS DOUBLE) AS v
              FROM (VALUES $grid) t(ph, v)) g
            WHERE GREATEST(
              CAST(c_custkey % 5 AS DOUBLE) * 0.1 * ph + (-0.2) * v
                + (CAST(c_custkey % 11 AS DOUBLE) * 0.2 - 0.5),
              (-0.1) * ph + CAST(c_custkey % 7 AS DOUBLE) * 0.1 * v
                + (CAST(c_custkey % 3 AS DOUBLE) * 0.3 - 0.4)) <= 0.5)
          ORDER BY bulk_id""" },
    "f10_one_sided_range" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_acctbal >= 0.0 ORDER BY c_custkey""",
    "f11_two_sided_range" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
         WHERE c_acctbal BETWEEN 1000.0 AND 5000.0 ORDER BY c_custkey""",
    "f12b_sample_deterministic" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE ((${StableHash.polyHashSql("concat('sample|', CAST(doc_id AS VARCHAR))")}
                  * $sA + $sB) % ${StableHash.P} + 1.0) / ${StableHash.P + 1}.0 < 0.25
          ORDER BY doc_id""",
    "f14_smiles_isin" ->
      s"""SELECT c_custkey, c_mktsegment FROM customer
          WHERE c_mktsegment IN ${sqlIn(segments)} ORDER BY c_custkey""",
    "p14_drop_heavy_columns" ->
      """SELECT vec_id, label FROM embeddings ORDER BY vec_id""",
    "p15_verbose_projection" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1.0 - l_discount) AS revenue
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
  )
}
