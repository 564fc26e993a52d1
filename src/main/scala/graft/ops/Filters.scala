package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relational filter algebra — SURVEY.md §2.2, F1–F14 (+ P14–P16).
  *
  * Reference semantics: `catlas/filters.py:15-179` (bulk table dispatcher),
  * `catlas/filters.py:236-239` (adsorbate), applied in user/YAML order.
  *
  * Spark-first design: every filter is a pure `Column` predicate builder —
  * no UDFs — so Catalyst can push each predicate into the parquet scan
  * (PushedFilters), fold constants, and prune columns. Array-typed filters
  * use higher-order functions (`forall`, `exists`, `arrays_overlap`), which
  * stay inside whole-stage codegen; at 100 TB the difference between a
  * pushed-down codegen predicate and an opaque UDF is the whole ballgame.
  */
object Filters {

  /** F1 `filter_by_bulk_ids` — membership (catlas/filters.py:42-43). */
  def byIds(c: Column, ids: Seq[Any]): Column = c.isin(ids: _*)

  /** F2 `filter_ignore_bulk_ids` — anti-membership (filters.py:44-45). */
  def ignoreIds(c: Column, ids: Seq[Any]): Column = !c.isin(ids: _*)

  /** F3 `filter_by_acceptable_elements` — every element of the array is in
    * the allowed set (filters.py:46-55). `forall` keeps codegen; the
    * equivalent `size(array_except(...))===0` would allocate an array per
    * row — avoid at scale.
    */
  def acceptableElements(arr: Column, allowed: Seq[String]): Column = {
    val allowedSet = allowed.toSet
    forall(arr, e => e.isInCollection(allowedSet))
  }

  /** F4 `filter_by_num_elements` (filters.py:57-58). */
  def numElements(n: Column, counts: Seq[Int]): Column = n.isin(counts: _*)

  /** F5 `filter_by_required_elements` — all required present
    * (filters.py:59-70): conjunction of `array_contains`, not a nested loop.
    */
  def requiredElements(arr: Column, required: Seq[String]): Column =
    required.map(r => array_contains(arr, r)).reduce(_ && _)

  /** F6 `filter_by_object_size` (filters.py:71-72). */
  def maxSize(n: Column, v: Int): Column = n <= lit(v)

  /** F7 `filter_by_elements_active_host` (filters.py:73-87): subset of
    * active ∪ host, AND intersects active, AND intersects host.
    */
  def activeHost(arr: Column, active: Seq[String], host: Seq[String]): Column =
    acceptableElements(arr, active ++ host) &&
      arrays_overlap(arr, lit(active.toArray)) &&
      arrays_overlap(arr, lit(host.toArray))

  /** F10/F11 `filter_by_bulk_e_above_hull` / `filter_by_bulk_band_gap` —
    * one- or two-sided range (filters.py:113-129).
    */
  def range(c: Column, lo: Option[Double], hi: Option[Double]): Column =
    (lo, hi) match {
      case (Some(l), Some(h)) => c.between(l, h)
      case (Some(l), None)    => c >= lit(l)
      case (None, Some(h))    => c <= lit(h)
      case _                  => lit(true)
    }

  /** F12 `filter_fraction` — seeded Bernoulli sample (filters.py:131-132).
    * Implemented as `df.sample` at the call site; the seed makes a single
    * run reproducible but the row set is partitioning-dependent, so no
    * cross-engine oracle exists (recorded rows-only by the driver).
    */
  val sampleSeed = 42L
}
