package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F9 Pourbaix electrochemical stability (reference:
  * catlas/filter_utils.py:194-346, config schema
  * config_validation.py:130-185).
  *
  * Reference shape: per-bulk LMDB side-store holding a Pourbaix diagram +
  * entry, probed row-by-row; decomposition energy evaluated on a pH×V grid
  * (`get_decomposition_bools_from_range`, :271-318) or an explicit
  * condition list (:321-346); a bulk is kept when it is stable — decomp
  * energy ≤ cap — at ANY evaluated condition.
  *
  * Spark-first shape: the side-store becomes a DIAGRAM TABLE keyed by
  * bulk_id, broadcast-joined (the LMDB random-read becomes a hash-join
  * probe — at 100 TB the diagram side is dim-sized: one row per distinct
  * bulk). pymatgen's `get_decomposition_energy` is piecewise-linear over
  * the diagram's stability domains, so a diagram row carries the linear
  * pieces (a, b, c) with e(pH, V) = max over pieces of a·pH + b·V + c —
  * evaluated with `aggregate`/`exists` higher-order column functions:
  * pure codegen'd expressions, no UDF, no shuffle beyond the broadcast.
  *
  * A bulk with no diagram row is dropped — the reference returns [False]
  * when the Pourbaix query failed (filter_utils.py:252-255).
  */
object Pourbaix {

  /** One electrochemical condition (pH, applied potential V vs SHE, and
    * the decomposition-energy cap under which the material counts stable).
    */
  case class Condition(pH: Double, V: Double, maxDecompositionEnergy: Double)

  /** One linear piece of a bulk's decomposition-energy surface. */
  case class DiagramPiece(a: Double, b: Double, c: Double)

  /** Diagram-table row: `pieces` as an array column after `toDF`. */
  case class DiagramEntry(bulk_id: String, pieces: Seq[DiagramPiece])

  /** Range mode (filter_utils.py:285-303): np.arange semantics — stop
    * exclusive — with the upper bound appended when the grid missed it.
    * Default steps pH 0.2 / V 0.1 (:291-294).
    */
  def rangeConditions(pHLower: Double, pHUpper: Double,
                      vLower: Double, vUpper: Double,
                      maxDecompositionEnergy: Double,
                      pHStep: Double = 0.2, vStep: Double = 0.1): Seq[Condition] = {
    def arange(lo: Double, hi: Double, step: Double): Seq[Double] = {
      require(step > 0 && hi >= lo, s"bad range [$lo, $hi] step $step")
      val n = math.max(1, math.ceil((hi - lo) / step - 1e-9).toInt)
      val xs = (0 until n).map(i => lo + i * step)
      if (xs.exists(x => math.abs(x - hi) < 1e-12)) xs else xs :+ hi
    }
    for {
      ph <- arange(pHLower, pHUpper, pHStep)
      v <- arange(vLower, vUpper, vStep)
    } yield Condition(ph, v, maxDecompositionEnergy)
  }

  /** Decomposition energy at (pH, V) over a `pieces` array column. */
  def decompositionEnergy(pieces: Column, pH: Column, v: Column): Column =
    aggregate(pieces, lit(Double.MinValue),
      (acc, p) => greatest(acc,
        p.getField("a") * pH + p.getField("b") * v + p.getField("c")))

  /** Stability predicate: stable at ANY of `conditions` (the reference's
    * per-condition bool list is consumed by filters.py:99-109 as keep-if-
    * any-true).
    */
  def stableAtAny(pieces: Column, conditions: Seq[Condition]): Column = {
    require(conditions.nonEmpty, "pourbaix filter needs at least one condition")
    val condArr = array(conditions.map(c => struct(
      lit(c.pH).as("pH"), lit(c.V).as("V"),
      lit(c.maxDecompositionEnergy).as("maxE"))): _*)
    exists(condArr, c =>
      decompositionEnergy(pieces, c.getField("pH"), c.getField("V")) <= c.getField("maxE"))
  }

  /** The F9 filter: broadcast-join `diagram` (bulk_id, pieces) onto
    * `bulks` and keep rows stable at any condition. Missing diagram rows
    * drop the bulk (inner join = the reference's failed-query [False]).
    */
  def filterStable(bulks: DataFrame, diagram: DataFrame,
                   conditions: Seq[Condition],
                   idCol: String = "bulk_id"): DataFrame = {
    require(!bulks.columns.contains("pieces"),
      "filterStable: bulks side already has a 'pieces' column")
    bulks.join(broadcast(diagram.select(col(idCol), col("pieces"))), Seq(idCol))
      .filter(stableAtAny(col("pieces"), conditions))
      .drop("pieces")
  }
}
