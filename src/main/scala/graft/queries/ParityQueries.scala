package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num
import graft.parity.Parity

/** §3.2–3.3 entry points over the corpus: a validation table synthesized
  * deterministically from `orders` (adsorbate ~ priority, distribution ~
  * status, DFT ~ scaled price, ML ~ linear + discrete perturbation), then
  * the parity report and best-frame queries run on it. Geometry scores
  * (U2–U8) run on the crystal fixtures as a rows-only entry.
  */
object ParityQueries extends QueryPack {

  private def validation(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderpriority").as("adsorbate"),
      col("o_orderstatus").as("distribution"),
      // integer-derived values with <=4 decimal digits: every product/sum
      // stays clear of the DECIMAL(30,6) rounding-tie zone (see Num)
      ((col("o_orderkey") % 997).cast("double") / lit(100.0)).as("DFT_energy"),
      ((col("o_orderkey") % 997).cast("double") / lit(100.0) * lit(2.0)
        + (col("o_custkey") % 7).cast("double") / lit(10.0)).as("ML_energy"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pr1_parity_report" -> ((s, d) =>
      Parity.parityReport(validation(s, d))
        .orderBy("adsorbate", "distribution")),

    "pr2_best_frame" -> ((s, d) =>
      Parity.bestFrame(
        Tables.embeddings(s, d).select(
          col("vec_id").cast("string").as("random_id"),
          (col("label").cast("double") / lit(10.0)).as("DFT_energy"),
          col("embedding").cast("array<double>").as("ML_energies")))),

    // U2–U8 geometry scores over enumerated fixture slabs (rows-only: the
    // values are pinned by GeometrySpec; this puts the operators in the
    // driver gate).
    "u2_geometry_scores" -> ((s, _) => {
      import s.implicits._
      val geomUdf = udf((slab: graft.domain.Structure, bulk: graft.domain.Structure) => {
        val area = graft.domain.Geometry.surfaceArea(slab)
        val com = graft.domain.Geometry.centerOfMass(slab)
        val bl = graft.domain.Geometry.bondLengths(bulk).values.min
        val cn = graft.domain.Geometry.bulkCoordination(bulk).values.max
        val bb = graft.domain.Geometry.brokenBondScore(slab, bulk)
        val sd = graft.domain.Geometry.surfaceDensityScore(slab, bulk)
        (area, com(2), bl, cn, bb, sd)
      })
      s.createDataset(graft.domain.Fixtures.bulks)
        .flatMap(b => graft.domain.Enumerate.enumerateSlabs(b, 1))
        .toDF()
        .withColumn("g", geomUdf(col("slab_structure"), col("bulk_structure")))
        // array cols stringified: the driver comparator sorts a pandas frame
        // by every column and cannot hash numpy arrays
        .select(col("bulk_id"),
          concat_ws(",", col("slab_millers")).as("slab_millers"),
          col("slab_shift"),
          col("g._1").as("area"), col("g._2").as("com_z"),
          col("g._3").as("min_bond_length"), col("g._4").as("max_cn"),
          col("g._5").as("broken_bond_score"), col("g._6").as("surface_density_score"))
        .orderBy("bulk_id", "slab_millers", "slab_shift")
    }),

    // S5 .npz read through the DataSource V2 table (format("npz")):
    // deterministic fixtures to a scratch dir, one row per archive with
    // array columns, melted to join-ready rows against a literal oracle.
    // The missing `counts` member in the ood archive exercises the
    // null-column path without touching the melt.
    "s5_npz_table" -> ((s, _) => {
      val dir = graft.sources.NpzFixtures.writeTo(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_s5_npz"))
      val raw = s.read.format("npz").load(dir)
        .withColumn("dist", regexp_extract(col("path"), "([^/]+)\\.npz", 1))
      graft.sources.Sources.meltArrays(raw, "dist", "ids", "energies")
        .select(col("distribution"), col("id"), col("ml_energy"))
        .orderBy("distribution", "id")
    }),

    // S6 real .traj read through the driver gate: spec-conformant ULM
    // fixtures written to a scratch dir, parsed distributed, per-frame
    // energies + the anomaly screen verdict against a literal oracle.
    "s6_traj_energies" -> ((s, _) => {
      import s.implicits._
      val dir = graft.sources.UlmFixtures.writeTo(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_s6_trajs"))
      graft.sources.Sources.readTrajectories(s, dir).toDF()
        .select(regexp_extract(col("path"), "([^/]+)\\.traj", 1).as("traj"),
          col("goodTrajectory").as("good_trajectory"),
          posexplode(col("energies")).as(Seq("frame", "ml_energy")))
        .select(col("traj"), col("frame"), col("ml_energy"), col("good_trajectory"))
        .orderBy("traj", "frame")
    }),
  )

  private def parityOracle: String = {
    val x = "(CAST(o_orderkey % 997 AS DOUBLE) / 100.0)"
    val y = s"($x * 2.0 + CAST(o_custkey % 7 AS DOUBLE) / 10.0)"
    val sx = Num.sqlSum(x); val sy = Num.sqlSum(y)
    val sxx = Num.sqlSum(s"$x * $x"); val sxy = Num.sqlSum(s"$x * $y")
    val syy = Num.sqlSum(s"$y * $y")
    val mae = Num.sqlAvg(s"abs($x - $y)")
    s"""WITH s AS (
          SELECT o_orderpriority AS adsorbate, o_orderstatus AS distribution,
                 count(*) AS n, $mae AS mae,
                 $sx AS sx, $sy AS sy, $sxx AS sxx, $sxy AS sxy, $syy AS syy
          FROM orders GROUP BY 1, 2)
        SELECT adsorbate, distribution, n, mae,
               (sxy - sx*sy/n) / (sxx - sx*sx/n) AS slope,
               (sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n AS intercept,
               ((sxy - sx*sy/n) * (sxy - sx*sy/n)) /
                 ((sxx - sx*sx/n) * (syy - sy*sy/n)) AS r2
        FROM s ORDER BY adsorbate, distribution"""
  }

  val oracles: Map[String, String] = Map(
    "u2_geometry_scores" ->
      """SELECT * FROM (VALUES
          ('mp-126', '1,0,0', CAST('0.0' AS DOUBLE), CAST('15.366399999999999' AS DOUBLE), CAST('0.4166333333333333' AS DOUBLE), CAST('3.049044440476393' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.021692350409551576' AS DOUBLE), CAST('1.3015410245730947' AS DOUBLE)),
          ('mp-126', '1,1,0', CAST('0.0' AS DOUBLE), CAST('21.731371284849928' AS DOUBLE), CAST('0.41663333333333336' AS DOUBLE), CAST('3.049044440476393' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.02300821211170305' AS DOUBLE), CAST('0.8282956360213098' AS DOUBLE)),
          ('mp-126', '1,1,1', CAST('0.0' AS DOUBLE), CAST('26.615385529426394' AS DOUBLE), CAST('0.4999666666666666' AS DOUBLE), CAST('3.049044440476393' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.01878612652246544' AS DOUBLE), CAST('0.6763005548087557' AS DOUBLE)),
          ('mp-13', '1,0,0', CAST('0.0' AS DOUBLE), CAST('8.2369' AS DOUBLE), CAST('0.4166333333333333' AS DOUBLE), CAST('2.734042199747473' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.03035122436839102' AS DOUBLE), CAST('0.7284293848413844' AS DOUBLE)),
          ('mp-13', '1,1,0', CAST('0.0' AS DOUBLE), CAST('11.648735691910948' AS DOUBLE), CAST('0.4999666666666667' AS DOUBLE), CAST('2.734042199747473' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.021461556568203675' AS DOUBLE), CAST('0.5150773576368882' AS DOUBLE)),
          ('mp-13', '1,1,1', CAST('0.0' AS DOUBLE), CAST('14.266729296864087' AS DOUBLE), CAST('0.41663333333333347' AS DOUBLE), CAST('2.734042199747473' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.021904109449156606' AS DOUBLE), CAST('0.38551232630515625' AS DOUBLE)),
          ('mp-30', '1,0,0', CAST('0.0' AS DOUBLE), CAST('13.0321' AS DOUBLE), CAST('0.4166333333333333' AS DOUBLE), CAST('2.807921028091781' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.025577867982392196' AS DOUBLE), CAST('1.5346720789435317' AS DOUBLE)),
          ('mp-30', '1,1,0', CAST('0.0' AS DOUBLE), CAST('18.430172566202412' AS DOUBLE), CAST('0.41663333333333347' AS DOUBLE), CAST('2.807921028091781' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.027129425847965696' AS DOUBLE), CAST('0.9766593305267651' AS DOUBLE)),
          ('mp-30', '1,1,1', CAST('0.0' AS DOUBLE), CAST('22.572259329318364' AS DOUBLE), CAST('0.4999666666666667' AS DOUBLE), CAST('2.807921028091781' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.022151083447396268' AS DOUBLE), CAST('0.7974390041062657' AS DOUBLE)),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), CAST('18.232899999999997' AS DOUBLE), CAST('0.4672002281505876' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.013711477603672485' AS DOUBLE), CAST('0.3290754624881396' AS DOUBLE)),
          ('mp-79', '1,0,0', CAST('0.0' AS DOUBLE), CAST('18.232899999999997' AS DOUBLE), CAST('0.3660664385160791' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.013711477603672485' AS DOUBLE), CAST('0.3290754624881396' AS DOUBLE)),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), CAST('18.232899999999997' AS DOUBLE), CAST('0.3660664385160792' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.013711477603672485' AS DOUBLE), CAST('0.3290754624881396' AS DOUBLE)),
          ('mp-79', '1,0,0', CAST('0.5' AS DOUBLE), CAST('18.232899999999997' AS DOUBLE), CAST('0.4672002281505877' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.013711477603672485' AS DOUBLE), CAST('0.3290754624881396' AS DOUBLE)),
          ('mp-79', '1,1,0', CAST('0.0' AS DOUBLE), CAST('25.7852144613924' AS DOUBLE), CAST('0.4999666666666669' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.009695478793644286' AS DOUBLE), CAST('0.2326914910474629' AS DOUBLE)),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), CAST('31.58030916932258' AS DOUBLE), CAST('0.4672002281505877' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.009895406606834791' AS DOUBLE), CAST('0.17415915628029233' AS DOUBLE)),
          ('mp-79', '1,1,1', CAST('0.0' AS DOUBLE), CAST('31.58030916932258' AS DOUBLE), CAST('0.36606643851607923' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.009895406606834791' AS DOUBLE), CAST('0.17415915628029233' AS DOUBLE)),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), CAST('31.58030916932258' AS DOUBLE), CAST('0.3660664385160792' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.009895406606834791' AS DOUBLE), CAST('0.17415915628029233' AS DOUBLE)),
          ('mp-79', '1,1,1', CAST('0.5' AS DOUBLE), CAST('31.58030916932258' AS DOUBLE), CAST('0.4672002281505877' AS DOUBLE), CAST('4.067721321575508' AS DOUBLE), CAST(8 AS INTEGER), CAST('0.009895406606834791' AS DOUBLE), CAST('0.17415915628029233' AS DOUBLE)),
          ('mp-81', '1,0,0', CAST('0.0' AS DOUBLE), CAST('16.6464' AS DOUBLE), CAST('0.41663333333333324' AS DOUBLE), CAST('3.1734952339652254' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.020024349609124695' AS DOUBLE), CAST('1.2014609765474817' AS DOUBLE)),
          ('mp-81', '1,1,0', CAST('0.0' AS DOUBLE), CAST('23.54156464468749' AS DOUBLE), CAST('0.41663333333333336' AS DOUBLE), CAST('3.1734952339652254' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.021239030096193396' AS DOUBLE), CAST('0.7646050834629623' AS DOUBLE)),
          ('mp-81', '1,1,1', CAST('0.0' AS DOUBLE), CAST('28.83241056311456' AS DOUBLE), CAST('0.4999666666666667' AS DOUBLE), CAST('3.1734952339652254' AS DOUBLE), CAST(12 AS INTEGER), CAST('0.01734159545576298' AS DOUBLE), CAST('0.6242974364074673' AS DOUBLE)))
          AS t(bulk_id, slab_millers, slab_shift, area, com_z, min_bond_length, max_cn, broken_bond_score, surface_density_score)""",
    "pr1_parity_report" -> parityOracle,
    "pr2_best_frame" ->
      s"""WITH x AS (
            SELECT CAST(unnest(generate_series(1, len(embedding))) - 1 AS INT) AS frame,
                   unnest(embedding) AS e,
                   CAST(label AS DOUBLE) / 10.0 AS dft
            FROM embeddings),
          c AS (
            SELECT frame,
                   ${Num.sqlAvg("abs(CAST(e AS DOUBLE) - dft)")} AS mae,
                   ${Num.sqlAvg("CAST(e AS DOUBLE) - dft")} AS me,
                   count(*) AS n
            FROM x GROUP BY frame)
          SELECT frame, mae, me, n FROM c ORDER BY mae, frame LIMIT 1""",
    // the s5 fixtures are deterministic — the oracle is their pinned
    // content (all energies exact binary doubles)
    "s5_npz_table" ->
      """SELECT distribution, id, CAST(ml_energy AS DOUBLE) AS ml_energy
         FROM (VALUES
           ('val_id', 'mp-101', 1.5),
           ('val_id', 'mp-2', -2.25),
           ('val_id', 'mp-33333', 0.75),
           ('val_id', 'mvc-7', -0.125),
           ('val_ood', 'mp-8', 0.5),
           ('val_ood', 'oqmd-77', -1.75))
           AS t(distribution, id, ml_energy)
         ORDER BY distribution, id""",
    // the s6 fixtures are deterministic — the oracle is their pinned
    // content (frame is posexplode's INT, energies exact binary doubles)
    "s6_traj_energies" ->
      """SELECT traj, CAST(frame AS INT) AS frame,
                CAST(ml_energy AS DOUBLE) AS ml_energy, good_trajectory
         FROM (VALUES
           ('desorbed', 0, -3.25, false),
           ('desorbed', 1, -1.5, false),
           ('stable', 0, -3.25, true),
           ('stable', 1, -3.5, true),
           ('stable', 2, -3.75, true))
           AS t(traj, frame, ml_energy, good_trajectory)""",
  )
}
