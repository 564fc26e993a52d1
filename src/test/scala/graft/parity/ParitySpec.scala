package graft.parity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ParitySpec extends SparkTestBase {
  import spark.implicits._

  test("parity report recovers a known linear model per split") {
    val v = (1 to 200).map { i =>
      val x = i / 10.0
      ("*CO", if (i % 2 == 0) "id" else "ood", x, 2.0 * x + 1.0)
    }.toDF("adsorbate", "distribution", "DFT_energy", "ML_energy")
    val r = Parity.parityReport(v).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("slope") - 2.0) < 1e-9)
      assert(math.abs(row.getAs[Double]("intercept") - 1.0) < 1e-9)
      assert(math.abs(row.getAs[Double]("r2") - 1.0) < 1e-9)
    }
  }

  test("pre-filters are applied before the report (bulk_filter reuse)") {
    val v = Seq(
      ("*H", "id", 1.0, 1.1, 5), ("*H", "id", 2.0, 2.1, 50))
      .toDF("adsorbate", "distribution", "DFT_energy", "ML_energy", "bulk_natoms")
    val r = Parity.parityReport(v, Seq(col("bulk_natoms") <= 10)).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n") == 1)
  }

  test("best frame finds the index with minimal MAE") {
    // frame 1 is exact; frames 0 and 2 are off by ±1
    val v = Seq(
      ("a", 1.0, Seq(2.0, 1.0, 0.0)),
      ("b", 3.0, Seq(4.0, 3.0, 2.0)))
      .toDF("random_id", "DFT_energy", "ML_energies")
    val best = Parity.bestFrame(v).collect()(0)
    assert(best.getAs[Int]("frame") == 1)
    assert(best.getAs[Double]("mae") == 0.0)
  }
}

class ResourcesSpec extends SparkTestBase {
  test("M4 gpu profile carries task+executor gpu requests") {
    val p = graft.domain.Resources.gpuProfile(gpusPerExecutor = 2, memoryGb = 16)
    assert(p.taskResources("gpu").amount == 1.0)
    assert(p.executorResources("gpu").amount == 2)
  }
}
