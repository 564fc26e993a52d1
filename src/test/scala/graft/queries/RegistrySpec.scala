package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Contract checks for the driver gate (smoke at sf0.001; the full oracle
  * diff runs via graft.Verify + tools/compare.py at sf0.01).
  */
class RegistrySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 with a stable non-empty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.columns.nonEmpty)
        df.count() // executes the plan
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
