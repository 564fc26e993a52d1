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

  test("output column names are identifier-safe and unique (oracle contract)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, sf).columns
      assert(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
        s"$name: non-identifier columns ${cols.mkString(",")}")
      assert(cols.distinct.length == cols.length, s"$name: duplicate columns")
    }
  }

  test("every query is run-to-run deterministic (hash of sorted rows)") {
    def fingerprint(name: String): Int = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect().map(_.toString).sorted.mkString("\n").hashCode
    }
    // skip the seeded sample (partitioning-dependent by design)
    val names = SparkEntry.queries.keys.filterNot(_ == "f12_sample_fraction").toSeq.sorted
    val first = names.map(n => n -> fingerprint(n)).toMap
    val diffs = names.filter(n => fingerprint(n) != first(n))
    assert(diffs.isEmpty, s"nondeterministic queries: $diffs")
  }
}
