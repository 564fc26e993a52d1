package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the cross-session store contract ([[PersistedBase]]): the build
  * thunk runs exactly once per content key (later calls — the "new
  * session" path — are pure parquet reads), a changed key rebuilds, and
  * the content fingerprint is row-order independent but sensitive to
  * every keyed column (the invalidation rule d7b/gt2b rely on: a text
  * edit MUST rebuild the CC labels).
  */
class PersistedBaseSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "aa bb"), (2L, "cc dd"), (3L, "ee ff")).toDF("id", "text")

  test("corpusKey: order-independent, content-sensitive") {
    val k1 = PersistedBase.corpusKey(docs, col("id"), col("text"))
    val k2 = PersistedBase.corpusKey(docs.orderBy(col("id").desc),
      col("id"), col("text"))
    assert(k1 == k2, "row order must not change the key")
    val edited = docs.withColumn("text",
      when(col("id") === 2L, lit("cc dx")).otherwise(col("text")))
    assert(PersistedBase.corpusKey(edited, col("id"), col("text")) != k1,
      "a single-row text edit must invalidate")
    val dropped = docs.filter(col("id") =!= 3L)
    assert(PersistedBase.corpusKey(dropped, col("id"), col("text")) != k1,
      "a deletion must invalidate")
  }

  test("getOrBuild: builds once per key, rebuilds on key change") {
    val name = s"pbspec-${System.nanoTime()}"
    var builds = 0
    def serve(key: String, version: Int = 1) =
      PersistedBase.getOrBuild(spark, name, key, version) {
        builds += 1
        docs.select(col("id"), length(col("text")).as("len"))
      }
    val cold = serve("k1").orderBy("id").as[(Long, Int)].collect().toSeq
    val warm = serve("k1").orderBy("id").as[(Long, Int)].collect().toSeq
    assert(builds == 1, "second call must be a store read, not a rebuild")
    assert(cold == warm)
    serve("k2").collect()
    assert(builds == 2, "a new content key must rebuild")
    // the ADVICE-r10 stale-logic hole: the content key fingerprints the
    // SOURCE DATA, so a build-closure change with an unchanged corpus
    // must be invalidated by the derivation version instead
    serve("k1", version = 2).collect()
    assert(builds == 3,
      "a bumped derivation version must rebuild under an unchanged key")
  }

  test("corpusKey: a same-position character SWAP across two rows must " +
    "invalidate (the affine-cancellation regression)") {
    // rows 1/2 trade their last characters: with a polynomial row hash
    // the commutative sum is IDENTICAL by algebra (h(a)+h(b') =
    // h(a')+h(b) for a same-position same-δ edit pair) and the xor
    // collided in practice (GraphPersistedSpec's returnflag flip) —
    // the avalanching row hash must see the swap
    val swapped = docs.withColumn("text",
      when(col("id") === 1L, lit("aa bd"))
        .when(col("id") === 2L, lit("cc db"))
        .otherwise(col("text")))
    assert(PersistedBase.corpusKey(swapped, col("id"), col("text")) !=
      PersistedBase.corpusKey(docs, col("id"), col("text")),
      "a cross-row character swap must change the key")
  }

  test("corpusKey: empty corpus yields the stable 0-0-0 key, not an NPE") {
    assert(PersistedBase.corpusKey(docs.filter(col("id") < 0L),
      col("id"), col("text")) == "0-0-0")
  }

  test("getOrBuild: a builder losing the race reads the winner's entry " +
    "and never clobbers it") {
    val name = s"pbspec-race-${System.nanoTime()}"
    val storeRoot = sys.env.getOrElse("GRAFT_STORE_DIR",
      s"${sys.props("java.io.tmpdir")}/graft-store")
    // simulate the race deterministically: WHILE builder B's thunk runs
    // (B already passed the initial absence check), builder A lands a
    // complete entry at the keyed path. B's post-build re-check must see
    // it, discard B's own result, and serve A's rows — never delete or
    // overwrite the complete entry.
    val served = PersistedBase.getOrBuild(spark, name, "k", 1) {
      docs.select(col("id"), lit("winner").as("who"))
        .write.mode("overwrite").parquet(s"$storeRoot/$name-v1-k")
      docs.select(col("id"), lit("loser").as("who"))
    }
    assert(served.select("who").distinct().as[String].collect().toSeq
      == Seq("winner"),
      "the losing builder must fall through to the winner's entry")
    // and a later cold probe still serves the winner (entry intact)
    assert(PersistedBase.getOrBuild(spark, name, "k", 1) { fail("no rebuild") }
      .select("who").distinct().as[String].collect().toSeq == Seq("winner"))
  }
}
