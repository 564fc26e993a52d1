package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-SESSION persistence for expensive shared bases — the tier above
  * [[SharedBase]]'s in-session memo. SharedBase makes the second query of
  * a family free within one session; a NEW session still pays the full
  * build (measured: dup_labels ≈ 4.2 s, tri_base ≈ 4.2 s at sf0.1 —
  * every cold session, forever). This store writes the built base to
  * parquet keyed by a CONTENT HASH of the inputs it derives from, so any
  * later session serves the family warm after one cheap key probe.
  *
  * Invalidation rule: the key is an order-independent fingerprint of the
  * source table's identifying columns (count + sum + xor of a per-row
  * avalanching `xxhash64` — see [[corpusKey]] on why the polynomial fold
  * was unsafe here), computed in ONE aggregate pass over only
  * those columns — a column-pruned scan, no payload bytes beyond the
  * named columns. Any insert, delete, or key-column update changes the
  * fingerprint and the store entry is rebuilt; entries for superseded
  * keys are just dead files (bounded housekeeping, deleted lazily). At
  * 100 TB even the pruned scan is worth skipping: a production
  * deployment keys on the table's snapshot/version id (Delta/Iceberg
  * commit, partition manifest) — zero-scan — and refreshes APPENDS via
  * the d15 anti-join discipline instead of rebuilding; the content hash
  * is the engine-portable fallback this sandbox can actually exercise.
  *
  * Write protocol: build → write to a PER-ATTEMPT unique `.tmp-<uuid>`
  * sibling → atomic rename into the keyed path. The unique suffix is
  * what makes CONCURRENT sessions safe, not just killed ones: a shared
  * fixed tmp path would let two builders interleave delete/write and
  * rename a MIXED parquet dir (duplicate part files under a valid
  * _SUCCESS) into place, which every later session would then trust. A
  * complete entry is never deleted, and a failed rename means another
  * builder won the race — fall through to the read; a killed session's
  * orphaned `.tmp-*` dirs are dead files swept on the next build of the
  * same entry.
  */
private[graft] object PersistedBase {

  /** Store root: `GRAFT_STORE_DIR` env, else `<java.io.tmpdir>/graft-store`. */
  private def root: String =
    sys.env.getOrElse("GRAFT_STORE_DIR",
      s"${sys.props("java.io.tmpdir")}/graft-store")

  /** Order-independent content fingerprint of `df`'s `keyCols`: one
    * aggregate pass → (row count, wrapping sum, xor) of the row hash,
    * rendered as a hex string. Commutative accumulators make the key
    * independent of partitioning and row order. The sum rides a
    * decimal(38,0): ~2^63 per-row hashes overflow an ANSI long sum after
    * a handful of rows; decimal holds ~1e18 rows before it would.
    *
    * The row hash must be AVALANCHING, not the repo's polynomial fold: a
    * polynomial hash is affine in each character, so a same-position
    * character swap across two rows (doc A gains the char doc B loses —
    * flag flips, text swaps: ordinary corpus edits) cancels EXACTLY in
    * the commutative sum — h(a)+h(b') = h(a')+h(b) whenever a/a' and
    * b/b' differ by the same δ at the same position — leaving only the
    * xor as defense, which collides whenever the carry-flipped bits
    * happen to agree (GraphPersistedSpec's returnflag-flip pin caught
    * precisely this as a FULL key collision with the old polyHash64 row
    * hash). xxhash64's avalanche destroys the affine structure; store
    * keys are engine-internal so no DuckDB twin is needed (the
    * StableHash tier-2 rule). Switching the hash retired pre-existing
    * store entries — dead files under the lazy-sweep rule, never wrong
    * answers.
    */
  def corpusKey(df: DataFrame, keyCols: Column*): String = {
    val h = xxhash64(concat_ws("\u0001",
      keyCols.map(_.cast("string")): _*))
    // coalesce: sum/bit_xor are NULL over zero rows — an empty corpus
    // must yield the stable key "0-0-0", not a driver NPE
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce((sum(h.cast("decimal(38,0)")) % lit(Long.MaxValue))
        .cast("long"), lit(0L)).as("s"),
      coalesce(call_function("bit_xor", h), lit(0L)).as("x")).first()
    f"${r.getLong(0)}%x-${r.getLong(1)}%x-${r.getLong(2)}%x"
  }

  /** Serve `name` for content key `key` from the store, building and
    * persisting it first if absent. The returned frame is always the
    * parquet read-back (cold and warm paths yield byte-identical data).
    *
    * `version` is the DERIVATION version — the content key fingerprints
    * the source DATA, not the build closure, so a logic change to the
    * builder (or to anything it calls: edge construction, Hll constants,
    * dedup banding) with an unchanged corpus would otherwise warm-serve
    * stale, now-wrong rows out of a pre-existing store. Every call site
    * declares its version and MUST bump it when the build closure's
    * semantics change; the old entries become dead files under the lazy
    * sweep rule, never wrong answers. (Round-11 hardening — the xxhash64
    * corpusKey switch retired stale entries only by accident of changing
    * every key.)
    */
  def getOrBuild(s: SparkSession, name: String, key: String, version: Int)
                (build: => DataFrame): DataFrame = {
    val dir = new Path(s"$root/$name-v$version-$key")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    def complete = fs.exists(new Path(dir, "_SUCCESS"))
    if (!complete) {
      // per-attempt unique tmp: concurrent builders never share a path
      // (a killed attempt's orphan is a dead file, swept lazily — never
      // eagerly, which could delete a LIVE concurrent builder's tmp)
      val tmp = new Path(
        s"$root/$name-v$version-$key.tmp-${java.util.UUID.randomUUID}")
      build.write.mode("overwrite").parquet(tmp.toString)
      // re-check: NEVER delete a complete entry another builder landed
      // while we were building; an incomplete leftover (pre-protocol
      // partial write) is safe to clear before the rename
      if (complete) fs.delete(tmp, true)
      else {
        if (fs.exists(dir)) fs.delete(dir, true)
        if (!fs.rename(tmp, dir)) {
          // rename races are won by exactly one builder; the losers
          // fall through to read the winner's entry
          fs.delete(tmp, true)
          if (!complete)
            throw new IllegalStateException(
              s"[store] rename failed with no complete entry: $tmp -> $dir")
        }
      }
    }
    s.read.parquet(dir.toString)
  }
}
