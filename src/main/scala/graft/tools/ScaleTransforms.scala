package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared honest-scaling transforms for the replication harnesses
  * ([[Scale10]], [[MakeSf1]]): copy 0 is the base corpus verbatim; copy c
  * gets a transform that preserves WITHIN-copy structure exactly while
  * decorrelating copies from each other — so a 10× corpus is 10× the
  * work, not 10 aliases of the same work and not a lattice of cross-copy
  * near-duplicate cliques.
  *
  *  - text: length-preserving alphabet PERMUTATION (seeded Fisher–Yates
  *    keyed by the copy index) — token/shingle/fingerprint statistics per
  *    copy are isomorphic to the base (the map is bijective on letters;
  *    the corpus is lowercase+space), but cross-copy shingles never
  *    collide. A permutation rather than the earlier caesar ROTATION
  *    because replication must COMPOSE for the second decade of scale
  *    evidence (sf1 → sf10): rotations add mod 26, so 100 two-level
  *    copies would share only 26 distinct total shifts — every base doc
  *    would reappear verbatim ~4× (artificial exact-dup cliques, the
  *    exact artifact the harness exists to avoid). Compositions of
  *    distinct-keyed random permutations are themselves distinct for all
  *    practical purposes.
  *  - embeddings: circular DIMENSION rotation by c — a permutation is
  *    orthogonal, so every within-copy dot product, norm, cosine, and
  *    cluster is bit-preserved, while cross-copy cosines are those of a
  *    vector against an unrelated rotation (no systematic alignment).
  *    The previous +0.001·c constant offset failed this: v and v+ε·1 are
  *    cosine ≈ 0.999, which planted a 10-clique of artificial near-dups
  *    per base vector. NOTE the composition caveat: rotations add mod
  *    DIM (64), so a two-level 100× corpus has cross-copy duplicate
  *    vectors — fine for the graph/dedup/text sf10 spot list (which
  *    never reads embeddings), not yet honest for ANN at 100×.
  */
object ScaleTransforms {
  private val az = "abcdefghijklmnopqrstuvwxyz"

  /** Deterministic alphabet permutation keyed by c: Fisher–Yates driven
    * by a 64-bit LCG (fixed constants, no JDK Random — the mapping is
    * data-generation contract, pinned by ScaleTransformsSpec).
    */
  private[tools] def perm(c: Int): String = {
    val a = az.toCharArray
    var state = c.toLong
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % bound).toInt
    }
    var i = a.length - 1
    while (i >= 1) {
      val j = next(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    new String(a)
  }

  def remapText(text: Column, c: Int): Column =
    if (c == 0) text else translate(text, az, perm(c))

  def rotateEmbedding(vec: Column, c: Int, dim: Int): Column = {
    val k = c % dim
    if (k == 0) vec else concat(slice(vec, k + 1, dim - k), slice(vec, 1, k))
  }
}
