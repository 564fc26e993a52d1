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
  *  - text: length-preserving caesar remap — token/shingle/fingerprint
  *    statistics per copy are isomorphic to the base, but cross-copy
  *    shingles never collide (the corpus is lowercase+space).
  *  - embeddings: circular DIMENSION rotation by c — a permutation is
  *    orthogonal, so every within-copy dot product, norm, cosine, and
  *    cluster is bit-preserved, while cross-copy cosines are those of a
  *    vector against an unrelated rotation (no systematic alignment).
  *    The previous +0.001·c constant offset failed this: v and v+ε·1 are
  *    cosine ≈ 0.999, which planted a 10-clique of artificial near-dups
  *    per base vector — exactly the artifact the harness must avoid.
  */
object ScaleTransforms {
  private val az = "abcdefghijklmnopqrstuvwxyz"
  private def rot(c: Int) = az.drop(c % 26) + az.take(c % 26)

  def remapText(text: Column, c: Int): Column =
    if (c % 26 == 0) text else translate(text, az, rot(c))

  def rotateEmbedding(vec: Column, c: Int, dim: Int): Column = {
    val k = c % dim
    if (k == 0) vec else concat(slice(vec, k + 1, dim - k), slice(vec, 1, k))
  }
}
