package graft.sources

/** Deterministic PLANTED near-duplicate signature law — the fixture
  * device behind the perceptual near-dup gates (image dHash, audio
  * fingerprint), shared verbatim by the media generators here and the
  * DuckDB oracles that replay it.
  *
  * Why planted: the natural media fixtures derive pixels/samples from
  * tiny linear doc_id formulas, so their perceptual hashes CLUSTER —
  * a Hamming near-dup gate over them degenerates to
  * everything-matches-everything and verifies nothing (the round-16
  * measurement that deferred the near-dup form). Here each document's
  * 64-bit (or 63-bit) signature is drawn from a nonlinear mixer that is
  * still replayable in plain SQL integer arithmetic, and near-dups are
  * PLANTED: doc_id ≡ 3 (mod 7) copies the signature of doc_id − 3 with
  * exactly `doc_id % 4` distinct bits flipped. Measured at sf0.1
  * (5,000 docs): minimum base-to-base Hamming distance 11, zero chance
  * pairs within distance 3 — so the pair set a maxDist-3 search must
  * return is exactly the planted pairs with k ≤ 3, and recall/precision
  * are both gate-visible.
  *
  * The mixer is three QUADRATIC rounds x ← (x² + 12345) mod (2³¹ − 1)
  * seeded with src·64 + i + 1 — quadratic because affine rounds (any
  * LCG chain) compose to one affine map whose bit parities correlate
  * across seeds (measured: ~5·10⁵ chance pairs within distance 3);
  * squaring breaks the composition. The seed is reduced mod 2³¹ − 1
  * BEFORE the first square, so every squared operand is < 2³¹ and all
  * intermediates fit int64 (x < 2³¹ ⇒ x² < 2⁶²) at ANY doc_id — DuckDB
  * BIGINT (which errors on overflow, where Scala silently wraps)
  * replays it exactly; the SQL oracle carries the same reduction.
  * (The raw seed src·64 + i + 1 itself fits int64 for src < 2⁵⁷ —
  * far beyond any corpus this law will ever label.) */
object Planted {
  private val M = 2147483647L // 2^31 - 1

  /** Bit i of the UNPERTURBED signature of source document `src`. */
  def baseBit(src: Long, i: Int): Int = {
    var x = (src * 64L + i + 1L) % M
    var r = 0
    while (r < 3) { x = (x * x + 12345L) % M; r += 1 }
    (x % 2L).toInt
  }

  /** Near-dup plant: documents with doc_id ≡ 3 (mod 7) carry the
    * signature of doc_id − 3 (always a non-planted document: the base
    * is ≡ 0 mod 7). */
  def srcOf(docId: Long): Long = if (docId % 7 == 3) docId - 3 else docId

  /** Number of flipped bits for a planted document (0..3) — 0 plants an
    * EXACT duplicate, so the fixture exercises the full hamming range. */
  def kOf(docId: Long): Int = if (docId % 7 == 3) (docId % 4).toInt else 0

  /** Flip positions (d·11 + m·17) mod nbits for m < kOf(d) — pairwise
    * distinct for k ≤ 3 whenever nbits > 34 (offsets 0, 17, 34), so the
    * planted Hamming distance is exactly kOf(d). */
  def flipPositions(docId: Long, nbits: Int): Set[Int] =
    (0 until kOf(docId)).map(m => ((docId * 11 + m * 17) % nbits).toInt).toSet

  /** Bit i of document `docId`'s planted signature in an nbits space. */
  def sigBit(docId: Long, i: Int, nbits: Int): Int = {
    val b = baseBit(srcOf(docId), i)
    if (flipPositions(docId, nbits).contains(i)) 1 - b else b
  }

  /** The full signature as a long (bit i at position i; for nbits = 64
    * bit 63 lands in the sign bit, matching the media hash kernels). */
  def sig(docId: Long, nbits: Int): Long = {
    require(nbits >= 35 && nbits <= 64, s"nbits=$nbits out of [35, 64]")
    var v = 0L
    var i = 0
    while (i < nbits) { v |= sigBit(docId, i, nbits).toLong << i; i += 1 }
    v
  }
}
