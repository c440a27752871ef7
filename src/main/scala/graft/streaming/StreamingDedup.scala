package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, StatefulProcessorHandle, TTLConfig}

/** Ingest-time near-duplicate detection — the STREAMING face of the batch
  * MinHash/LSH dedup family (operators/Dedup.scala): as documents arrive,
  * an LSH index held in keyed state proposes candidate pairs against
  * everything already ingested, and an exact-Jaccard verification join
  * (batch-side, against the document store) confirms them. This is the
  * dedup-on-arrival shape a 100-TB training pipeline runs at its ingestion
  * edge instead of re-running corpus-wide batch dedup per delivery.
  *
  * Streaming piece: band buckets (Dedup.bandBuckets — the SAME banding
  * function as every batch path) keyed by bucket hash; per bucket a
  * ListState holds the postings (doc ids already seen, arrival order), and
  * each arriving doc emits one candidate pair per prior posting. Arrival
  * order is made deterministic by the event-time ordered drain, so the
  * emitted pair set equals the batch `lshCandidates` set (modulo duplicate
  * pairs from multi-band collisions — the verifier distincts them), and a
  * SQL oracle can replay the whole operator.
  *
  * Scale: state per bucket is the postings list — the same size the batch
  * join's build side would be for that bucket; emission per doc is bounded
  * by its buckets' occupancy (the LSH S-curve keeps buckets small for
  * non-pathological corpora, same argument as batch LSH). Verification
  * joins only candidate pairs.
  */
object StreamingDedup {

  /** One (bucket, doc) posting row; `docId` doubles as arrival order. */
  case class BandRow(key: Long, docId: Long)

  object BandRow {
    /** Arrival = doc-id order; the triple is unique per (bucket, doc), so a
      * doc hitting the same bucket via two colliding bands collapses to one
      * buffered row (free intra-bucket dedup). */
    val orderKey: EventTimeOps.OrderKey[BandRow] =
      r => (r.docId * 1000L, r.docId * 1000000L, r.docId)
  }

  /** Candidate pair: `id1` ingested before `id2`. */
  case class CandPair(id1: Long, id2: Long)

  /** Per-bucket claim index: emit (prior, current) for every posting
    * already in the bucket, then append the current doc. */
  final class BucketClaim extends EventTimeOps.OrderedProcessor[Long, BandRow, CandPair](
      BandRow.orderKey, Encoders.product[BandRow]) {
    @transient private var postings: ListState[Long] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      postings = h.getListState[Long]("postings", Encoders.scalaLong, TTLConfig.NONE)
    override protected def onOrdered(key: Long, r: BandRow): Iterator[CandPair] = {
      val out = postings.get().map(p => CandPair(p, r.docId)).toVector
      postings.appendValue(r.docId)
      out.iterator
    }
  }

  /** One chunk occurrence on the stream, keyed by the chunk's 64-bit
    * FNV-1a fingerprint (`key`) and carrying a SECOND independent 64-bit
    * fingerprint (`key2`, xxhash64 of the same text — the
    * [[graft.operators.Dedup.charGramFingerprints]] double-hash
    * currency); (docId, chunkIdx) is its position. The text rides along
    * so survivors can reassemble without a corpus join. */
  case class ChunkRow(key: Long, key2: Long, docId: Long, chunkIdx: Long,
                      chunkText: String)

  object ChunkRow {
    /** Arrival = (doc, position) order; unique per key because a doc
      * contributes a given (docId, chunkIdx) once. */
    val orderKey: EventTimeOps.OrderKey[ChunkRow] =
      r => (r.docId * 1000L, r.docId, r.chunkIdx)
  }

  /** A surviving chunk occurrence. */
  case class KeptChunk(docId: Long, chunkIdx: Long, chunkText: String)

  /** Ingest-time duplicated-CHUNK suppression — the streaming face of
    * [[graft.operators.Dedup.dedupChunksKeepFirst]] (C4 line-dedup
    * granularity): chunks stream keyed by fingerprint, the FIRST arrival
    * in (doc, position) order claims the key, every later occurrence —
    * cross-doc or within-doc — is suppressed at the edge. Because the
    * ordered drain makes arrival order deterministic, the kept set
    * equals the batch operator's lexicographic-min rule exactly and the
    * batch oracle replays it.
    *
    * Fingerprint-keyed state is the 100-TB shape (the state KEY stays
    * the 8-byte FNV `key`), but the claim is DOUBLE-fingerprinted: per
    * key the state holds the `key2` values already claimed, and an
    * arrival suppresses only when its own key2 is among them. For
    * keep-first dedup a fingerprint collision does not merely hide a
    * duplicate — it would silently REMOVE a distinct chunk from a
    * document (data corruption, the direction the "collisions can only
    * hide" argument does NOT cover), and at ~4×10⁹ distinct chunks a
    * single 64-bit fingerprint makes that even-odds (birthday bound) —
    * a 100 TB corpus is orders of magnitude past it. Two independent
    * 64-bit hashes push the per-pair conflation to ~2^-128, the same
    * collision-exact contract [[graft.operators.GramIndex]] carries via
    * [[graft.operators.Dedup.charGramFingerprints]]. The per-key list
    * holds one entry per DISTINCT chunk whose FNV collides on this key
    * (~1 everywhere, ~2 at vanishing frequency), so state stays one
    * long per distinct chunk. State grows with distinct chunks ingested
    * — the same size a batch keep-first aggregation's shuffle would be
    * for the same corpus. */
  final class ChunkClaim extends EventTimeOps.OrderedProcessor[Long, ChunkRow, KeptChunk](
      ChunkRow.orderKey, Encoders.product[ChunkRow]) {
    @transient private var claimed: ListState[Long] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      claimed = h.getListState[Long]("claimedH2", Encoders.scalaLong, TTLConfig.NONE)
    override protected def onOrdered(key: Long, r: ChunkRow): Iterator[KeptChunk] =
      if (claimed.get().contains(r.key2)) Iterator.empty
      else {
        claimed.appendValue(r.key2)
        Iterator.single(KeptChunk(r.docId, r.chunkIdx, r.chunkText))
      }
  }
}
