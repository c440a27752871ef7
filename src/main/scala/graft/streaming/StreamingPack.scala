package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** Continuous fixed-length sequence packing — the streaming face of
  * [[graft.operators.TextPipeline.packSequences]] (gate qel). Documents
  * arrive in micro-batches, keyed by a shard column (one independent token
  * stream per shard, e.g. language); per-shard keyed state carries the
  * remainder tokens of the open sequence across batches, and every
  * sequence is emitted exactly once, in the batch whose document closes it.
  *
  * Reference semantics anchor: the reference's continuous-ingest pipelines
  * (flink-streaming-java ProcessFunction keyed state; SURVEY.md §2.10) —
  * here applied to the concat-and-chunk layout a causal-LM trainer
  * consumes. Only CLOSED sequences (exactly `seqLen` tokens) are emitted:
  * the trailing partial of each shard stays open in state awaiting more
  * data, exactly as a production continuous packer behaves. On a finite
  * replay the batch twin restricted to complete sequences reproduces the
  * output bit-for-bit (gate qem).
  *
  * Scale notes: state per shard is < seqLen tokens + two longs — O(shards
  * × seqLen) total, independent of corpus size. Shards process in
  * parallel (keyed state store); the per-shard token stream is inherently
  * sequential, which is why the shard column exists — parallelism at 100 TB
  * comes from sharding (by domain/language/path-prefix), not from within a
  * shard. Documents are drained in doc-id order per shard by the
  * watermark-driven [[EventTimeOps.OrderedProcessor]], so out-of-order
  * arrival within the watermark delay does not perturb the layout.
  */
object StreamingPack {

  /** One document on the shard `key`'s token stream; `docId` is the
    * within-shard order (unique per key). */
  case class DocToks(key: String, docId: Long, toks: Array[String])

  object DocToks {
    /** Arrival = doc-id order; docId is unique within a key. */
    val orderKey: EventTimeOps.OrderKey[DocToks] =
      d => (d.docId * 1000L, d.docId * 1000000L, d.docId)
  }

  /** A closed sequence: `n_toks` == seqLen always (partials stay open);
    * `n_docs` = distinct documents contributing >= 1 token. */
  case class PackedSeq(lang: String, seq_id: Long, n_toks: Long,
                       n_docs: Long, seq_text: String)

  /** Per-shard packer: remainder buffer (< seqLen tokens), next sequence
    * id, and the count of docs contributing to the open partial. */
  final class SeqPacker(seqLen: Int)
      extends EventTimeOps.OrderedProcessor[String, DocToks, PackedSeq](
        DocToks.orderKey, Encoders.product[DocToks]) {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")

    // remainder stored as the space-joined token string: tokens come from a
    // \s+ split so they carry no whitespace — the join is lossless, and a
    // flat string beats per-token list state (one value put per doc).
    @transient private var rem: ValueState[String] = _
    @transient private var nextSeq: ValueState[Long] = _
    @transient private var openDocs: ValueState[Long] = _

    override protected def openState(h: StatefulProcessorHandle): Unit = {
      rem = h.getValueState[String]("rem", Encoders.STRING, TTLConfig.NONE)
      nextSeq = h.getValueState[Long]("nextSeq", Encoders.scalaLong, TTLConfig.NONE)
      openDocs = h.getValueState[Long]("openDocs", Encoders.scalaLong, TTLConfig.NONE)
    }

    override protected def onOrdered(key: String, d: DocToks): Iterator[PackedSeq] = {
      val toks = d.toks
      if (toks.isEmpty) return Iterator.empty // zero-token doc: no contribution
      var buf: Array[String] =
        if (rem.exists() && rem.get().nonEmpty) rem.get().split(" ") else Array.empty
      var sid = if (nextSeq.exists()) nextSeq.get() else 0L
      var nDocs = if (openDocs.exists()) openDocs.get() else 0L
      nDocs += 1 // this doc contributes to the currently open sequence
      val out = Vector.newBuilder[PackedSeq]
      var idx = 0
      // invariant: buf.length < seqLen, so take >= 1 and the loop advances
      while (buf.length + (toks.length - idx) >= seqLen) {
        val take = seqLen - buf.length
        val seqToks = new Array[String](seqLen)
        System.arraycopy(buf, 0, seqToks, 0, buf.length)
        System.arraycopy(toks, idx, seqToks, buf.length, take)
        out += PackedSeq(key, sid, seqLen.toLong, nDocs, seqToks.mkString(" "))
        sid += 1
        idx += take
        buf = Array.empty[String]
        nDocs = if (idx < toks.length) 1L else 0L // leftover opens a new partial
      }
      if (idx < toks.length) buf = buf ++ toks.slice(idx, toks.length)
      rem.update(buf.mkString(" "))
      nextSeq.update(sid)
      openDocs.update(nDocs)
      out.result().iterator
    }
  }
}
