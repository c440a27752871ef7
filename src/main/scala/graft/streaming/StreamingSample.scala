package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  StatefulProcessorHandle, TTLConfig, TimeMode, TimerValues}

/** Ingest-time weighted priority sampling — the STREAMING face of the batch
  * Duffield–Lund–Thorup sample ([[graft.operators.Sampling.prioritySample]],
  * gate qd0): as documents arrive, each shard keeps the k best rows by
  * priority = weight / unitHash in bounded keyed state and emits a row only
  * when it ENTERS the shard's current top-k. The emitted candidate stream is
  * a superset of the final shard top-k (the threshold only ever rises, so a
  * final member must have entered on arrival), and a batch-side TakeOrdered
  * over the candidates yields EXACTLY the global top-k — order-independent,
  * so the batch oracle replays it verbatim with no ordered-drain machinery.
  *
  * Scale: state is O(shards · k) rows total regardless of corpus size;
  * per-row work is one O(k) scan of the shard's list (k is the sample size,
  * e.g. 100); expected emissions per shard are O(k · log n) under random
  * arrival (the running-top-k entry count), so the candidate stream the
  * final TakeOrdered reads is tiny. This is the one-pass "keep a weighted
  * sample of the firehose" shape an ingestion edge runs instead of
  * re-sorting the corpus per delivery.
  */
object StreamingSample {

  /** One arriving document on a shard; `priority` is computed stream-side
    * with the same expression the batch operator uses (weight / unitHash,
    * zero-hash guarded), so both engines agree bit-for-bit. */
  case class PrioRow(shard: Long, docId: Long, weight: Long, priority: Double)

  /** A row that entered its shard's running top-k. */
  case class Cand(docId: Long, weight: Long, priority: Double)

  /** Per-shard bounded running top-k: better = higher priority, ties to the
    * smaller doc id (the batch operator's exact ORDER BY). */
  final class ShardTopK(k: Int) extends StatefulProcessor[Long, PrioRow, Cand] {
    require(k > 0)
    @transient private var topk: ListState[Cand] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      topk = getHandle.getListState[Cand]("topk", Encoders.product[Cand],
        TTLConfig.NONE)

    private def better(a: Cand, b: Cand): Boolean =
      a.priority > b.priority || (a.priority == b.priority && a.docId < b.docId)

    override def handleInputRows(key: Long, rows: Iterator[PrioRow],
                                 tv: TimerValues): Iterator[Cand] = {
      var cur = topk.get().toVector
      val out = Vector.newBuilder[Cand]
      var dirty = false
      rows.foreach { r =>
        val c = Cand(r.docId, r.weight, r.priority)
        if (cur.size < k) { cur = cur :+ c; out += c; dirty = true }
        else {
          val worst = cur.indices.minBy(i => (cur(i).priority, -cur(i).docId))
          if (better(c, cur(worst))) {
            cur = cur.updated(worst, c); out += c; dirty = true
          }
        }
      }
      if (dirty) topk.put(cur.toArray)
      out.result().iterator
    }
  }

  /** One arriving document for the budget gate, keyed by shard. */
  case class BudgetRow(shard: Long, docId: Long, nToks: Long)

  object BudgetRow {
    /** Arrival = doc-id order; unique per shard. */
    val orderKey: EventTimeOps.OrderKey[BudgetRow] =
      r => (r.docId * 1000L, r.docId, 0L)
  }

  /** A document admitted under the shard's token budget. */
  case class KeptDoc(docId: Long, shard: Long, nToks: Long, cumBefore: Long)

  /** Ingest-time token-budget gating — the STREAMING face of
    * [[graft.operators.Sampling.tokenBudgetSelect]] under the standard
    * sharded approximation: the budget splits equally across shards and
    * each shard admits documents in deterministic (drain-ordered) arrival
    * order while they fit entirely (cumBefore + n ≤ shardBudget); the
    * counter keeps accumulating past the cut, so admission is a contiguous
    * per-shard prefix exactly like the batch rule, and the whole operator
    * replays as a per-shard window in SQL.
    *
    * Scale: state is ONE long per shard; sharding the budget is what makes
    * the gate horizontally scalable (a single global counter would funnel
    * every document through one state partition) at the cost of the usual
    * per-shard quantization — bounded by one document per shard. */
  final class BudgetGate(shardBudget: Long)
      extends EventTimeOps.OrderedProcessor[Long, BudgetRow, KeptDoc](
        BudgetRow.orderKey, Encoders.product[BudgetRow]) {
    require(shardBudget > 0)
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      total = h.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
    override protected def onOrdered(key: Long, r: BudgetRow): Iterator[KeptDoc] = {
      val t = if (total.exists()) total.get() else 0L
      total.update(t + r.nToks) // count every arrival, admitted or not
      if (t + r.nToks <= shardBudget)
        Iterator.single(KeptDoc(r.docId, key, r.nToks, t))
      else Iterator.empty
    }
  }
}
