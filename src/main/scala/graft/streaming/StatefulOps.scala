package graft.streaming

import graft.streaming.EventTimeOps.{OrderKey, OrderedProcessor}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** Typed row shapes shared by the stateful streaming operators. */
object StatefulOps {

  /** Keyed event row (events fixture projected): all timestamps in epoch µs. */
  case class KeyedEvent(key: Long, eventId: Long, tsUs: Long, eventType: String,
                        valueMillis: Long)

  object KeyedEvent {
    val orderKey: OrderKey[KeyedEvent] =
      e => (e.tsUs / 1000, e.tsUs, e.eventId)

    /** Arrival-order processing: rows drain by the real watermark but are
      * delivered sorted by eventId (the fixture's arrival sequence), NOT by
      * event time — the order a record-at-a-time engine would see them in.
      * Required by operators whose semantics depend on observing lateness
      * (an event-time-sorted drain would never see a late row). */
    val arrivalKey: OrderKey[KeyedEvent] =
      e => (e.tsUs / 1000, e.eventId, 0L)
  }

  /** Output of the streaming OVER (rows unbounded preceding) aggregate. */
  case class RunningAggOut(key: Long, eventId: Long, tsUs: Long,
                           runningN: Long, runningSumMillis: Long)

  /** Output of per-key tumbling count windows. */
  case class CountWindowOut(key: Long, winSeq: Long, n: Long,
                            sumMillis: Long, firstTsUs: Long, lastTsUs: Long)

  /** A completed CEP match: ids of the matched events, per stage. */
  case class CepMatchOut(key: Long, ids: Seq[Long], startTsUs: Long, endTsUs: Long)

  /** Streaming OVER `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`
    * per-row running aggregate in event-time order (reference:
    * flink-libraries/flink-table/.../table/runtime/aggregate/
    * RowTimeUnboundedRowsOver.scala). One ValueState accumulator per key;
    * one output row per input row. */
  final class RunningAgg extends OrderedProcessor[Long, KeyedEvent, RunningAggOut](
      KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
    @transient private var acc: ValueState[(Long, Long)] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      acc = h.getValueState[(Long, Long)]("acc",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[RunningAggOut] = {
      val (n0, s0) = if (acc.exists()) acc.get() else (0L, 0L)
      val st = (n0 + 1, s0 + e.valueMillis)
      acc.update(st)
      Iterator(RunningAggOut(key, e.eventId, e.tsUs, st._1, st._2))
    }
  }

  /** Per-key tumbling COUNT windows of `size` rows in event-time order
    * (reference: KeyedStream.countWindow → WindowOperator with
    * PurgingTrigger(CountTrigger); flink-streaming-java/.../api/windowing/
    * triggers/CountTrigger.java). Emits one row per completed window;
    * a trailing partial window stays in state (fires only on more input),
    * matching the reference's count-trigger behavior. */
  final class CountWindow(size: Int) extends OrderedProcessor[Long, KeyedEvent, CountWindowOut](
      KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
    // (windowSeq, n, sumMillis, firstTsUs, lastTsUs)
    @transient private var acc: ValueState[(Long, Long, Long, Long, Long)] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      acc = h.getValueState("cw", Encoders.product[(Long, Long, Long, Long, Long)],
        TTLConfig.NONE)
    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[CountWindowOut] = {
      val (seq, n, s, f, _) = if (acc.exists()) acc.get() else (0L, 0L, 0L, e.tsUs, 0L)
      val first = if (n == 0) e.tsUs else f
      val n1 = n + 1
      val s1 = s + e.valueMillis
      if (n1 == size) {
        acc.update((seq + 1, 0L, 0L, 0L, 0L))
        Iterator(CountWindowOut(key, seq, n1, s1, first, e.tsUs))
      } else {
        acc.update((seq, n1, s1, first, e.tsUs))
        Iterator.empty
      }
    }
  }

  /** CEP strict-contiguity sequence (reference: flink-libraries/flink-cep
    * .../pattern/Pattern.java — begin(...).next(...)...within(t), the
    * strict `next` form): matches when `stages` event types occur on
    * consecutive events of a key (event-time order) and the whole match
    * spans at most `withinUs`. After a match the state resets past the
    * matched prefix (no overlapping reuse of matched events — Flink's
    * default after-match skip for this project). */
  final class StrictSeq(stages: Seq[String], withinUs: Long)
      extends OrderedProcessor[Long, KeyedEvent, CepMatchOut](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
    // partial match: ids + tss of matched prefix
    @transient private var part: ValueState[(Seq[Long], Seq[Long])] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      part = h.getValueState("cep", Encoders.product[(Seq[Long], Seq[Long])],
        TTLConfig.NONE)
    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[CepMatchOut] = {
      val (ids, tss) = if (part.exists()) part.get() else (Seq.empty[Long], Seq.empty[Long])
      val k = ids.length
      // within check against the tentative match start
      def fits(startTs: Long) = e.tsUs - startTs <= withinUs
      if (k < stages.length && e.eventType == stages(k) &&
          (ids.isEmpty || fits(tss.head))) {
        val (ids1, tss1) = (ids :+ e.eventId, tss :+ e.tsUs)
        if (ids1.length == stages.length) {
          part.clear()
          Iterator(CepMatchOut(key, ids1, tss1.head, e.tsUs))
        } else { part.update((ids1, tss1)); Iterator.empty }
      } else if (stages.nonEmpty && e.eventType == stages.head) {
        // strict contiguity broken — this event may restart a match
        part.update((Seq(e.eventId), Seq(e.tsUs)))
        Iterator.empty
      } else { part.clear(); Iterator.empty }
    }
  }

  /** Streaming OVER `ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`
    * (reference: table/runtime/aggregate/RowTimeBoundedRowsOver.scala):
    * sliding count+sum over the last `n` rows per key, one output per row.
    * State is a bounded deque of the last n-1 values. */
  final class RowsBoundedAgg(n: Int) extends OrderedProcessor[Long, KeyedEvent, RunningAggOut](
      KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
    @transient private var win: ValueState[Seq[Long]] = _
    override protected def openState(h: StatefulProcessorHandle): Unit =
      win = h.getValueState[Seq[Long]]("win",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]](), TTLConfig.NONE)
    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[RunningAggOut] = {
      val prev = if (win.exists()) win.get() else Seq.empty
      val cur = (prev :+ e.valueMillis).takeRight(n)
      win.update(cur)
      Iterator(RunningAggOut(key, e.eventId, e.tsUs, cur.length.toLong, cur.sum))
    }
  }

  /** Streaming OVER `RANGE BETWEEN durUs PRECEDING AND CURRENT ROW`
    * (reference: RowTimeBoundedRangeOver.scala): time-bounded sum per key.
    * State holds (ts, value) pairs inside the range; older entries evict as
    * the (event-time-ordered) stream advances.
    *
    * SQL RANGE ... CURRENT ROW frames include every peer with the same
    * order-by value, including ones that sort after the current row — so
    * rows are held in a same-ts pending group and emitted together, each
    * with the aggregate over the full peer group, once the timestamp
    * advances or the drain ends via [[onWatermark]]. Boundary caveat: a
    * peer with ts EXACTLY equal to the watermark could still arrive in a
    * later batch after the group flushed (only strictly-older rows are
    * dropped as late); the reference operator has the same boundary — its
    * RowTimeBoundedRangeOver fires at the watermark and drops subsequent
    * equal-ts rows as late — so flushed groups match reference behavior. */
  final class RangeBoundedAgg(durUs: Long) extends OrderedProcessor[Long, KeyedEvent, RunningAggOut](
      KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
    @transient private var win: ValueState[Seq[(Long, Long)]] = _
    @transient private var pend: ValueState[Seq[(Long, Long, Long)]] = _ // (id, ts, vm)
    override protected def openState(h: StatefulProcessorHandle): Unit = {
      win = h.getValueState[Seq[(Long, Long)]]("rwin",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]](),
        TTLConfig.NONE)
      pend = h.getValueState[Seq[(Long, Long, Long)]]("rpend",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]](),
        TTLConfig.NONE)
    }
    private def flush(key: Long): Iterator[RunningAggOut] = {
      val p = if (pend.exists()) pend.get() else Seq.empty
      if (p.isEmpty) Iterator.empty
      else {
        val ts = p.head._2
        val lo = ts - durUs
        val kept = (if (win.exists()) win.get() else Seq.empty)
          .dropWhile(_._1 < lo) ++ p.map(r => r._2 -> r._3)
        win.update(kept)
        pend.clear()
        val n = kept.length.toLong
        val s = kept.map(_._2).sum
        p.iterator.map(r => RunningAggOut(key, r._1, r._2, n, s))
      }
    }
    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[RunningAggOut] = {
      val p = if (pend.exists()) pend.get() else Seq.empty
      val out = if (p.nonEmpty && e.tsUs > p.head._2) flush(key) else Iterator.empty
      val p1 = if (p.nonEmpty && e.tsUs > p.head._2) Seq.empty else p
      pend.update(p1 :+ ((e.eventId, e.tsUs, e.valueMillis)))
      out
    }
    override protected def onWatermark(key: Long, watermarkMs: Long): Iterator[RunningAggOut] =
      flush(key)
  }

  /** Apply an ordered processor over a KeyedEvent stream. */
  def run[O: Encoder](ds: Dataset[KeyedEvent],
                      p: OrderedProcessor[Long, KeyedEvent, O]): Dataset[O] = {
    import ds.sparkSession.implicits._
    EventTimeOps.ordered(ds, (e: KeyedEvent) => e.key, p)
  }
}
