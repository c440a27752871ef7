package graft.streaming

import graft.streaming.EventTimeOps.OrderedProcessor
import graft.streaming.StatefulOps.KeyedEvent
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** Generic tumbling-window operator with pluggable Trigger and Evictor —
  * the part of the reference's WindowOperator that Spark's declarative
  * `groupBy(window(...))` cannot express (reference: flink-streaming-java/
  * .../runtime/operators/windowing/{WindowOperator,EvictingWindowOperator}
  * .java; api/windowing/triggers/{CountTrigger,DeltaTrigger}.java;
  * api/windowing/evictors/{CountEvictor,TimeEvictor,DeltaEvictor}.java).
  *
  * Because elements arrive in event-time order (OrderedProcessor), a key's
  * windows close in order: contents are buffered per active window and
  * fired by the trigger and/or at window end once the watermark passes.
  */
object WindowProcessor {

  /** (winStartUs, fireSeq within window, rows in pane, sum of values). */
  final case class Fire(key: Long, winStartUs: Long, fireSeq: Long, n: Long,
                        sumMillis: Long, lastTsUs: Long)

  sealed trait Trigger extends Serializable
  /** Fire once when the watermark passes window end (default event-time). */
  case object OnWindowEnd extends Trigger
  /** Fire every n elements and purge the pane (countWindow semantics). */
  final case class CountTrigger(n: Int) extends Trigger
  /** Fire when |value - valueAtLastFire| > threshold, purging; first
    * element of a window always sets the reference point. */
  final case class DeltaTrigger(threshold: Long) extends Trigger
  /** Non-purging periodic fire every `intervalUs` of event time while the
    * window is open (reference: ContinuousEventTimeTrigger); the window-end
    * close still fires the full contents. Boundary fires happen when the
    * first element at/after a boundary arrives; boundaries with no prior
    * contents are skipped. */
  final case class ContinuousTrigger(intervalUs: Long) extends Trigger

  sealed trait Evictor extends Serializable
  case object NoEvictor extends Evictor
  /** Keep only the last `max` elements (by event-time order) at firing. */
  final case class CountEvictor(max: Int) extends Evictor
  /** Keep only elements within `durUs` of the newest element at firing. */
  final case class TimeEvictor(durUs: Long) extends Evictor
  /** Evict elements whose |value - newestValue| > threshold at firing
    * (reference: DeltaEvictor with an absolute-difference DeltaFunction). */
  final case class DeltaEvictor(threshold: Long) extends Evictor

  /** Window pane state: window id, fire counter, reference value for
    * DeltaTrigger, and buffered (tsUs, valueMillis) contents. */
  final case class Pane(winId: Long, fires: Long, refValue: Long,
                        rows: Seq[(Long, Long)], nextBoundaryUs: Long = 0L)

  final class Tumbling(sizeUs: Long, trigger: Trigger, evictor: Evictor)
      extends OrderedProcessor[Long, KeyedEvent, Fire](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {

    @transient private var pane: ValueState[Pane] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      pane = h.getValueState[Pane]("pane",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Pane](), TTLConfig.NONE)

    private def evict(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = evictor match {
      case NoEvictor => rows
      case CountEvictor(m) => rows.takeRight(m)
      case TimeEvictor(d) =>
        if (rows.isEmpty) rows else { val hi = rows.last._1; rows.dropWhile(_._1 < hi - d) }
      case DeltaEvictor(th) =>
        if (rows.isEmpty) rows
        else { val ref = rows.last._2; rows.filter(r => math.abs(r._2 - ref) <= th) }
    }

    private def fire(key: Long, p: Pane, purge: Boolean): (Fire, Pane) = {
      val kept = evict(p.rows)
      val f = Fire(key, p.winId * sizeUs, p.fires, kept.length.toLong,
        kept.map(_._2).sum, if (kept.isEmpty) 0L else kept.last._1)
      (f, p.copy(fires = p.fires + 1, rows = if (purge) Seq.empty else p.rows))
    }

    /** Close out the current pane if its window ended at/before `tsUs`. */
    private def closeIfEnded(key: Long, boundaryUs: Long): Iterator[Fire] = {
      if (!pane.exists()) return Iterator.empty
      val p = pane.get()
      val winEnd = (p.winId + 1) * sizeUs
      if (winEnd <= boundaryUs) {
        pane.clear()
        trigger match {
          case OnWindowEnd | ContinuousTrigger(_) =>
            Iterator.single(fire(key, p, purge = true)._1)
          case _ => if (p.rows.nonEmpty) Iterator.single(fire(key, p, purge = true)._1)
                    else Iterator.empty // purging trigger with empty remainder
        }
      } else Iterator.empty
    }

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[Fire] = {
      // elements arrive in event-time order, so entering e's window closes
      // any earlier pane (its end <= e's window start)
      val closed = closeIfEnded(key, (e.tsUs / sizeUs) * sizeUs)
      val p0 = if (pane.exists()) pane.get()
               else Pane(e.tsUs / sizeUs, 0L, e.valueMillis, Seq.empty)
      // continuous boundaries that e's arrival crosses fire BEFORE e joins
      val preFires = Seq.newBuilder[Fire]
      var p0b = p0
      trigger match {
        case ContinuousTrigger(ivl) =>
          val winEnd = (p0b.winId + 1) * sizeUs
          var nb = if (p0b.nextBoundaryUs == 0L) p0b.winId * sizeUs + ivl
                   else p0b.nextBoundaryUs
          while (nb <= e.tsUs && nb < winEnd) {
            if (p0b.rows.nonEmpty) {
              val (f, p2) = fire(key, p0b, purge = false)
              preFires += f
              p0b = p2
            }
            nb += ivl
          }
          p0b = p0b.copy(nextBoundaryUs = nb)
        case _ =>
      }
      val p1 = p0b.copy(rows = p0b.rows :+ (e.tsUs -> e.valueMillis))
      val fired: Option[Fire] = trigger match {
        case CountTrigger(n) if p1.rows.length >= n =>
          val (f, p2) = fire(key, p1, purge = true); pane.update(p2); Some(f)
        case DeltaTrigger(th) if math.abs(e.valueMillis - p1.refValue) > th =>
          val (f, p2) = fire(key, p1, purge = true)
          pane.update(p2.copy(refValue = e.valueMillis)); Some(f)
        case _ => pane.update(p1); None
      }
      closed ++ preFires.result().iterator ++ fired.iterator
    }

    override protected def onWatermark(key: Long, watermarkMs: Long): Iterator[Fire] =
      closeIfEnded(key, watermarkMs * 1000)
  }

  /** Output of [[TumblingWithLateness]]: `tag="fire"` rows are window
    * emissions (on-time fire_seq 0, late re-fires 1..); `tag="side"` rows
    * are the late-data side output (beyond allowed lateness) — filter on
    * `tag` to split the streams, the Spark equivalent of
    * `getSideOutput(lateTag)` (see operators.SideOutputs). */
  final case class LateFire(key: Long, winStartUs: Long, tag: String,
                            fireSeq: Long, trigId: Long, n: Long, sumMillis: Long)

  /** Operator-internal watermark generators (reference: AssignerWith
    * {Periodic,Punctuated}Watermarks — flink-streaming-java/.../api/
    * functions/timestamps/BoundedOutOfOrdernessTimestampExtractor.java and
    * AssignerWithPunctuatedWatermarks.java). Spark exposes only the bounded
    * global watermark; these drive the per-key clean watermark inside
    * [[TumblingWithLateness]], so punctuated generation becomes expressible. */
  sealed trait WatermarkGen extends Serializable {
    /** New clean watermark after observing `e` (monotone max is applied
      * by the caller). Long.MinValue = no watermark from this element. */
    def onElement(e: KeyedEvent): Long
  }
  /** Watermark trails the max seen event time by `delayUs`. */
  final case class BoundedOutOfOrderness(delayUs: Long) extends WatermarkGen {
    def onElement(e: KeyedEvent): Long = e.tsUs - delayUs
  }
  /** Watermark emitted only by marker elements (e.g. a barrier event type);
    * non-markers never advance it. */
  final case class Punctuated(mark: KeyedEvent => Long) extends WatermarkGen {
    def onElement(e: KeyedEvent): Long = mark(e)
  }

  /** Tumbling event-time windows with `allowedLateness` and a late-data side
    * output (reference: WindowOperator.allowedLateness + sideOutputLateData,
    * flink-streaming-java/.../runtime/operators/windowing/WindowOperator
    * .java). Spark's global watermark cannot re-admit late rows, so this is
    * the documented two-tier approximation (NEXT.md): the stream's REAL
    * watermark is wide enough that nothing is dropped upstream, and the
    * operator maintains its own per-key "clean" watermark
    * `max(eventTime) - cleanDelayUs` (a BoundedOutOfOrderness generator, or
    * any [[WatermarkGen]] via the alternate constructor).
    * Against that clean watermark, per arriving element:
    *   - window end + lateness already passed  -> side output (expired);
    *   - window end passed (within lateness)   -> element joins the window
    *     and the window RE-FIRES immediately with updated contents
    *     (fire_seq increments), Flink's late-firing refinement;
    *   - otherwise -> normal accumulation; the window fires on-time
    *     (fire_seq 0) once the clean watermark passes its end.
    * Window state is evicted once end + lateness <= clean watermark.
    * Per-key watermarking is an approximation of Flink's global watermark —
    * documented, and strictly finer-grained (a slow key cannot mark a fast
    * key's rows late). */
  final class TumblingWithLateness(sizeUs: Long, gen: WatermarkGen, latenessUs: Long)
      extends OrderedProcessor[Long, KeyedEvent, LateFire](
        KeyedEvent.arrivalKey, Encoders.product[KeyedEvent]) {

    def this(sizeUs: Long, cleanDelayUs: Long, latenessUs: Long) =
      this(sizeUs, BoundedOutOfOrderness(cleanDelayUs), latenessUs)

    // the clean watermark (µs), Long.MinValue until first emission
    @transient private var cwm: ValueState[Long] = _
    // open windows: (winStartUs, n, sumMillis, fires)
    @transient private var wins: ValueState[Seq[(Long, Long, Long, Long)]] = _

    override protected def openState(h: StatefulProcessorHandle): Unit = {
      cwm = h.getValueState[Long]("lcwm", Encoders.scalaLong, TTLConfig.NONE)
      wins = h.getValueState[Seq[(Long, Long, Long, Long)]]("lwins",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long, Long)]](),
        TTLConfig.NONE)
    }

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[LateFire] = {
      val cwmExcl = if (cwm.exists()) cwm.get() else Long.MinValue
      val w = Math.floorDiv(e.tsUs, sizeUs) * sizeUs
      val wend = w + sizeUs
      val out = Seq.newBuilder[LateFire]
      var ws = if (wins.exists()) wins.get() else Seq.empty
      if (cwmExcl != Long.MinValue && wend + latenessUs <= cwmExcl) {
        out += LateFire(key, w, "side", -1L, e.eventId, 1L, e.valueMillis)
      } else {
        val idx = ws.indexWhere(_._1 == w)
        var (n1, s1, f1) =
          if (idx >= 0) { val t = ws(idx); (t._2 + 1, t._3 + e.valueMillis, t._4) }
          else (1L, e.valueMillis, 0L)
        if (cwmExcl != Long.MinValue && wend <= cwmExcl) {
          // late but allowed: immediate re-fire with refined contents
          out += LateFire(key, w, "fire", f1, e.eventId, n1, s1)
          f1 += 1
        }
        ws = if (idx >= 0) ws.updated(idx, (w, n1, s1, f1)) else ws :+ ((w, n1, s1, f1))
      }
      val cwmIncl = math.max(cwmExcl, gen.onElement(e))
      // on-time fires for windows whose end the clean watermark just passed
      ws = ws.sortBy(_._1).map { case t @ (st, n, s, f) =>
        if (f == 0 && st + sizeUs <= cwmIncl && n > 0) {
          out += LateFire(key, st, "fire", 0L, e.eventId, n, s)
          (st, n, s, 1L)
        } else t
      }
      // evict windows past their lateness horizon
      ws = ws.filter { case (st, _, _, _) => st + sizeUs + latenessUs > cwmIncl }
      cwm.update(cwmIncl)
      wins.update(ws)
      out.result().iterator
    }
  }

  /** Sliding windows (size, slide) with evictor support — each element
    * joins size/slide overlapping panes; event-time-ordered input closes
    * panes in start order (fire when an element or the watermark passes a
    * pane's end). Reference: SlidingEventTimeWindows under
    * EvictingWindowOperator. OnWindowEnd firing only (continuous/count
    * triggers pair with tumbling/session here). */
  final class Sliding(sizeUs: Long, slideUs: Long, evictor: Evictor)
      extends OrderedProcessor[Long, KeyedEvent, Fire](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
    require(sizeUs % slideUs == 0, "size must be a multiple of slide")

    // active panes: (winStartUs, rows)
    @transient private var panes: ValueState[Seq[(Long, Seq[(Long, Long)])]] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      panes = h.getValueState[Seq[(Long, Seq[(Long, Long)])]]("slpanes",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Seq[(Long, Long)])]](),
        TTLConfig.NONE)

    private def evict(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = evictor match {
      case NoEvictor => rows
      case CountEvictor(m) => rows.takeRight(m)
      case TimeEvictor(d) =>
        if (rows.isEmpty) rows else { val hi = rows.last._1; rows.dropWhile(_._1 < hi - d) }
      case DeltaEvictor(th) =>
        if (rows.isEmpty) rows
        else { val ref = rows.last._2; rows.filter(r => math.abs(r._2 - ref) <= th) }
    }

    private def fireOf(key: Long, start: Long, rows: Seq[(Long, Long)]): Fire = {
      val kept = evict(rows)
      Fire(key, start, 0L, kept.length.toLong, kept.map(_._2).sum,
        if (kept.isEmpty) 0L else kept.last._1)
    }

    /** Fire and drop panes whose end <= boundaryUs. */
    private def closeUpTo(key: Long, boundaryUs: Long): Iterator[Fire] = {
      val cur = if (panes.exists()) panes.get() else Seq.empty
      val (done, open) = cur.partition { case (start, _) => start + sizeUs <= boundaryUs }
      if (done.nonEmpty) panes.update(open)
      done.sortBy(_._1).iterator.map { case (start, rows) => fireOf(key, start, rows) }
    }

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[Fire] = {
      val closed = closeUpTo(key, e.tsUs)
      val cur = if (panes.exists()) panes.get() else Seq.empty
      // window starts containing e: aligned, start > ts - size, start <= ts
      val lastStart = (e.tsUs / slideUs) * slideUs
      val starts = Iterator.iterate(lastStart)(_ - slideUs)
        .takeWhile(st => st > e.tsUs - sizeUs && st >= 0).toSeq
      val byStart = cur.toMap
      val updated = (byStart.keySet ++ starts).toSeq.map { st =>
        val rows = byStart.getOrElse(st, Seq.empty)
        st -> (if (starts.contains(st)) rows :+ (e.tsUs -> e.valueMillis) else rows)
      }
      panes.update(updated)
      closed
    }

    override protected def onWatermark(key: Long, watermarkMs: Long): Iterator[Fire] =
      closeUpTo(key, watermarkMs * 1000)
  }

  /** Session windows (gap-based) with the same pluggable trigger/evictor.
    * Event-time-ordered input makes session "merging" append-only: a new
    * element either extends the open session (gap < gapUs) or closes it —
    * the general MergingWindowSet machinery degenerates to one open pane
    * per key (reference: EventTimeSessionWindows + MergingWindowSet).
    * A session also closes when the watermark passes lastTs + gap.
    * `winStartUs` in the output is the session's first-element timestamp. */
  /** Session pane: (sessStartUs, lastTsUs, fires, refValue, rows). */
  final case class SPane(start: Long, last: Long, fires: Long, refValue: Long,
                         rows: Seq[(Long, Long)])

  final class Session(gapUs: Long, trigger: Trigger, evictor: Evictor)
      extends OrderedProcessor[Long, KeyedEvent, Fire](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {

    @transient private var pane: ValueState[SPane] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      pane = h.getValueState[SPane]("spane",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SPane](), TTLConfig.NONE)

    private def evict(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = evictor match {
      case NoEvictor => rows
      case CountEvictor(m) => rows.takeRight(m)
      case TimeEvictor(d) =>
        if (rows.isEmpty) rows else { val hi = rows.last._1; rows.dropWhile(_._1 < hi - d) }
      case DeltaEvictor(th) =>
        if (rows.isEmpty) rows
        else { val ref = rows.last._2; rows.filter(r => math.abs(r._2 - ref) <= th) }
    }

    private def fire(key: Long, p: SPane, purge: Boolean): (Fire, SPane) = {
      val kept = evict(p.rows)
      val f = Fire(key, p.start, p.fires, kept.length.toLong, kept.map(_._2).sum,
        if (kept.isEmpty) 0L else kept.last._1)
      (f, p.copy(fires = p.fires + 1, rows = if (purge) Seq.empty else p.rows))
    }

    /** Close the open session if it expired at `boundaryUs`. */
    private def closeIfExpired(key: Long, boundaryUs: Long): Iterator[Fire] = {
      if (!pane.exists()) return Iterator.empty
      val p = pane.get()
      if (p.last + gapUs <= boundaryUs) {
        pane.clear()
        if (trigger == OnWindowEnd || p.rows.nonEmpty)
          Iterator.single(fire(key, p, purge = true)._1)
        else Iterator.empty
      } else Iterator.empty
    }

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[Fire] = {
      val closed = closeIfExpired(key, e.tsUs)
      val p0 = if (pane.exists()) pane.get()
               else SPane(e.tsUs, e.tsUs, 0L, e.valueMillis, Seq.empty)
      val p1 = p0.copy(last = e.tsUs, rows = p0.rows :+ (e.tsUs -> e.valueMillis))
      val fired: Option[Fire] = trigger match {
        case CountTrigger(n) if p1.rows.length >= n =>
          val (f, p2) = fire(key, p1, purge = true); pane.update(p2); Some(f)
        case DeltaTrigger(th) if math.abs(e.valueMillis - p1.refValue) > th =>
          val (f, p2) = fire(key, p1, purge = true)
          pane.update(p2.copy(refValue = e.valueMillis)); Some(f)
        case _ => pane.update(p1); None
      }
      closed ++ fired.iterator
    }

    override protected def onWatermark(key: Long, watermarkMs: Long): Iterator[Fire] =
      closeIfExpired(key, watermarkMs * 1000)
  }

  /** Session windows with a per-element gap (reference: the dynamic-gap
    * SessionWindowTimeGapExtractor model — upstream Flink gained it in 1.4;
    * included as a natural generalization of [[Session]]). Each element
    * extends the open session's end to `max(end, ts + gapOf(e))`; an element
    * at/after the current end closes the session first (event-time-ordered
    * input makes merging append-only, as in [[Session]]). `winStartUs` is
    * the session's first-element timestamp; one fire per closed session. */
  final class DynamicSession(gapOf: KeyedEvent => Long, evictor: Evictor = NoEvictor)
      extends OrderedProcessor[Long, KeyedEvent, Fire](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {

    // (sessStartUs, sessEndUs, rows)
    @transient private var pane: ValueState[(Long, Long, Seq[(Long, Long)])] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      pane = h.getValueState[(Long, Long, Seq[(Long, Long)])]("dspane",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Seq[(Long, Long)])](),
        TTLConfig.NONE)

    private def evict(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = evictor match {
      case NoEvictor => rows
      case CountEvictor(m) => rows.takeRight(m)
      case TimeEvictor(d) =>
        if (rows.isEmpty) rows else { val hi = rows.last._1; rows.dropWhile(_._1 < hi - d) }
      case DeltaEvictor(th) =>
        if (rows.isEmpty) rows
        else { val ref = rows.last._2; rows.filter(r => math.abs(r._2 - ref) <= th) }
    }

    private def closeIfExpired(key: Long, boundaryUs: Long): Iterator[Fire] = {
      if (!pane.exists()) return Iterator.empty
      val (start, end, rows) = pane.get()
      if (end <= boundaryUs) {
        pane.clear()
        val kept = evict(rows)
        Iterator.single(Fire(key, start, 0L, kept.length.toLong, kept.map(_._2).sum,
          if (kept.isEmpty) 0L else kept.last._1))
      } else Iterator.empty
    }

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[Fire] = {
      val closed = closeIfExpired(key, e.tsUs)
      val reach = e.tsUs + gapOf(e)
      val (start, end, rows) =
        if (pane.exists()) pane.get() else (e.tsUs, reach, Seq.empty[(Long, Long)])
      pane.update((start, math.max(end, reach), rows :+ (e.tsUs -> e.valueMillis)))
      closed
    }

    override protected def onWatermark(key: Long, watermarkMs: Long): Iterator[Fire] =
      closeIfExpired(key, watermarkMs * 1000)
  }
}
