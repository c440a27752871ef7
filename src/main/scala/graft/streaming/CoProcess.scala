package graft.streaming

import graft.streaming.EventTimeOps.{OrderKey, OrderedProcessor}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** Connected-streams parity (reference: flink-streaming-java/.../api/
  * datastream/ConnectedStreams.java + api/functions/co/CoProcessFunction
  * .java): two differently-typed keyed streams share one operator and one
  * state namespace. Spark has no two-input stateful operator, so the
  * documented pattern applies — tag each side, union, and dispatch inside
  * one ordered processor (`Either`-union; SURVEY.md §2.3).
  */
object CoProcess {

  /** A row from either side, unified: `side` 0 = left, 1 = right. */
  case class Tagged(key: Long, eventId: Long, tsUs: Long, side: Int,
                    valueMillis: Long)

  object Tagged {
    // tieId folds the side bit in: the OrderKey contract requires a unique
    // tie per buffered row, and the two sides may legitimately carry the
    // same eventId. Also pins equal-(ts, id) interleaving to left-first.
    // The packing needs eventId < 2^62 — enforced loudly, because a
    // silent overflow would misorder (or, under the MapState buffer,
    // drop) rows instead of failing.
    val orderKey: OrderKey[Tagged] = { t =>
      require(t.eventId >= 0 && t.eventId < (1L << 62),
        s"eventId ${t.eventId} outside [0, 2^62) — tie packing would collide")
      (t.tsUs / 1000, t.tsUs, t.eventId * 2 + t.side)
    }
  }

  /** CoProcessFunction-style callbacks, event-time ordered across BOTH
    * inputs (the reference interleaves by arrival; we pin the stronger,
    * deterministic event-time interleaving). */
  trait CoFn[O] extends Serializable {
    def open(handle: StatefulProcessorHandle): Unit = {}
    def processLeft(key: Long, e: Tagged): Iterator[O]
    def processRight(key: Long, e: Tagged): Iterator[O]
  }

  final class Processor[O](fn: CoFn[O])
      extends OrderedProcessor[Long, Tagged, O](Tagged.orderKey, Encoders.product[Tagged]) {
    override protected def openState(h: StatefulProcessorHandle): Unit = fn.open(h)
    override protected def onOrdered(key: Long, e: Tagged): Iterator[O] =
      if (e.side == 0) fn.processLeft(key, e) else fn.processRight(key, e)
  }

  /** Connect two keyed streams and run a CoFn over the merged order. */
  def connect[O: Encoder](left: Dataset[Tagged], right: Dataset[Tagged],
                          fn: CoFn[O]): Dataset[O] = {
    import left.sparkSession.implicits._
    EventTimeOps.ordered(left.union(right), (t: Tagged) => t.key, new Processor(fn))
  }

  /** Example CoFn: per key, count left-side rows seen so far; each right
    * row emits that running count (clicks-before-purchase shape). */
  case class CountAtRight(key: Long, rightId: Long, tsUs: Long, leftSeen: Long)

  final class LeftCountAtRight extends CoFn[CountAtRight] {
    @transient private var n: ValueState[Long] = _
    override def open(h: StatefulProcessorHandle): Unit =
      n = h.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    def processLeft(key: Long, e: Tagged): Iterator[CountAtRight] = {
      n.update((if (n.exists()) n.get() else 0L) + 1); Iterator.empty
    }
    def processRight(key: Long, e: Tagged): Iterator[CountAtRight] =
      Iterator(CountAtRight(key, e.eventId, e.tsUs, if (n.exists()) n.get() else 0L))
  }
}
