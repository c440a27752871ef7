package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming._

/** ProcessFunction-style hook (reference: flink-streaming-java
  * .../api/functions/ProcessFunction.java — processElement/onTimer over
  * keyed state): per-key element callback + event-time timers, hosted on
  * Spark's `transformWithState` StatefulProcessor so state lives in the
  * executor-local state store and checkpoints with the query.
  */
object ProcessFn {

  /** Per-element context mirroring ProcessFunction.Context. */
  trait Ctx extends Serializable {
    def handle: StatefulProcessorHandle
    def registerEventTimeTimer(tsMs: Long): Unit
    def currentWatermarkMs: Long
  }

  /** User logic: processElement + onTimer (both may emit). */
  trait Fn[K, I, O] extends Serializable {
    def open(handle: StatefulProcessorHandle): Unit = {}
    def processElement(key: K, value: I, ctx: Ctx): Iterator[O]
    def onTimer(key: K, tsMs: Long, ctx: Ctx): Iterator[O] = Iterator.empty
  }

  private final class Processor[K, I, O](fn: Fn[K, I, O])
      extends StatefulProcessor[K, I, O] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      fn.open(getHandle)
    private def ctx(tv: TimerValues): Ctx = new Ctx {
      def handle: StatefulProcessorHandle = getHandle
      def registerEventTimeTimer(tsMs: Long): Unit = getHandle.registerTimer(tsMs)
      def currentWatermarkMs: Long = tv.getCurrentWatermarkInMs()
    }
    override def handleInputRows(key: K, rows: Iterator[I], tv: TimerValues): Iterator[O] =
      rows.flatMap(r => fn.processElement(key, r, ctx(tv)))
    override def handleExpiredTimer(key: K, tv: TimerValues, info: ExpiredTimerInfo): Iterator[O] =
      fn.onTimer(key, info.getExpiryTimeInMs(), ctx(tv))
  }

  /** Apply `fn` over a keyed stream; event-time mode (requires an upstream
    * `withWatermark`). Output is append-only. */
  def apply[K: Encoder, I: Encoder, O: Encoder](
      ds: Dataset[I], keyFn: I => K, fn: Fn[K, I, O]): Dataset[O] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(keyFn)
      .transformWithState(new Processor(fn), TimeMode.EventTime(), OutputMode.Append())
  }
}
