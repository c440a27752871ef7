package graft

import java.util.concurrent.atomic.AtomicLong

import graft.streaming.EventTimeOps.OrderedProcessor
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{KeyedEvent, RunningAggOut}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the OrderedProcessor min-pending drain guard: a watermark tick that
  * cannot release any buffered row (every buffered timestamp is above the
  * watermark) must NOT iterate the state buffer. Without the guard, every
  * subclass-registered timer — window cleanup, CEP timeouts, session gaps —
  * pays an O(buffered rows) scan per key per batch under long watermark
  * delays. local[4] keeps all tasks in this JVM, so the static counters
  * below observe the executor-side processor instances directly.
  */
object DrainGuardProbe {
  val scans = new AtomicLong // full-buffer scans on the timer path
  val ticks = new AtomicLong // expired-timer deliveries (onWatermark calls)
}

/** RunningAgg clone that (a) registers a cleanup-style timer 6s after each
  * drained row — the pattern that generates ticks with nothing ready — and
  * (b) counts scans vs ticks through the production hooks. */
final class ProbedRunningAgg extends OrderedProcessor[Long, KeyedEvent, RunningAggOut](
    KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {
  @transient private var acc: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
  override protected def openState(
      h: org.apache.spark.sql.streaming.StatefulProcessorHandle): Unit =
    acc = h.getValueState[(Long, Long)]("acc",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override protected def onBufferScan(): Unit = { DrainGuardProbe.scans.incrementAndGet(); () }
  override protected def onWatermark(key: Long, wm: Long): Iterator[RunningAggOut] = {
    DrainGuardProbe.ticks.incrementAndGet(); Iterator.empty
  }
  override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[RunningAggOut] = {
    getHandle.registerTimer(e.tsUs / 1000 + 6000)
    val (n0, s0) = if (acc.exists()) acc.get() else (0L, 0L)
    val st = (n0 + 1, s0 + e.valueMillis)
    acc.update(st)
    Iterator(RunningAggOut(key, e.eventId, e.tsUs, st._1, st._2))
  }
}

class DrainGuardSpec extends SparkSpec {
  import spark.implicits._

  test("no-op watermark tick (all buffered rows above wm) skips the buffer scan") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    DrainGuardProbe.scans.set(0)
    DrainGuardProbe.ticks.set(0)
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "5 seconds").drop("ts").as[KeyedEvent]
    val q = StatefulOps.run(ds, new ProbedRunningAgg)
      .writeStream.outputMode("append").format("memory").queryName("drain_guard").start()
    def ev(id: Long, tsSec: Long, vm: Long) = KeyedEvent(7L, id, tsSec * 1000000L, "x", vm)

    mem.addData(ev(1, 10, 100)) // buffer {10s}, timer@10s; wm -> 5s: no fire
    q.processAllAvailable()
    mem.addData(ev(2, 20, 200)) // wm -> 15s: timer@10s drains row@10s (one scan);
    q.processAllAvailable()     // survivor {20s} -> minPending=20s; cleanup timer@16s
    val scansAfterDrain = DrainGuardProbe.scans.get()
    val ticksAfterDrain = DrainGuardProbe.ticks.get()
    assert(scansAfterDrain >= 1, "the ready-row drain must scan")

    mem.addData(ev(3, 21, 300)) // wm -> 16s: cleanup timer@16s fires with
    q.processAllAvailable()     // minPending=20s > wm — the no-op tick
    assert(DrainGuardProbe.ticks.get() > ticksAfterDrain,
      "the cleanup timer must have fired")
    assert(DrainGuardProbe.scans.get() === scansAfterDrain,
      "a tick below every buffered timestamp must not iterate the buffer")

    mem.addData(ev(4, 30, 400)) // wm -> 25s: drains 20s & 21s in order
    q.processAllAvailable()
    q.stop()
    val got = spark.table("drain_guard")
      .select("eventId", "runningN", "runningSumMillis")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got(1L) === (1L, 100L))
    assert(got(2L) === (2L, 300L))
    assert(got(3L) === (3L, 600L)) // event-time order held across the guard
    assert(DrainGuardProbe.ticks.get() > DrainGuardProbe.scans.get(),
      "guard must have skipped at least one tick's scan overall")
  }
}
