package graft

import graft.streaming.{StatefulOps, WindowProcessor}
import graft.streaming.StatefulOps.KeyedEvent
import graft.streaming.WindowProcessor._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class WindowProcessorSpec extends SparkSpec {
  import spark.implicits._

  private val WinUs = 100000000L // 100s tumbling windows

  private def runWin(trigger: Trigger, evictor: Evictor,
                     events: Seq[KeyedEvent]): Seq[Fire] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = StatefulOps.run(ds, new Tumbling(WinUs, trigger, evictor))
    val name = s"win_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try { mem.addData(events: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[Fire].collect().toSeq
  }

  private def ev(id: Long, tsSec: Long, vm: Long) =
    KeyedEvent(1L, id, tsSec * 1000000L, "x", vm)

  private def runLate(cleanDelayUs: Long, latenessUs: Long,
                      events: Seq[KeyedEvent]): Seq[LateFire] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = StatefulOps.run(ds,
      new TumblingWithLateness(WinUs, cleanDelayUs, latenessUs))
    val name = s"late_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try { mem.addData(events: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[LateFire].collect().toSeq
  }

  test("TumblingWithLateness: on-time fire, late re-fire, side output past the horizon") {
    // clean delay 10s, lateness 50s, 100s windows; events in ARRIVAL order:
    //  id1 ts=50  -> w[0,100) accumulates
    //  id2 ts=120 -> w[100,200); clean wm 110 >= 100 fires w0 on-time (n=1)
    //  id3 ts=80  -> w0 already fired, within lateness (150 > 110): re-fire n=2
    //  id4 ts=300 -> clean wm 290: fires w100 on-time; w0 horizon 150 <= 290 evicts
    //  id5 ts=90  -> w0 horizon passed -> side output
    val got = runLate(10000000L, 50000000L, Seq(
      ev(1, 50, 10), ev(2, 120, 20), ev(3, 80, 30), ev(4, 300, 40), ev(5, 90, 50)))
    val rows = got.map(f => (f.winStartUs, f.tag, f.fireSeq, f.trigId, f.n, f.sumMillis)).toSet
    assert(rows === Set(
      (0L, "fire", 0L, 2L, 1L, 10L),
      (0L, "fire", 1L, 3L, 2L, 40L),
      (100000000L, "fire", 0L, 4L, 1L, 20L),
      (0L, "side", -1L, 5L, 1L, 50L)))
  }

  test("TumblingWithLateness: window first seen inside the lateness tier fires immediately") {
    // id2 advances clean wm past w0's end before w0 has any content; id3 then
    // creates w0 late -> immediate fire_seq 0 with just itself
    val got = runLate(10000000L, 50000000L, Seq(
      ev(2, 120, 20), ev(3, 80, 30)))
    assert(got.filter(_.winStartUs == 0L)
      .map(f => (f.tag, f.fireSeq, f.trigId, f.n, f.sumMillis)) ===
      Seq(("fire", 0L, 3L, 1L, 30L)))
  }

  test("TumblingWithLateness with Punctuated watermarks: only marker events advance the clock") {
    // Only type "p" events emit a watermark (their own ts); others never do.
    val evs = Seq(
      KeyedEvent(1, 1, 50000000L, "x", 10),   // w0 accumulates
      KeyedEvent(1, 2, 120000000L, "p", 20),  // wm=120s fires w0 on-time
      KeyedEvent(1, 3, 80000000L, "x", 30),   // w0 late (within 50s): re-fire
      KeyedEvent(1, 4, 310000000L, "x", 40),  // NOT a marker: no fires
      KeyedEvent(1, 5, 320000000L, "p", 50),  // wm=320s fires w100; w0 evicts
      KeyedEvent(1, 6, 90000000L, "x", 60))   // w0 past horizon -> side
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = StatefulOps.run(ds, new TumblingWithLateness(WinUs,
      Punctuated(e => if (e.eventType == "p") e.tsUs else Long.MinValue), 50000000L))
    val name = s"punct_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try { mem.addData(evs: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table(name).as[LateFire].collect().toSeq
    assert(got.map(f => (f.winStartUs, f.tag, f.fireSeq, f.trigId, f.n, f.sumMillis)).toSet === Set(
      (0L, "fire", 0L, 2L, 1L, 10L),
      (0L, "fire", 1L, 3L, 2L, 40L),
      (100000000L, "fire", 0L, 5L, 1L, 20L),
      (0L, "side", -1L, 6L, 1L, 60L)))
    // w300 stays open: the last marker (320s) never passed its end
  }

  test("DynamicSession: per-element gap extends the session end") {
    // gap: 20s for "p", 100s otherwise; session end = max over ts+gap
    val evs = Seq(
      KeyedEvent(1, 1, 10000000L, "x", 1),   // sess1 [10, 110)
      KeyedEvent(1, 2, 50000000L, "p", 2),   // reach 70 < 110: end stays
      KeyedEvent(1, 3, 120000000L, "x", 3),  // closes sess1; sess2 [120, 220)
      KeyedEvent(1, 4, 200000000L, "p", 4),  // reach 220: end stays 220
      KeyedEvent(1, 5, 230000000L, "x", 5))  // closes sess2; sess3 open at end
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = StatefulOps.run(ds, new DynamicSession(
      e => if (e.eventType == "p") 20000000L else 100000000L))
    val name = s"dsess_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try { mem.addData(evs: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table(name).as[Fire].collect().toSeq
    assert(got.map(f => (f.winStartUs, f.n, f.sumMillis, f.lastTsUs)).toSet === Set(
      (10000000L, 2L, 3L, 50000000L),
      (120000000L, 2L, 7L, 200000000L)))
  }

  test("OnWindowEnd fires a closed window once, keeps the open one pending") {
    // window [0,100s) has 2 rows; window [100s,200s) has 1 row (stays open:
    // final watermark = 150s < its end)
    val got = runWin(OnWindowEnd, NoEvictor,
      Seq(ev(1, 10, 5), ev(2, 20, 7), ev(3, 150, 9)))
    assert(got.map(f => (f.winStartUs, f.fireSeq, f.n, f.sumMillis)) ===
      Seq((0L, 0L, 2L, 12L)))
  }

  test("CountEvictor keeps only the newest elements at firing") {
    val got = runWin(OnWindowEnd, CountEvictor(2),
      Seq(ev(1, 10, 1), ev(2, 20, 2), ev(3, 30, 4), ev(4, 150, 0)))
    assert(got.map(f => (f.n, f.sumMillis, f.lastTsUs)) === Seq((2L, 6L, 30000000L)))
  }

  test("TimeEvictor keeps elements near the newest one") {
    val got = runWin(OnWindowEnd, TimeEvictor(15000000L), // 15s
      Seq(ev(1, 10, 1), ev(2, 50, 2), ev(3, 60, 4), ev(4, 150, 0)))
    assert(got.map(f => (f.n, f.sumMillis)) === Seq((2L, 6L))) // rows at 50s,60s
  }

  test("CountTrigger fires every n and the remainder at window end") {
    val got = runWin(CountTrigger(2), NoEvictor,
      Seq(ev(1, 10, 1), ev(2, 20, 2), ev(3, 30, 4), ev(4, 40, 8), ev(5, 50, 16),
        ev(6, 150, 0)))
    assert(got.map(f => (f.fireSeq, f.n, f.sumMillis)) ===
      Seq((0L, 2L, 3L), (1L, 2L, 12L), (2L, 1L, 16L)))
  }

  test("DeltaTrigger fires when the value jumps past the threshold") {
    // ref=10; 12 (|2|<=5) no; 17 (|7|>5) fire {10,12,17}, new ref=17;
    // 18 no; window end fires remainder {18}
    val got = runWin(DeltaTrigger(5), NoEvictor,
      Seq(ev(1, 10, 10), ev(2, 20, 12), ev(3, 30, 17), ev(4, 40, 18), ev(5, 150, 0)))
    assert(got.map(f => (f.fireSeq, f.n, f.sumMillis)) ===
      Seq((0L, 3L, 39L), (1L, 1L, 18L)))
  }

  test("DeltaEvictor keeps only elements near the newest value") {
    val got = runWin(OnWindowEnd, DeltaEvictor(3),
      Seq(ev(1, 10, 1), ev(2, 20, 8), ev(3, 30, 10), ev(4, 150, 0)))
    // ref = last value 10: keep 8 and 10, drop 1
    assert(got.map(f => (f.n, f.sumMillis)) === Seq((2L, 18L)))
  }

  test("ContinuousTrigger fires at event-time boundaries without purging") {
    // 100s window, 30s boundaries at 30/60/90; elements at 10,40,70; close at 150
    val got = runWin(ContinuousTrigger(30000000L), NoEvictor,
      Seq(ev(1, 10, 1), ev(2, 40, 2), ev(3, 70, 4), ev(4, 150, 0)))
    // boundary 30 fires {1}; boundary 60 fires {1,2}; close fires all
    assert(got.map(f => (f.fireSeq, f.n, f.sumMillis)) ===
      Seq((0L, 1L, 1L), (1L, 2L, 3L), (2L, 3L, 7L)))
  }

  test("ContinuousTrigger skips empty boundaries") {
    // first element arrives after two boundaries have passed
    val got = runWin(ContinuousTrigger(30000000L), NoEvictor,
      Seq(ev(1, 65, 5), ev(2, 95, 2), ev(3, 150, 0)))
    // boundary 90 fires {5}; close fires {5,2}; boundaries 30/60 skipped
    assert(got.map(f => (f.fireSeq, f.n, f.sumMillis)) ===
      Seq((0L, 1L, 5L), (1L, 2L, 7L)))
  }

  test("Sliding windows: elements join overlapping panes; evictor applies per pane") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // size 100s, slide 50s; events at 60,120,160; final nudge at 300
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = StatefulOps.run(ds,
      new Sliding(100000000L, 50000000L, NoEvictor))
    val name = s"slide_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      mem.addData(ev(1, 60, 1), ev(2, 120, 2), ev(3, 160, 4), ev(4, 300, 0))
      q.processAllAvailable(); mem.addData(); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).as[Fire].collect().toSeq
      .filter(_.n > 0).sortBy(_.winStartUs).map(f => (f.winStartUs / 1000000, f.n, f.sumMillis))
    // windows: [0,100) has {60}; [50,150) has {60,120}; [100,200) has {120,160};
    // [150,250) has {160}; [250,350) has {300-event} but stays open? 300 closes at wm=300 -> end 350 > 300 stays pending... the nudge advances wm to 300 so [250,350) not closed; [300,400) not closed
    assert(got === Seq((0L, 1L, 1L), (50L, 2L, 3L), (100L, 2L, 6L), (150L, 1L, 4L)))
  }

  test("empty remainder after a purging fire does not fire at window end") {
    val got = runWin(CountTrigger(2), NoEvictor,
      Seq(ev(1, 10, 1), ev(2, 20, 2), ev(3, 150, 0)))
    assert(got.map(f => (f.fireSeq, f.n)) === Seq((0L, 2L)))
  }
}
