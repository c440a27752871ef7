package graft

import graft.streaming.{Cep, EventTimeOps}
import graft.streaming.StatefulOps.KeyedEvent
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CepSpec extends SparkSpec {
  import spark.implicits._

  private def runPat(pat: Cep.Pattern, events: Seq[KeyedEvent],
                     emitTimeouts: Boolean = false): Seq[Cep.Match] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = EventTimeOps.ordered(ds, (e: KeyedEvent) => e.key,
      new Cep.NfaProcessor(pat, emitTimeouts))
    val name = s"cep_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try { mem.addData(events: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[Cep.Match].collect().toSeq
  }

  private def ev(id: Long, tsSec: Long, typ: String) =
    KeyedEvent(1L, id, tsSec * 1000000L, typ, 0L)

  test("oneOrMore absorbs the full run greedily; overlapping starts give suffix matches") {
    // a a a b: partials start at each a; each absorbs later a's, binds b
    val got = runPat(Cep.Pattern.begin("a").oneOrMore.followedBy("b"),
      Seq(ev(1, 10, "a"), ev(2, 20, "a"), ev(3, 30, "a"), ev(4, 40, "b")))
    assert(got.map(_.ids).toSet ===
      Set(Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L), Seq(3L, 4L)))
  }

  test("oneOrMore with relaxed contiguity skips non-matching events inside the loop") {
    val got = runPat(Cep.Pattern.begin("a").oneOrMore.followedBy("b"),
      Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "a"), ev(4, 40, "b")))
    assert(got.map(_.ids).toSet === Set(Seq(1L, 3L, 4L), Seq(3L, 4L)))
  }

  test("final-stage oneOrMore emits a match per absorption") {
    val got = runPat(Cep.Pattern.begin("b").followedBy("a", times = 1).oneOrMore,
      Seq(ev(1, 10, "b"), ev(2, 20, "a"), ev(3, 30, "a")))
    assert(got.map(_.ids).toSet === Set(Seq(1L, 2L), Seq(1L, 2L, 3L)))
  }

  test("optional stage binds when present, is skipped when the next stage arrives first") {
    val pat = Cep.Pattern.begin("v").followedBy("c").optional.followedBy("p")
    // click present: bound
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "c"), ev(3, 30, "p")))
      .map(_.ids) === Seq(Seq(1L, 2L, 3L)))
    // purchase before any click: optional skipped
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "p")))
      .map(_.ids) === Seq(Seq(1L, 2L)))
    // purchase first, click later: the skip already consumed the match
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "p"), ev(3, 30, "c"), ev(4, 40, "p")))
      .map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("followedBy skips non-matching events (relaxed contiguity)") {
    val got = runPat(Cep.Pattern.begin("a").followedBy("b"),
      Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "x"), ev(4, 40, "b")))
    assert(got.map(_.ids) === Seq(Seq(1L, 4L)))
  }

  test("next requires strict contiguity") {
    val strict = Cep.Pattern.begin("a").next("b")
    assert(runPat(strict, Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "b"))).isEmpty)
    assert(runPat(strict, Seq(ev(1, 10, "a"), ev(2, 20, "b"))).map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("greedy first binding: each start binds the earliest qualifying event") {
    val got = runPat(Cep.Pattern.begin("a").followedBy("b"),
      Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "b")))
    // one match: a binds FIRST b only (no branch to the second b)
    assert(got.map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("overlapping starts each produce a match") {
    val got = runPat(Cep.Pattern.begin("a").followedBy("b"),
      Seq(ev(1, 10, "a"), ev(2, 20, "a"), ev(3, 30, "b")))
    assert(got.map(_.ids).toSet === Set(Seq(1L, 3L), Seq(2L, 3L)))
  }

  test("times(n) repetition with relaxed gaps") {
    val got = runPat(Cep.Pattern.begin("a", times = 3),
      Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "a"), ev(4, 40, "a")))
    // starts at 1 (binds 1,3,4), at 3 (pending), at 4 (pending)
    assert(got.map(_.ids) === Seq(Seq(1L, 3L, 4L)))
  }

  test("within prunes overdue partials") {
    val got = runPat(Cep.Pattern.begin("a").followedBy("b").within(15000000L),
      Seq(ev(1, 10, "a"), ev(2, 40, "b"), ev(3, 45, "a"), ev(4, 50, "b")))
    assert(got.map(_.ids) === Seq(Seq(3L, 4L)))
  }

  test("within operates on the carried time domain — arrival-time input gives the clock-time variant") {
    // Flink 1.3's Pattern.within follows the stream's time characteristic
    // (event time OR processing time). The NFA is time-domain-agnostic: it
    // prunes on tsUs, whatever that carries. Feed ARRIVAL sequence as the
    // timestamp (the processing-time surrogate) and the same pattern
    // becomes a clock-time window: event-time order is a,b within 5s
    // (would match under event time) but arrival order spreads them past
    // the within horizon, so the clock-time run must NOT match — and the
    // late-arriving pair that is adjacent in arrival time must match even
    // though its event times are far apart.
    def arr(id: Long, arrivalSec: Long, typ: String) =
      KeyedEvent(1L, id, arrivalSec * 1000000L, typ, 0L)
    val pat = Cep.Pattern.begin("a").followedBy("b").within(15000000L)
    // arrival domain: a@t=10 ... b@t=40 (>15s apart in clock time: pruned);
    // a@t=45, b@t=50 adjacent in clock time: matches
    val got = runPat(pat,
      Seq(arr(1, 10, "a"), arr(2, 40, "b"), arr(3, 45, "a"), arr(4, 50, "b")))
    assert(got.map(_.ids) === Seq(Seq(3L, 4L)))
    // same four events squeezed into a 4s arrival burst: clock-time within
    // passes for both starts (relaxed contiguity gives a2→b4 too)
    val burst = runPat(pat,
      Seq(arr(1, 1, "a"), arr(2, 2, "b"), arr(3, 3, "a"), arr(4, 4, "b")))
    assert(burst.map(_.ids).toSet === Set(Seq(1L, 2L), Seq(3L, 4L)))
  }

  test("notFollowedBy kills a partial when the guard type intervenes") {
    val pat = Cep.Pattern.begin("a").notFollowedBy("x").followedBy("b")
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "b"))).isEmpty)
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "y"), ev(3, 30, "b")))
      .map(_.ids) === Seq(Seq(1L, 3L)))
  }

  test("notFollowedBy guard clears once the next stage binds") {
    // x AFTER b is irrelevant
    val pat = Cep.Pattern.begin("a").notFollowedBy("x").followedBy("b")
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "x")))
      .map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("keys are isolated: a match never spans two keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pat = Cep.Pattern.begin("a").next("b")
    val events = Seq(
      KeyedEvent(1L, 1, 10000000L, "a", 0), KeyedEvent(2L, 2, 20000000L, "b", 0),
      KeyedEvent(2L, 3, 30000000L, "a", 0), KeyedEvent(2L, 4, 40000000L, "b", 0))
    val mem = MemoryStream[KeyedEvent]
    val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
    val out = EventTimeOps.ordered(ds, (e: KeyedEvent) => e.key, new Cep.NfaProcessor(pat))
    val name = s"cep_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try { mem.addData(events: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table(name).as[Cep.Match].collect().toSeq
    // key 1's lone "a" followed by key 2's "b" must NOT match
    assert(got.map(m => (m.key, m.ids)) === Seq((2L, Seq(3L, 4L))))
  }

  test("mixed contiguity: followedBy then next") {
    val pat = Cep.Pattern.begin("a").followedBy("b").next("c")
    // gap before b is fine; gap between b and c kills it
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "b"),
      ev(4, 40, "c"))).map(_.ids) === Seq(Seq(1L, 3L, 4L)))
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "x"),
      ev(4, 40, "c"))).isEmpty)
  }

  test("single-stage pattern emits on every match") {
    val got = runPat(Cep.Pattern.begin("a"),
      Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "a")))
    assert(got.map(_.ids).toSet === Set(Seq(1L), Seq(3L)))
  }

  test("validate rejects silently-never-matching shapes at construction") {
    def reject(p: Cep.Pattern): Unit =
      intercept[IllegalArgumentException](new Cep.NfaProcessor(p))
    // trailing optional: no following stage to skip to
    reject(Cep.Pattern.begin("a").followedBy("b").optional)
    // consecutive optionals exceed the one-stage lookahead
    reject(Cep.Pattern.begin("a").followedBy("b").optional.followedBy("c").optional
      .followedBy("d"))
    // oneOrMore followed by the same type never exits the loop
    reject(Cep.Pattern.begin("a").oneOrMore.followedBy("a"))
    // oneOrMore followed by an optional stage: the skip path needs the
    // optional stage's own type to exit the loop — 'a a c' never matches
    reject(Cep.Pattern.begin("a").oneOrMore.followedBy("b").optional.followedBy("c"))
    // sanity: the legal neighbours still construct
    new Cep.NfaProcessor(Cep.Pattern.begin("a").oneOrMore.followedBy("b"))
    new Cep.NfaProcessor(Cep.Pattern.begin("a").followedBy("b").optional.followedBy("c"))
  }

  test("followedByAny binds every qualifying event where followedBy binds only the first") {
    val events = Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "x"), ev(4, 40, "b"))
    val any = runPat(Cep.Pattern.begin("a").followedByAny("b"), events)
    assert(any.map(_.ids).toSet === Set(Seq(1L, 2L), Seq(1L, 4L)))
    val greedy = runPat(Cep.Pattern.begin("a").followedBy("b"), events)
    assert(greedy.map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("followedByAny mid-pattern: each fork continues to the next stage independently") {
    val got = runPat(Cep.Pattern.begin("a").followedByAny("b").followedBy("c"),
      Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "b"), ev(4, 40, "c")))
    assert(got.map(_.ids).toSet === Set(Seq(1L, 2L, 4L), Seq(1L, 3L, 4L)))
  }

  test("or widens a stage to either type, greedy-first across both") {
    val pat = Cep.Pattern.begin("a").followedBy("b").or("c")
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "c")))
      .map(_.ids) === Seq(Seq(1L, 2L)))
    // the first event of EITHER type binds; the later b does not re-bind
    assert(runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "c"), ev(3, 30, "b")))
      .map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("until closes the loop: loop-type events after the stop event are not absorbed") {
    val pat = Cep.Pattern.begin("a").oneOrMore.until("u").followedBy("b")
    val got = runPat(pat, Seq(ev(1, 10, "a"), ev(2, 20, "a"), ev(3, 30, "u"),
      ev(4, 40, "a"), ev(5, 50, "b")))
    // partials born at 1 and 2 stop absorbing at the u but still complete on
    // b; the a@40 partial was born AFTER the u, so its loop is open
    assert(got.map(_.ids).toSet ===
      Set(Seq(1L, 2L, 5L), Seq(2L, 5L), Seq(4L, 5L)))
  }

  test("until on a final oneOrMore stage kills the partial outright") {
    val got = runPat(Cep.Pattern.begin("a").oneOrMore.until("u"),
      Seq(ev(1, 10, "a"), ev(2, 20, "u"), ev(3, 30, "a")))
    // no [1,3] extension across the u
    assert(got.map(_.ids).toSet === Set(Seq(1L), Seq(3L)))
  }

  test("timeout select reports pruned partials with bound ids and the deadline") {
    val pat = Cep.Pattern.begin("a").followedBy("b").within(15000000L)
    val got = runPat(pat,
      Seq(ev(1, 10, "a"), ev(2, 40, "x"), ev(3, 45, "a"), ev(4, 50, "b")),
      emitTimeouts = true)
    val (timeouts, matches) = got.partition(_.timedOut)
    assert(matches.map(_.ids) === Seq(Seq(3L, 4L)))
    assert(timeouts.map(m => (m.ids, m.endTsUs)) === Seq((Seq(1L), 25000000L)))
  }

  private def evv(id: Long, tsSec: Long, typ: String, vm: Long) =
    KeyedEvent(1L, id, tsSec * 1000000L, typ, vm)

  test("where diverges from type-only matching: a failing event is skipped, not bound") {
    val events = Seq(evv(1, 10, "a", 0), evv(2, 20, "b", 50), evv(3, 30, "b", 200))
    val typed = runPat(Cep.Pattern.begin("a").followedBy("b"), events)
    assert(typed.map(_.ids) === Seq(Seq(1L, 2L))) // greedy binds the first b
    val conded = runPat(
      Cep.Pattern.begin("a").followedBy("b").where(_.valueMillis > 100), events)
    assert(conded.map(_.ids) === Seq(Seq(1L, 3L))) // small b skipped
  }

  test("where on the head stage gates which events start partials") {
    val got = runPat(Cep.Pattern.begin("a").where(_.valueMillis >= 100).followedBy("b"),
      Seq(evv(1, 10, "a", 50), evv(2, 20, "a", 150), evv(3, 30, "b", 0)))
    assert(got.map(_.ids) === Seq(Seq(2L, 3L)))
  }

  test("where under strict contiguity: a type-matching but failing next event kills the partial") {
    val pat = Cep.Pattern.begin("a").next("b").where(_.valueMillis > 100)
    assert(runPat(pat,
      Seq(evv(1, 10, "a", 0), evv(2, 20, "b", 50), evv(3, 30, "b", 200))).isEmpty)
    assert(runPat(pat, Seq(evv(1, 10, "a", 0), evv(2, 20, "b", 200)))
      .map(_.ids) === Seq(Seq(1L, 2L)))
  }

  test("repeated where calls AND-compose") {
    val pat = Cep.Pattern.begin("a")
      .followedBy("b").where(_.valueMillis > 100).where(_.valueMillis < 300)
    val got = runPat(pat, Seq(evv(1, 10, "a", 0), evv(2, 20, "b", 400),
      evv(3, 30, "b", 200)))
    assert(got.map(_.ids) === Seq(Seq(1L, 3L)))
  }

  test("whereIter reads the bound values: second purchase strictly larger than the first") {
    val pat = Cep.Pattern.begin("p")
      .followedBy("p").whereIter((e, vals) => e.valueMillis > vals.head)
    val got = runPat(pat,
      Seq(evv(1, 10, "p", 100), evv(2, 20, "p", 50), evv(3, 30, "p", 150)))
    // start@1 skips p@50, binds p@150; start@2 binds p@150; start@3 pending
    assert(got.map(_.ids).toSet === Set(Seq(1L, 3L), Seq(2L, 3L)))
  }

  test("conditioned oneOrMore can share a type with the next stage and still exit") {
    // small p's absorb into the loop; the big p fails the loop's condition
    // and takes the exit edge instead (validate allows the overlap because
    // conditions are present)
    val pat = Cep.Pattern.begin("p").where(_.valueMillis < 100).oneOrMore
      .followedBy("p").where(_.valueMillis >= 100)
    val got = runPat(pat,
      Seq(evv(1, 10, "p", 50), evv(2, 20, "p", 60), evv(3, 30, "p", 200)))
    assert(got.map(_.ids).toSet === Set(Seq(1L, 2L, 3L), Seq(2L, 3L)))
    // cond-free overlap is still rejected
    intercept[IllegalArgumentException](
      new Cep.NfaProcessor(Cep.Pattern.begin("p").oneOrMore.followedBy("p")))
  }

  test("maxPartials caps per-key state oldest-start first; below the cap output is unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pat = Cep.Pattern.begin("a").followedByAny("b")
    val events = Seq(ev(1, 10, "a"), ev(2, 20, "a"), ev(3, 30, "a"), ev(4, 40, "b"))
    def runCapped(cap: Int): Seq[Cep.Match] = {
      val mem = MemoryStream[KeyedEvent]
      val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
        .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
      val out = EventTimeOps.ordered(ds, (e: KeyedEvent) => e.key,
        new Cep.NfaProcessor(pat, maxPartials = cap))
      val name = s"cep_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
      try { mem.addData(events: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[Cep.Match].collect().toSeq
    }
    // cap above the live set: identical to the uncapped run
    assert(runCapped(10).map(_.ids).toSet ===
      runPat(pat, events).map(_.ids).toSet)
    assert(runCapped(10).map(_.ids).toSet ===
      Set(Seq(1L, 4L), Seq(2L, 4L), Seq(3L, 4L)))
    // cap = 2: the a@10 partial (oldest start) is dropped when a@30 lands
    assert(runCapped(2).map(_.ids).toSet === Set(Seq(2L, 4L), Seq(3L, 4L)))
  }

  test("times(from, to) on the final stage emits a match per count in the range") {
    val got = runPat(Cep.Pattern.begin("v").followedBy("a").times(2, 3),
      Seq(ev(1, 10, "v"), ev(2, 20, "a"), ev(3, 30, "a"), ev(4, 40, "a"), ev(5, 50, "a")))
    // the v-start binds a@20,a@30 (count 2) and a@40 (count 3), then stops
    assert(got.map(_.ids).toSet ===
      Set(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 4L)))
  }

  test("times(from, to) mid-pattern: greedy absorption, early exit after the minimum") {
    val pat = Cep.Pattern.begin("v").followedBy("a").times(2, 3).followedBy("b")
    // only 2 a's, then b: early exit at the minimum
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "a"), ev(3, 30, "a"), ev(4, 40, "b")))
      .map(_.ids) === Seq(Seq(1L, 2L, 3L, 4L)))
    // 4 a's: absorbs to the max of 3, the 4th is skipped (relaxed), b binds
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "a"), ev(3, 30, "a"),
      ev(4, 40, "a"), ev(5, 50, "a"), ev(6, 60, "b")))
      .map(_.ids) === Seq(Seq(1L, 2L, 3L, 4L, 6L)))
    // one a only: below the minimum, no match
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "a"), ev(3, 30, "b"))).isEmpty)
  }

  test("notNext kills only when the prohibited type is the IMMEDIATE successor") {
    val pat = Cep.Pattern.begin("v").notNext("x").followedBy("p")
    // x immediately after v: dead
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "x"), ev(3, 30, "p"))).isEmpty)
    // x later in the gap: irrelevant (contrast notFollowedBy)
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "y"), ev(3, 30, "x"), ev(4, 40, "p")))
      .map(_.ids) === Seq(Seq(1L, 4L)))
    // immediate p binds as usual
    assert(runPat(pat, Seq(ev(1, 10, "v"), ev(2, 20, "p"))).map(_.ids) === Seq(Seq(1L, 2L)))
    // ambiguous: notNext type also accepted by the guarded stage
    intercept[IllegalArgumentException](
      new Cep.NfaProcessor(Cep.Pattern.begin("v").notNext("p").followedBy("p")))
  }

  test("consecutive closes the loop at the first gap; default keeps absorbing past it") {
    val events = Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "b"),
      ev(4, 40, "x"), ev(5, 50, "b"), ev(6, 60, "c"))
    val dflt = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore
      .followedBy("c"), events)
    assert(dflt.map(_.ids) === Seq(Seq(1L, 2L, 3L, 5L, 6L)))
    val consec = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore.consecutive
      .followedBy("c"), events)
    // x@40 closes the loop: b@50 is NOT absorbed, c still binds
    assert(consec.map(_.ids) === Seq(Seq(1L, 2L, 3L, 6L)))
  }

  test("consecutive still allows a gap BEFORE the first repetition (outer contiguity)") {
    val got = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore.consecutive
      .followedBy("c"),
      Seq(ev(1, 10, "a"), ev(2, 20, "x"), ev(3, 30, "b"), ev(4, 40, "b"), ev(5, 50, "c")))
    assert(got.map(_.ids) === Seq(Seq(1L, 3L, 4L, 5L)))
  }

  test("consecutive on a final loop stage: the gap kills further emission") {
    val events = Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "b"),
      ev(4, 40, "x"), ev(5, 50, "b"))
    val dflt = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore, events)
    assert(dflt.map(_.ids).toSet ===
      Set(Seq(1L, 2L), Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 5L)))
    val consec = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore.consecutive,
      events)
    assert(consec.map(_.ids).toSet === Set(Seq(1L, 2L), Seq(1L, 2L, 3L)))
  }

  test("consecutive loop may share a type with the next stage: the gap opens the exit") {
    val pat = Cep.Pattern.begin("p").oneOrMore.consecutive.followedBy("p")
    val got = runPat(pat, Seq(ev(1, 10, "p"), ev(2, 20, "p"), ev(3, 30, "x"), ev(4, 40, "p")))
    // starts at 1 and 2 absorb contiguously, close at x@30, exit on p@40;
    // the p@40 partial stays pending (its loop is open, absorbing)
    assert(got.map(_.ids).toSet === Set(Seq(1L, 2L, 4L), Seq(2L, 4L)))
    // without a gap the loop absorbs greedily and never exits
    assert(runPat(pat, Seq(ev(1, 10, "p"), ev(2, 20, "p"), ev(3, 30, "p"))).isEmpty)
  }

  test("allowCombinations explores every repetition subset containing the first binding") {
    val events = Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "b"),
      ev(4, 40, "b"), ev(5, 50, "c"))
    val dflt = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore
      .followedBy("c"), events)
    assert(dflt.map(_.ids) === Seq(Seq(1L, 2L, 3L, 4L, 5L)))
    val combo = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore.allowCombinations
      .followedBy("c"), events)
    assert(combo.map(_.ids).toSet === Set(
      Seq(1L, 2L, 5L), Seq(1L, 2L, 3L, 5L), Seq(1L, 2L, 4L, 5L), Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("allowCombinations on a final loop stage emits each subset at its last absorption") {
    val got = runPat(Cep.Pattern.begin("a").followedBy("b").oneOrMore.allowCombinations,
      Seq(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "b"), ev(4, 40, "b")))
    assert(got.map(_.ids).toSet === Set(
      Seq(1L, 2L), Seq(1L, 2L, 3L), Seq(1L, 2L, 4L), Seq(1L, 2L, 3L, 4L)))
  }

  test("loop-contiguity builder validation: loop-only, mutually exclusive") {
    intercept[IllegalArgumentException](Cep.Pattern.begin("a").followedBy("b").consecutive)
    intercept[IllegalArgumentException](
      Cep.Pattern.begin("a").followedBy("b").allowCombinations)
    intercept[IllegalArgumentException](
      Cep.Pattern.begin("a").oneOrMore.consecutive.allowCombinations)
    intercept[IllegalArgumentException](
      Cep.Pattern.begin("a").oneOrMore.allowCombinations.consecutive)
    // non-consecutive shared-type loop is still rejected at construction
    intercept[IllegalArgumentException](new Cep.NfaProcessor(
      Cep.Pattern.begin("p").oneOrMore.allowCombinations.followedBy("p")))
  }

  test("a partial dropped by maxPartials never reports a timeout (cap wins over select)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pat = Cep.Pattern.begin("a").followedBy("b").within(15000000L)
    // three a-starts inside one within-window, no b: uncapped, all three
    // partials time out at x@60; with cap=2 the oldest (a@10) is
    // cap-dropped when a@14 lands — while still live, well before its
    // deadline — so its deadline must NOT be reported later
    val events = Seq(ev(1, 10, "a"), ev(2, 12, "a"), ev(3, 14, "a"), ev(4, 60, "x"))
    def runCapped(cap: Int): Seq[Cep.Match] = {
      val mem = MemoryStream[KeyedEvent]
      val ds = mem.toDS().withColumn("ts", timestamp_micros(col("tsUs")))
        .withWatermark("ts", "0 seconds").drop("ts").as[KeyedEvent]
      val out = EventTimeOps.ordered(ds, (e: KeyedEvent) => e.key,
        new Cep.NfaProcessor(pat, emitTimeouts = true, maxPartials = cap))
      val name = s"cep_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
      try { mem.addData(events: _*); q.processAllAvailable(); mem.addData(); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[Cep.Match].collect().toSeq
    }
    assert(runCapped(10).filter(_.timedOut).map(_.ids).toSet ===
      Set(Seq(1L), Seq(2L), Seq(3L)))
    assert(runCapped(2).filter(_.timedOut).map(_.ids).toSet ===
      Set(Seq(2L), Seq(3L)))
  }

  test("new-shape validation: until placement, timeout needs within, ambiguous until") {
    // until on a non-loop stage
    intercept[IllegalArgumentException](Cep.Pattern.begin("a").followedBy("b").until("u"))
    // timeout select without a within bound
    intercept[IllegalArgumentException](
      new Cep.NfaProcessor(Cep.Pattern.begin("a").followedBy("b"), emitTimeouts = true))
    // until type shared with the next stage (would both close and exit)
    intercept[IllegalArgumentException](new Cep.NfaProcessor(
      Cep.Pattern.begin("a").oneOrMore.until("b").followedBy("b")))
  }
}
