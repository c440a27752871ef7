package graft

import graft.streaming.Cep
import graft.streaming.Cep.{Match, Partial, Pattern, Stage}
import graft.streaming.StatefulOps.KeyedEvent
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential test of the pure NFA transition (Cep.Nfa.step)
  * against an INDEPENDENT brute-force matcher written straight from the
  * reference semantics (flink-cep Pattern javadoc), not from the NFA code:
  * for every head-stage event, walk forward binding each following stage's
  * first qualifying event (greedy first binding), killing on guards /
  * strict-contiguity violations / the within bound.
  *
  * The grammar covers the deterministic single-alternative subset —
  * begin + followedBy/next chains with where/whereIter conditions,
  * notFollowedBy and notNext guards, and within. The branching constructs
  * (followedByAny, oneOrMore, times ranges, optional) have their pinned
  * semantics covered example-by-example in CepSpec; here the goal is
  * volume — thousands of random event interleavings hunting for state
  * machine edge cases (guard arming, condition fall-through, pruning).
  */
class CepFuzzSpec extends AnyFunSuite {

  private def runNfa(pat: Pattern, events: Seq[KeyedEvent]): Set[(Seq[Long], Long, Long)] = {
    // the generator only produces validate()-clean shapes (no guard/type
    // overlap, no trailing optional), mirroring NfaProcessor's gate
    var partials: Seq[Partial] = Seq.empty
    val out = Seq.newBuilder[Match]
    events.foreach { e =>
      val (next, ms) = Cep.Nfa.step(pat, partials, 1L, e,
        emitTimeouts = false, maxPartials = Int.MaxValue,
        needVals = pat.stages.exists(_.cond.isDefined))
      partials = next
      out ++= ms
    }
    out.result().map(m => (m.ids, m.startTsUs, m.endTsUs)).toSet
  }

  /** Brute force: one greedy walk per head-stage event. Stages are all
    * times=1 in the generated grammar, so the walk is a simple cursor. */
  private def brute(pat: Pattern, events: IndexedSeq[KeyedEvent]): Set[(Seq[Long], Long, Long)] = {
    val st = pat.stages
    val res = Set.newBuilder[(Seq[Long], Long, Long)]
    for (i <- events.indices if st.head.accepts(events(i), Seq.empty)) {
      val start = events(i).tsUs
      var ids = Vector(events(i).eventId)
      var vals = Vector(events(i).valueMillis)
      var s = 1
      var lastBind = i
      var dead = false
      var j = i + 1
      while (!dead && s < st.length && j < events.length) {
        val e = events(j)
        if (e.tsUs - start > pat.withinUs) dead = true
        else {
          val stage = st(s)
          if (j == lastBind + 1 && stage.strictGuards.contains(e.eventType)) dead = true
          else if (stage.accepts(e, vals)) {
            ids :+= e.eventId; vals :+= e.valueMillis; lastBind = j; s += 1
          } else if (stage.guards.contains(e.eventType)) dead = true
          else if (stage.contiguity == Cep.Strict) dead = true
          j += 1
        }
      }
      if (!dead && s == st.length)
        res += ((ids, start, events(lastBind).tsUs))
    }
    res.result()
  }

  /** Closed-form reference for head→loop(oneOrMore)→tail patterns under
    * the three internal-contiguity modes, written from the reference
    * quantifier semantics (Quantifier.consecutive / allowCombinations +
    * this repo's pinned greedy default), independent of the NFA code:
    *  - default: absorb every loop-type event from the first one on,
    *    skipping others; the first tail event after >=1 repetition exits.
    *  - consecutive: absorb the maximal CONTIGUOUS run starting at the
    *    first loop event; the first non-loop event closes absorption (and
    *    exits directly when it is the tail type).
    *  - combinations: the first loop event is always bound; every subset
    *    of the loop events strictly between it and the first tail event
    *    joins it (order preserved).
    */
  private def bruteLoop(mode: String, h: String, l: String, t: String,
                        withinUs: Long,
                        events: IndexedSeq[KeyedEvent]): Set[(Seq[Long], Long, Long)] = {
    val res = Set.newBuilder[(Seq[Long], Long, Long)]
    for (i <- events.indices if events(i).eventType == h) {
      val start = events(i).tsUs
      val jOpt = (i + 1 until events.length).find(events(_).eventType == l)
      jOpt.foreach { j =>
        val tailOpt = (j + 1 until events.length).find(events(_).eventType == t)
        tailOpt.foreach { k =>
          val tail = events(k)
          if (tail.tsUs - start <= withinUs) {
            val mids = (j + 1 until k).filter(events(_).eventType == l)
            mode match {
              case "default" =>
                res += ((events(i).eventId +: (j +: mids).map(events(_).eventId)
                  :+ tail.eventId, start, tail.tsUs))
              case "consecutive" =>
                // maximal contiguous run at j; events between run end and
                // the tail must not re-open the loop
                var end = j
                while (end + 1 < k && events(end + 1).eventType == l) end += 1
                res += ((events(i).eventId +: (j to end).map(events(_).eventId)
                  :+ tail.eventId, start, tail.tsUs))
              case "combinations" =>
                mids.toSet.subsets().foreach { s =>
                  res += ((events(i).eventId +: (j +: mids.filter(s)).map(events(_).eventId)
                    :+ tail.eventId, start, tail.tsUs))
                }
            }
          }
        }
      }
    }
    res.result()
  }

  test("loop NFA matches the closed-form reference on 1500 random streams x 3 modes") {
    val rnd = new scala.util.Random(20260814L)
    val types = Vector("a", "b", "c", "x")
    for (trial <- 1 to 1500; mode <- Seq("default", "consecutive", "combinations")) {
      val Seq(h, l, t) = rnd.shuffle(types.toList).take(3)
      val base = Pattern.begin(h).followedBy(l).oneOrMore
      val modded = mode match {
        case "default" => base
        case "consecutive" => base.consecutive
        case "combinations" => base.allowCombinations
      }
      val within = if (rnd.nextBoolean()) 12L * 1000000L else Long.MaxValue
      val pat = modded.followedBy(t).within(within)
      val events = (0 until 25).map { k =>
        KeyedEvent(1L, k + 1L, (k + 1L) * 1000000L,
          types(rnd.nextInt(types.length)), 0L)
      }
      val got = runNfa(pat, events)
      val want = bruteLoop(mode, h, l, t, within, events)
      assert(got === want,
        s"trial $trial mode=$mode $h->$l+->$t within=$within diverged")
    }
  }

  test("NFA matches the brute-force reference on 3000 random pattern/stream pairs") {
    val rnd = new scala.util.Random(20260813L)
    val types = Vector("a", "b", "c", "d")
    var checked = 0
    for (trial <- 1 to 3000) {
      // random pattern: 2-4 stages over a small alphabet
      val nStages = 2 + rnd.nextInt(3)
      val head = Stage(Set(types(rnd.nextInt(types.length))))
      var stages = Vector(head)
      for (_ <- 2 to nStages) {
        val t = types(rnd.nextInt(types.length))
        val contig = if (rnd.nextInt(4) == 0) Cep.Strict else Cep.Relaxed
        // negative guards never overlap the stage's own accept type
        val guards: Set[String] =
          if (rnd.nextInt(5) == 0) Set(types(rnd.nextInt(types.length))) - t
          else Set.empty
        val strictGuards: Set[String] =
          if (rnd.nextInt(5) == 0) Set(types(rnd.nextInt(types.length))) - t
          else Set.empty
        val cond: Option[Cep.IterCond] = rnd.nextInt(3) match {
          case 0 => val thr = rnd.nextInt(100).toLong
            Some((e, _) => e.valueMillis > thr) // SimpleCondition
          case 1 => Some((e, vs) => e.valueMillis > vs.head) // IterativeCondition
          case _ => None
        }
        stages :+= Stage(Set(t), contiguity = contig, guards = guards,
          strictGuards = strictGuards, cond = cond)
      }
      val within = rnd.nextInt(3) match {
        case 0 => 5L * 1000000L
        case 1 => 20L * 1000000L
        case _ => Long.MaxValue
      }
      val pat = Pattern(stages, withinUs = within)
      // random single-key stream: strictly increasing timestamps
      val events = (0 until 40).map { k =>
        KeyedEvent(1L, k + 1L, (k + 1L) * 1000000L,
          types(rnd.nextInt(types.length)), rnd.nextInt(100).toLong)
      }
      val got = runNfa(pat, events)
      val want = brute(pat, events)
      assert(got === want,
        s"trial $trial diverged: pattern=${stages.map(_.label).mkString("->")} within=$within")
      checked += 1
    }
    assert(checked === 3000)
  }
}
