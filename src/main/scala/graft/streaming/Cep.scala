package graft.streaming

import graft.streaming.EventTimeOps.OrderedProcessor
import graft.streaming.StatefulOps.KeyedEvent
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** CEP subset (reference: flink-libraries/flink-cep/.../pattern/Pattern.java
  * — begin/next/followedBy/times/oneOrMore/within; nfa/NFA.java — partial
  * match tracking). Patterns compile to a small NFA evaluated per key in
  * event-time order on the ordered stateful processor.
  *
  * Semantics (pinned, deterministic):
  *  - `next` = strict contiguity: the very next event of the key must match.
  *  - `followedBy` = relaxed contiguity with GREEDY FIRST BINDING: each
  *    pending partial match binds the first qualifying event; non-matching
  *    events in between are skipped (no branching — the reference's
  *    skip-till-next-match).
  *  - `times(n)` = n consecutive bindings of the same stage predicate
  *    (contiguity of the stage itself follows the stage's kind).
  *  - `within(d)`: whole match must span <= d; overdue partials are pruned.
  *  - Every event that satisfies stage 0 starts a new partial match, so
  *    overlapping matches with distinct start events are all reported
  *    (reference default NO_SKIP after-match behavior).
  */
object Cep {

  sealed trait Contiguity
  case object Strict extends Contiguity   // next
  case object Relaxed extends Contiguity  // followedBy

  /** One pattern stage: predicate on event_type, repetition count, how it
    * attaches to the previous stage, and negative guards — event types
    * that must NOT occur between the previous binding and this one
    * (notFollowedBy). `unbounded` = oneOrMore (greedy loop), `optional` =
    * the stage may be skipped when the following stage's event arrives
    * first. */
  final case class Stage(eventType: String, times: Int = 1,
                         contiguity: Contiguity = Relaxed,
                         guards: Set[String] = Set.empty,
                         unbounded: Boolean = false,
                         optional: Boolean = false) extends Serializable

  /** Fluent builder mirroring Pattern.begin(...).followedBy(...)
    * .oneOrMore.optional.notFollowedBy(...).within(...). */
  final case class Pattern(stages: Vector[Stage], withinUs: Long = Long.MaxValue,
                           pendingGuards: Set[String] = Set.empty) {
    def next(t: String, times: Int = 1): Pattern =
      copy(stages = stages :+ Stage(t, times, Strict, pendingGuards),
        pendingGuards = Set.empty)
    def followedBy(t: String, times: Int = 1): Pattern =
      copy(stages = stages :+ Stage(t, times, Relaxed, pendingGuards),
        pendingGuards = Set.empty)
    /** The given type must not occur before the NEXT bound stage
      * (reference: Pattern.notFollowedBy; a trailing notFollowedBy with no
      * following stage is rejected, as in the reference). */
    def notFollowedBy(t: String): Pattern = copy(pendingGuards = pendingGuards + t)
    /** The last added stage loops greedily: it absorbs every further event
      * of its type; the next stage's first qualifying event advances the
      * match out of the loop. A final oneOrMore stage emits a match on
      * every absorption, the reference's extend-per-repetition behavior
      * (reference: Pattern.oneOrMore + NFA looping TAKE state). */
    def oneOrMore: Pattern = {
      require(stages.nonEmpty, "oneOrMore needs a stage")
      copy(stages = stages.init :+ stages.last.copy(unbounded = true))
    }
    /** The last added stage may be skipped: if the FOLLOWING stage's event
      * arrives before this stage binds, the match proceeds without it
      * (reference: Pattern.optional). Not allowed on the head stage (a
      * match still needs a concrete start event). */
    def optional: Pattern = {
      require(stages.length >= 2, "optional is not supported on the head stage")
      copy(stages = stages.init :+ stages.last.copy(optional = true))
    }
    def within(us: Long): Pattern = {
      require(pendingGuards.isEmpty, "notFollowedBy must be followed by a bound stage")
      copy(withinUs = us)
    }

    /** Structural constraints the NFA's single-stage lookahead can honor —
      * checked at compile time (NfaProcessor construction) so unsupported
      * shapes fail loudly instead of silently never matching:
      *  - a trailing optional stage would be a no-op (the skip path needs a
      *    following stage), as would consecutive optionals;
      *  - a oneOrMore stage followed by a stage of the SAME event type can
      *    never exit the loop (greedy absorption always wins). */
    private[Cep] def validate(): Unit = {
      require(!stages.last.optional,
        "optional on the final stage is unsupported (no following stage to skip to)")
      stages.sliding(2).foreach { w =>
        if (w.length == 2) {
          require(!(w(0).optional && w(1).optional),
            "consecutive optional stages are unsupported (one stage of lookahead)")
          require(!(w(0).unbounded && w(0).eventType == w(1).eventType),
            s"oneOrMore('${w(0).eventType}') followed by the same type never exits the loop")
          require(!(w(0).unbounded && w(1).optional),
            s"oneOrMore('${w(0).eventType}') followed by an optional stage never takes " +
              "the skip path (exiting the loop requires the optional stage's own type)")
        }
      }
    }
  }

  object Pattern {
    def begin(t: String, times: Int = 1): Pattern =
      Pattern(Vector(Stage(t, times, Relaxed)))
  }

  /** A partial match: stage index, bindings so far, repetition progress. */
  final case class Partial(stage: Int, reps: Int, startTsUs: Long, ids: Seq[Long])

  final case class Match(key: Long, ids: Seq[Long], startTsUs: Long, endTsUs: Long)

  /** NFA over one key's event-time-ordered events. */
  final class NfaProcessor(pattern: Pattern)
      extends OrderedProcessor[Long, KeyedEvent, Match](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {

    pattern.validate()

    @transient private var partials: ValueState[Seq[Partial]] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      partials = h.getValueState[Seq[Partial]]("nfa",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Partial]](),
        TTLConfig.NONE)

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[Match] = {
      val st = pattern.stages
      val cur = if (partials.exists()) partials.get() else Seq.empty
      val out = Seq.newBuilder[Match]
      val next = Seq.newBuilder[Partial]

      /** Bind `e` as a repetition of stage `i`: emits a match and/or leaves
        * a surviving partial. A looping (oneOrMore) stage stays put and, if
        * final, emits per absorption; a bounded stage advances on its last
        * repetition. */
      def bindAt(i: Int, reps0: Int, start: Long, ids: Seq[Long]): Unit = {
        val stage = st(i)
        val ids1 = ids :+ e.eventId
        if (stage.unbounded) {
          if (i == st.length - 1) out += Match(key, ids1, start, e.tsUs)
          next += Partial(i, reps0 + 1, start, ids1)
        } else {
          val reps = reps0 + 1
          if (reps == stage.times) {
            if (i + 1 == st.length) out += Match(key, ids1, start, e.tsUs)
            else next += Partial(i + 1, 0, start, ids1)
          } else next += Partial(i, reps, start, ids1)
        }
      }

      cur.foreach { p =>
        if (e.tsUs - p.startTsUs > pattern.withinUs) () // overdue: prune
        else {
          val stage = st(p.stage)
          if (e.eventType == stage.eventType) {
            bindAt(p.stage, p.reps, p.startTsUs, p.ids)
          } else if (stage.unbounded && p.reps >= 1 && p.stage + 1 < st.length &&
              e.eventType == st(p.stage + 1).eventType) {
            // loop exit: the next stage's first qualifying event advances
            bindAt(p.stage + 1, 0, p.startTsUs, p.ids)
          } else if (stage.optional && p.reps == 0 && p.stage + 1 < st.length &&
              e.eventType == st(p.stage + 1).eventType) {
            // optional skip: following stage's event arrived first
            bindAt(p.stage + 1, 0, p.startTsUs, p.ids)
          } else if (stage.guards.contains(e.eventType)) {
            // negative guard hit between bindings: kill the partial
          } else {
            // the pending binding's contiguity governs whether a gap is
            // allowed: relaxed skips the event, strict drops the partial
            if (stage.contiguity == Relaxed) next += p
          }
        }
      }
      // a head-stage event always starts a fresh partial
      if (e.eventType == st.head.eventType) bindAt(0, 0, e.tsUs, Seq.empty)
      partials.update(next.result())
      out.result().iterator
    }
  }
}
