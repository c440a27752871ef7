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
    * (notFollowedBy). */
  final case class Stage(eventType: String, times: Int = 1,
                         contiguity: Contiguity = Relaxed,
                         guards: Set[String] = Set.empty) extends Serializable

  /** Fluent builder mirroring Pattern.begin(...).followedBy(...)
    * .notFollowedBy(...).within(...). */
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
    def within(us: Long): Pattern = {
      require(pendingGuards.isEmpty, "notFollowedBy must be followed by a bound stage")
      copy(withinUs = us)
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

      cur.foreach { p =>
        if (e.tsUs - p.startTsUs > pattern.withinUs) () // overdue: prune
        else {
          val stage = st(p.stage)
          val matches = e.eventType == stage.eventType
          if (matches) {
            val reps = p.reps + 1
            val advanced =
              if (reps == stage.times) Partial(p.stage + 1, 0, p.startTsUs, p.ids :+ e.eventId)
              else p.copy(reps = reps, ids = p.ids :+ e.eventId)
            if (advanced.stage == st.length) out += Match(key, advanced.ids, p.startTsUs, e.tsUs)
            else next += advanced
          } else if (st(p.stage).guards.contains(e.eventType)) {
            // negative guard hit between bindings: kill the partial
          } else {
            // the pending binding's contiguity governs whether a gap is
            // allowed: relaxed skips the event, strict drops the partial
            if (st(p.stage).contiguity == Relaxed) next += p
          }
        }
      }
      // a head-stage event always starts a fresh partial
      if (e.eventType == st.head.eventType) {
        if (st.head.times == 1) {
          if (st.length == 1) out += Match(key, Seq(e.eventId), e.tsUs, e.tsUs)
          else next += Partial(1, 0, e.tsUs, Seq(e.eventId))
        } else next += Partial(0, 1, e.tsUs, Seq(e.eventId))
      }
      partials.update(next.result())
      out.result().iterator
    }
  }
}
