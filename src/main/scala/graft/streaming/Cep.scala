package graft.streaming

import graft.streaming.EventTimeOps.OrderedProcessor
import graft.streaming.StatefulOps.KeyedEvent
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** CEP subset (reference: flink-libraries/flink-cep/.../pattern/Pattern.java
  * — begin/next/followedBy/followedByAny/times/oneOrMore/until/within;
  * nfa/NFA.java + nfa/SharedBuffer.java — partial-match tracking with
  * branching alternatives). Patterns compile to a small NFA evaluated per
  * key in event-time order on the ordered stateful processor.
  *
  * Semantics (pinned, deterministic):
  *  - `next` = strict contiguity: the very next event of the key must match.
  *  - `followedBy` = relaxed contiguity with GREEDY FIRST BINDING: each
  *    pending partial match binds the first qualifying event; non-matching
  *    events in between are skipped (the reference's skip-till-next-match).
  *  - `followedByAny` = skip-till-ANY-match: each qualifying event both
  *    advances a FORKED copy of the partial AND leaves the original pending,
  *    so every later qualifying event spawns another alternative (the
  *    reference's SharedBuffer branching). Combinatorial by design; `within`
  *    bounds the live branch set.
  *  - `or(t)` widens the LAST added stage to also accept events of type `t`
  *    (the reference's Pattern.or condition disjunction).
  *  - `times(n)` = n consecutive bindings of the same stage predicate
  *    (contiguity of the stage itself follows the stage's kind).
  *  - `times(from, to)` = GREEDY range repetition: the stage absorbs up
  *    to `to` qualifying events; once `from` are bound, the next stage's
  *    first qualifying event advances (deterministic first-binding, not
  *    the reference's all-count branching); a final range stage emits a
  *    match at every count in [from, to].
  *  - `consecutive` (on a oneOrMore stage) = strict INTERNAL contiguity
  *    (reference: Quantifier.consecutive): after the first repetition, a
  *    non-matching event closes the loop; outer contiguity still governs
  *    the gap before the first repetition.
  *  - `allowCombinations` (on a oneOrMore stage) = skip-till-any BETWEEN
  *    repetitions (reference: Quantifier.allowCombinations): each further
  *    qualifying event extends the loop AND forks a skipping branch, so
  *    all repetition subsets containing the first binding are explored.
  *  - `notNext(t)`: the event immediately after the previous binding must
  *    not be of type `t` (reference: Pattern.notNext) — later `t`s are
  *    irrelevant, unlike notFollowedBy's whole-gap guard.
  *  - `where(f)` / `whereIter(f)`: value conditions on the last stage
  *    (reference: SimpleCondition / IterativeCondition); a type-matching
  *    event failing the condition is simply a non-matching event.
  *  - `until(t)` (on a oneOrMore stage): an event of type `t` CLOSES the
  *    loop for every live partial — no further absorption — but the partial
  *    stays pending for the following stage (reference: Pattern.until /
  *    NFA stop state). Partials started after the closing event are
  *    unaffected (each partial evaluates `until` on its own suffix).
  *  - `within(d)`: whole match must span <= d; overdue partials are pruned.
  *    The horizon lives in whatever time domain `tsUs` carries — event time
  *    normally; feed arrival time and the same pattern is the reference's
  *    processing-time (clock-time) `within`, Flink 1.3's time-characteristic
  *    switch expressed as an input choice (spec-pinned in CepSpec).
  *  - timeout select (`new NfaProcessor(pat, emitTimeouts = true)`): a
  *    pruned overdue partial emits a [[Match]] with `timedOut = true`,
  *    `ids` = the events bound so far and `endTsUs` = its deadline
  *    (startTsUs + within) — the reference's PatternStream.select timeout
  *    variant. Detection is LAZY and purely data-driven: the timeout is
  *    reported when the key's next event past the deadline arrives (no
  *    wall-clock end-of-stream flush), which keeps the operator
  *    deterministic and exactly reproducible by a batch oracle.
  *  - Every event that satisfies stage 0 starts a new partial match, so
  *    overlapping matches with distinct start events are all reported
  *    (reference default NO_SKIP after-match behavior).
  */
object Cep {

  sealed trait Contiguity
  case object Strict extends Contiguity      // next
  case object Relaxed extends Contiguity     // followedBy (skip till next match)
  case object RelaxedAny extends Contiguity  // followedByAny (skip till ANY match)

  /** A value condition on a candidate event, with read access to the
    * valueMillis of the events the partial has bound so far (oldest first)
    * — the reference's IterativeCondition (flink-cep/.../pattern/
    * conditions/IterativeCondition.java); a SimpleCondition is the special
    * case ignoring the bindings. Must be deterministic and serializable
    * (plain Scala closures are). */
  type IterCond = (KeyedEvent, Seq[Long]) => Boolean

  /** One pattern stage: accepted event types (>1 via `or`), an optional
    * value condition (where/whereIter), repetition count, how it attaches
    * to the previous stage, negative guards — event types that must NOT
    * occur between the previous binding and this one (notFollowedBy) —
    * and, for unbounded loops, the `until` stop types. `unbounded` =
    * oneOrMore (greedy loop), `optional` = the stage may be skipped when
    * the following stage's event arrives first. */
  final case class Stage(types: Set[String], times: Int = 1,
                         contiguity: Contiguity = Relaxed,
                         guards: Set[String] = Set.empty,
                         unbounded: Boolean = false,
                         optional: Boolean = false,
                         untilTypes: Set[String] = Set.empty,
                         cond: Option[IterCond] = None,
                         timesTo: Int = 0,
                         strictGuards: Set[String] = Set.empty,
                         loopStrict: Boolean = false,
                         loopAny: Boolean = false) extends Serializable {
    def matches(t: String): Boolean = types.contains(t)
    /** Full acceptance test: event type AND the value condition evaluated
      * against the partial's bound values (empty at a head-stage bind). */
    def accepts(e: KeyedEvent, boundVals: Seq[Long]): Boolean =
      types.contains(e.eventType) && cond.forall(_(e, boundVals))
    /** Upper repetition bound: `timesTo` when a times(from, to) range was
      * declared, else the fixed `times`. */
    def timesMax: Int = if (timesTo > 0) timesTo else times
    def label: String = types.mkString("|")
  }

  /** Fluent builder mirroring Pattern.begin(...).followedBy(...)
    * .oneOrMore.until(...).optional.notFollowedBy(...).within(...). */
  final case class Pattern(stages: Vector[Stage], withinUs: Long = Long.MaxValue,
                           pendingGuards: Set[String] = Set.empty,
                           pendingStrictGuards: Set[String] = Set.empty) {
    def next(t: String, times: Int = 1): Pattern =
      copy(stages = stages :+ Stage(Set(t), times, Strict, pendingGuards,
        strictGuards = pendingStrictGuards),
        pendingGuards = Set.empty, pendingStrictGuards = Set.empty)
    def followedBy(t: String, times: Int = 1): Pattern =
      copy(stages = stages :+ Stage(Set(t), times, Relaxed, pendingGuards,
        strictGuards = pendingStrictGuards),
        pendingGuards = Set.empty, pendingStrictGuards = Set.empty)
    /** Skip-till-any-match: the stage binds EVERY qualifying event, not just
      * the first — the partial forks per binding (reference:
      * Pattern.followedByAny). */
    def followedByAny(t: String, times: Int = 1): Pattern =
      copy(stages = stages :+ Stage(Set(t), times, RelaxedAny, pendingGuards,
        strictGuards = pendingStrictGuards),
        pendingGuards = Set.empty, pendingStrictGuards = Set.empty)
    /** Range repetition on the LAST added stage (reference:
      * Pattern.times(from, to)): the stage binds between `from` and `to`
      * consecutive repetitions, GREEDILY — it keeps absorbing qualifying
      * events up to `to`; once at least `from` are bound, the next
      * stage's first qualifying event advances the match out (the same
      * deterministic first-binding family as followedBy, not the
      * reference's all-count branching). A final range stage emits a
      * match at EVERY count in [from, to] (the per-absorption behavior a
      * final oneOrMore has). */
    def times(from: Int, to: Int): Pattern = {
      require(stages.nonEmpty, "times needs a stage")
      require(from >= 1 && to >= from, s"need 1 <= from <= to, got ($from, $to)")
      require(!stages.last.unbounded, "times(from, to) conflicts with oneOrMore")
      copy(stages = stages.init :+ stages.last.copy(times = from, timesTo = to))
    }
    /** The LAST added stage also accepts events of type `t` (reference:
      * Pattern.or — condition disjunction on one stage). */
    def or(t: String): Pattern = {
      require(stages.nonEmpty, "or needs a stage")
      require(pendingGuards.isEmpty && pendingStrictGuards.isEmpty,
        "or widens the last bound stage; it cannot follow a dangling notFollowedBy/notNext")
      copy(stages = stages.init :+ stages.last.copy(types = stages.last.types + t))
    }
    /** Value condition on the LAST added stage (reference: Pattern.where +
      * SimpleCondition — a predicate on the candidate event alone). A
      * type-matching event that fails the condition is simply a
      * non-matching event: relaxed contiguity skips it, strict drops the
      * partial. Repeated `where` calls AND-compose, as in the reference. */
    def where(f: KeyedEvent => Boolean): Pattern =
      whereIter((e, _) => f(e))
    /** Value condition with access to the partial's bound values so far
      * (valueMillis, oldest first — the head binding is `vals.head`):
      * the reference's IterativeCondition, e.g. "this purchase is larger
      * than the first one bound". AND-composes with prior conditions. */
    def whereIter(f: IterCond): Pattern = {
      require(stages.nonEmpty, "where needs a stage")
      require(pendingGuards.isEmpty && pendingStrictGuards.isEmpty,
        "where conditions the last bound stage; it cannot follow a dangling notFollowedBy/notNext")
      val last = stages.last
      val merged: IterCond = last.cond match {
        case Some(g) => (e, vs) => g(e, vs) && f(e, vs)
        case None => f
      }
      copy(stages = stages.init :+ last.copy(cond = Some(merged)))
    }
    /** The given type must not occur before the NEXT bound stage
      * (reference: Pattern.notFollowedBy; a trailing notFollowedBy with no
      * following stage is rejected, as in the reference). */
    def notFollowedBy(t: String): Pattern = copy(pendingGuards = pendingGuards + t)
    /** The event IMMEDIATELY after the previous binding must not be of
      * type `t` (reference: Pattern.notNext — the strict-contiguity
      * negative pattern). Later occurrences of `t` are irrelevant,
      * unlike notFollowedBy's whole-gap guard. */
    def notNext(t: String): Pattern = copy(pendingStrictGuards = pendingStrictGuards + t)
    /** The last added stage loops greedily: it absorbs every further event
      * of its type; the next stage's first qualifying event advances the
      * match out of the loop. A final oneOrMore stage emits a match on
      * every absorption, the reference's extend-per-repetition behavior
      * (reference: Pattern.oneOrMore + NFA looping TAKE state). */
    def oneOrMore: Pattern = {
      require(stages.nonEmpty, "oneOrMore needs a stage")
      copy(stages = stages.init :+ stages.last.copy(unbounded = true))
    }
    /** Internal STRICT contiguity for the last (oneOrMore) stage
      * (reference: Quantifier.consecutive, the 1.3 looping-contiguity
      * modifier): once the loop has bound its first repetition, the first
      * event that neither repeats the loop nor advances to the next stage
      * CLOSES the loop — no further absorption; the partial stays pending
      * for the following stage (or dies when the loop is final). The gap
      * BEFORE the first repetition still follows the stage's outer
      * contiguity, as in the reference. */
    def consecutive: Pattern = {
      require(stages.nonEmpty && stages.last.unbounded,
        "consecutive applies to a oneOrMore stage")
      require(!stages.last.loopAny,
        "consecutive conflicts with allowCombinations on the same stage")
      copy(stages = stages.init :+ stages.last.copy(loopStrict = true))
    }
    /** Non-deterministic internal contiguity for the last (oneOrMore)
      * stage (reference: Quantifier.allowCombinations — skip-till-any
      * BETWEEN repetitions): after the first repetition binds (outer
      * contiguity unchanged: followedBy still binds the FIRST qualifying
      * event), every further qualifying event both extends the loop and
      * forks a branch that skips it, so all order-preserving repetition
      * subsets containing the first binding are explored. Combinatorial by
      * design; `within` (and the NfaProcessor `maxPartials` valve) bound
      * the live branch set. */
    def allowCombinations: Pattern = {
      require(stages.nonEmpty && stages.last.unbounded,
        "allowCombinations applies to a oneOrMore stage")
      require(!stages.last.loopStrict,
        "allowCombinations conflicts with consecutive on the same stage")
      copy(stages = stages.init :+ stages.last.copy(loopAny = true))
    }
    /** Stop condition for the last (oneOrMore) stage: an event of type `t`
      * closes the loop — no further absorption — while the partial stays
      * pending for the following stage (reference: Pattern.until). */
    def until(t: String): Pattern = {
      require(stages.nonEmpty && stages.last.unbounded,
        "until applies to a oneOrMore stage")
      require(!stages.last.types.contains(t),
        s"until('$t') conflicts with the loop's own event type")
      copy(stages = stages.init :+
        stages.last.copy(untilTypes = stages.last.untilTypes + t))
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
      require(pendingGuards.isEmpty && pendingStrictGuards.isEmpty,
        "notFollowedBy/notNext must be followed by a bound stage")
      copy(withinUs = us)
    }

    /** Structural constraints the NFA's single-stage lookahead can honor —
      * checked at compile time (NfaProcessor construction) so unsupported
      * shapes fail loudly instead of silently never matching:
      *  - a trailing optional stage would be a no-op (the skip path needs a
      *    following stage), as would consecutive optionals;
      *  - a oneOrMore stage followed by a stage sharing an event type can
      *    never exit the loop on that type (greedy absorption always wins);
      *  - an until type that the NEXT stage also accepts is ambiguous (the
      *    event would both close the loop and exit it). */
    private[Cep] def validate(): Unit = {
      require(!stages.last.optional,
        "optional on the final stage is unsupported (no following stage to skip to)")
      stages.foreach { s =>
        require((s.strictGuards intersect s.types).isEmpty,
          s"notNext type also accepted by stage '${s.label}' is ambiguous " +
            "(the immediate event would both bind and kill)")
      }
      stages.sliding(2).foreach { w =>
        if (w.length == 2) {
          require(!(w(0).optional && w(1).optional),
            "consecutive optional stages are unsupported (one stage of lookahead)")
          // with value conditions the overlap CAN be escapable (the loop's
          // cond rejects what the next stage's cond accepts), and a
          // consecutive loop closes on the first gap after which a shared
          // type CAN exit — so only the cond-free non-consecutive case is
          // provably stuck
          require((w(0).types intersect w(1).types).isEmpty || !w(0).unbounded ||
              w(0).cond.isDefined || w(1).cond.isDefined || w(0).loopStrict,
            s"oneOrMore('${w(0).label}') followed by a shared type never exits the loop")
          require(!(w(0).unbounded && w(1).optional),
            s"oneOrMore('${w(0).label}') followed by an optional stage never takes " +
              "the skip path (exiting the loop requires the optional stage's own type)")
          require((w(0).untilTypes intersect w(1).types).isEmpty,
            s"until type shared with the next stage ('${w(1).label}') is ambiguous")
        }
      }
    }
  }

  object Pattern {
    def begin(t: String, times: Int = 1): Pattern =
      Pattern(Vector(Stage(Set(t), times, Relaxed)))
  }

  /** A partial match: stage index, bindings so far (ids + their
    * valueMillis — `vals` is populated only when some stage carries a
    * value condition, to keep conditionless patterns' state lean),
    * repetition progress; `loopClosed` = an `until` event stopped this
    * partial's oneOrMore loop; `gapSeen` = at least one event arrived
    * since the last binding (arms/disarms the notNext strict guard). */
  final case class Partial(stage: Int, reps: Int, startTsUs: Long, ids: Seq[Long],
                           loopClosed: Boolean = false,
                           vals: Seq[Long] = Seq.empty,
                           gapSeen: Boolean = false)

  /** A completed match, or — when the processor runs with
    * `emitTimeouts = true` — a timed-out partial (`timedOut = true`,
    * `ids` = events bound before the deadline, `endTsUs` = the deadline). */
  final case class Match(key: Long, ids: Seq[Long], startTsUs: Long, endTsUs: Long,
                         timedOut: Boolean = false)

  /** NFA over one key's event-time-ordered events.
    *
    * `maxPartials` caps the per-key live partial set (reference analogue:
    * the SharedBuffer's bounded after-match pruning): `followedByAny`
    * forks a branch per qualifying event, so without a cap a hostile key
    * could grow state up to its event count inside the `within` horizon.
    * When the cap is hit, the OLDEST-start partials are dropped first
    * (deterministically; ties keep the earlier-built branch) — newest
    * starts are the ones still able to complete, so this is the
    * least-lossy deterministic policy. Matches below the cap are
    * unchanged (CepSpec pins both properties). */
  final class NfaProcessor(pattern: Pattern, emitTimeouts: Boolean = false,
                           maxPartials: Int = Int.MaxValue)
      extends OrderedProcessor[Long, KeyedEvent, Match](
        KeyedEvent.orderKey, Encoders.product[KeyedEvent]) {

    pattern.validate()
    require(!emitTimeouts || pattern.withinUs != Long.MaxValue,
      "timeout select requires a within() bound")
    require(maxPartials >= 1, s"maxPartials must be >= 1, got $maxPartials")

    /** Bound values are only carried in state when some stage's condition
      * can read them — conditionless patterns keep partial state lean. */
    private val needVals = pattern.stages.exists(_.cond.isDefined)

    @transient private var partials: ValueState[Seq[Partial]] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      partials = h.getValueState[Seq[Partial]]("nfa",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Partial]](),
        TTLConfig.NONE)

    override protected def onOrdered(key: Long, e: KeyedEvent): Iterator[Match] = {
      val cur = if (partials.exists()) partials.get() else Seq.empty
      val (kept, out) = Nfa.step(pattern, cur, key, e, emitTimeouts, maxPartials, needVals)
      partials.update(kept)
      out.iterator
    }
  }

  /** The pure per-event NFA transition — (partial set, event) → (new
    * partial set, emitted matches). Factored out of [[NfaProcessor]] so it
    * is directly testable without a streaming harness (CepFuzzSpec runs a
    * randomized differential check against an independent brute-force
    * matcher); the processor is a thin per-key state wrapper around it. */
  private[graft] object Nfa {
    def step(pattern: Pattern, cur: Seq[Partial], key: Long, e: KeyedEvent,
             emitTimeouts: Boolean, maxPartials: Int,
             needVals: Boolean): (Seq[Partial], Seq[Match]) = {
      val st = pattern.stages
      val out = Seq.newBuilder[Match]
      val next = Seq.newBuilder[Partial]

      /** Bind `e` as a repetition of stage `i`: emits a match and/or leaves
        * a surviving partial. A looping (oneOrMore) stage stays put and, if
        * final, emits per absorption; a bounded stage advances on its last
        * repetition. Advancing to a new stage resets `loopClosed`. */
      def bindAt(i: Int, reps0: Int, start: Long, ids: Seq[Long],
                 vals: Seq[Long]): Unit = {
        val stage = st(i)
        val ids1 = ids :+ e.eventId
        val vals1 = if (needVals) vals :+ e.valueMillis else vals
        if (stage.unbounded) {
          if (i == st.length - 1) out += Match(key, ids1, start, e.tsUs)
          next += Partial(i, reps0 + 1, start, ids1, vals = vals1)
        } else {
          val reps = reps0 + 1
          if (i + 1 == st.length) {
            // final stage: emit once the minimum count is reached; a
            // times(from, to) range keeps absorbing — and emitting per
            // count — until the max (fixed times is from == to)
            if (reps >= stage.times) out += Match(key, ids1, start, e.tsUs)
            if (reps < stage.timesMax) next += Partial(i, reps, start, ids1, vals = vals1)
          } else {
            if (reps == stage.timesMax) next += Partial(i + 1, 0, start, ids1, vals = vals1)
            else next += Partial(i, reps, start, ids1, vals = vals1)
          }
        }
      }

      cur.foreach { p =>
        if (e.tsUs - p.startTsUs > pattern.withinUs) {
          // overdue: prune; under timeout select, report the dead partial
          if (emitTimeouts)
            out += Match(key, p.ids, p.startTsUs,
              p.startTsUs + pattern.withinUs, timedOut = true)
        } else {
          val stage = st(p.stage)
          val nextStage = if (p.stage + 1 < st.length) Some(st(p.stage + 1)) else None
          if (!p.gapSeen && p.reps == 0 && stage.strictGuards.contains(e.eventType)) {
            // notNext violated: the immediate successor of the previous
            // binding is a prohibited type — kill the partial (wins over
            // any other use of the event; the declared constraint is
            // already broken)
          } else if (stage.accepts(e, p.vals) && !(stage.unbounded && p.loopClosed)) {
            bindAt(p.stage, p.reps, p.startTsUs, p.ids, p.vals)
            // skip-till-any: the un-advanced partial survives to bind a
            // later qualifying event too (SharedBuffer fork). The same
            // fork applies BETWEEN loop repetitions under
            // allowCombinations (internal skip-till-any — the branch that
            // skips this absorption explores the other repetition subsets).
            if (stage.contiguity == RelaxedAny ||
                (stage.unbounded && stage.loopAny && p.reps >= 1))
              next += p.copy(gapSeen = true)
          } else if (stage.unbounded && p.reps >= 1 &&
              nextStage.exists(_.accepts(e, p.vals))) {
            // loop exit: the next stage's first qualifying event advances
            bindAt(p.stage + 1, 0, p.startTsUs, p.ids, p.vals)
            if (nextStage.get.contiguity == RelaxedAny) next += p.copy(gapSeen = true)
          } else if (!stage.unbounded && stage.timesTo > 0 && p.reps >= stage.times &&
              nextStage.exists(_.accepts(e, p.vals))) {
            // times(from, to) early exit: at least `from` repetitions are
            // bound, the next stage's first qualifying event advances
            bindAt(p.stage + 1, 0, p.startTsUs, p.ids, p.vals)
            if (nextStage.get.contiguity == RelaxedAny) next += p.copy(gapSeen = true)
          } else if (stage.optional && p.reps == 0 &&
              nextStage.exists(_.accepts(e, p.vals))) {
            // optional skip: following stage's event arrived first
            bindAt(p.stage + 1, 0, p.startTsUs, p.ids, p.vals)
            if (nextStage.get.contiguity == RelaxedAny) next += p.copy(gapSeen = true)
          } else if (stage.guards.contains(e.eventType)) {
            // negative guard hit between bindings: kill the partial
          } else if (stage.unbounded && stage.untilTypes.contains(e.eventType)) {
            // until: the loop stops absorbing; the partial survives only if
            // a later stage can still complete the match
            if (p.stage + 1 < st.length) next += p.copy(loopClosed = true, gapSeen = true)
          } else if (stage.unbounded && stage.loopStrict && p.reps >= 1) {
            // consecutive: a non-matching event after the first repetition
            // closes the loop — no further absorption; the partial
            // survives only if a later stage can still complete the match
            if (p.stage + 1 < st.length) next += p.copy(loopClosed = true, gapSeen = true)
          } else {
            // the pending binding's contiguity governs whether a gap is
            // allowed: relaxed (either kind) skips the event, strict drops
            // the partial (a type-matching event that merely FAILS the
            // stage's value condition lands here too — it is just a
            // non-matching event, the reference's condition semantics)
            if (stage.contiguity != Strict) next += p.copy(gapSeen = true)
          }
        }
      }
      // a head-stage event always starts a fresh partial
      if (st.head.accepts(e, Seq.empty)) bindAt(0, 0, e.tsUs, Seq.empty, Seq.empty)
      val all = next.result()
      val kept =
        if (all.size <= maxPartials) all
        else {
          // oldest-start first, ties earliest-built: drop indices are a
          // pure function of the (deterministic) partial set
          val drop = all.zipWithIndex
            .sortBy { case (p, i) => (p.startTsUs, i) }
            .take(all.size - maxPartials).map(_._2).toSet
          all.zipWithIndex.collect { case (p, i) if !drop.contains(i) => p }
        }
      (kept, out.result())
    }
  }
}
