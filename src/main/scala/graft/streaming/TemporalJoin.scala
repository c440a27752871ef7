package graft.streaming

import graft.streaming.CoProcess.Tagged
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming temporal (as-of) join: enrich each probe-side row with the
  * most recent build-side row at-or-before its event time, per key — the
  * streaming sibling of [[graft.operators.AsOfJoin.backward]] and the
  * stream-native form of point-in-time feature lookup (probe = example
  * stream, build = versioned feature stream).
  *
  * Built on the event-time-ordered drain: both sides union into one keyed
  * processor; the order key puts build rows BEFORE probe rows at equal
  * timestamps (inclusive as-of bound) and orders same-(ts, side) rows by
  * event id, so the retained build state is always the (max ts, max id)
  * version — byte-identical semantics to the batch operator, which is what
  * the oracle checks.
  *
  * State per key is ONE tuple (the current build version) — O(keys) total,
  * no buffer growth with stream length; the ordered-drain buffer holds only
  * rows inside the watermark delay. (The reference engine class had no
  * temporal join in 1.3; it arrived upstream in 1.7 as "temporal table
  * joins" — flink-table TemporalRowtimeJoin keeps exactly this
  * latest-version-per-key state.)
  */
object TemporalJoin {

  /** Probe row enriched with the as-of build version (None = no version
    * at-or-before the probe time). */
  case class Enriched(key: Long, probeId: Long, tsUs: Long,
                      buildId: Option[Long], buildTsUs: Option[Long],
                      buildValueMillis: Option[Long])

  /** Build rows first at equal ts (side 0 = build, 1 = probe), then by id:
    * the OrderKey-contract-unique tie is (side, eventId) packed — side in
    * bit 62. Ids must fit below it; enforced loudly, because a masked
    * overflow would silently overwrite a buffered row (MapState identity). */
  private val orderKey: EventTimeOps.OrderKey[Tagged] = { t =>
    require(t.eventId >= 0 && t.eventId < (1L << 62),
      s"eventId ${t.eventId} outside [0, 2^62) — tie packing would collide")
    (t.tsUs / 1000, t.tsUs, (t.side.toLong << 62) | t.eventId)
  }

  final class Processor
      extends EventTimeOps.OrderedProcessor[Long, Tagged, Enriched](
        orderKey, Encoders.product[Tagged]) {
    @transient private var version: ValueState[(Long, Long, Long)] = _

    override protected def openState(h: StatefulProcessorHandle): Unit =
      version = h.getValueState[(Long, Long, Long)]("graft_asof_version",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override protected def onOrdered(key: Long, e: Tagged): Iterator[Enriched] =
      if (e.side == 0) { // build: advance the key's current version
        version.update((e.tsUs, e.eventId, e.valueMillis))
        Iterator.empty
      } else {
        val v = if (version.exists()) Some(version.get()) else None
        Iterator.single(Enriched(key, e.eventId, e.tsUs,
          v.map(_._2), v.map(_._1), v.map(_._3)))
      }
  }

  /** Join: each `probe` row enriched with the latest `build` row
    * at-or-before it (inclusive), per key. */
  def asof(build: Dataset[Tagged], probe: Dataset[Tagged]): Dataset[Enriched] = {
    implicit val enc: Encoder[Enriched] = Encoders.product[Enriched]
    import build.sparkSession.implicits._
    EventTimeOps.ordered(
      build.map(_.copy(side = 0)).union(probe.map(_.copy(side = 1))),
      (t: Tagged) => t.key, new Processor)
  }
}
