package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-defined aggregate surface (reference: flink-libraries/flink-table/
  * .../functions/AggregateFunction.scala — createAccumulator/accumulate/
  * merge/getValue, and flink-core/.../api/common/functions/
  * AggregateFunction.java for incremental window aggregation). Spark's
  * `Aggregator[IN, BUF, OUT]` is the 1:1 mapping: zero/reduce/merge/finish.
  * Registered via `functions.udaf` they run as codegen'd typed-imperative
  * aggregates with map-side partial aggregation.
  *
  * Exact integer arithmetic (cents/weights) so results are reproducible
  * bit-for-bit by an external oracle.
  */
object Aggregators {

  /** Mergeable Misra-Gries heavy-hitter summary with `k` counters (public
    * algorithm: Misra & Gries 1982; mergeability per Agarwal et al.,
    * "Mergeable Summaries", PODS 2012). Buffer is AT MOST k (key, count)
    * entries regardless of stream length — the bounded-state property
    * that lets it ride a streaming windowed aggregate.
    *
    * reduce: increment the key, or insert when there is room, else
    * decrement every counter (dropping zeros) — the arriving key is
    * absorbed by the decrement. merge: sum both maps, then subtract the
    * (k+1)-th largest count and drop non-positives. Either path
    * undercounts any key by at most N/(k+1) (N = items aggregated), so
    * every key with true count > N/(k+1) is GUARANTEED present in the
    * output — the exact-verification contract the qdy gate leans on. The
    * surviving ESTIMATES depend on arrival/merge order (inherent to MG);
    * only the guaranteed-superset property is deterministic, so callers
    * must re-count candidates exactly before reporting. */
  final case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < k => b.updated(key, 1L)
        case None => b.flatMap { case (s, c) =>
          if (c > 1) Some(s -> (c - 1)) else None
        }
      }
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (m, (s, c)) =>
        m.updated(s, m.getOrElse(s, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (s, c) => if (c > d) Some(s -> (c - d)) else None }
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Weighted average over (valueCents, weight), exact integer division —
    * the canonical UDAGG example. Returns cents. */
  object WeightedAvgCents extends Aggregator[(Long, Long), (Long, Long), Long] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): Long = if (b._2 == 0) 0L else Math.floorDiv(b._1, b._2)
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Count of strictly-increasing steps in (ts, valueMillis) sequences —
    * an order-insensitive-merge UDAGG is impossible for this, so it
    * aggregates the full sorted list; used to exercise a non-trivial
    * buffer shape (growing collection), like the reference's
    * CollectAggFunction. */
  object SortedValues extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {
    def zero: Seq[(Long, Long)] = Seq.empty
    def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = b :+ a
    def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] = x ++ y
    def finish(b: Seq[(Long, Long)]): Seq[Long] = b.sorted.map(_._2)
    def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
