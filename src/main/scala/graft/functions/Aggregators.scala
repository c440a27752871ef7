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
