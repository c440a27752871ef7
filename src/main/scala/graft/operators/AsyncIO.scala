package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

/** Async I/O pattern (reference: flink-streaming-java/.../api/datastream/
  * AsyncDataStream.java — orderedWait/unorderedWait; api/operators/async/
  * AsyncWaitOperator.java): bounded-concurrency asynchronous enrichment
  * inside `mapPartitions`, the documented Spark equivalent. Each partition
  * keeps at most `capacity` requests in flight; `orderedWait` preserves
  * input order (results emitted in submission order), `unorderedWait`
  * emits in completion order within the sliding window.
  */
object AsyncIO {

  /** Ordered variant: results in input order, <= capacity in flight. */
  def orderedWait[I, O: Encoder](ds: Dataset[I], capacity: Int, timeout: Duration)(
      f: I => Future[O]): Dataset[O] =
    ds.mapPartitions { rows =>
      new Iterator[O] {
        private val inFlight = scala.collection.mutable.Queue.empty[Future[O]]
        private def fill(): Unit =
          while (inFlight.size < capacity && rows.hasNext) inFlight.enqueue(f(rows.next()))
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): O = { fill(); Await.result(inFlight.dequeue(), timeout) }
      }
    }

  /** Unordered variant: first-completed-first-emitted within the window. */
  def unorderedWait[I, O: Encoder](ds: Dataset[I], capacity: Int, timeout: Duration)(
      f: I => Future[O]): Dataset[O] =
    ds.mapPartitions { rows =>
      import scala.concurrent.ExecutionContext.Implicits.global
      new Iterator[O] {
        private var inFlight = List.empty[Future[O]]
        private def fill(): Unit =
          while (inFlight.size < capacity && rows.hasNext) inFlight ::= f(rows.next())
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): O = {
          fill()
          var idx = inFlight.indexWhere(_.isCompleted)
          while (idx < 0) {
            Await.ready(Future.firstCompletedOf(inFlight), timeout)
            idx = inFlight.indexWhere(_.isCompleted)
          }
          val done = inFlight(idx).value.get.get
          inFlight = inFlight.patch(idx, Nil, 1)
          done
        }
      }
    }
}
