package graft

import graft.operators.{AsyncIO, SideOutputs}
import org.apache.spark.sql.functions._
import scala.concurrent.Future
import scala.concurrent.duration._

/** Async I/O, side-output demux, and observe()-metrics patterns. */
class OpsPatternsSpec extends SparkSpec {
  import spark.implicits._

  test("AsyncIO.orderedWait preserves input order with bounded concurrency") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val ds = (1 to 100).toDS().repartition(2)
    val out = AsyncIO.orderedWait(ds, capacity = 8, timeout = 30.seconds) { i =>
      Future { Thread.sleep((i % 3).toLong); i * 10 }
    }
    // order preserved within each partition: collect per partition and check
    val perPart = out.mapPartitions(it => Iterator(it.toSeq)).collect()
    perPart.foreach { p => assert(p === p.sortBy(v => ds.collect().indexOf(v / 10))) }
    assert(out.collect().sorted === (1 to 100).map(_ * 10).toArray)
  }

  test("AsyncIO.unorderedWait emits every result exactly once") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val ds = (1 to 50).toDS().repartition(2)
    val out = AsyncIO.unorderedWait(ds, capacity = 4, timeout = 30.seconds) { i =>
      Future { Thread.sleep(((i * 7) % 5).toLong); i + 1000 }
    }
    assert(out.collect().sorted === (1 to 50).map(_ + 1000).toArray)
  }

  test("SideOutputs.demux routes each row to exactly one tag (first match wins)") {
    val df = Seq((1, "a"), (2, "b"), (3, "ab"), (4, "x")).toDF("id", "s")
    val outs = SideOutputs.demux(df, Seq(
      "hasA" -> col("s").contains("a"),
      "hasB" -> col("s").contains("b")))
    assert(outs("hasA").select("id").as[Int].collect().toSet === Set(1, 3))
    assert(outs("hasB").select("id").as[Int].collect().toSet === Set(2)) // 3 went to hasA
    assert(outs("default").select("id").as[Int].collect().toSet === Set(4))
  }

  test("observe() exposes accumulator-style metrics on a batch action") {
    val df = Seq(1, 2, 3, 4, 5).toDF("v")
      .observe("m", count(lit(1)).as("rows"), sum($"v").as("total"),
        count(when($"v" > 3, 1)).as("late_like"))
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var seen: Option[org.apache.spark.sql.Row] = None
      def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("m").foreach(r => seen = Some(r))
      def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      df.collect()
      var tries = 0
      while (listener.seen.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val m = listener.seen.get
      assert(m.getAs[Long]("rows") === 5L)
      assert(m.getAs[Long]("total") === 15L)
      assert(m.getAs[Long]("late_like") === 2L)
    } finally spark.listenerManager.unregister(listener)
  }
}
