package graft

import graft.streaming.ProcessFn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throwaway probe: pins transformWithState timer-vs-watermark semantics. */
object TimerProbe {
  case class Ev(user: String, tsMs: Long, v: Long)

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ds = mem.toDS().withColumn("ts", timestamp_millis(col("tsMs")))
      .withWatermark("ts", "0 seconds").as[Ev]

    // processElement registers a timer at each element ts; onTimer emits marker
    val fn = new ProcessFn.Fn[String, Ev, String] {
      def processElement(key: String, value: Ev, ctx: ProcessFn.Ctx): Iterator[String] = {
        ctx.registerEventTimeTimer(value.tsMs)
        Iterator(s"elem:$key:${value.tsMs}:wm=${ctx.currentWatermarkMs}")
      }
      override def onTimer(key: String, tsMs: Long, ctx: ProcessFn.Ctx): Iterator[String] =
        Iterator(s"timer:$key:$tsMs:wm=${ctx.currentWatermarkMs}")
    }
    val out = ProcessFn(ds, (e: Ev) => e.user, fn)
    val q = out.writeStream.outputMode("append").format("memory").queryName("probe").start()
    mem.addData(Ev("a", 1000, 1), Ev("a", 2000, 2), Ev("a", 3000, 3))
    q.processAllAvailable()
    println("--- after batch1 (max ts=3000, delay=0) ---")
    spark.table("probe").collect().foreach(r => println(r.getString(0)))
    mem.addData(Ev("a", 10000, 4))
    q.processAllAvailable()
    println("--- after batch2 (ts=10000) ---")
    spark.table("probe").collect().foreach(r => println(r.getString(0)))
    q.stop()
    spark.stop()
  }
}
