package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Processing-time characteristic (reference: flink-streaming-java/.../
  * windowing/assigners/TumblingProcessingTimeWindows.java +
  * triggers/ProcessingTimeTrigger.java; TimeCharacteristic.ProcessingTime).
  *
  * The reference assigns windows by the wall clock at the moment an element
  * passes the operator. Spark's micro-batch model has no per-operator wall
  * clock, so the faithful mapping is INGEST time: stamp each row with a
  * clock column at the source and run the ordinary (event-time) window
  * machinery on that column. Flink itself documents ingestion time as the
  * deterministic cousin of processing time (TimeCharacteristic.IngestionTime
  * — same assigners, automatic timestamps at the source); this helper is
  * exactly that construction, with watermark delay 0 because the clock
  * column is monotone in arrival order by definition.
  *
  * Production use: `ProcTime.attach(stream)` — `current_timestamp()` is the
  * micro-batch's ingest clock (constant within a batch: the batch IS the
  * processing-time quantum). Tests and the correctness gate inject a
  * deterministic clock instead, which makes the otherwise
  * wall-clock-dependent semantics replayable by a batch oracle bit-for-bit.
  */
object ProcTime {
  val ColName = "proc_ts"

  /** Stamp `clock` onto the stream as the processing-time column. */
  def attach(df: DataFrame, clock: Column = current_timestamp()): DataFrame =
    df.withColumn(ColName, clock)

  /** Processing-time tumbling window, ready to aggregate: stamps the clock,
    * watermarks it with zero delay (monotone by construction), and returns
    * the windowed column to group on alongside other keys. */
  def tumble(df: DataFrame, width: String,
             clock: Column = current_timestamp()): (DataFrame, Column) = {
    val stamped = attach(df, clock).withWatermark(ColName, "0 seconds")
    (stamped, window(col(ColName), width))
  }
}
