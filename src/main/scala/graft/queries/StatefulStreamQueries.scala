package graft.queries

import graft.Tables
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KeyedEvent
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Custom stateful streaming operators (SURVEY.md §7 phase 3–5) run through
  * the same synchronous file-stream harness as StreamQueries: real
  * Structured Streaming queries on `transformWithState` with event-time
  * timers, drained by the watermark, then hash-checked against batch SQL.
  *
  * Watermark delay is 0s and event-time timers fire when watermark >= ts
  * (verified empirically), so on a finite replay every buffered row is
  * emitted and a batch oracle can reproduce the output exactly.
  */
object StatefulStreamQueries {

  /** events → watermarked Dataset[KeyedEvent] keyed by user_id. */
  private def keyedEvents(s: SparkSession, dir: String): Dataset[KeyedEvent] = {
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(Tables.path(dir, "events")).schema
    val raw = s.readStream.schema(schema).parquet(s"$dir/events*.parquet")
    val withTs =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    withTs.withWatermark("ts", "0 seconds")
      .select(col("user_id").as("key"), col("event_id").as("eventId"),
        unix_micros(col("ts").cast("timestamp")).as("tsUs"),
        col("event_type").as("eventType"),
        round(col("value") * 1000).cast("long").as("valueMillis"))
      .as[KeyedEvent]
  }

  private def run(df: DataFrame, name: String)(implicit s: SparkSession): DataFrame = {
    val q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  def entries: Seq[Entry] = Seq(

    // Streaming OVER: ROWS UNBOUNDED PRECEDING running aggregate per key,
    // one output row per input row, event-time order.
    Entry("q95_stream_over_running",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        val out = StatefulOps.run(keyedEvents(s, dir), new StatefulOps.RunningAgg)
          .toDF("key", "event_id", "ts_us", "running_n", "running_sum_millis")
        run(out, "q95_sink")
      },
      Some("""SELECT user_id AS key, event_id, epoch_us(ts) AS ts_us,
          row_number() OVER w AS running_n,
          sum(CAST(round(value*1000) AS BIGINT)) OVER w AS running_sum_millis
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // Tumbling count windows of 10 rows per key; only completed windows emit.
    Entry("q96_stream_count_window",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        val out = StatefulOps.run(keyedEvents(s, dir), new StatefulOps.CountWindow(10))
          .toDF("key", "win_seq", "n", "sum_millis", "first_ts_us", "last_ts_us")
        run(out, "q96_sink")
      },
      Some("""WITH o AS (
          SELECT user_id, event_id, ts, value,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
          FROM events)
        SELECT user_id AS key, rn // 10 AS win_seq, count(*) AS n,
          sum(CAST(round(value*1000) AS BIGINT)) AS sum_millis,
          epoch_us(min(ts)) AS first_ts_us, epoch_us(max(ts)) AS last_ts_us
        FROM o GROUP BY 1, 2 HAVING count(*) = 10""")),

    // CEP strict sequence view -> click -> purchase within 1 day per user.
    Entry("q97_stream_cep_seq",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        val out = StatefulOps.run(keyedEvents(s, dir),
            new StatefulOps.StrictSeq(Seq("view", "click", "purchase"), 86400000000L))
          .select(col("key"),
            element_at(col("ids"), 1).as("id_view"),
            element_at(col("ids"), 2).as("id_click"),
            element_at(col("ids"), 3).as("id_purchase"),
            col("startTsUs").as("start_ts_us"), col("endTsUs").as("end_ts_us"))
        run(out, "q97_sink")
      },
      Some("""WITH o AS (
          SELECT user_id, event_id, ts, event_type,
            lead(event_type, 1) OVER w AS t1, lead(event_id, 1) OVER w AS id1,
            lead(event_type, 2) OVER w AS t2, lead(event_id, 2) OVER w AS id2,
            lead(ts, 2) OVER w AS ts2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id AS key, event_id AS id_view, id1 AS id_click,
          id2 AS id_purchase, epoch_us(ts) AS start_ts_us, epoch_us(ts2) AS end_ts_us
        FROM o
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND epoch_us(ts2) - epoch_us(ts) <= 86400000000""")),

    // Connected streams (CoProcessFunction): clicks and purchases share one
    // keyed operator; each purchase emits how many clicks preceded it.
    Entry("q98_stream_coprocess",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        import graft.streaming.CoProcess
        val ev = keyedEvents(s, dir)
        def side(typ: String, tag: Int) = ev.filter(_.eventType == typ)
          .map(e => CoProcess.Tagged(e.key, e.eventId, e.tsUs, tag, e.valueMillis))
        val out = CoProcess.connect(side("click", 0), side("purchase", 1),
            new CoProcess.LeftCountAtRight)
          .toDF("key", "purchase_id", "ts_us", "clicks_before")
        run(out, "q98_sink")
      },
      Some("""SELECT p.user_id AS key, p.event_id AS purchase_id,
          epoch_us(p.ts) AS ts_us,
          (SELECT count(*) FROM events c
           WHERE c.user_id = p.user_id AND c.event_type = 'click'
             AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id)))
            AS clicks_before
        FROM events p WHERE p.event_type = 'purchase'""")),
  )
}
