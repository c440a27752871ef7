package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Declarative time windows over the `events` fixture, batch evaluation
  * (SURVEY.md §2.5): tumbling / sliding / session windows map to
  * `window()` / `session_window()` exactly as the reference's
  * Tumble/Slide/Session group-windows map to its WindowOperator.
  *
  * Window boundaries are emitted as integer epoch-microseconds
  * (`unix_micros`) so an external oracle reproduces them with pure integer
  * arithmetic; `value` sums use exact integer millis.
  */
object WindowQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val HourUs = 3600000000L
  private val HalfHourUs = 1800000000L

  private def valueMillis = round(col("value") * 1000).cast("long")

  def entries: Seq[Entry] = Seq(

    Entry("q70_tumble_1h",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 1000).cast("long")) / 1000.0).as("sum_value"))
          .select(unix_micros(col("window.start")).as("win_start_us"),
            unix_micros(col("window.end")).as("win_end_us"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some(s"""SELECT (epoch_us(ts) // $HourUs) * $HourUs AS win_start_us,
        (epoch_us(ts) // $HourUs) * $HourUs + $HourUs AS win_end_us,
        event_type, count(*) AS n,
        (CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT)/1000.0) AS sum_value
        FROM events GROUP BY 1, 2, 3""")),

    Entry("q71_slide_1h_30m",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 1000).cast("long")) / 1000.0).as("sum_value"))
          .select(unix_micros(col("window.start")).as("win_start_us"),
            col("n"), col("sum_value"))
      },
      Some(s"""SELECT win_start_us, count(*) AS n,
        (CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT)/1000.0) AS sum_value
        FROM (
          SELECT (epoch_us(ts) // $HalfHourUs) * $HalfHourUs AS win_start_us, value FROM events
          UNION ALL
          SELECT (epoch_us(ts) // $HalfHourUs) * $HalfHourUs - $HalfHourUs AS win_start_us, value FROM events
        ) GROUP BY win_start_us""")),

    Entry("q72_session_2h",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 1000).cast("long")) / 1000.0).as("sum_value"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("sess_start_us"),
            unix_micros(col("session_window.end")).as("sess_end_us"),
            col("n"), col("sum_value"))
      },
      Some("""WITH marked AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), islands AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
          FROM marked
        )
        SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
          epoch_us(max(ts) + INTERVAL 2 HOUR) AS sess_end_us,
          count(*) AS n,
          (CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT)/1000.0) AS sum_value
        FROM islands GROUP BY user_id, sess""")),

    // tumbling count + per-window distinct users, keyed by event_type
    Entry("q73_tumble_6h_distinct",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
          .select(unix_micros(col("window.start")).as("win_start_us"),
            col("event_type"), col("users"), col("n"))
      },
      Some(s"""SELECT (epoch_us(ts) // ${6 * HourUs}) * ${6 * HourUs} AS win_start_us,
        event_type, count(DISTINCT user_id) AS users, count(*) AS n
        FROM events GROUP BY 1, 2""")),
  )
}
