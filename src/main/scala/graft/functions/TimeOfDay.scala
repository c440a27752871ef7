package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL TIME (time-of-day) mapping — closes the SURVEY §1.2 `SqlTimeTypeInfo`
  * gap (reference: flink-core .../typeinfo/SqlTimeTypeInfo.java; Table API
  * TIME literals and TEMPORAL extraction in flink-table's
  * ExpressionParser/ScalarFunctions).
  *
  * Spark has no TIME data type; the engine-portable representation is
  * **micros-of-day as LongType** (0 .. 86_399_999_999), the same value
  * DuckDB's `datediff('microseconds', TIME '00:00:00', CAST(ts AS TIME))`
  * yields — so TIME semantics hash-oracle exactly (qd7_time_of_day).
  * Comparison/ordering/arithmetic on TIME values are then plain integer
  * ops, and every helper below is a thin composition of codegen'd
  * builtins (no UDFs; whole-stage codegen preserved).
  *
  * ZONE INVARIANT: all helpers assume `spark.sql.session.timeZone=UTC`
  * (the harness default, pinned by FunctionsSpec). `microsOfDay` is
  * arithmetic on `unix_micros` and therefore always UTC-based, while
  * `formatSeconds`/`parseMicros` go through `date_format`/`to_timestamp`
  * which are session-zoned — under a non-UTC session zone the two
  * families would silently disagree (e.g. `hourOf(microsOfDay(ts)) !=
  * hour rendered by formatSeconds(ts)`). Callers on non-UTC sessions
  * must re-zone timestamps first (`convert_timezone`) or pin the session
  * zone; the helpers deliberately do NOT pay a per-row zone conversion.
  */
object TimeOfDay {

  val MicrosPerDay: Long = 86400000000L

  /** TIME part of a timestamp, as micros since midnight (UTC-based —
    * correct as session time-of-day only under a UTC session zone, see
    * object doc). pmod keeps pre-1970 instants in [0, day). */
  def microsOfDay(ts: Column): Column = pmod(unix_micros(ts), lit(MicrosPerDay))

  /** TIME → 'HH:mm:ss' display string (second precision, the SQL TIME(0)
    * default the reference's SQL_TIME carries). */
  def formatSeconds(ts: Column): Column = date_format(ts, "HH:mm:ss")

  /** Parse a 'HH:mm:ss[.SSSSSS]' TIME string to micros-of-day (UTC
    * session: epoch day 0 anchors the parse, so no zone skew). */
  def parseMicros(timeStr: Column): Column =
    unix_micros(to_timestamp(concat(lit("1970-01-01 "), timeStr)))

  /** Re-anchor a TIME (micros-of-day) onto a date column → timestamp —
    * the SQL `date + time` composition. */
  def atDate(date: Column, todMicros: Column): Column =
    timestamp_micros(unix_micros(date.cast("timestamp")) + todMicros)

  /** HOUR/MINUTE/SECOND extraction from a TIME value in micros-of-day. */
  def hourOf(todMicros: Column): Column = (todMicros / lit(3600000000L)).cast("int")
  def minuteOf(todMicros: Column): Column =
    pmod(todMicros / lit(60000000L), lit(60L)).cast("int")
  def secondOf(todMicros: Column): Column =
    pmod(todMicros / lit(1000000L), lit(60L)).cast("int")
}
