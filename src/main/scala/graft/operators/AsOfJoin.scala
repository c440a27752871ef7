package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for each left row, the single most recent
  * right row with `rightTs <= leftTs` on the same key (backward direction;
  * `forward` gives the earliest right row with `rightTs >= leftTs`).
  *
  * The reference engine has no as-of operator; it is the canonical temporal
  * primitive a training-data/feature pipeline needs (join each example to
  * the latest feature snapshot at example time) and the classic case where
  * the naive formulation — a range join `l.ts >= r.ts` followed by a
  * max-per-group — explodes: every left row matches ALL earlier right rows
  * (O(|L|·|R|/keys) intermediates) before the dedup throws them away.
  *
  * Implementation is the union-merge formulation, which Spark executes as
  * ONE shuffle and ONE sort, with zero intermediate blowup:
  *   1. tag both sides, union on (key, ts, tag) with right rows sorted
  *      before left rows at equal ts (inclusive bound);
  *   2. one window pass per key ordered by (ts, tag, tiebreak):
  *      `last(rightStruct, ignoreNulls)` ROWS UNBOUNDED PRECEDING carries
  *      the latest right payload forward to each left row;
  *   3. keep left rows, unpack the carried struct; rows whose carried ts
  *      violates `tolerance` revert to null (left-outer semantics).
  *
  * At scale: cost is sort-shuffle of |L|+|R| — the same price as the
  * sort-merge join Catalyst would pick for an equi-join of the two inputs —
  * and the window is a streaming pass (no frame buffering: the frame is
  * unbounded-preceding, so Spark keeps a single running value per key).
  * Skewed keys behave like any sorted window: one task per key partition;
  * salt upstream with [[SkewJoin]] if one key dominates.
  *
  * Ties are deterministic: equal (ts, side) rows order by `tiebreak`
  * (e.g. an event id), and the LAST one wins — a pure function of the
  * data, so retries and re-partitioning cannot flip the result.
  */
object AsOfJoin {

  /** Backward as-of join (latest right at-or-before left).
    *
    * @param left      point-query side; all its columns survive
    * @param right     snapshot side; its non-key columns come back prefixed
    *                  with `rightPrefix` (null when no match)
    * @param key       equi-key column name (same name both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param tiebreak  right column that breaks equal-timestamp ties
    *                  (max wins); must exist on the right side
    * @param toleranceUs match only if `leftTs - rightTs <= tolerance` (µs);
    *                  0 or negative = unbounded lookback
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, tiebreak: String,
               toleranceUs: Long = 0L, rightPrefix: String = "r_"): DataFrame = {
    requireClean(left)
    // timestamp order == µs-long order: both directions share ONE core
    val axL = left.withColumn("_axts", expr(s"unix_micros($leftTs)"))
    val axR = right.withColumn("_axts", expr(s"unix_micros($rightTs)"))
      .withColumn("_axtb", col(tiebreak).cast("long"))
    backwardOnLong(axL, axR, key, "_axts", "_axtb", toleranceUs, rightPrefix)
  }

  /** Forward as-of join (earliest right at-or-after left): the time-mirrored
    * [[backward]] — same single-shuffle plan on a negated time axis. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String, tiebreak: String,
              toleranceUs: Long = 0L, rightPrefix: String = "r_"): DataFrame = {
    requireClean(left)
    val negL = left.withColumn("_axts", expr(s"-unix_micros($leftTs)"))
    val negR = right.withColumn("_axts", expr(s"-unix_micros($rightTs)"))
      // mirror the tiebreak too: backward takes MAX _tb, forward wants MIN
      .withColumn("_axtb", -col(tiebreak).cast("long"))
    backwardOnLong(negL, negR, key, "_axts", "_axtb", toleranceUs, rightPrefix)
  }

  private val reserved =
    Set("_ts", "_side", "_tb", "_payload", "_match", "_match_ts", "_axts", "_axtb")
  private def requireClean(left: DataFrame): Unit =
    require(!left.columns.exists(reserved),
      s"left columns clash with reserved names ${reserved.mkString(",")}")

  /** The one as-of core, on a long axis (ascending = backward; callers
    * negate the axis for forward). */
  private def backwardOnLong(left: DataFrame, right: DataFrame, key: String,
                             tsCol: String, tbCol: String, toleranceUs: Long,
                             rightPrefix: String): DataFrame = {
    val rightPayloadCols = right.columns.filter(c => c != key && c != tsCol && c != tbCol).toSeq
    val leftCols = left.columns.filter(_ != tsCol).toSeq

    val taggedRight = right.select(
      Seq(col(key), col(tsCol).as("_ts"), lit(0).as("_side"), col(tbCol).as("_tb"),
        struct(rightPayloadCols.map(col): _*).as("_payload")) ++
        leftCols.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(tsCol).as("_ts"), lit(1).as("_side"),
        lit(null).cast("long").as("_tb"),
        lit(null).cast(taggedRight.schema("_payload").dataType).as("_payload")) ++
        leftCols.filter(_ != key).map(col): _*)

    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .withColumn("_match_ts", last(when(col("_side") === 0, col("_ts")),
        ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val tolerated =
      if (toleranceUs > 0)
        carried.withColumn("_match",
          when(col("_ts") - col("_match_ts") <= toleranceUs, col("_match")))
      else carried
    tolerated.select(
      leftCols.map(col) ++
        rightPayloadCols.map(c => col(s"_match.$c").as(s"$rightPrefix$c")): _*)
  }
}
