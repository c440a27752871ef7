package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-equi interval join by bin decomposition.
  *
  * `points ⋈ intervals ON lo <= pt AND pt < hi` has no equi-key, so Catalyst
  * can only run it as BroadcastNestedLoopJoin (fine when one side is tiny,
  * quadratic when neither is). Binning manufactures the equi-key: quantize
  * the axis into fixed-width bins, explode each interval into the bins it
  * covers, join point-bin to interval-bin hash-wise, then re-check the exact
  * predicate on the (now bounded) candidate set.
  *
  * Cost model: candidates per point = intervals overlapping its bin — i.e.
  * local density × (1 + span/binWidth) replication on the interval side,
  * instead of |points|·|intervals|. Pick `binWidthUs` ≈ the typical interval
  * span: wider bins raise candidates-per-bin, narrower bins raise the
  * interval replication factor. Both knobs stay O(data), never O(data²),
  * and the shuffle key (bin) distributes uniformly when the axis does —
  * exactly the property that holds this join together at 100 TB where a
  * nested loop is off the table.
  *
  * The exact predicate re-check makes the result bit-identical to the
  * nested-loop semantics — binning is pure pruning, never approximation.
  */
object RangeJoin {

  /** Join `points` (µs-long column `ptUs`) to `intervals` (µs-long columns
    * `loUs`, `hiUs`; half-open [lo, hi)) on containment. Returns all point
    * columns plus all interval columns; inner semantics. */
  def pointInInterval(points: DataFrame, ptUs: String,
                      intervals: DataFrame, loUs: String, hiUs: String,
                      binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0)
    // overlapping names would make the post-join exact re-check ambiguous
    // (or silently read the wrong side); fail loudly instead
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points/intervals share column names ${overlap.mkString(",")} — rename first")
    require(!(points.columns ++ intervals.columns).contains("_bin"),
      "'_bin' is reserved by pointInInterval")
    val p = points.withColumn("_bin", floor(col(ptUs) / binWidthUs))
    // Degenerate intervals (hi <= lo) match nothing, but unguarded they
    // would feed sequence() a DESCENDING range — for a far-inverted pair
    // that's millions of phantom bins from one row. Filter them out first.
    //
    // hi is exclusive: an interval touching bin boundary hi = k*W does not
    // occupy bin k — hence the -1 on the inclusive upper bin.
    val iv = intervals.filter(col(hiUs) > col(loUs)).withColumn("_bin",
      explode(sequence(floor(col(loUs) / binWidthUs),
        floor((col(hiUs) - 1) / binWidthUs))))
    p.join(iv, Seq("_bin"), "inner")
      .filter(col(ptUs) >= col(loUs) && col(ptUs) < col(hiUs))
      .drop("_bin")
  }
}
