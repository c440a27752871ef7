package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ledgered ROLL-UP for the per-batch delta-partition state the
  * streaming mixture/curriculum family keeps
  * ([[StreamingTopup]], [[StreamingCurriculum]] — reference anchor:
  * the keyed-state maintenance surface of SURVEY §2.10).
  *
  * The family's replay-idempotence rides per-batch delta partitions
  * (`stateDir/delta/batch_id=<id>`, per-partition overwrite,
  * self-excluding reads), which is correct but grows the per-commit
  * read O(delivered batches) forever on a never-ending stream. This
  * compacts ledgered deliveries into WATERMARKED GENERATIONS —
  * `stateDir/rollup/w=<W>` holds the (key, value) sums of every
  * delivery with batch_id ≤ W — so a commit reads one generation plus
  * the ≤ `rollEvery` still-unrolled deltas, O(1) in stream age.
  *
  * Correctness invariants (the GramIndex-compact discipline, adapted —
  * a generation SWAP here is not rename-aside but watermark-monotone):
  *
  *  - only LEDGERED batches fold. foreachBatch commits batch ids in
  *    order, so when batch `bid` runs, every id < bid is ledgered and
  *    `bid` itself is ledgered before [[maybeRollup]] is called — a
  *    replayed (crashed, unledgered) batch's half-written delta can
  *    therefore never be folded, and the family's self-excluding read
  *    (`batch_id =!= bid`) keeps working verbatim;
  *  - readers NEVER mix a generation with a delta it already folded:
  *    [[read]] takes W = the max COMPLETE generation (`_SUCCESS`
  *    marker) and filters deltas to `batch_id > W` — a leftover folded
  *    delta (crash between the generation commit and its deletion) is
  *    excluded by the watermark, not by the deletion having happened;
  *  - a crash anywhere inside [[maybeRollup]] leaves a readable state:
  *    before the new generation's `_SUCCESS` lands, readers still use
  *    the old W and the intact deltas; after it, the new W wins and
  *    the stale generation/deltas are ignorable garbage that the next
  *    call's cleanup preamble deletes (all idempotent: delete by
  *    watermark comparison, rewrite by overwrite);
  *  - integer sums commute, so folding cannot perturb downstream
  *    values: `read` feeds the same groupBy-sum the callers always ran
  *    (spec-pinned — a rolled stream's outputs are byte-identical to
  *    an unrolled one's). */
private[graft] object DeltaState {

  /** Fold when more than this many unrolled delta partitions are live —
    * small enough that the per-commit listing stays O(1), large enough
    * that each fold amortizes over many commits. */
  val DefaultRollEvery = 16

  private def hfs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deltaPath(stateDir: String) = new Path(s"$stateDir/delta")
  private def rollPath(stateDir: String) = new Path(s"$stateDir/rollup")

  /** Live delta partition ids (directory listing, not file recursion). */
  private def deltaIds(spark: SparkSession, stateDir: String): Seq[Long] = {
    val dp = deltaPath(stateDir)
    val fs = hfs(spark, dp)
    if (!fs.exists(dp)) Seq.empty
    else fs.listStatus(dp).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .flatMap(n => n.stripPrefix("batch_id=").toLongOption)
  }

  private def genIds(spark: SparkSession, stateDir: String): Seq[Long] = {
    val rp = rollPath(stateDir)
    val fs = hfs(spark, rp)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("w="))
      .flatMap(n => n.stripPrefix("w=").toLongOption)
  }

  private def isComplete(spark: SparkSession, stateDir: String, w: Long): Boolean =
    hfs(spark, rollPath(stateDir))
      .exists(new Path(rollPath(stateDir), s"w=$w/_SUCCESS"))

  /** The max complete generation's watermark, −1 if none. */
  private def maxW(spark: SparkSession, stateDir: String): Long = {
    val complete = genIds(spark, stateDir).filter(isComplete(spark, stateDir, _))
    if (complete.isEmpty) -1L else complete.max
  }

  /** The state visible to batch `excludeBid`: the newest complete
    * generation's rows plus every delta STRICTLY past its watermark,
    * minus the batch's own partition (the family's replay
    * self-exclusion), projected to `cols`. None when no state exists
    * yet (first delivery). */
  def read(spark: SparkSession, stateDir: String, excludeBid: Long,
           cols: Seq[String]): Option[DataFrame] = {
    val w = maxW(spark, stateDir)
    val live = deltaIds(spark, stateDir).filter(id => id > w && id != excludeBid)
    val delta =
      if (live.isEmpty) None
      else Some(spark.read.parquet(
          live.map(id => s"$stateDir/delta/batch_id=$id"): _*)
        .select(cols.map(col): _*))
    val gen =
      if (w < 0) None
      else Some(spark.read.parquet(s"$stateDir/rollup/w=$w")
        .select(cols.map(col): _*))
    (delta, gen) match {
      case (Some(d), Some(g)) => Some(d.unionByName(g))
      case (d, g) => d.orElse(g)
    }
  }

  /** Idempotent garbage sweep: drop superseded/incomplete generations
    * and every delta a complete generation already folded. Returns the
    * surviving watermark. */
  private def cleanup(spark: SparkSession, stateDir: String): Long = {
    val rp = rollPath(stateDir)
    val fs = hfs(spark, rp)
    val w = maxW(spark, stateDir)
    genIds(spark, stateDir)
      .filter(g => g < w || !isComplete(spark, stateDir, g))
      .foreach(g => fs.delete(new Path(rp, s"w=$g"), true))
    val dp = deltaPath(stateDir)
    deltaIds(spark, stateDir).filter(_ <= w)
      .foreach(id => fs.delete(new Path(dp, s"batch_id=$id"), true))
    w
  }

  /** Fold the live deltas into a new generation when more than
    * `rollEvery` have accumulated. Call AFTER the batch's ledger write
    * (so every live delta is a committed delivery). `keyCol`/`valCol`
    * name the delta schema's group key and additive count. */
  def maybeRollup(spark: SparkSession, stateDir: String, keyCol: String,
                  valCol: String,
                  rollEvery: Int = DefaultRollEvery): Unit = {
    val w0 = cleanup(spark, stateDir)
    val live = deltaIds(spark, stateDir).filter(_ > w0)
    if (live.size < math.max(rollEvery, 1)) return
    val newW = live.max
    val deltas = spark.read.parquet(
        live.map(id => s"$stateDir/delta/batch_id=$id"): _*)
      .select(col(keyCol), col(valCol))
    val all =
      if (w0 < 0) deltas
      else deltas.unionByName(
        spark.read.parquet(s"$stateDir/rollup/w=$w0")
          .select(col(keyCol), col(valCol)))
    all.groupBy(col(keyCol)).agg(sum(col(valCol)).as(valCol))
      .coalesce(1) // a generation is key-cardinality-bounded (G rows)
      .write.mode("overwrite").parquet(s"$stateDir/rollup/w=$newW")
    cleanup(spark, stateDir)
    ()
  }
}
