package graft.operators

import graft.functions.Fnv1a64Expr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling and dataset splitting.
  *
  * Training pipelines need splits that are (a) stable across reruns and
  * cluster layouts, (b) disjoint and exhaustive, (c) auditable — "which
  * split is doc 12345 in?" must have one answer forever. `rand(seed)` gives
  * none of these under retries/repartitioning (SPARK-23207 class:
  * per-partition seeding depends on layout); `TABLESAMPLE` none by design.
  *
  * The primitive here is a content hash of the id column mapped to [0, 1):
  * a pure function of the row, so membership is layout-independent,
  * retry-stable, and replayable anywhere (the DuckDB oracle replays the
  * same FNV-1a arithmetic — sampling is oracle-EXACT, which no
  * rand()-based sample can be). Different `salt` values give independent
  * samples from the same ids.
  *
  * At 100 TB: a sample/split is a map-side filter fused into the scan —
  * no shuffle, no driver round-trip, prunable columns untouched.
  */
object Sampling {

  /** hash(id, salt) → uniform double in [0, 1), deterministic. */
  def unitHash(id: Column, salt: String): Column =
    // FNV-1a (native codegen expr) over the decimal rendering of the id plus
    // the salt tag; >>> 11 keeps the top 53 bits — exact in a double.
    shiftrightunsigned(Fnv1a64Expr(concat(id.cast("string"), lit(":" + salt))), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Bernoulli sample: keep rows with unitHash < fraction. */
  def sample(df: DataFrame, idCol: String, fraction: Double,
             salt: String = "sample"): DataFrame =
    df.filter(unitHash(col(idCol), salt) < fraction)

  /** Disjoint-exhaustive split: adds `splitCol` ∈ names(i) with
    * P(names(i)) = weights(i)/Σweights. Every id lands in exactly one
    * split, forever. */
  def split(df: DataFrame, idCol: String, weights: Seq[Double],
            names: Seq[String], splitCol: String = "split",
            salt: String = "split"): DataFrame = {
    require(weights.length == names.length && weights.nonEmpty)
    require(weights.forall(_ > 0))
    val total = weights.sum
    val cums = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = unitHash(col(idCol), salt)
    // last bucket catches u in [cum_{n-1}, 1) exactly
    val expr0 = cums.init.zip(names.init).foldRight(lit(names.last): Column) {
      case ((cum, name), elseExpr) => when(u < cum, name).otherwise(elseExpr)
    }
    df.withColumn(splitCol, expr0)
  }

  /** Deterministic k-fold assignment (reference: flink-ml/.../
    * preprocessing/Splitter.scala — kFoldSplit): adds `foldCol` =
    * floor(unitHash·k) ∈ [0, k). Content-hashed, so the assignment is
    * stable across runs and partitionings and replayable in plain SQL —
    * the reference's random folds are neither. Map-side only: no shuffle,
    * no state, works identically on a 100 TB frame. */
  def kFold(df: DataFrame, idCol: String, k: Int, foldCol: String = "fold",
            salt: String = "kfold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn(foldCol,
      floor(unitHash(col(idCol), salt) * k).cast("int"))
  }

  /** The i-th cross-validation pair: (train = every other fold, test =
    * fold i). Both are filters over the same deterministic assignment —
    * disjoint and exhaustive by construction. */
  def kFoldSplit(df: DataFrame, idCol: String, k: Int, i: Int,
                 salt: String = "kfold"): (DataFrame, DataFrame) = {
    require(i >= 0 && i < k, s"fold index $i outside [0, $k)")
    val withFold = kFold(df, idCol, k, salt = salt)
    (withFold.filter(col("fold") =!= i).drop("fold"),
      withFold.filter(col("fold") === i).drop("fold"))
  }

  /** Per-stratum Bernoulli sample: fractions(stratum) of each stratum's
    * rows, deterministic. Strata absent from the map are dropped —
    * the `sampleBy` contract. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double],
                 salt: String = "strat"): DataFrame = {
    val fracExpr = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, f).otherwise(acc)
    }
    df.filter(unitHash(col(idCol), salt) < fracExpr)
  }
}
