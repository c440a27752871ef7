package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML preprocessing parity (reference: flink-libraries/flink-ml/.../ml/
  * preprocessing/{StandardScaler,MinMaxScaler,PolynomialFeatures}.scala):
  * fit/transform as a single aggregate pass whose tiny result broadcasts
  * back into a projection.
  *
  * All statistics are computed from EXACT integer moments (n, Σx, Σx²) of
  * integer-valued columns, so the derived doubles follow one fixed
  * arithmetic sequence and any engine reproduces them bit-for-bit — no
  * float-summation-order dependence (a requirement of the oracle gate and
  * good hygiene at 100 TB where partial-agg order is nondeterministic).
  */
object Preprocessing {

  /** Per-group simple linear regression y = a + b·x by closed-form least
    * squares (reference capability: FlinkML MultipleLinearRegression —
    * flink-libraries/flink-ml/.../ml/regression/MultipleLinearRegression
    * .scala, which iterates SGD; for low dimension the normal equations
    * need ONE aggregation pass, the scalable route — SGD's per-step full
    * passes are the wrong shape for 100 TB; spark.ml carries the
    * high-dimensional/iterative case).
    *
    * `xCol`/`yCol` must be integral-valued (cast/cents first): the five
    * moments (n, Σx, Σy, Σxy, Σx²) are exact longs, so slope/intercept
    * derive through one fixed double-arithmetic sequence — bit-identical
    * on any engine, any partitioning. */
  def linearFit(df: DataFrame, groupCols: Seq[String], xCol: String,
                yCol: String): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      // degenerate group (single row / constant x): slope undefined -> NULL
      // on every engine, rather than Spark-NULL vs IEEE-Infinity skew
      .withColumn("_det",
        col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
      .withColumn("slope", when(col("_det") =!= 0.0,
        (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
          col("_det")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n").cast("double"))
      .drop("_det")
  }

  /** Moment aggregate columns for z-scoring `c`, prefixed `p` (shared by
    * [[standardScale]] and MLPipeline.StandardScaler).
    * Moments in decimal(38,0): Σx² of 64-bit inputs overflows long at
    * ~10^5 rows of 10^7-scale values; decimal stays exact (DuckDB's
    * int128 sum is the mirror image). Input must be integral (e.g.
    * cents) — a double input would be silently truncated by the decimal
    * cast. */
  private[operators] def zStats(c: String, p: String): Seq[Column] = Seq(
    count(col(c)).as(s"$p${c}_n"),
    sum(col(c).cast("decimal(38,0)")).as(s"$p${c}_s"),
    sum(col(c).cast("decimal(19,0)") * col(c).cast("decimal(19,0)")).as(s"$p${c}_q"))

  /** z = (x - Σx/n) / sqrt(Σx²/n - (Σx/n)²) over [[zStats]] columns;
    * constant column → 0. One fixed double-arithmetic sequence from exact
    * moments — engine- and partitioning-independent. */
  private[operators] def zOut(c: String, p: String): Column = {
    val mean = col(s"$p${c}_s").cast("double") / col(s"$p${c}_n")
    val varP = col(s"$p${c}_q").cast("double") / col(s"$p${c}_n") - mean * mean
    round(when(varP <= 0.0, lit(0.0))
      .otherwise((col(c) - mean) / sqrt(varP)), 9).as(s"${c}_z")
  }

  /** min/max aggregate columns for [[minMaxScale]]-style rescaling. */
  private[operators] def mmStats(c: String, p: String): Seq[Column] =
    Seq(min(col(c)).as(s"$p${c}_min"), max(col(c)).as(s"$p${c}_max"))

  /** x' = (x - min) / (max - min); constant training column → 0.5 (the
    * reference's midpoint convention for an empty range). */
  private[operators] def mmOut(c: String, p: String): Column =
    round(when(col(s"$p${c}_max") === col(s"$p${c}_min"), lit(0.5))
      .otherwise((col(c) - col(s"$p${c}_min")).cast("double") /
        (col(s"$p${c}_max") - col(s"$p${c}_min")).cast("double")), 9).as(s"${c}_mm")

  /** z-score columns from integer inputs; constant columns map to 0.
    * Input columns must be integral (e.g. cents). */
  def standardScale(df: DataFrame, cols: Seq[String], keep: Seq[String] = Nil): DataFrame = {
    val stats = df.select(cols.flatMap(c => zStats(c, "")): _*)
    df.crossJoin(broadcast(stats))
      .select(keep.map(col) ++ cols.map(c => zOut(c, "")): _*)
  }

  /** x' = (x - min) / (max - min) per integral column; constant → 0.5. */
  def minMaxScale(df: DataFrame, cols: Seq[String], keep: Seq[String] = Nil): DataFrame = {
    val stats = df.select(cols.flatMap(c => mmStats(c, "")): _*)
    df.crossJoin(broadcast(stats))
      .select(keep.map(col) ++ cols.map(c => mmOut(c, "")): _*)
  }

  /** Degree-d polynomial expansion of one integral column: x^2 .. x^d as
    * exact integer products. */
  def polynomialFeatures(df: DataFrame, c: String, degree: Int): DataFrame =
    df.select(col("*") +: (2 to degree).map(d =>
      (2 to d).foldLeft(col(c).cast("long"))((acc, _) => acc * col(c)).as(s"${c}_p$d")): _*)
}
