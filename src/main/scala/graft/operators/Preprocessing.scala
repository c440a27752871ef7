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

  /** Per-group TWO-feature linear regression y = b0 + b1·x1 + b2·x2 by
    * closed-form normal equations (reference: flink-ml/.../ml/regression/
    * MultipleLinearRegression.scala — multi-feature least squares; its SGD
    * loop is replaced by the one-aggregation-pass solve, the scalable
    * shape — see [[linearFit]]). The general-k sibling is
    * [[ML.linearRegressionFit]]; two features get the closed form because
    * a 3×3 Cramer solve is expressible as ONE fixed double-arithmetic
    * sequence over exact integer moments, so the result hash-oracles on
    * any engine.
    *
    * `x1Col`/`x2Col`/`yCol` must be integral-valued (cast/cents first);
    * the nine moments are exact longs (magnitude contract as
    * [[linearFit]]: Σx·y of bounded per-row values stays far below 2^63
    * at any corpus size where the per-row bound holds). A singular system
    * (collinear features, constant column, < 3 distinct points) yields
    * NULL coefficients on every engine rather than engine-skewed ±Inf. */
  def multiLinearFit(df: DataFrame, groupCols: Seq[String], x1Col: String,
                     x2Col: String, yCol: String): DataFrame = {
    val x1 = col(x1Col).cast("long"); val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x1).as("s1"), sum(x2).as("s2"),
        sum(y).as("sy"), sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"),
        sum(x2 * x2).as("s22"), sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
    // Cramer's rule on A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],
    // b = [sy,s1y,s2y] — every product in double AFTER the exact integer
    // aggregation, in one pinned association order mirrored by the oracle
    def d(c: String): Column = col(c).cast("double")
    val det = d("n") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1") * d("s22") - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s12") - d("s11") * d("s2"))
    val det0 = d("sy") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1y") * d("s22") - d("s12") * d("s2y")) +
      d("s2") * (d("s1y") * d("s12") - d("s11") * d("s2y"))
    val det1 = d("n") * (d("s1y") * d("s22") - d("s12") * d("s2y")) -
      d("sy") * (d("s1") * d("s22") - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s2y") - d("s1y") * d("s2"))
    val det2 = d("n") * (d("s11") * d("s2y") - d("s1y") * d("s12")) -
      d("s1") * (d("s1") * d("s2y") - d("s1y") * d("s2")) +
      d("sy") * (d("s1") * d("s12") - d("s11") * d("s2"))
    m.withColumn("_det", det)
      .withColumn("intercept", when(col("_det") =!= 0.0, det0 / col("_det")))
      .withColumn("b1", when(col("_det") =!= 0.0, det1 / col("_det")))
      .withColumn("b2", when(col("_det") =!= 0.0, det2 / col("_det")))
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
