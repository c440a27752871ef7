package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FlinkML pipeline surface (reference: flink-ml/.../pipeline/{Estimator,
  * Transformer,Predictor}.scala and Chained{Transformer,Predictor}.scala):
  * `fit` captures model state from TRAINING data — an aggregate row or a
  * weight vector, always O(features), never O(rows) — and the returned
  * transformer replays it on ANY conforming frame. That train/serve split
  * is what the one-shot helpers in [[Preprocessing]] (which re-derive
  * stats from the frame they scale) don't give; both shapes are useful,
  * the reference's pipeline is this one.
  *
  * Scale: every `transform` is a crossJoin(broadcast(1-row stats)) or a
  * literal column rewrite — no shuffle, stays inside whole-stage codegen;
  * every `fit` is one aggregate (scalers) or the [[ML]] training loops.
  */
object MLPipeline {

  trait Transformer extends Serializable { self =>
    def transform(df: DataFrame): DataFrame
    /** ChainedTransformer: feed this transformer's output into `next`. */
    def andThen(next: Transformer): Transformer = new Transformer {
      def transform(df: DataFrame): DataFrame = next.transform(self.transform(df))
    }
  }

  trait Estimator {
    def fit(df: DataFrame): Transformer
  }

  /** z-score scaler: fit = one moments row over the training frame (the
    * shared Preprocessing.zStats/zOut expressions — exact decimal sums of
    * INTEGRAL columns), checkpointed so serving never re-runs the
    * training scan; transform appends `<col>_z` columns. */
  final case class StandardScaler(cols: Seq[String]) extends Estimator {
    def fit(df: DataFrame): Transformer = {
      val stats = df.select(cols.flatMap(c => Preprocessing.zStats(c, "__")): _*)
        .localCheckpoint()
      new Transformer {
        def transform(in: DataFrame): DataFrame =
          in.crossJoin(broadcast(stats))
            .select(in.columns.map(col).toSeq ++
              cols.map(c => Preprocessing.zOut(c, "__")): _*)
      }
    }
  }

  /** min-max scaler to [0,1] (constant training column → 0.5, the
    * reference's midpoint convention); appends `<col>_mm`. */
  final case class MinMaxScaler(cols: Seq[String]) extends Estimator {
    def fit(df: DataFrame): Transformer = {
      val stats = df.select(cols.flatMap(c => Preprocessing.mmStats(c, "__")): _*)
        .localCheckpoint()
      new Transformer {
        def transform(in: DataFrame): DataFrame =
          in.crossJoin(broadcast(stats))
            .select(in.columns.map(col).toSeq ++
              cols.map(c => Preprocessing.mmOut(c, "__")): _*)
      }
    }
  }

  /** Stateless degree-d expansion of one integral column (x^2..x^d as
    * exact integer products); appends `<col>_p<d>`. */
  final case class PolynomialFeatures(c: String, degree: Int) extends Transformer {
    def transform(in: DataFrame): DataFrame =
      Preprocessing.polynomialFeatures(in, c, degree)
  }

  /** Predictor = Estimator whose transformer appends a `prediction`
    * column (reference: pipeline/Predictor.scala). Simple least-squares
    * y ~ x via the closed-form one-pass fit. */
  final case class LinearRegression(xCol: String, yCol: String) extends Estimator {
    def fit(df: DataFrame): Transformer = {
      val coef = Preprocessing
        .linearFit(df.withColumn("__g", lit(1)), Seq("__g"), xCol, yCol)
        .select(col("slope").as("__slope"), col("intercept").as("__intercept"))
        .localCheckpoint()
      new Transformer {
        def transform(in: DataFrame): DataFrame =
          in.crossJoin(broadcast(coef))
            .select(in.columns.map(col).toSeq :+
              (col("__slope") * col(xCol) + col("__intercept")).as("prediction"): _*)
      }
    }
  }

  /** Multi-feature least-squares Predictor (reference: flink-ml/.../
    * regression/MultipleLinearRegression.scala): fit = ONE Gram aggregate
    * + a driver-side k×k solve (ML.linearRegressionFit — O(k²) model
    * state); transform appends `prediction` = w0 + Σ wj·xj with no
    * shuffle. */
  final case class MultipleLinearRegression(xCols: Seq[String], yCol: String)
      extends Estimator {
    def fit(df: DataFrame): Transformer = {
      val w = ML.linearRegressionFit(df, xCols, yCol)
      new Transformer {
        def transform(in: DataFrame): DataFrame =
          in.withColumn("prediction", ML.linearRegressionPredict(w))
      }
    }
  }

  /** Hinge-loss linear classifier over integral feature columns via the
    * deterministic Pegasos loop (ML.svmScaled); prediction in {-1, 1}. */
  final case class LinearSVM(labelCol: String, xCols: Seq[String], iters: Int,
                             lambdaInv: Long = 100L) extends Estimator {
    def fit(df: DataFrame): Transformer = {
      val w = ML.svmScaled(df, labelCol, xCols, iters, lambdaInv = lambdaInv)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val weights = xCols.map(c => c -> w(c)).toMap
      new Transformer {
        def transform(in: DataFrame): DataFrame =
          in.withColumn("prediction", ML.svmPredict(weights))
      }
    }
  }
}
