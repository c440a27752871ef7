package graft

import graft.operators.MLPipeline._
import org.apache.spark.sql.functions._

/** FlinkML pipeline-surface semantics: fit captures TRAINING statistics
  * and the transformer replays them on unseen data (train/serve split). */
class MLPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("StandardScaler applies training moments to unseen data") {
    val train = Seq(0L, 10L).toDF("x") // mean 5, stdev 5
    val serve = Seq(15L).toDF("x")
    val t = StandardScaler(Seq("x")).fit(train)
    // (15 - 5) / 5 = 2: the training mean/stdev, not the serve frame's
    assert(t.transform(serve).select($"x_z").head().getDouble(0) === 2.0)
    // constant training column -> z = 0 everywhere
    val t2 = StandardScaler(Seq("x")).fit(Seq(7L, 7L).toDF("x"))
    assert(t2.transform(serve).select($"x_z").head().getDouble(0) === 0.0)
  }

  test("MultipleLinearRegression recovers an exact plane and predicts unseen points") {
    // y = 3 + 2*x1 - x2, exactly linear and full-rank
    val train = Seq((1L, 1L), (2L, 5L), (3L, 2L), (4L, 7L), (5L, 3L), (6L, 1L))
      .toDF("x1", "x2").withColumn("y", lit(3.0) + col("x1") * 2 - col("x2"))
    val t = MultipleLinearRegression(Seq("x1", "x2"), "y").fit(train)
    val pred = t.transform(Seq((10L, 4L)).toDF("x1", "x2"))
      .select($"prediction").head().getDouble(0)
    assert(math.abs(pred - (3.0 + 20.0 - 4.0)) < 1e-9)
    // collinear features must fail loudly, not return garbage
    val bad = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x1", "x2")
      .withColumn("y", col("x1") * 1.0)
    intercept[IllegalArgumentException](
      MultipleLinearRegression(Seq("x1", "x2"), "y").fit(bad))
  }

  test("MinMaxScaler applies the training range (values outside extrapolate); constant -> 0.5") {
    val t = MinMaxScaler(Seq("x")).fit(Seq(10L, 20L).toDF("x"))
    val out = t.transform(Seq(10L, 15L, 25L).toDF("x"))
      .select($"x_mm").as[Double].collect().toSeq
    assert(out === Seq(0.0, 0.5, 1.5)) // outside training range extrapolates
    val tc = MinMaxScaler(Seq("x")).fit(Seq(3L, 3L).toDF("x"))
    assert(tc.transform(Seq(3L).toDF("x")).select($"x_mm").head().getDouble(0) === 0.5)
  }

  test("andThen chains transformers left to right") {
    val chained = MinMaxScaler(Seq("x")).fit(Seq(0L, 10L).toDF("x"))
      .andThen(PolynomialFeatures("x", 3))
    val row = chained.transform(Seq(4L).toDF("x"))
    assert(row.columns.toSeq === Seq("x", "x_mm", "x_p2", "x_p3"))
    val r = row.head()
    assert(r.getAs[Double]("x_mm") === 0.4)
    assert(r.getAs[Long]("x_p3") === 64L)
  }

  test("LinearRegression predictor reproduces an exact line on unseen x") {
    val train = Seq((1L, 13L), (2L, 23L), (3L, 33L)).toDF("x", "y") // y = 10x + 3
    val t = LinearRegression("x", "y").fit(train)
    val pred = t.transform(Seq((10L, 0L)).toDF("x", "y"))
      .select($"prediction").head().getDouble(0)
    assert(math.abs(pred - 103.0) < 1e-9)
  }

  test("LinearSVM predictor classifies unseen points of separable data") {
    val train = (0 to 10).filter(_ != 5)
      .map(x => (if (x >= 6) 1L else -1L, 1L, x.toLong)).toDF("y", "b", "x")
    val t = LinearSVM("y", Seq("b", "x"), iters = 50).fit(train)
    val preds = t.transform(Seq((0L, 1L, 2L), (0L, 1L, 9L)).toDF("y", "b", "x"))
      .select($"x", $"prediction").as[(Long, Int)].collect().toMap
    assert(preds === Map(2L -> -1, 9L -> 1))
  }
}
