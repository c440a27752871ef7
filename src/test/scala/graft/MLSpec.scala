package graft

import graft.operators.ML
import org.apache.spark.sql.functions._

/** Specs for the double-precision ML paths that have no SQL-expressible
  * oracle (the scaled-integer gate paths are hash-checked by qbu/qbv). */
class MLSpec extends SparkSpec {
  import spark.implicits._

  test("alsFit rank-2 recovers an exactly rank-2 rating matrix") {
    // ratings = U·Vᵀ for known rank-2 factors; a complete exact low-rank
    // matrix is recoverable, so predictions must converge to the data
    val users = (0 until 20).map(u => (u.toLong, 1.0 + (u % 5), 0.5 + (u % 3)))
    val items = (0 until 15).map(i => (i.toLong, 1.0 + (i % 4), 0.5 + (i % 2)))
    val ratings = for ((u, a, b) <- users; (i, c, d) <- items)
      yield (u, i, a * c + b * d)
    val df = ratings.toDF("u", "i", "r")
    val factors = ML.alsFit(df, "u", "i", "r", rank = 2, sweeps = 10, lambda = 1e-9)
    val rmse = ML.alsPredict(df, factors, "u", "i")
      .agg(sqrt(avg(pow(col("prediction") - col("r"), 2))))
      .head().getDouble(0)
    assert(rmse < 1e-3, s"rank-2 ALS should fit exact rank-2 data, rmse=$rmse")
  }

  test("alsFit higher rank also fits (regularized solve stays non-singular)") {
    val ratings = for (u <- 0 until 12; i <- 0 until 10)
      yield (u.toLong, i.toLong, (1.0 + u % 3) * (1.0 + i % 4))
    val df = ratings.toDF("u", "i", "r")
    val factors = ML.alsFit(df, "u", "i", "r", rank = 4, sweeps = 8, lambda = 1e-6)
    val rmse = ML.alsPredict(df, factors, "u", "i")
      .agg(sqrt(avg(pow(col("prediction") - col("r"), 2))))
      .head().getDouble(0)
    assert(rmse < 1e-2, s"rank-4 >= true rank, should still fit, rmse=$rmse")
  }

  test("alsRank1Scaled recovers rank-1 structure") {
    // exact rank-1 integer ratings: r = a_u * c_i
    val as = Map(1L -> 2L, 2L -> 3L, 3L -> 5L)
    val cs = Map(10L -> 4L, 11L -> 7L, 12L -> 2L)
    val df = (for ((u, a) <- as.toSeq; (i, c) <- cs.toSeq)
      yield (u, i, a * c)).toDF("u", "i", "r")
    val f = ML.alsRank1Scaled(df, "u", "i", "r", sweeps = 3)
    val uf = f.filter($"side" === "user").as[(String, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    val itf = f.filter($"side" === "item").as[(String, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    for ((u, a) <- as; (i, c) <- cs) {
      val pred = uf(u).toDouble * itf(i).toDouble / 1e8
      val err = math.abs(pred - a * c) / (a * c)
      assert(err < 0.01, s"u=$u i=$i pred=$pred want=${a * c}")
    }
  }

  test("alsRank2Scaled reconstructs an exactly rank-2 rating matrix") {
    // the qbx oracle proves engine replay; this proves the alternation
    // actually FITS: predictions from the scaled factors approach the
    // known rank-2 data
    val ratings = for (u <- 1L to 12L; i <- 1L to 10L)
      yield (u, i, (2 + u % 3) * (1 + i % 4) + (1 + u % 2) * (2 + i % 3))
    val df = ratings.toDF("u", "i", "r")
    val f = ML.alsRank2Scaled(df, "u", "i", "r", sweeps = 6)
    val uf = f.filter($"side" === "user").as[(String, Long, Long, Long)]
      .collect().map(r => r._2 -> (r._3, r._4)).toMap
    val itf = f.filter($"side" === "item").as[(String, Long, Long, Long)]
      .collect().map(r => r._2 -> (r._3, r._4)).toMap
    val errs = ratings.map { case (u, i, r) =>
      val pred = (uf(u)._1.toDouble * itf(i)._1 + uf(u)._2.toDouble * itf(i)._2) / 1e8
      math.abs(pred - r) / r
    }
    val meanErr = errs.sum / errs.size
    assert(meanErr < 0.05, s"rank-2 ALS should fit rank-2 data, mean rel err $meanErr")
  }

  test("svmScaled separates linearly separable data") {
    // y = sign(x - 5) with a margin gap: a correct (w_x, w_b) exists
    val rows = (0 to 10).filter(_ != 5)
      .map(x => (if (x >= 6) 1L else -1L, 1L, x.toLong))
    val df = rows.toDF("y", "b", "x")
    // λ = 1/100: small enough that the hinge term dominates and the
    // optimum actually separates (λ = 1 over-regularizes a unit-margin
    // boundary at |w| ~ 2)
    val w = ML.svmScaled(df, "y", Seq("b", "x"), iters = 50, lambdaInv = 100L)
      .as[(String, Long)].collect().toMap
    val weights = Map("b" -> w("b"), "x" -> w("x"))
    val acc = df.withColumn("p", ML.svmPredict(weights))
      .filter($"p" === $"y").count().toDouble / rows.size
    assert(acc == 1.0, s"separable data must classify perfectly, acc=$acc, w=$w")
  }

  test("svmScaled violation count decreases vs the all-violating start") {
    val rows = (0 to 10).filter(_ != 5)
      .map(x => (if (x >= 6) 1L else -1L, 1L, x.toLong))
    val df = rows.toDF("y", "b", "x")
    val viol = ML.svmScaled(df, "y", Seq("b", "x"), iters = 50, lambdaInv = 100L)
      .filter($"k" === "_violations").head().getLong(1)
    assert(viol < rows.size, "training must reduce hinge violations below n")
  }

  test("gradientDescentScaled matches an independent BigInt replay for every penalty") {
    val rows = Seq((1L, 2L, 7L), (1L, 5L, 16L), (1L, 9L, 28L), (1L, 3L, 10L))
    val df = rows.toDF("b", "x", "y")
    val scale = 1000000L; val etaInv = 10L; val lambdaInv = 2L; val iters = 5
    val n = rows.size
    for (penalty <- Seq("none", "l2", "l1")) {
      // straight-line BigInt reimplementation of the documented update
      var w = Array(BigInt(0), BigInt(0))
      for (t <- 1 to iters) {
        val g = Array(BigInt(0), BigInt(0))
        rows.foreach { case (b, x, y) =>
          val r = b * w(0) + x * w(1) - BigInt(y) * scale
          g(0) += b * r; g(1) += x * r
        }
        w = w.zipWithIndex.map { case (wj, j) =>
          val pen = penalty match {
            case "none" => BigInt(0)
            case "l2" => wj / (lambdaInv * etaInv * t)
            case "l1" => BigInt(wj.signum) * (BigInt(scale) / (lambdaInv * etaInv * t))
          }
          wj - pen - g(j) / (BigInt(etaInv) * t * n)
        }
      }
      val got = ML.gradientDescentScaled(df, "y", Seq("b", "x"), iters,
        scale, etaInv, penalty, lambdaInv)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("b") === w(0).toLong && got("x") === w(1).toLong,
        s"penalty=$penalty diverged from the replay")
      // y ~= 3x + 1: the slope weight must head toward 3·scale
      assert(got("x") > 2 * scale && got("x") < 4 * scale, s"penalty=$penalty slope off")
    }
    // the three penalties produce distinct trajectories on this fixture
    val ws = Seq("none", "l2", "l1").map(p =>
      ML.gradientDescentScaled(df, "y", Seq("b", "x"), iters, scale, etaInv, p, lambdaInv)
        .filter($"k" === "x").head().getLong(1))
    assert(ws.distinct.size === 3)
  }

  test("gradientDescentScaled guards the residual bound against Long overflow") {
    val df = Seq((1L, 1L << 40, 5L)).toDF("b", "x", "y")
    val e = intercept[IllegalArgumentException](
      ML.gradientDescentScaled(df, "y", Seq("b", "x"), iters = 3, etaInv = 1L))
    assert(e.getMessage.contains("residual bound"))
  }

  test("kMeansScaled recovers planted clusters and tightens centroids over rounds") {
    // three tight planted clusters; the first three ids land in DIFFERENT
    // clusters so the lowest-id init starts with one seed per true cluster
    val centers = Seq(Seq(10f, 0f, 0f), Seq(0f, 10f, 0f), Seq(0f, 0f, 10f))
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 30).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val r = ML.kMeansScaled(df, "vec_id", "embedding", k = 3, iters = 2)
    val got = r.assignments.as[(Long, Long)].collect().toMap
    // every member of a planted cluster shares its seed's cell
    assert((0 until 30).forall(i => got(i.toLong) === got((i % 3).toLong)))
    assert(got.values.toSet.size === 3)
    // after two rounds each centroid sits within quantization noise of its
    // planted center (init was a single sample; the mean is much closer)
    val cents = r.centroids.as[(Long, Seq[Long])].collect().toMap
    centers.zipWithIndex.foreach { case (c, i) =>
      val cv = cents(got(i.toLong))
      c.zip(cv).foreach { case (exp, gotQ) =>
        assert(math.abs(gotQ / 1e6 - exp) < 0.1, s"centroid $i drifted: $cv")
      }
    }
    // a dead seed drops out: two identical far points + one lone seed that
    // captures everything leaves the dead cell without members
    val degen = Seq((0L, Seq(0f, 0f)), (1L, Seq(0.001f, 0f)), (2L, Seq(0.001f, 0.001f)))
      .toDF("vec_id", "embedding")
    val r2 = ML.kMeansScaled(degen, "vec_id", "embedding", k = 2, iters = 2)
    assert(r2.assignments.select("cell_id").as[Long].collect().toSet.size <= 2)
  }
}
