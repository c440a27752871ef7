package graft

import graft.operators.PQ
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PQSpec extends SparkSpec {
  import spark.implicits._

  /** 40 8-dim vectors in two tight clusters: ids 0..19 near (1,1,..),
    * ids 20..39 near (9,9,..), with a deterministic per-id jitter. */
  private def clustered = spark.range(40).select(
    $"id".cast("long").as("vec_id"),
    transform(sequence(lit(0), lit(7)),
      d => (when($"id" < 20, 1.0).otherwise(9.0) +
        (($"id" * 7 + d * 3) % 10).cast("double") / 100.0).cast("float"))
      .as("embedding"))

  test("fit encodes every vector in every subspace against the codebook") {
    val model = PQ.fit(clustered, "vec_id", "embedding", dim = 8, m = 2,
      k = 4, iters = 1)
    assert(model.centroids.count() === 2 * 4)
    assert(model.codes.count() === 40 * 2)
    // every assigned cell exists in that subspace's codebook
    val orphan = model.codes.join(model.centroids, Seq("m", "cell_id"), "leftanti")
    assert(orphan.isEmpty)
  }

  test("adcTopK with k = n cells and 0 rounds degenerates to exact quantized L2") {
    // each distinct vector seeds its own cell, so the ADC table IS the
    // exact subspace distance and the sum IS the exact quantized distance
    val df = clustered
    val model = PQ.fit(df, "vec_id", "embedding", dim = 8, m = 2,
      k = 40, iters = 0)
    val probes = df.filter($"vec_id" % 13 === 0)
    val adc = PQ.adcTopK(model, probes, "vec_id", "embedding", dim = 8, m = 2,
      topK = 7)
    val qf = df.select($"vec_id",
      transform($"embedding", x => floor(x.cast("double") * 1000000L).cast("long"))
        .as("qv"))
    val pf = qf.filter($"vec_id" % 13 === 0)
      .select($"vec_id".as("q_id"), $"qv".as("pv"))
    val w = Window.partitionBy("q_id").orderBy($"d".asc, $"vec_id".asc)
    val brute = pf.crossJoin(qf)
      .withColumn("d", aggregate(
        zip_with($"pv", $"qv", (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 7)
      .select($"q_id", $"rank", $"vec_id".as("id"), $"d".as("adc_dist"))
    assert(adc.exceptAll(brute).isEmpty && brute.exceptAll(adc).isEmpty)
  }

  test("adcTopK keeps probes inside their own cluster") {
    val model = PQ.fit(clustered, "vec_id", "embedding", dim = 8, m = 2,
      k = 4, iters = 2)
    val probes = clustered.filter($"vec_id".isin(3L, 27L))
    val top = PQ.adcTopK(model, probes, "vec_id", "embedding", dim = 8, m = 2,
      topK = 5)
    val rows = top.select($"q_id", $"id").as[(Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (q, n) =>
      assert((q < 20) === (n < 20),
        s"probe $q got cross-cluster neighbor $n under ADC")
    }
  }

  test("ivfAdcTopK with nProbe = nCells equals the unpruned adcTopK") {
    val df = clustered
    val coarse = graft.operators.ML.kMeansScaled(df, "vec_id", "embedding",
      k = 4, iters = 1)
    val model = PQ.fit(df, "vec_id", "embedding", dim = 8, m = 2, k = 4, iters = 1)
    val probes = df.filter($"vec_id".isin(0L, 21L, 39L))
    val full = PQ.adcTopK(model, probes, "vec_id", "embedding", dim = 8, m = 2,
      topK = 6)
    val ivf = PQ.ivfAdcTopK(coarse, model, probes, "vec_id", "embedding",
      dim = 8, m = 2, nProbe = 4, topK = 6)
    assert(ivf.exceptAll(full).isEmpty && full.exceptAll(ivf).isEmpty)
  }

  test("ivfAdcTopK prunes: with nProbe = 1 every neighbor shares the probe's nearest cell") {
    val df = clustered
    val coarse = graft.operators.ML.kMeansScaled(df, "vec_id", "embedding",
      k = 2, iters = 2)
    val model = PQ.fit(df, "vec_id", "embedding", dim = 8, m = 2, k = 4, iters = 1)
    val probes = df.filter($"vec_id".isin(3L, 27L))
    val top = PQ.ivfAdcTopK(coarse, model, probes, "vec_id", "embedding",
      dim = 8, m = 2, nProbe = 1, topK = 10)
    val cellOf = coarse.assignments.select($"vec_id", $"cell_id")
      .as[(Long, Long)].collect().toMap
    val rows = top.select($"q_id", $"id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n) =>
      assert(cellOf(n) === cellOf(q),
        s"neighbor $n (cell ${cellOf(n)}) outside probe $q's cell ${cellOf(q)}")
    }
    // the two tight clusters coincide with the 2 coarse cells: 10 each
    assert(rows.count(_._1 == 3L) === 10 && rows.count(_._1 == 27L) === 10)
  }
}
