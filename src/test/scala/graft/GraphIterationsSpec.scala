package graft

import graft.operators.{GraphGenerators, GraphIterations, GraphOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The three Gelly iteration-model facades (scatter-gather, GSA,
  * vertex-centric) and the generator package: facade results are checked
  * against the hand-inlined library algorithms and hand-computed
  * fixtures; generators against their structural invariants. */
class GraphIterationsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("src", "dst")

  test("scatterGatherToFixpoint min-propagation reproduces connectedComponents") {
    // two components: {1,2,3,9} and {5,6}
    val e = edges(1L -> 2L, 2L -> 3L, 9L -> 3L, 5L -> 6L)
    val ued = GraphOps.undirected(e).select(col("a").as("src"), col("b").as("dst"))
    val init = ued.select(col("src").as("node")).distinct()
      .withColumn("val", col("node"))
    val got = GraphIterations.scatterGatherToFixpoint(ued, init, 20)(
      identity, min, (old, acc) => least(old, coalesce(acc, old)))
      .as[(Long, Long)].collect().toMap
    val want = GraphOps.connectedComponents(e)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("gatherSumApply runs SSSP over weighted edges (gather reads the edge value)") {
    // 0 -1-> 1 -1-> 2; 0 -5-> 2: shortest 0->2 is 2 via the chain
    val e = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 5L)).toDF("src", "dst", "eval")
    val big = 1000000L
    val init = Seq((0L, 0L), (1L, big), (2L, big)).toDF("node", "val")
    val got = GraphIterations.gatherSumApply(e, init, 3)(
      (srcVal, eval) => srcVal + eval, min,
      (old, acc) => least(old, coalesce(acc, old)))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("vertexCentric passes the whole inbox as a sorted array") {
    // star into node 9 from 3,1,2: compute = old * 100 + inbox size, and
    // the inbox must arrive ascending-sorted for determinism
    val e = edges(3L -> 9L, 1L -> 9L, 2L -> 9L)
    val init = Seq((1L, 10L), (2L, 20L), (3L, 30L), (9L, 7L)).toDF("node", "val")
    val got = GraphIterations.vertexCentric(e, init, 1)(
      identity,
      (old, inbox) => when(inbox.isNull, old)
        .otherwise(old * 100 + element_at(inbox, 1) * 1000000 + size(inbox)))
      .as[(Long, Long)].collect().toMap
    // node 9: inbox sorted = [10, 20, 30] -> 7*100 + 10*1000000 + 3
    assert(got === Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 9L -> 10000703L))
    }

  test("generators satisfy their structural invariants") {
    assert(GraphGenerators.complete(spark, 7).count() === 42)
    val cyc = GraphGenerators.cycle(spark, 9)
    assert(cyc.count() === 18)
    // every node has exactly 2 distinct neighbours in a 9-cycle
    assert(cyc.groupBy("src").agg(count(lit(1)).as("d"))
      .filter(col("d") =!= 2).isEmpty)
    assert(GraphGenerators.path(spark, 9).count() === 16)
    assert(GraphGenerators.star(spark, 9).count() === 16)
    assert(GraphGenerators.grid(spark, 3, 4).count() === 2 * (2 * 4 + 3 * 3))
    val hc = GraphGenerators.hypercube(spark, 4)
    assert(hc.count() === 16 * 4)
    // hypercube edges differ in exactly one bit and are symmetric
    assert(hc.select(expr("bit_count(src ^ dst)").as("b"))
      .filter(col("b") =!= 1).isEmpty)
    assert(hc.intersect(hc.select(col("dst").as("src"), col("src").as("dst")))
      .count() === 64)
    assert(GraphGenerators.singletonEdges(spark, 5).count() === 10)
    assert(GraphGenerators.empty(spark, 11).count() === 11)
    val rm = GraphGenerators.rmat(spark, 6, 500)
    assert(rm.count() === 500)
    // all endpoints inside [0, 2^6); deterministic across invocations
    assert(rm.filter(col("src") < 0 || col("src") > 63 ||
      col("dst") < 0 || col("dst") > 63).isEmpty)
    assert(rm.exceptAll(GraphGenerators.rmat(spark, 6, 500)).isEmpty)
  }

  test("maybeBroadcast hints only below bigRows/2 (frame-size headroom)") {
    import graft.operators.Iterations
    import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
    val cut = Iterations.defaultBigRows
    val small = spark.range(10).toDF("id")
    def hinted(rows: Long): Boolean = {
      val side = Iterations.maybeBroadcast(rows)(small)
      side.join(spark.range(20).toDF("id"), "id")
        .queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty
    }
    // below half the cutoff: the vertex/factor frame (≤ ~2× the edge count's
    // distinct endpoints) still fits a broadcast → hint present
    assert(hinted(cut / 2 - 1))
    // at/above half the cutoff: no hint — with the small-loop profile
    // disabling AQE there is no runtime fallback if a broadcast overflows
    assert(!hinted(cut / 2))
    assert(!hinted(cut * 2))
  }
}
