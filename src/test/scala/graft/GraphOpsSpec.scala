package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // two components: {1,2,3} (chain) and {10,11}; 20 isolated via self-ref? no — isolated nodes
  // only exist if they appear in an edge, so the smallest component is a pair.
  private val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")

  test("degrees count in/out per node") {
    val d = GraphOps.degrees(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d(1L) === ((0L, 1L, 1L)))
    assert(d(2L) === ((1L, 1L, 2L)))
    assert(d(3L) === ((1L, 0L, 1L)))
    assert(d(10L) === ((0L, 1L, 1L)))
  }

  test("connectedComponents labels by min id and converges") {
    val cc = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("pageRankScaled: sink accumulates, chain is deterministic") {
    val pr = GraphOps.pageRankScaled(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // source nodes settle at the teleport floor
    assert(pr(1L) === 150000L)
    assert(pr(10L) === 150000L)
    // independent hand computation of the integer recurrence for node 2:
    var r1 = 1000000L; var r2 = 1000000L
    for (_ <- 1 to 10) { val n2 = 150000L + (85L * r1) / 100L; r1 = 150000L; r2 = n2 }
    assert(pr(2L) === r2)
    assert(pr(3L) > pr(2L)) // 3 receives from 2 which receives from 1
  }

  test("sumOverOutNeighbors aggregates neighbor attributes") {
    val attrs = Seq((2L, 100L), (3L, 7L), (11L, 5L)).toDF("node", "x")
    val out = GraphOps.sumOverOutNeighbors(edges, attrs, "x").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((100L, 1L)))
    assert(out(2L) === ((7L, 1L)))
    assert(out(10L) === ((5L, 1L)))
  }
}
