package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Gelly Graph.java transformation-surface semantics (the gate query qbw
  * covers subgraph/mapVertices/reverse/reduceOnNeighbors/getDegrees
  * against the DuckDB oracle; this spec pins the remaining members). */
class GraphFacadeSpec extends SparkSpec {
  import spark.implicits._

  private def g1 = Graph(
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("node", "value"),
    Seq((1L, 2L, 5L), (2L, 3L, 7L), (3L, 1L, 9L)).toDF("src", "dst", "value"))

  test("mapEdges transforms edge values only") {
    val g = g1.mapEdges(_ + 100L)
    assert(g.edges.select(sum($"value")).head().getLong(0) === 321L)
    assert(g.vertices.count() === 4)
  }

  test("filterOnEdges keeps vertices (Gelly: no vertex pruning)") {
    val g = g1.filterOnEdges($"value" > 6)
    assert(g.edges.count() === 2)
    assert(g.vertices.count() === 4)
  }

  test("subgraph drops edges whose endpoint was filtered away") {
    val g = g1.subgraph($"value" =!= 30L, lit(true))
    assert(g.vertices.count() === 3)
    // edges touching node 3 (value 30) are gone
    assert(g.edges.as[(Long, Long, Long)].collect().toSet === Set((1L, 2L, 5L)))
  }

  test("joinWithVertices applies f on match, keeps value otherwise") {
    val in = Seq((1L, 100L), (3L, 300L)).toDF("node", "x")
    val g = g1.joinWithVertices(in, (v, x) => v + x)
    val m = g.vertices.as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 110L, 2L -> 20L, 3L -> 330L, 4L -> 40L))
  }

  test("joinWithVertices keeps one vertex per id on duplicate input (min wins)") {
    val in = Seq((1L, 200L), (1L, 100L)).toDF("node", "x")
    val g = g1.joinWithVertices(in, (v, x) => v + x)
    val rows = g.vertices.as[(Long, Long)].collect()
    assert(rows.length === 4, "vertex set must stay unique per id")
    assert(rows.toMap.apply(1L) === 110L) // min input value, deterministic
  }

  test("union dedups vertices (left wins) and keeps duplicate edges") {
    val g2 = Graph(
      Seq((3L, 99L), (5L, 50L)).toDF("node", "value"),
      Seq((3L, 1L, 9L), (5L, 3L, 1L)).toDF("src", "dst", "value"))
    val u = g1.union(g2)
    val m = u.vertices.as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L, 5L -> 50L))
    assert(u.edges.count() === 5) // the (3,1,9) duplicate survives
  }

  test("difference removes the other graph's vertices and incident edges") {
    val g2 = Graph(Seq((2L, 0L)).toDF("node", "value"),
      spark.emptyDataset[(Long, Long, Long)].toDF("src", "dst", "value"))
    val d = g1.difference(g2)
    assert(d.vertices.as[(Long, Long)].collect().toMap.keySet === Set(1L, 3L, 4L))
    assert(d.edges.as[(Long, Long, Long)].collect().toSet === Set((3L, 1L, 9L)))
  }

  test("intersect keeps exactly the common (src, dst, value) edges") {
    val g2 = Graph(
      Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("node", "value"),
      Seq((1L, 2L, 5L), (2L, 3L, 999L)).toDF("src", "dst", "value"))
    val i = g1.intersect(g2)
    assert(i.edges.as[(Long, Long, Long)].collect().toSet === Set((1L, 2L, 5L)))
    assert(i.vertices.select("node").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("reduceOnEdges aggregates incident edge values per direction") {
    val out = g1.reduceOnEdges(max, "out").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 5L, 2L -> 7L, 3L -> 9L))
    val in = g1.reduceOnEdges(max, "in").as[(Long, Long)].collect().toMap
    assert(in === Map(2L -> 5L, 3L -> 7L, 1L -> 9L))
    val all = g1.reduceOnEdges(sum, "all").as[(Long, Long)].collect().toMap
    assert(all === Map(1L -> 14L, 2L -> 12L, 3L -> 16L))
  }

  test("reduceOnNeighbors aggregates neighbor vertex values") {
    val in = g1.reduceOnNeighbors(sum, "in").as[(Long, Long)].collect().toMap
    // in-neighbors: 2<-1, 3<-2, 1<-3
    assert(in === Map(2L -> 10L, 3L -> 20L, 1L -> 30L))
    val all = g1.reduceOnNeighbors(sum, "all").as[(Long, Long)].collect().toMap
    assert(all === Map(1L -> 50L, 2L -> 40L, 3L -> 30L))
  }

  test("getUndirected doubles edges; getDegrees counts isolated vertices as 0") {
    val u = g1.getUndirected
    assert(u.edges.count() === 6)
    val deg = g1.getDegrees.as[(Long, Long)].collect().toMap
    assert(deg === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 0L))
  }
}
