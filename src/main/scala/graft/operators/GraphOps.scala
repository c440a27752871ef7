package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph capability surface (reference: flink-libraries/flink-gelly/.../
  * Graph.java — degrees/reduceOnNeighbors, library/{PageRank,
  * ConnectedComponents}.java, pregel/VertexCentricIteration.java),
  * re-expressed as DataFrames + driver-side Pregel loops.
  *
  * A graph is two DataFrames: `edges(src, dst)` (directed) and implied
  * vertices. Iterative algorithms run the classic Spark pattern: join
  * messages → aggregate → update, with `cache` + `localCheckpoint` per
  * round to keep lineage flat (the in-cluster iteration the reference runs
  * natively becomes a driver loop of short jobs; each round is one shuffle
  * keyed on the node id, so rounds co-partition and AQE handles skew).
  *
  * PageRank uses scaled integer arithmetic (micro-ranks, integer division)
  * so results are exactly reproducible by any engine — no float summation
  * order dependence.
  */
object GraphOps {

  /** Undirected view: each edge in both directions, distinct. */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst"), col("src"))).distinct()

  /** All vertex ids. */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).union(edges.select(col("dst"))).distinct()

  /** In/out/total degrees (reference: Graph.java — inDegrees/outDegrees/getDegrees). */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    vertices(edges)
      .join(out, Seq("node"), "left").join(in, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        (coalesce(col("in_deg"), lit(0L)) + coalesce(col("out_deg"), lit(0L))).as("deg"))
  }

  /** Connected components by min-label propagation to fixpoint
    * (reference: flink-libraries/flink-gelly/.../library/
    * ConnectedComponents.java — scatter-gather min-id). Returns
    * (node, component) where component = min node id in the component. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val ued = undirected(edges).cache()
    val initial = vertices(edges).withColumn("lbl", col("node"))
    val labels = Iterations.iterateDelta(initial, maxIter) { cur =>
      val nbrMin = ued.join(cur, ued("b") === cur("node"))
        .groupBy(col("a").as("node")).agg(min(col("lbl")).as("nbr_lbl"))
      cur.join(nbrMin, Seq("node"), "left")
        .select(col("node"), least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
    } { (prev, next) =>
      next.join(prev.withColumnRenamed("lbl", "old"), "node")
        .filter(col("lbl") =!= col("old")).limit(1).count() == 0
    }
    ued.unpersist()
    labels.select(col("node"), col("lbl").as("component"))
  }

  /** PageRank, `iters` fixed rounds, damping 0.85, dangling mass dropped.
    * Ranks are integer micro-units: rank0 = 1e6; each round
    * rank' = 150000 + (85 * sum(rank(src) div outdeg(src))) div 100. */
  def pageRankScaled(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select("src", "dst").distinct().cache()
    // Loop-invariant hoist: (edge ⋈ out-degree) never changes across
    // rounds — pay its join once, not per iteration. At scale this is a
    // full shuffle of the edge set saved per round; the cached result is
    // already partitioned for the per-round rank join.
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val eWithDeg = e.join(outdeg, "src")
      .select(col("src").as("node"), col("dst"), col("d")).cache()
    val verts = vertices(e).cache()
    val ranks = Iterations.iterate(verts.withColumn("rank", lit(1000000L)), iters, fuse = 2) { cur =>
      // `div` = exact integer division (Spark's `/` would be double division)
      val contribs = eWithDeg.join(cur, "node")
        .select(col("dst").as("node"), expr("rank div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      verts.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(contrib, 0L)) div 100")).as("rank"))
    }
    e.unpersist(); eWithDeg.unpersist(); verts.unpersist()
    ranks
  }

  /** Aggregate a neighbor attribute onto each vertex (reference:
    * Graph.java — reduceOnNeighbors(SUM)): sum `attr` of `dst`-side
    * neighbors per `src` vertex, given a vertex-attribute table. */
  def sumOverOutNeighbors(edges: DataFrame, vertexAttrs: DataFrame,
                          attrCol: String): DataFrame =
    edges.join(vertexAttrs.withColumnRenamed("node", "dst"), "dst")
      .groupBy(col("src").as("node"))
      .agg(sum(col(attrCol)).as(s"sum_$attrCol"), count(lit(1)).as("n_nbrs"))
}
